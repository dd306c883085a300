from pathtracerwithcuda_tpu.render.wavefront import render_pass, trace_radiance
from pathtracerwithcuda_tpu.render.session import RenderSession

__all__ = ["render_pass", "trace_radiance", "RenderSession"]
