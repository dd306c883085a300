from pathtracerwithcuda_tpu.parallel.mesh import make_render_mesh, RAY_AXIS, SAMPLE_AXIS
from pathtracerwithcuda_tpu.parallel.shard import (
    distributed_render_pass,
    distributed_trace,
)

__all__ = [
    "make_render_mesh",
    "RAY_AXIS",
    "SAMPLE_AXIS",
    "distributed_render_pass",
    "distributed_trace",
]
