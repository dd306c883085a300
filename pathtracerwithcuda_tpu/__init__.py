"""TPU-native differentiable path tracer.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
BlauHimmel/PathTracerWithCuda (an interactive progressive CUDA path tracer):
progressive accumulation, BVH-accelerated triangle meshes, spheres, GGX
microfacet reflection, dielectric/conductor Fresnel, refraction with medium
hand-off, homogeneous-medium subsurface scattering, textures, cube-map /
procedural-sky environments, thin-lens depth of field — plus capabilities the
reference does not have: differentiable rendering (pixel gradients w.r.t.
material/texture/emitter parameters) and multi-chip scaling via
``jax.sharding`` / ``shard_map``.

Design notes (TPU-first, not a CUDA port):
  * The wavefront is a fixed-shape SoA ray batch; the CUDA stream compaction
    (thrust::remove_if, reference Kernel/parallel_function.cu:42-49) becomes an
    active-lane mask because XLA requires static shapes.
  * The per-material control flow of the reference megakernel
    (Kernel/path_tracer_kernel.cu:494-624) becomes branchless all-lobe
    evaluation + select, which vectorizes on the VPU and keeps gradients
    well-defined.
  * The stackless skip-link BVH layout (Bvh/bvh.cpp:244-330) is kept as plain
    int/float SoA arrays; traversal is a lax.while_loop (and a Pallas kernel on
    the hot path).
  * RNG is counter-based `jax.random` keyed on (pass, depth, lane) — replacing
    the reference's hash-seeded thrust engines (Kernel/path_tracer_kernel.cu:35-44).
"""

__version__ = "0.1.0"

from pathtracerwithcuda_tpu.config import RenderConfig

__all__ = ["RenderConfig", "__version__"]
