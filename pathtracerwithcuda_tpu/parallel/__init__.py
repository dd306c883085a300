"""Parallel/distributed utilities.

The shard_map render wrappers are imported lazily (PEP 562): they pull in
the full render stack, whose module-level jnp constants initialize the XLA
backend — which must NOT happen before jax.distributed.initialize() in a
multi-host process (parallel.mesh.init_distributed).
"""

from pathtracerwithcuda_tpu.parallel.mesh import (  # noqa: F401
    RAY_AXIS,
    SAMPLE_AXIS,
    init_distributed,
    make_render_mesh,
)

_LAZY = ("distributed_render_pass", "distributed_trace")

__all__ = ["make_render_mesh", "init_distributed", "RAY_AXIS", "SAMPLE_AXIS",
           *_LAZY]


def __getattr__(name):
    if name in _LAZY:
        from pathtracerwithcuda_tpu.parallel import shard

        return getattr(shard, name)
    raise AttributeError(name)
