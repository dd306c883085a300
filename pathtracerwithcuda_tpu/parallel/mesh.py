"""Device mesh construction.

The reference is single-GPU (SURVEY.md §2 parallelism checklist: data
parallelism only, one CUDA thread per pixel).  The TPU-native scaling model
(BASELINE.json north star):

  * rays/pixels sharded over chips — the `rays` mesh axis (pure data
    parallelism over ICI; no per-bounce communication because each chip owns
    its pixels end-to-end);
  * optionally samples-per-pixel sharded over a second `spp` axis — each chip
    traces the same pixels with different sample ids and the accumulation is
    psum-reduced;
  * scene/BVH/materials replicated (they fit HBM for every reference-class
    scene; primitive-range sharding is the documented escape hatch for
    beyond-HBM scenes);
  * for inverse rendering, material-parameter gradients are psum all-reduced.

Multi-host: call `jax.distributed.initialize()` before building the mesh and
the same code runs over DCN+ICI.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh

from pathtracerwithcuda_tpu.axes import RAY_AXIS, SAMPLE_AXIS  # noqa: F401 (re-export)


def init_distributed(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> int:
    """Multi-host entry point: jax.distributed.initialize + device report.

    On TPU pods the three arguments are auto-detected from the environment
    (pass nothing); for CPU-based smoke tests pass them explicitly
    (tests/test_multihost.py runs a 2-process coordinator handshake).
    Call once per process BEFORE any other JAX API, then build the mesh with
    make_render_mesh() over jax.devices() — the same shard_map programs run
    over ICI within a host and DCN across hosts.  Returns the global device
    count.  CLI: `apps/render_cli.py --distributed`, `bench.py` via
    PT_DISTRIBUTED=1.
    """
    kwargs = {}
    if coordinator is not None:
        kwargs["coordinator_address"] = coordinator
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)
    print(f"[Info] distributed: process {jax.process_index()}/"
          f"{jax.process_count()}, {jax.local_device_count()} local / "
          f"{jax.device_count()} global devices")
    return jax.device_count()


def make_render_mesh(num_devices: Optional[int] = None,
                     sample_parallel: int = 1) -> Mesh:
    """1D mesh over rays, or 2D (rays, spp) when sample_parallel > 1."""
    devices = jax.devices()
    n = num_devices or len(devices)
    devices = np.asarray(devices[:n])
    if sample_parallel > 1:
        if n % sample_parallel:
            raise ValueError(f"{n} devices not divisible by spp={sample_parallel}")
        grid = devices.reshape(n // sample_parallel, sample_parallel)
        return Mesh(grid, (RAY_AXIS, SAMPLE_AXIS))
    return Mesh(devices.reshape(n), (RAY_AXIS,))
