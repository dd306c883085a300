"""Multi-host smoke: jax.distributed over two CPU processes (DCN code path).

The reference is strictly single-process/single-GPU; the TPU build's
multi-host story is jax.distributed.initialize + the same shard_map
programs over a global mesh (SURVEY.md §5 distributed-comm checklist).
This test launches TWO real processes with a coordinator handshake and has
each build the global render mesh and run a psum over it — the minimal
proof that parallel.mesh.init_distributed and mesh construction work
across process boundaries.
"""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
from pathtracerwithcuda_tpu.parallel.mesh import init_distributed, make_render_mesh, RAY_AXIS
n = init_distributed(coordinator=sys.argv[1], num_processes=2,
                     process_id=int(sys.argv[2]))
assert n == 4, n  # 2 processes x 2 virtual CPU devices
mesh = make_render_mesh()
assert mesh.shape[RAY_AXIS] == 4
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
x = jax.make_array_from_callback(
    (4,), NamedSharding(mesh, P(RAY_AXIS)),
    lambda idx: jnp.asarray([float(jax.process_index()) + 1.0]))
total = jax.jit(lambda a: jnp.sum(a))(x)
# processes 0 and 1 each own two shards: 1+1+2+2
assert float(total) == 6.0, float(total)
print(f"proc {jax.process_index()} OK total={float(total)}")
"""


def test_two_process_mesh_and_psum(tmp_path):
    port = socket.socket()
    port.bind(("127.0.0.1", 0))
    addr = f"127.0.0.1:{port.getsockname()[1]}"
    port.close()

    env = dict(os.environ)
    # keep the axon sitecustomize from registering/initializing a backend
    # before the worker's jax.distributed.initialize (it must be first)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = root + os.pathsep + env.get("PYTHONPATH", "")
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    procs = [
        subprocess.Popen([sys.executable, str(script), addr, str(i)],
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         text=True, env=env,
                         cwd=os.path.dirname(os.path.dirname(__file__)))
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=180)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append((p.returncode, out))
    for rc, out in outs:
        assert rc == 0, out[-2000:]
    assert any("OK total=6.0" in out for _, out in outs)
