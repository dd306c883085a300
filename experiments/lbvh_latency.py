"""Interactive-rebuild latency: rotation edit on a bunny-class mesh.

Times the three rebuild paths the session can take after set_mesh_rotate
(reference rotate→rebuild: Core/triangle_mesh.cpp:335-426):
  1. device build_lbvh alone (jitted steady state) — the analog of the
     reference's MortonCodeCUDA builder (Bvh/bvh.cpp morton path);
  2. end-to-end set_mesh_rotate with config.bvh_build=LBVH;
  3. end-to-end set_mesh_rotate with the SAH builder (native C++ fast path).

Usage: python -u experiments/lbvh_latency.py [seg_u seg_v]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from pathtracerwithcuda_tpu.config import BvhBuildMethod
from pathtracerwithcuda_tpu.render.session import RenderSession
from pathtracerwithcuda_tpu.scene.examples import flagship_config, flagship_scene


def main(seg_u=192, seg_v=172):
    host = flagship_scene(seg_u=seg_u, seg_v=seg_v)
    n_tris = sum(m.vertices.shape[0] for m in host.meshes)
    print(f"total mesh triangles: {n_tris}", flush=True)

    # 1) device LBVH build alone
    from pathtracerwithcuda_tpu.bvh.build_lbvh import build_lbvh

    torus = host.meshes[2]
    v = torus.vertices  # (T, 3, 3) baked
    lo = jnp.asarray(v.min(axis=1))
    hi = jnp.asarray(v.max(axis=1))
    t = v.shape[0]
    res = build_lbvh(lo, hi, t)
    jax.block_until_ready(res)
    np.asarray(res["order"][0])
    t0 = time.perf_counter()
    reps = 10
    for _ in range(reps):
        res = build_lbvh(lo, hi, t)
    np.asarray(res["order"][0])
    dt_dev = (time.perf_counter() - t0) / reps * 1e3
    print(f"build_lbvh (device, {t} tris): {dt_dev:.1f} ms", flush=True)

    # 2) / 3) end-to-end rotation edits
    for method, label in ((BvhBuildMethod.LBVH, "LBVH"),
                          (BvhBuildMethod.SAH, "SAH/native")):
        config = flagship_config(width=256, height=144, bvh_build=method)
        sess = RenderSession(flagship_scene(seg_u=seg_u, seg_v=seg_v), config)
        sess.set_mesh_rotate(2, (0.0, 10.0, 0.0))  # warm (compiles)
        t0 = time.perf_counter()
        reps = 5
        for i in range(reps):
            sess.set_mesh_rotate(2, (0.0, 10.0 + 5.0 * (i + 1), 0.0))
        dt = (time.perf_counter() - t0) / reps * 1e3
        print(f"set_mesh_rotate end-to-end [{label}]: {dt:.1f} ms", flush=True)


if __name__ == "__main__":
    a = sys.argv[1:]
    main(int(a[0]) if a else 192, int(a[1]) if len(a) > 1 else 172)
