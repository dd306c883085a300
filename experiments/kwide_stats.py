"""Wide-kernel walk statistics: per-row pop counts and stale-pop fraction.

Runs the wide kernel in walk_only mode, which (since round 5) returns
per-row diagnostics instead of hits: out_tri = total stack pops per row,
out_t = pops whose 8-child hit mask was empty (stale).  These quantify the
two structural costs of row-packet traversal — the union-of-node-sets
factor (pops per 128-ray row vs per-ray needs) and ordered-descent
staleness — and the chain tail imbalance (max/mean pops per 8-row chain).

  python -u -c "import sys; sys.argv=['x','<primary|bounce>']; exec(open('experiments/kwide_stats.py').read())"
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

from pathtracerwithcuda_tpu.ops import rng as rng_mod
from pathtracerwithcuda_tpu.ops.raygen import generate_rays
from pathtracerwithcuda_tpu.ops import traversal_pallas as tp
from pathtracerwithcuda_tpu.render import wavefront as wf
from pathtracerwithcuda_tpu.scene.build import build_scene_data
from pathtracerwithcuda_tpu.scene.examples import (
    flagship_camera,
    flagship_config,
    flagship_scene,
)


def main(which="primary"):
    from pathtracerwithcuda_tpu.ops import traversal_wide as twd

    config = flagship_config(width=1920, height=1080, max_tracer_depth=8,
                             spp_per_pass=1, loop_mode="host")
    scene = build_scene_data(flagship_scene(), config)
    camera = flagship_camera(1920, 1080)
    order, _ = wf.render_order(config.width, config.height)
    pixel_ids = jnp.asarray(order)
    key = rng_mod.pass_key(jax.random.PRNGKey(0), 0)
    ray_u = rng_mod.raygen_uniforms(key, pixel_ids)
    o, d = generate_rays(camera, pixel_ids, ray_u, config.use_anti_alias)

    if which == "bounce":
        rng = np.random.default_rng(0)
        on = np.asarray(o)
        dn = np.asarray(d)
        t = rng.uniform(4.0, 14.0, (on.shape[0], 1)).astype(np.float32)
        o2 = on + dn * t
        d2 = rng.normal(size=dn.shape).astype(np.float32)
        d2 /= np.linalg.norm(d2, axis=-1, keepdims=True)
        g = 4
        lo = o2.min(axis=0)
        hi = o2.max(axis=0)
        c = np.clip(((o2 - lo) / np.maximum(hi - lo, 1e-9) * g).astype(np.int32),
                    0, g - 1)
        cell = (c[:, 0] * g + c[:, 1]) * g + c[:, 2]
        octant = ((d2[:, 0] < 0) * 4 + (d2[:, 1] < 0) * 2 + (d2[:, 2] < 0)).astype(np.int32)
        perm = np.argsort(cell * 8 + octant, kind="stable")
        o, d = jnp.asarray(o2[perm]), jnp.asarray(d2[perm])

    p = o.shape[0]
    chunk = tp.CHUNK_PACKETS * tp.PACKET
    p_pad = (p + chunk - 1) // chunk * chunk
    o = jnp.pad(o, ((0, p_pad - p), (0, 0)), constant_values=tp.FAR_ORIGIN)
    d = jnp.pad(d, ((0, p_pad - p), (0, 0)), constant_values=1.0)
    seed = jnp.full((p_pad,), jnp.inf).at[p:].set(0.0)

    wide = twd.wide_structure(scene.bvh_next, scene.bvh_tri_start,
                              scene.bvh_tri_count)
    tables = twd.pack_wide_tables(
        jnp.asarray(wide.src), jnp.asarray(wide.meta),
        scene.bvh_min, scene.bvh_max,
        scene.tri_v0, scene.tri_v1, scene.tri_v2, scene.leaf_size)

    dd = jnp.where(d == 0.0, 1e-20, d)
    inv_d = 1.0 / dd
    nc = p_pad // chunk

    def shatter(x):
        return x.reshape(nc, tp.CHUNK_PACKETS, tp.ROWS, tp.LANES)

    fields = [shatter(o[:, 0]), shatter(o[:, 1]), shatter(o[:, 2]),
              shatter(inv_d[:, 0]), shatter(inv_d[:, 1]), shatter(inv_d[:, 2]),
              shatter(seed),
              shatter(dd[:, 0]), shatter(dd[:, 1]), shatter(dd[:, 2])]

    pops_all, stale_all = [], []
    for c in range(nc):
        st, tri = twd._run([f[c] for f in fields], *tables,
                           num_wide=wide.num_wide,
                           pad_tri=scene.num_triangles,
                           leaf_k=scene.leaf_size, chains=twd.WIDE_CHAINS,
                           walk_only=True)
        pops_all.append(np.asarray(tri)[:, :, 0])    # (packets, rows)
        stale_all.append(np.asarray(st)[:, :, 0])
    pops = np.concatenate(pops_all, axis=0).astype(np.int64)   # (packets, rows)
    stales = np.concatenate(stale_all, axis=0).astype(np.int64)

    live_rows = pops.shape[0] * pops.shape[1]
    print(f"{which}: wide_nodes={wide.num_wide} rows={live_rows} "
          f"(incl. padding rows)")
    print(f"pops/row: mean {pops.mean():.1f}  p50 {np.percentile(pops, 50):.0f}"
          f"  p90 {np.percentile(pops, 90):.0f}  max {pops.max()}")
    print(f"stale fraction: {stales.sum() / max(pops.sum(), 1):.3f}")
    # chain imbalance: kernels process 8 packets (=rows grouped per chain
    # position) in lockstep per while iteration; iterations = max over the
    # 8 rows of one chain slot.  Rows of chain i are packet block rows.
    cpp = twd.WIDE_CHAINS
    blocks = pops.reshape(-1, cpp, tp.ROWS)  # (instances, chains, rows)
    per_row_iters = blocks  # each row walks its own pops
    eff = per_row_iters.mean() / np.maximum(
        per_row_iters.max(axis=2), 1).mean()
    print(f"row-lockstep efficiency (mean/meanmax within 8-row groups): {eff:.3f}")


main(sys.argv[1] if len(sys.argv) > 1 else "primary")
