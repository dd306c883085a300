"""Kernel walk/drain split on flagship-scale loads.

One variant per process (pallas shape/program poison on the axon tunnel):

  python -u -c "import sys; sys.argv=['x','<rays>','<mode>']; exec(open('experiments/kprof.py').read())"

rays: primary | bounce     mode: full | walk_only | wide
(bounce = primary hit points + random directions, octant-sorted like the
production repack — a realistic depth-1 incoherent load; mode=wide runs the
8-wide kernel of ops/traversal_wide.py instead of the binary row-packet one)
"""

import sys
import time

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


def main(which="primary", mode="full", leaf=None, chains=None, dirbins=0):
    import os

    if os.environ.get("PT_SEG_CAP"):
        tp.SEG_CAP = int(os.environ["PT_SEG_CAP"])
    config = flagship_config(width=1920, height=1080, max_tracer_depth=8,
                             spp_per_pass=1, loop_mode="host")
    if leaf:
        config = config.replace(bvh_leaf_node_triangle_num=int(leaf))
    if os.environ.get("PT_BVH_BUCKETS"):
        config = config.replace(
            bvh_bucket_max_divide_internal_num=int(os.environ["PT_BVH_BUCKETS"]))
    chains = int(chains) if chains else tp.CHAINS
    dirbins = int(dirbins)
    scene = build_scene_data(flagship_scene(), config)
    camera = flagship_camera(1920, 1080)
    order, _ = wf.render_order(config.width, config.height)
    pixel_ids = jnp.asarray(order)
    key = rng_mod.pass_key(jax.random.PRNGKey(0), 0)
    ray_u = rng_mod.raygen_uniforms(key, pixel_ids)
    o, d = generate_rays(camera, pixel_ids, ray_u, config.use_anti_alias)

    if which == "bounce":
        # offline: primary hits via the XLA walk on CPU arrays is too slow;
        # approximate hit points with a fixed march to the floor/torus region,
        # then random dirs — matches bounce-ray statistics closely enough
        rng = np.random.default_rng(0)
        on = np.asarray(o)
        dn = np.asarray(d)
        t = rng.uniform(4.0, 14.0, (on.shape[0], 1)).astype(np.float32)
        o2 = on + dn * t
        d2 = rng.normal(size=dn.shape).astype(np.float32)
        d2 /= np.linalg.norm(d2, axis=-1, keepdims=True)
        octant = ((d2[:, 0] < 0) * 4 + (d2[:, 1] < 0) * 2 + (d2[:, 2] < 0)).astype(np.int32)
        key_np = octant
        if dirbins > 0:
            # finer direction key: octant + quantized |direction| sub-bins
            ax = np.clip((np.abs(d2) * dirbins).astype(np.int32), 0, dirbins - 1)
            key_np = ((octant * dirbins + ax[:, 0]) * dirbins + ax[:, 1])
        elif dirbins < 0:
            # origin-cell key: quantize origins to a (-dirbins)^3 grid, then
            # octant within the cell — spatial-first coherence
            g = -dirbins
            lo = o2.min(axis=0)
            hi = o2.max(axis=0)
            c = np.clip(((o2 - lo) / np.maximum(hi - lo, 1e-9) * g).astype(np.int32),
                        0, g - 1)
            cell = (c[:, 0] * g + c[:, 1]) * g + c[:, 2]
            key_np = cell * 8 + octant
        perm = np.argsort(key_np, kind="stable")
        o, d = jnp.asarray(o2[perm]), jnp.asarray(d2[perm])

    p = o.shape[0]
    chunk = tp.CHUNK_PACKETS * tp.PACKET
    p_pad = (p + chunk - 1) // chunk * chunk
    o = jnp.pad(o, ((0, p_pad - p), (0, 0)), constant_values=tp.FAR_ORIGIN)
    d = jnp.pad(d, ((0, p_pad - p), (0, 0)), constant_values=1.0)
    seed = jnp.full((p_pad,), jnp.inf)
    seed = seed.at[p:].set(0.0)  # padded lanes are dead

    nbox, meta, tris = tp.pack_scene_tables(
        scene.bvh_min, scene.bvh_max, scene.bvh_next, scene.bvh_tri_start,
        scene.bvh_tri_count, scene.tri_v0, scene.tri_v1, scene.tri_v2,
        scene.leaf_size)
    dead = seed <= 0.0
    o = jnp.where(dead[:, None], tp.FAR_ORIGIN, o)
    dd = jnp.where(d == 0.0, 1e-20, d)
    inv_d = 1.0 / dd
    nc = p_pad // chunk

    def shatter(x):
        return x.reshape(nc, tp.CHUNK_PACKETS, tp.ROWS, tp.LANES)

    fields = [shatter(o[:, 0]), shatter(o[:, 1]), shatter(o[:, 2]),
              shatter(inv_d[:, 0]), shatter(inv_d[:, 1]), shatter(inv_d[:, 2]),
              shatter(seed),
              shatter(dd[:, 0]), shatter(dd[:, 1]), shatter(dd[:, 2])]

    wo = mode == "walk_only"

    if mode.startswith("wide"):
        from pathtracerwithcuda_tpu.ops import traversal_wide as twd

        if os.environ.get("PT_WIDE_SEG_CAP"):
            twd.SEG_CAP = int(os.environ["PT_WIDE_SEG_CAP"])
        wide = twd.wide_structure(scene.bvh_next, scene.bvh_tri_start,
                                  scene.bvh_tri_count)
        wtables = twd.pack_wide_tables(
            jnp.asarray(wide.src), jnp.asarray(wide.meta),
            scene.bvh_min, scene.bvh_max,
            scene.tri_v0, scene.tri_v1, scene.tri_v2, scene.leaf_size)
        print(f"wide nodes {wide.num_wide} stack {wide.max_stack}", flush=True)

        def run_all():
            outs = [twd._run([f[c] for f in fields], *wtables,
                             num_wide=wide.num_wide,
                             pad_tri=scene.num_triangles,
                             leaf_k=scene.leaf_size, chains=chains,
                             walk_only=mode == "wide_walk")
                    for c in range(nc)]
            return outs[-1][0]
    else:
        def run_all():
            outs = [tp._run([f[c] for f in fields], nbox, meta, tris,
                            num_nodes=scene.num_bvh_nodes,
                            pad_tri=scene.num_triangles,
                            leaf_k=scene.leaf_size, chains=chains,
                            walk_only=wo)
                    for c in range(nc)]
            return outs[-1][0]

    x = run_all()
    jax.block_until_ready(x)
    np.asarray(x[0, 0, 0])
    t0 = time.perf_counter()
    n = 3
    for _ in range(n):
        x = run_all()
    np.asarray(x[0, 0, 0])
    dt = (time.perf_counter() - t0) / n
    print(f"{which}/{mode} leaf={scene.leaf_size} chains={chains} "
          f"dirbins={dirbins} segcap={tp.SEG_CAP}: {dt*1e3:.1f} ms for {p} "
          f"rays -> {p/dt/1e6:.1f} Mray/s", flush=True)


if __name__ == "__main__":
    a = sys.argv[1:] + [None] * 5
    main(a[0] or "primary", a[1] or "full", a[2], a[3], a[4] or 0)
