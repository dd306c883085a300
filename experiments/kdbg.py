"""Direct _run driver: one chunk, small tree, compare vs numpy brute force."""

import numpy as np
import jax
import jax.numpy as jnp

from pathtracerwithcuda_tpu.bvh.build_sah import build_sah_bvh
from pathtracerwithcuda_tpu.bvh.flatten import leaf_runs, permute_leaf_contiguous
from pathtracerwithcuda_tpu.ops import traversal_pallas as tp


def brute(o, d, tri, bound):
    v0, v1, v2 = tri[:, 0], tri[:, 1], tri[:, 2]
    e1 = v1 - v0
    e2 = v2 - v0
    best_t = bound.copy()
    best = -np.ones(o.shape[0], np.int32)
    for i in range(tri.shape[0]):
        p = np.cross(d, e2[i])
        det = (e1[i] * p).sum(-1)
        ok = det != 0
        inv = 1.0 / np.where(ok, det, 1.0)
        tv = o - v0[i]
        q = np.cross(tv, e1[i])
        b1 = (tv * p).sum(-1) * inv
        b2 = (d * q).sum(-1) * inv
        t = (e2[i] * q).sum(-1) * inv
        hit = ok & (b1 >= 0) & (b2 >= 0) & (b1 + b2 <= 1) & (t > 0) & (t < best_t)
        best_t = np.where(hit, t, best_t)
        best = np.where(hit, i, best)
    return best, np.where(best >= 0, best_t, np.inf)


def main(n_tris=500, leaf=8, seed=7, chains=tp.CHAINS):
    rng = np.random.default_rng(seed)
    base = rng.uniform(-5, 5, (n_tris, 1, 3))
    tri = (base + rng.normal(size=(n_tris, 3, 3)) * 0.4).astype(np.float32)
    bvh = build_sah_bvh(tri[:, 0], tri[:, 1], tri[:, 2], leaf_size=leaf)
    bvh, perm = permute_leaf_contiguous(bvh)
    tri = tri[perm]
    start, count = leaf_runs(bvh.tri_slots)
    n_rays = chains * tp.PACKET
    o = rng.uniform(-8, 8, (n_rays, 3)).astype(np.float32)
    d = rng.normal(size=(n_rays, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)

    nbox, meta, tris_t = tp.pack_scene_tables(
        jnp.asarray(bvh.node_min), jnp.asarray(bvh.node_max),
        jnp.asarray(bvh.next_index), jnp.asarray(start), jnp.asarray(count),
        jnp.asarray(tri[:, 0]), jnp.asarray(tri[:, 1]), jnp.asarray(tri[:, 2]),
        leaf,
    )
    seed_b = np.full((n_rays,), np.inf, np.float32)
    inv_d = 1.0 / d
    rays = np.concatenate([o, inv_d, seed_b[:, None]], axis=1)
    rays = rays.reshape(chains, tp.ROWS, tp.LANES, 7).transpose(0, 3, 1, 2)
    dirs = d.reshape(chains, tp.ROWS, tp.LANES, 3).transpose(0, 3, 1, 2)

    import time

    t0 = time.perf_counter()
    out_t, out_tri = tp._run(
        jnp.asarray(rays), jnp.asarray(dirs), nbox, meta, tris_t,
        num_nodes=bvh.num_nodes, pad_tri=n_tris, leaf_k=leaf, chains=chains,
    )
    jax.block_until_ready(out_t)
    print(f"compile+run1: {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    out_t, out_tri = tp._run(
        jnp.asarray(rays), jnp.asarray(dirs), nbox, meta, tris_t,
        num_nodes=bvh.num_nodes, pad_tri=n_tris, leaf_k=leaf, chains=chains,
    )
    jax.block_until_ready(out_t)
    print(f"run2: {time.perf_counter()-t0:.3f}s", flush=True)
    got_tri = np.asarray(out_tri).reshape(n_rays)
    got_t = np.asarray(out_t).reshape(n_rays)
    got_t = np.where(got_tri >= 0, got_t, np.inf)

    exp_tri, exp_t = brute(o.astype(np.float64), d.astype(np.float64),
                           tri.astype(np.float64), seed_b.astype(np.float64))
    fin_g, fin_e = np.isfinite(got_t), np.isfinite(exp_t)
    both = fin_g & fin_e
    print(f"nodes={bvh.num_nodes} rays={n_rays}")
    print("hit-set match:", (fin_g == fin_e).all(),
          "| got", fin_g.sum(), "exp", fin_e.sum())
    miss_extra = fin_g & ~fin_e
    miss_lost = ~fin_g & fin_e
    print("extra hits:", miss_extra.sum(), "lost hits:", miss_lost.sum())
    if miss_lost.sum():
        idx = np.where(miss_lost)[0][:8]
        print("lost ray idx (row, lane):",
              [(int(i) // 128 % 8, int(i) % 128) for i in idx])
    if both.sum():
        err = np.abs(got_t[both] - exp_t[both])
        print("t err max:", err.max())
        bad_tri = (got_tri[both] != exp_tri[both]) & (err > 1e-3)
        print("wrong-tri (t differs):", bad_tri.sum())


if __name__ == "__main__":
    main()
