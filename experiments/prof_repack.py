"""Microbenchmark: per-bounce repack cost vs alternatives, on device.

Measures, at production wavefront sizes:
  a) the production _repack_jit (stable octant argsort + wide row gather)
  b) order-preserving nonzero compaction (round-1 policy)
  c) the argsort alone / the gather alone

Usage: python -u experiments/prof_repack.py
"""

import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from pathtracerwithcuda_tpu.render import wavefront as wf


def timeit(fn, *args, n=5):
    out = fn(*args)
    jax.block_until_ready(out)
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf)[:1]
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf)[:1]
    return (time.perf_counter() - t0) / n


def make_state(p, frac_active=0.8, seed=0):
    k = jax.random.PRNGKey(seed)
    ks = jax.random.split(k, 8)
    d = jax.random.normal(ks[0], (p, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    return wf.RayState(
        origin=jax.random.normal(ks[1], (p, 3)),
        direction=d,
        throughput=jnp.ones((p, 3)),
        radiance=jnp.zeros((p, 3)),
        active=jax.random.uniform(ks[2], (p,)) < frac_active,
        med_absorption=jnp.zeros((p, 3)),
        med_scattering=jnp.zeros((p, 3)),
    )


@jax.jit
def argsort_only(key):
    return jnp.argsort(key, stable=True)


@jax.jit
def wide_gather(packed, sel):
    return packed[sel]


def nonzero_repack(state, pixel_ids, live_ids, radiance_full, out_size):
    radiance_full = radiance_full.at[live_ids].add(state.radiance)
    act = state.active
    sel = jnp.nonzero(act, size=out_size, fill_value=0)[0].astype(jnp.int32)
    valid = jnp.arange(out_size) < jnp.sum(act)
    new_state = wf.RayState(
        origin=state.origin[sel], direction=state.direction[sel],
        throughput=state.throughput[sel],
        radiance=jnp.zeros((out_size, 3), jnp.float32),
        active=act[sel] & valid,
        med_absorption=state.med_absorption[sel],
        med_scattering=state.med_scattering[sel],
    )
    return new_state, pixel_ids[sel], live_ids[sel], radiance_full


nonzero_repack_jit = jax.jit(nonzero_repack, static_argnames=("out_size",))


def main():
    for p in (2097152, 524288, 131072):
        state = make_state(p)
        pixel_ids = jnp.arange(p, dtype=jnp.int32)
        live_ids = jnp.arange(p, dtype=jnp.int32)
        out_size = p  # same-size repack (the every-bounce case)

        rf = jnp.zeros((p, 3), jnp.float32)
        from pathtracerwithcuda_tpu.config import RenderConfig
        from pathtracerwithcuda_tpu.scene.build import HostScene, build_scene_data

        empty_scene = build_scene_data(HostScene.empty(), RenderConfig())
        # donated arg: rebuild each call via lambda capture copy
        t_prod = timeit(
            lambda: wf._repack_jit(state, pixel_ids, live_ids,
                                   jnp.zeros((p, 3), jnp.float32),
                                   empty_scene, out_size))
        t_nz = timeit(
            lambda: nonzero_repack_jit(state, pixel_ids, live_ids,
                                       jnp.zeros((p, 3), jnp.float32),
                                       out_size))
        d = state.direction
        octant = ((d[:, 0] < 0) * 4 + (d[:, 1] < 0) * 2 + (d[:, 2] < 0)).astype(jnp.int32)
        key = jnp.where(state.active, octant, 8)
        t_sort = timeit(argsort_only, key)
        packed = jnp.concatenate([state.origin, state.direction,
                                  state.throughput, state.med_absorption,
                                  state.med_scattering,
                                  state.active[:, None].astype(jnp.float32),
                                  pixel_ids[:, None].astype(jnp.float32),
                                  live_ids[:, None].astype(jnp.float32)], axis=1)
        sel = jnp.argsort(key, stable=True)[:out_size].astype(jnp.int32)
        jax.block_until_ready(sel)
        t_gather = timeit(wide_gather, packed, sel)
        print(f"p={p}: production repack {t_prod*1e3:8.1f} ms | "
              f"nonzero repack {t_nz*1e3:8.1f} ms | "
              f"argsort alone {t_sort*1e3:8.1f} ms | "
              f"(P,18) gather alone {t_gather*1e3:8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
