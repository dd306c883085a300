"""Microbench: per-iteration cost anatomy of the traversal while-loop.

Variants (all run exactly ITERS iterations of the same slab test):
  base      — slab test on a constant box, no load, no scalar sync
  load      — + one-hot dynamic-index node fetch from VMEM
  sync      — + one vector->scalar jnp.any used as a scalar multiplier
  load+sync — both
  cond      — load+sync + a lax.cond region that adds a constant
  fori      — load+sync but with fori_loop instead of while_loop
"""
import functools, time
import jax, jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
ITERS = 2000
TILES = 64


def _extract_column(tile, lane):
    rows = tile.shape[0]
    onehot = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 1) == lane
    return jnp.sum(jnp.where(onehot, tile, 0), axis=1, keepdims=True)


def mk_kernel(load, sync, use_cond, use_fori):
    def kernel(ray_ref, nbox_ref, out_ref):
        o = ray_ref[0, 0:3, :]
        inv_d = ray_ref[0, 3:6, :]
        acc0 = jnp.zeros((1, LANES), jnp.float32)

        def body_fn(pos, acc):
            if load:
                box = _extract_column(nbox_ref[pos // LANES],
                                      jax.lax.rem(pos, LANES))
            else:
                box = nbox_ref[0, :, 0:1] * 0.5
            t_lo = (box[0:3, :] - o) * inv_d
            t_hi = (box[3:6, :] - o) * inv_d
            near = jnp.max(jnp.minimum(t_lo, t_hi), axis=0, keepdims=True)
            far = jnp.min(jnp.maximum(t_lo, t_hi), axis=0, keepdims=True)
            hit = (near <= far) & (far > 0.0)
            inc = jnp.where(hit, 1.0, 0.0)
            if sync:
                any_hit = jnp.any(hit)
                inc = inc * jnp.where(any_hit, 1.0, 0.5)
            if use_cond:
                acc = jax.lax.cond(pos % 7 == 3, lambda a: a + inc,
                                   lambda a: a + inc * 0.5, acc)
            else:
                acc = acc + inc
            return acc

        if use_fori:
            acc = jax.lax.fori_loop(0, ITERS, lambda i, a: body_fn(i, a), acc0)
        else:
            def cond(c):
                return c[0] < ITERS

            def body(c):
                pos, acc = c
                return pos + 1, body_fn(pos, acc)

            _, acc = jax.lax.while_loop(cond, body, (jnp.int32(0), acc0))
        out_ref[0, :, :] = jnp.broadcast_to(acc, (8, LANES))
    return kernel


def bench(name, **kw):
    rng = np.random.default_rng(0)
    rays = jnp.asarray(rng.normal(size=(TILES, 8, LANES)).astype(np.float32))
    nbox = jnp.asarray(rng.normal(size=(32, 8, LANES)).astype(np.float32))
    kernel = mk_kernel(**kw)

    @jax.jit
    def run(rays, nbox):
        return pl.pallas_call(
            kernel,
            grid=(TILES,),
            in_specs=[
                pl.BlockSpec((1, 8, LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(nbox.shape, lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 8, LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((TILES, 8, LANES), jnp.float32),
        )(rays, nbox)
    out = run(rays, nbox); jax.block_until_ready(out)
    t0 = time.time(); out = run(rays, nbox); jax.block_until_ready(out)
    dt = time.time() - t0
    print(f"{name:12s} {dt*1e3:8.2f} ms  -> {dt/(TILES*ITERS)*1e9:7.1f} ns/iter")


def main():
    bench("base", load=False, sync=False, use_cond=False, use_fori=False)
    bench("load", load=True, sync=False, use_cond=False, use_fori=False)
    bench("sync", load=False, sync=True, use_cond=False, use_fori=False)
    bench("load+sync", load=True, sync=True, use_cond=False, use_fori=False)
    bench("cond", load=True, sync=True, use_cond=True, use_fori=False)
    bench("fori", load=True, sync=True, use_cond=False, use_fori=True)


if __name__ == "__main__":
    main()
