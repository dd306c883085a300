"""Feature bisection: which real-kernel ingredient costs 300ns/iter?"""
import time
import jax, jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
LIMIT = 4000  # pos advances 1 or 2 -> 2000-4000 iters

def _extract_column(tile, lane):
    rows = tile.shape[0]
    onehot = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 1) == lane
    return jnp.sum(jnp.where(onehot, tile, 0), axis=1, keepdims=True)

def mk(meta_next, carried_bt, leaf_cond):
    def kernel(meta_ref, ray_ref, nbox_ref, out_ref):
        o = ray_ref[0, 0:3, :]
        inv_d = ray_ref[0, 3:6, :]
        bt0 = jnp.full((1, LANES), 1e30, jnp.float32)
        acc0 = jnp.zeros((1, LANES), jnp.float32)
        def cond(c): return c[0] < LIMIT
        def body(c):
            pos, best_t, acc = c
            box = _extract_column(nbox_ref[(pos // LANES) % 16],
                                  jax.lax.rem(pos, LANES))
            t_lo = (box[0:3, :] - o) * inv_d
            t_hi = (box[3:6, :] - o) * inv_d
            near = jnp.max(jnp.minimum(t_lo, t_hi), axis=0, keepdims=True)
            far = jnp.min(jnp.maximum(t_lo, t_hi), axis=0, keepdims=True)
            if carried_bt:
                hit = (near <= far) & (far > 0.0) & (near <= best_t)
                best_t = jnp.where(hit & (near > 0.5), near * 1.0001, best_t)
            else:
                hit = (near <= far) & (far > 0.0)
            any_hit = jnp.any(hit)
            if leaf_cond:
                acc, best_t = jax.lax.cond(
                    any_hit & (pos % 5 == 0),
                    lambda a: (a[0] + jnp.where(hit, 1.0, 0.0), a[1]),
                    lambda a: a, (acc, best_t))
            else:
                acc = acc + jnp.where(hit, 1.0, 0.0)
            if meta_next:
                nxt = meta_ref[3 * pos]
                pos = jnp.where(any_hit, pos + 1, nxt)
            else:
                pos = jnp.where(any_hit, pos + 1, pos + 2)
            return pos, best_t, acc
        _, _, acc = jax.lax.while_loop(cond, body, (jnp.int32(0), bt0, acc0))
        out_ref[0, :, :] = jnp.broadcast_to(acc, (8, LANES))
    return kernel

def bench(name, grid=256, **kw):
    rng = np.random.default_rng(0)
    rays = jnp.asarray(rng.normal(size=(grid, 8, LANES)).astype(np.float32))
    nbox = jnp.asarray((rng.normal(size=(16, 8, LANES)) * 2).astype(np.float32))
    meta = np.zeros((3 * (LIMIT + 2),), np.int32)
    meta[0::3] = np.arange(LIMIT + 2) + 2  # next = pos+2, same as arithmetic
    meta = jnp.asarray(meta)
    kernel = mk(**kw)
    @jax.jit
    def run(meta, rays, nbox):
        return pl.pallas_call(
            kernel, grid=(grid,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 8, LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(nbox.shape, lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 8, LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((grid, 8, LANES), jnp.float32),
        )(meta, rays, nbox)
    out = run(meta, rays, nbox); jax.block_until_ready(out)
    t0 = time.time(); out = run(meta, rays, nbox); jax.block_until_ready(out)
    dt = time.time() - t0
    iters = grid * LIMIT / 1.5  # rough
    print(f"{name:28s} {dt*1e3:9.2f} ms -> ~{dt/iters*1e9:6.1f} ns/iter")

bench("arith-next, no bt, no cond", meta_next=False, carried_bt=False, leaf_cond=False)
bench("META-next, no bt, no cond", meta_next=True, carried_bt=False, leaf_cond=False)
bench("arith-next, BT, no cond", meta_next=False, carried_bt=True, leaf_cond=False)
bench("arith-next, no bt, COND", meta_next=False, carried_bt=False, leaf_cond=True)
bench("META+BT+COND (≈real)", meta_next=True, carried_bt=True, leaf_cond=True)
