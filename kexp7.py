"""Sanity: do microbench iterations actually run? Count + scale test."""
import time
import jax, jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128

def _extract_column(tile, lane):
    rows = tile.shape[0]
    onehot = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 1) == lane
    return jnp.sum(jnp.where(onehot, tile, 0), axis=1, keepdims=True)

def mk(limit):
    def kernel(ray_ref, nbox_ref, out_ref):
        o = ray_ref[0, 0:3, :]
        inv_d = ray_ref[0, 3:6, :]
        acc0 = jnp.zeros((1, LANES), jnp.float32)
        def cond(c): return c[0] < limit
        def body(c):
            pos, acc, it = c
            box = _extract_column(nbox_ref[(pos // LANES) % 16],
                                  jax.lax.rem(pos, LANES))
            t_lo = (box[0:3, :] - o) * inv_d
            t_hi = (box[3:6, :] - o) * inv_d
            near = jnp.max(jnp.minimum(t_lo, t_hi), axis=0, keepdims=True)
            far = jnp.min(jnp.maximum(t_lo, t_hi), axis=0, keepdims=True)
            hit = (near <= far) & (far > 0.0)
            any_hit = jnp.any(hit)
            acc = acc + jnp.where(hit, 1.0, 0.0)
            return jnp.where(any_hit, pos + 1, pos + 2), acc, it + 1
        _, acc, it = jax.lax.while_loop(cond, body, (jnp.int32(0), acc0, jnp.int32(0)))
        out_ref[0, 0:7, :] = jnp.broadcast_to(acc, (7, LANES))
        out_ref[0, 7:8, :] = jnp.broadcast_to(it.astype(jnp.float32), (1, LANES))
    return kernel

def bench(limit, grid=256):
    rng = np.random.default_rng(0)
    rays = jnp.asarray(rng.normal(size=(grid, 8, LANES)).astype(np.float32))
    nbox = jnp.asarray((rng.normal(size=(16, 8, LANES)) * 2).astype(np.float32))
    kernel = mk(limit)
    @jax.jit
    def run(rays, nbox):
        return pl.pallas_call(
            kernel, grid=(grid,),
            in_specs=[
                pl.BlockSpec((1, 8, LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(nbox.shape, lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 8, LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((grid, 8, LANES), jnp.float32),
        )(rays, nbox)
    out = run(rays, nbox); jax.block_until_ready(out)
    best = 1e9
    for _ in range(3):
        t0 = time.time(); out = run(rays, nbox); jax.block_until_ready(out)
        best = min(best, time.time() - t0)
    iters = float(np.asarray(out)[:, 7, 0].sum())
    print(f"limit={limit:6d} grid={grid} total_iters={iters:10.0f}  {best*1e3:9.2f} ms"
          f" -> {best/iters*1e9:6.2f} ns/iter")

bench(4000)
bench(16000)
bench(64000)
