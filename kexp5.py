"""Is the whole-table BlockSpec re-copied per grid step?"""
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

def mk(steps):
    def kernel(ray_ref, nbox_ref, tri_ref, out_ref):
        o = ray_ref[0, 0:3, :]
        inv_d = ray_ref[0, 3:6, :]
        acc0 = jnp.zeros((1, LANES), jnp.float32)
        def cond(c): return c[0] < steps
        def body(c):
            pos, acc = c
            box = _extract_column(nbox_ref[pos // LANES], jax.lax.rem(pos, LANES))
            t_lo = (box[0:3, :] - o) * inv_d
            t_hi = (box[3:6, :] - o) * inv_d
            near = jnp.max(jnp.minimum(t_lo, t_hi), axis=0, keepdims=True)
            far = jnp.min(jnp.maximum(t_lo, t_hi), axis=0, keepdims=True)
            hit = (near <= far) & (far > 0.0)
            any_hit = jnp.any(hit)
            acc = acc + jnp.where(hit, 1.0, 0.0)
            return jnp.where(any_hit, pos + 1, pos + 2), acc
        _, acc = jax.lax.while_loop(cond, body, (jnp.int32(0), acc0))
        out_ref[0, :, :] = jnp.broadcast_to(acc, (8, LANES))
    return kernel

def bench(grid, steps, ntiles, ttiles):
    rng = np.random.default_rng(0)
    rays = jnp.asarray(rng.normal(size=(grid, 8, LANES)).astype(np.float32))
    nbox = jnp.asarray(rng.normal(size=(ntiles, 8, LANES)).astype(np.float32))
    tris = jnp.asarray(rng.normal(size=(ttiles, 16, LANES)).astype(np.float32))
    kernel = mk(steps)
    @jax.jit
    def run(rays, nbox, tris):
        return pl.pallas_call(
            kernel, grid=(grid,),
            in_specs=[
                pl.BlockSpec((1, 8, LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(nbox.shape, lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(tris.shape, lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 8, LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((grid, 8, LANES), jnp.float32),
        )(rays, nbox, tris)
    out = run(rays, nbox, tris); jax.block_until_ready(out)
    t0 = time.time(); out = run(rays, nbox, tris); jax.block_until_ready(out)
    dt = time.time() - t0
    print(f"grid={grid:6d} steps={steps:5d} tables={(ntiles*8+ttiles*16)*LANES*4/2**20:5.1f}MiB"
          f"  {dt*1e3:9.2f} ms -> {dt/grid*1e6:8.2f} us/gridstep")

bench(64, 2000, 16, 16)
bench(2048, 37, 16, 16)
bench(2048, 37, 175, 517)
bench(16200, 37, 175, 517)
