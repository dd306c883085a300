"""Validate: serialized data-dependent walk vs N interleaved chains."""
import time
import jax, jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
STEPS = 2000  # node visits per chain


def _extract_column(tile, lane):
    rows = tile.shape[0]
    onehot = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 1) == lane
    return jnp.sum(jnp.where(onehot, tile, 0), axis=1, keepdims=True)


def mk_kernel(chains):
    def kernel(ray_ref, nbox_ref, out_ref):
        os_ = [ray_ref[i, 0:3, :] for i in range(chains)]
        invs = [ray_ref[i, 3:6, :] for i in range(chains)]
        acc0 = jnp.zeros((8, LANES), jnp.float32)
        limit = STEPS * 2  # data-dependent pos advances by 1 or 2

        def cond(c):
            alive = c[0] < limit
            for i in range(1, chains):
                alive = alive | (c[i] < limit)
            return alive

        def body(c):
            poss = list(c[:chains])
            acc = c[chains]
            for i in range(chains):
                pos = poss[i]
                box = _extract_column(nbox_ref[(pos // LANES) % 16],
                                      jax.lax.rem(pos, LANES))
                t_lo = (box[0:3, :] - os_[i]) * invs[i]
                t_hi = (box[3:6, :] - os_[i]) * invs[i]
                near = jnp.max(jnp.minimum(t_lo, t_hi), axis=0, keepdims=True)
                far = jnp.min(jnp.maximum(t_lo, t_hi), axis=0, keepdims=True)
                hit = (near <= far) & (far > 0.0)
                any_hit = jnp.any(hit)
                row = jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 0) == (i % 8)
                inc = jnp.broadcast_to(jnp.where(hit, 1.0, 0.0), (8, LANES))
                acc = acc + jnp.where(row, inc, 0.0)
                # data-dependent next position == real serialization
                poss[i] = jnp.where(any_hit, pos + 1, pos + 2)
            return tuple(poss) + (acc,)

        init = tuple(jnp.int32(0) for _ in range(chains)) + (acc0,)
        out = jax.lax.while_loop(cond, body, init)
        out_ref[0, :, :] = out[chains]
    return kernel


def bench(chains, tiles_total=64):
    grid = tiles_total // chains
    rng = np.random.default_rng(0)
    rays = jnp.asarray(rng.normal(size=(grid * chains, 8, LANES)).astype(np.float32))
    nbox = jnp.asarray(rng.normal(size=(16, 8, LANES)).astype(np.float32))
    kernel = mk_kernel(chains)

    @jax.jit
    def run(rays, nbox):
        return pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((chains, 8, LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(nbox.shape, lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 8, LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((grid, 8, LANES), jnp.float32),
        )(rays, nbox)
    out = run(rays, nbox); jax.block_until_ready(out)
    t0 = time.time(); out = run(rays, nbox); jax.block_until_ready(out)
    dt = time.time() - t0
    visits = tiles_total * STEPS  # approx: each chain does >= STEPS visits
    print(f"chains={chains:2d}  {dt*1e3:8.2f} ms  -> {dt/visits*1e9:7.1f} ns/visit/packet")


def main():
    for c in [1, 2, 4, 8, 16]:
        bench(c)


if __name__ == "__main__":
    main()
