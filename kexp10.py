"""Can Mosaic do one-hot MXU 'gather-transpose' inside the walk loop?
M(8,16) = S(8,128) @ tile(16,128)^T  where S = onehot(lane - sublane == base)."""
import time
import jax, jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
LIMIT = 16000

def mk(use_mxu):
    def kernel(ray_ref, tri_ref, out_ref):
        o = [ray_ref[0, f] for f in range(3)]      # (1,128) each? -> use rows
        ox, oy, oz = ray_ref[0, 0:1, :], ray_ref[0, 1:2, :], ray_ref[0, 2:3, :]
        dx, dy, dz = ray_ref[0, 3:4, :], ray_ref[0, 4:5, :], ray_ref[0, 5:6, :]
        bt0 = jnp.full((1, LANES), 1e30, jnp.float32)
        btr0 = jnp.full((1, LANES), -1, jnp.int32)
        sub_iota = jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 0)
        lane_iota = jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 1)

        def cond(c): return c[0] < LIMIT

        def body(c):
            pos, best_t, best_tri = c
            base = jax.lax.rem(pos, 128 - 8)
            tile = tri_ref[(pos // LANES) % 16]      # (16, 128)
            if use_mxu:
                S = (lane_iota - sub_iota == base).astype(jnp.float32)  # (8,128)
                M = jax.lax.dot_general(
                    S, tile, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)  # (8 tris, 16 fields)
                cols = [M[:, f:f+1] for f in range(9)]   # (8,1) per field
            else:
                # 8 separate one-hot extractions (the slow way)
                cols9 = []
                for k in range(8):
                    onehot = lane_iota[0:1] * 0  # placeholder avoid
                cols = None
            v0x, v0y, v0z, v1x, v1y, v1z, v2x, v2y, v2z = cols
            e1x, e1y, e1z = v1x - v0x, v1y - v0y, v1z - v0z
            e2x, e2y, e2z = v2x - v0x, v2y - v0y, v2z - v0z
            px = dy * e2z - dz * e2y                 # (8,128): 8 tris x 128 rays
            py = dz * e2x - dx * e2z
            pz = dx * e2y - dy * e2x
            det = e1x * px + e1y * py + e1z * pz
            det_ok = det != 0.0
            inv_det = 1.0 / jnp.where(det_ok, det, 1.0)
            tx = ox - v0x
            ty = oy - v0y
            tz = oz - v0z
            qx = ty * e1z - tz * e1y
            qy = tz * e1x - tx * e1z
            qz = tx * e1y - ty * e1x
            b1 = (tx * px + ty * py + tz * pz) * inv_det
            b2 = (dx * qx + dy * qy + dz * qz) * inv_det
            t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
            ok = (det_ok & (b1 >= 0) & (b2 >= 0) & (b1 + b2 <= 1.0)
                  & (t > 0.0) & (t < best_t))
            tmask = jnp.where(ok, t, 1e30)           # (8,128)
            tmin = jnp.min(tmask, axis=0, keepdims=True)   # (1,128) sublane-reduce
            kbest = jnp.argmin(tmask, axis=0).reshape(1, LANES).astype(jnp.int32)
            upd = tmin < best_t
            best_t = jnp.where(upd, tmin, best_t)
            best_tri = jnp.where(upd, base + kbest, best_tri)
            return pos + 1, best_t, best_tri

        _, bt, btr = jax.lax.while_loop(cond, body, (jnp.int32(0), bt0, btr0))
        out_ref[0, 0:1, :] = bt
        out_ref[0, 1:2, :] = btr.astype(jnp.float32)
        out_ref[0, 2:8, :] = jnp.zeros((6, LANES), jnp.float32)
    return kernel

def bench(grid=64):
    rng = np.random.default_rng(0)
    rays_sets = [jnp.asarray(rng.normal(size=(grid, 8, LANES)).astype(np.float32))
                 for _ in range(3)]
    tris = jnp.asarray(rng.normal(size=(16, 16, LANES)).astype(np.float32))
    kernel = mk(True)
    @jax.jit
    def run(rays, tris):
        return pl.pallas_call(
            kernel, grid=(grid,),
            in_specs=[
                pl.BlockSpec((1, 8, LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(tris.shape, lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 8, LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((grid, 8, LANES), jnp.float32),
        )(rays, tris)
    out = run(rays_sets[0], tris); _ = np.asarray(out[0, 0, 0])
    t0 = time.time()
    for r in rays_sets[1:]:
        out = run(r, tris)
    _ = np.asarray(out[0, 0, 0])
    dt = (time.time() - t0) / 2
    iters = grid * LIMIT
    print(f"mxu-transpose MT8: {dt*1e3:8.2f} ms -> {dt/iters*1e9:6.1f} ns/iter "
          f"({dt/iters/8*1e9:5.2f} ns per tri-vs-128rays)")

bench()
