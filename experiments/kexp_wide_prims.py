"""Tiny-kernel probe: which 8-lane dynamic extraction primitives does
Mosaic accept (for the wide-BVH kernel)?  Each variant is its own tiny
pallas_call so one failure doesn't mask the others.

Run:  python -u experiments/kexp_wide_prims.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def run(name, kernel, *args, out_shape):
    try:
        out = pl.pallas_call(
            kernel,
            out_shape=out_shape,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
            + [pl.BlockSpec(memory_space=pltpu.VMEM)] * (len(args) - 1),
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(*args)
        jax.block_until_ready(out)
        return np.asarray(out)
    except Exception as e:  # noqa: BLE001
        msg = str(e).split("\n")[0][:140]
        print(f"  {name}: FAIL {type(e).__name__}: {msg}", flush=True)
        return None


def main():
    # table: 2 tiles of (8,128); value at [t, q, l] = t*10000 + q*1000 + l
    tab = (np.arange(2)[:, None, None] * 10000
           + np.arange(8)[None, :, None] * 1000
           + np.arange(128)[None, None, :]).astype(np.float32)
    tab = jnp.asarray(tab)
    w = jnp.asarray([19], jnp.int32)  # wide id -> tile 1, lane base (19%16)*8=24

    def want():
        return np.asarray(tab)[1, :, 24:32]  # (8, 8)

    # A: dynamic roll on lane axis
    def k_roll(w_ref, tab_ref, out_ref):
        wid = w_ref[0]
        tile = tab_ref[wid // 16]
        base = (wid % 16) * 8
        rolled = pltpu.roll(tile, -base, axis=1)
        out_ref[:, :] = rolled[:, :8]

    # B: dynamic_slice on the value
    def k_dslice(w_ref, tab_ref, out_ref):
        wid = w_ref[0]
        tile = tab_ref[wid // 16]
        base = (wid % 16) * 8
        out_ref[:, :] = jax.lax.dynamic_slice(tile, (0, base), (8, 8))

    # C: dynamic lane slice on the ref
    def k_refslice(w_ref, tab_ref, out_ref):
        wid = w_ref[0]
        base = (wid % 16) * 8
        out_ref[:, :] = tab_ref[wid // 16, :, pl.ds(base, 8)]

    # D: one-hot matmul extraction (precision fallback)
    def k_matmul(w_ref, tab_ref, out_ref):
        wid = w_ref[0]
        tile = tab_ref[wid // 16]
        base = (wid % 16) * 8
        lanes = jax.lax.broadcasted_iota(jnp.int32, (128, 8), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (128, 8), 1)
        oh = (lanes == base + cols).astype(jnp.float32)
        out_ref[:, :] = jax.lax.dot_general(
            tile, oh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)

    oshape = jax.ShapeDtypeStruct((8, 8), jnp.float32)
    for name, k in [("roll", k_roll), ("dynamic_slice_val", k_dslice),
                    ("ref_lane_ds", k_refslice), ("onehot_matmul", k_matmul)]:
        got = run(name, k, w, tab, out_shape=oshape)
        if got is not None:
            ok = np.array_equal(got, want())
            print(f"  {name}: {'OK exact' if ok else 'WRONG'} "
                  f"max|err|={np.abs(got - want()).max()}", flush=True)

    # E: (8,8) transpose of a dynamic subtile + broadcast columns (slab prep)
    def k_t8(w_ref, tab_ref, out_ref):
        wid = w_ref[0]
        tile = tab_ref[wid // 16]
        base = (wid % 16) * 8
        sub = jax.lax.dynamic_slice(tile, (0, base), (8, 8))
        subt = jnp.transpose(sub)  # (child, field)
        out_ref[:, :] = jnp.broadcast_to(subt[:, 2:3], (8, 128))

    got = run("t8+broadcast", k_t8, w, tab, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32))
    if got is not None:
        exp = np.broadcast_to(want().T[:, 2:3], (8, 128))
        print(f"  t8+broadcast: {'OK' if np.array_equal(got, exp) else 'WRONG'}",
              flush=True)

    # F: SMEM 2D scratch with dynamic [i, r] indexing + unconditional
    #    cursor store (stack ops)
    def k_stack(w_ref, tab_ref, out_ref, stack, sp):
        i = w_ref[0] % 1  # dynamic 0
        sp[i, 0] = 0
        for step in range(4):
            push = step % 2 == 0
            stack[i, 0, sp[i, 0]] = step * 11
            sp[i, 0] = sp[i, 0] + jnp.where(push, 1, 0)
        out_ref[0, 0] = jnp.float32(sp[i, 0] * 100 + stack[i, 0, sp[i, 0] - 1])

    try:
        out = pl.pallas_call(
            k_stack,
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            scratch_shapes=[pltpu.SMEM((2, 8, 16), jnp.int32),
                            pltpu.SMEM((2, 8), jnp.int32)],
        )(w, tab)
        # pushes at steps 0,2 -> sp=2, stack[.,.,1]=22 -> 222
        print(f"  smem_stack: got {float(np.asarray(out)[0,0])} want 222.0",
              flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"  smem_stack: FAIL {type(e).__name__}: "
              f"{str(e).splitlines()[0][:140]}", flush=True)


if __name__ == "__main__":
    main()
