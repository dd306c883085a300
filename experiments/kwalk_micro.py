"""Decompose the wide-walk per-iteration cost on real hardware.

The wide kernel's bounce walk measures ~4 us per 8-row iteration
(experiments/kwide_stats.py pops vs kprof time) while its vector work is
only ~0.4 us — something else owns the critical path.  Each variant below
runs ITERS iterations of a synthetic walk-shaped loop in its own tiny
pallas kernel and reports ns/iteration:

  full     tile load+roll+slab x8 rows, 4 packed syncs, 8 scalar slot loops
  noslot   same minus the per-row 8-slot scalar push loops
  nosync   slot loops driven by a constant mask (no vector->scalar sync)
  veconly  just the vector work (loads+rolls+slabs)
  syncs    4 bare syncs per iteration, minimal vector work

Run: python -u experiments/kwalk_micro.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS, LANES = 8, 128
ITERS = 20000
STACK = 64


def _slab8(sub_t, o, inv_d, best_t):
    def f(q):
        return jnp.broadcast_to(sub_t[:, q:q + 1], (ROWS, LANES))
    tx0 = (f(0) - o) * inv_d
    ty0 = (f(1) - o) * inv_d
    tz0 = (f(2) - o) * inv_d
    tx1 = (f(3) - o) * inv_d
    ty1 = (f(4) - o) * inv_d
    tz1 = (f(5) - o) * inv_d
    near = jnp.maximum(jnp.maximum(jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)),
                       jnp.minimum(tz0, tz1))
    far = jnp.minimum(jnp.minimum(jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)),
                      jnp.maximum(tz0, tz1))
    return (near <= far) & (far > 0.0) & (near <= best_t)


def make_kernel(variant):
    def kernel(meta_ref, nbox_ref, o_ref, out_ref, stack_ref, mail_ref):
        child_pow = jax.lax.broadcasted_iota(jnp.int32, (ROWS, LANES), 0)
        o = o_ref[:]
        inv_d = o * 1.0001 + 1.0
        best_t = o * 0.0 + 1e30

        for r in range(ROWS):
            stack_ref[r, 0] = jnp.int32(1)

        def body(it, acc):
            nodes = [jnp.minimum((acc + it + r * 7) & 255, 255)
                     for r in range(ROWS)]
            bits32 = []
            if variant in ("full", "noslot", "veconly", "nosync"):
                for g in range(4):
                    accv = None
                    for rg in range(2):
                        r = g * 2 + rg
                        w = nodes[r]
                        tile = nbox_ref[w // 16]
                        base = jax.lax.rem(w, 16) * 8
                        sub = pltpu.roll(tile, -base, axis=1)[:, :8]
                        sub_t = jnp.transpose(sub)
                        hit = _slab8(sub_t, o, inv_d, best_t)
                        w_r = jnp.left_shift(jnp.int32(1), 8 * rg + child_pow)
                        h = jnp.max(jnp.where(hit, w_r, 0), axis=1,
                                    keepdims=True)
                        accv = h if accv is None else accv + h
                    if variant in ("full", "noslot"):
                        bits32.append(jnp.sum(accv))  # vector->scalar sync
                    else:
                        bits32.append(jnp.int32(0x5a5a) + it)
            elif variant == "syncs":
                ones = jnp.ones((ROWS, 1), jnp.int32)
                for g in range(4):
                    bits32.append(jnp.sum(ones) + it)
            else:
                bits32 = [jnp.int32(0x5a5a)] * 4

            acc2 = acc
            if variant in ("full", "nosync"):
                for r in range(ROWS):
                    bits_r = (jax.lax.shift_right_logical(
                        bits32[r // 2], 8 * (r % 2)) & 0xFF)
                    mail_ref[r, 0] = acc2

                    @pl.when(bits_r != 0)
                    def _(r=r, bits_r=bits_r, a=acc2):
                        s = a & 31
                        cur = jnp.int32(0)
                        for k in range(7, -1, -1):
                            hit_c = (jax.lax.shift_right_logical(
                                bits_r, jnp.int32(k)) & 1) > 0
                            m = meta_ref[(k * 37 + r) & 255]
                            push = hit_c & (m > 0)
                            leaf = hit_c & (m < 0)
                            stack_ref[r, s & 31] = m - 1
                            s = s + jnp.where(push, 1, 0)
                            stack_ref[r, (cur + 32) & 63] = -m
                            cur = cur + jnp.where(leaf, 1, 0)
                        mail_ref[r, 0] = s

                    acc2 = acc2 + (mail_ref[r, 0] & 3)
            else:
                for r in range(ROWS):
                    acc2 = acc2 + (bits32[r // 2] & 1)
            return acc2

        acc = jax.lax.fori_loop(0, ITERS, body, jnp.int32(0))
        out_ref[0] = acc

    return kernel


def run_variant(variant):
    meta = jnp.asarray(np.random.default_rng(0).integers(
        -1000, 1000, 256), jnp.int32)
    nbox = jnp.asarray(np.random.default_rng(1).normal(
        size=(16, 8, 128)), jnp.float32)
    o = jnp.asarray(np.random.default_rng(2).normal(size=(ROWS, LANES)),
                    jnp.float32)
    f = pl.pallas_call(
        make_kernel(variant),
        out_shape=jax.ShapeDtypeStruct((1,), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        scratch_shapes=[pltpu.SMEM((ROWS, STACK), jnp.int32),
                        pltpu.SMEM((ROWS, 2), jnp.int32)],
    )
    x = f(meta, nbox, o)
    jax.block_until_ready(x)
    t0 = time.perf_counter()
    n = 3
    for _ in range(n):
        x = f(meta, nbox, o)
    np.asarray(x)
    dt = (time.perf_counter() - t0) / n
    print(f"{variant:<8s} {dt / ITERS * 1e9:8.1f} ns/iter", flush=True)


for v in ["full", "noslot", "nosync", "veconly", "syncs"]:
    try:
        run_variant(v)
    except Exception as e:  # noqa: BLE001
        print(f"{v}: FAIL {type(e).__name__}: {str(e).splitlines()[0][:120]}",
              flush=True)


def run_carry_variant(ncarry):
    """nosync-style body (vector + slot loops, constant mask) but carrying
    `ncarry` extra live scalars through the while loop — isolates the
    per-carried-scalar back-edge cost suspected of owning the real kernel's
    per-iteration floor."""
    meta = jnp.asarray(np.random.default_rng(0).integers(-1000, 1000, 256),
                       jnp.int32)
    nbox = jnp.asarray(np.random.default_rng(1).normal(size=(16, 8, 128)),
                       jnp.float32)
    o = jnp.asarray(np.random.default_rng(2).normal(size=(ROWS, LANES)),
                    jnp.float32)

    def kernel(meta_ref, nbox_ref, o_ref, out_ref, stack_ref, mail_ref):
        child_pow = jax.lax.broadcasted_iota(jnp.int32, (ROWS, LANES), 0)
        o = o_ref[:]
        inv_d = o * 1.0001 + 1.0
        best_t = o * 0.0 + 1e30
        for r in range(ROWS):
            stack_ref[r, 0] = jnp.int32(1)

        def body(c):
            it = c[0]
            extras = list(c[1:])
            nodes = [jnp.minimum((it + r * 7) & 255, 255) for r in range(ROWS)]
            bits32 = []
            for g in range(4):
                accv = None
                for rg in range(2):
                    r = g * 2 + rg
                    w = nodes[r]
                    tile = nbox_ref[w // 16]
                    base = jax.lax.rem(w, 16) * 8
                    sub = pltpu.roll(tile, -base, axis=1)[:, :8]
                    sub_t = jnp.transpose(sub)
                    hit = _slab8(sub_t, o, inv_d, best_t)
                    w_r = jnp.left_shift(jnp.int32(1), 8 * rg + child_pow)
                    h = jnp.max(jnp.where(hit, w_r, 0), axis=1, keepdims=True)
                    accv = h if accv is None else accv + h
                bits32.append(jnp.int32(0x5a5a) + it)
            for r in range(ROWS):
                bits_r = (jax.lax.shift_right_logical(
                    bits32[r // 2], 8 * (r % 2)) & 0xFF)
                s = it & 31
                cur = jnp.int32(0)
                for k in range(7, -1, -1):
                    hit_c = (jax.lax.shift_right_logical(
                        bits_r, jnp.int32(k)) & 1) > 0
                    m = meta_ref[(k * 37 + r) & 255]
                    stack_ref[r, s & 31] = m - 1
                    s = s + jnp.where(hit_c & (m > 0), 1, 0)
                    stack_ref[r, (cur + 32) & 63] = -m
                    cur = cur + jnp.where(hit_c & (m < 0), 1, 0)
            # touch every extra so none is dead-code eliminated
            extras = [e + (bits32[i % 4] & 1) for i, e in enumerate(extras)]
            return (it + 1,) + tuple(extras)

        init = (jnp.int32(0),) + tuple(jnp.int32(i) for i in range(ncarry))
        out = jax.lax.while_loop(lambda c: c[0] < ITERS, body, init)
        out_ref[0] = out[0] + out[-1] if ncarry else out[0]

    f = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1,), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        scratch_shapes=[pltpu.SMEM((ROWS, STACK), jnp.int32),
                        pltpu.SMEM((ROWS, 2), jnp.int32)],
    )
    x = f(meta, nbox, o)
    jax.block_until_ready(x)
    t0 = time.perf_counter()
    n = 3
    for _ in range(n):
        x = f(meta, nbox, o)
    np.asarray(x)
    dt = (time.perf_counter() - t0) / n
    print(f"carry+{ncarry:<3d} {dt / ITERS * 1e9:8.1f} ns/iter", flush=True)


if os.environ.get("PT_CARRY_SWEEP"):
    for n in (0, 8, 16, 32, 48):
        try:
            run_carry_variant(n)
        except Exception as e:  # noqa: BLE001
            print(f"carry+{n}: FAIL {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:120]}", flush=True)


def run_vcarry():
    """Carry the per-group hit-mask VECTORS through the while loop and do
    the vector->scalar reduction one iteration later: the sum's operand is
    then long since computed, so the scalar read doesn't wait on the slab
    pipeline — the stagger that the scalar-carried version could not
    express (carried scalars materialize at the back edge, forcing the
    wait at the issue point regardless of consumption point)."""
    meta = jnp.asarray(np.random.default_rng(0).integers(-1000, 1000, 256),
                       jnp.int32)
    nbox = jnp.asarray(np.random.default_rng(1).normal(size=(16, 8, 128)),
                       jnp.float32)
    o = jnp.asarray(np.random.default_rng(2).normal(size=(ROWS, LANES)),
                    jnp.float32)

    def kernel(meta_ref, nbox_ref, o_ref, out_ref, stack_ref, mail_ref):
        child_pow = jax.lax.broadcasted_iota(jnp.int32, (ROWS, LANES), 0)
        o = o_ref[:]
        inv_d = o * 1.0001 + 1.0
        best_t = o * 0.0 + 1e30
        for r in range(ROWS):
            stack_ref[r, 0] = jnp.int32(1)

        def body(c):
            it = c[0]
            pending = list(c[1:])  # 4 x (8,1) hit-weight vectors

            # phase 1: consume LAST iteration's masks (operands ready)
            bits32 = [jnp.sum(p) for p in pending]
            for r in range(ROWS):
                bits_r = (jax.lax.shift_right_logical(
                    bits32[r // 2], 8 * (r % 2)) & 0xFF)
                mail_ref[r, 0] = it

                @pl.when(bits_r != 0)
                def _(r=r, bits_r=bits_r, a=it):
                    s = a & 31
                    cur = jnp.int32(0)
                    for k in range(7, -1, -1):
                        hit_c = (jax.lax.shift_right_logical(
                            bits_r, jnp.int32(k)) & 1) > 0
                        m = meta_ref[(k * 37 + r) & 255]
                        stack_ref[r, s & 31] = m - 1
                        s = s + jnp.where(hit_c & (m > 0), 1, 0)
                        stack_ref[r, (cur + 32) & 63] = -m
                        cur = cur + jnp.where(hit_c & (m < 0), 1, 0)
                    mail_ref[r, 0] = s

            # phase 2+3: new slabs; masks go into the carry unreduced
            nodes = [jnp.minimum((it + mail_ref[r, 0] + r * 7) & 255, 255)
                     for r in range(ROWS)]
            new_pending = []
            for g in range(4):
                accv = None
                for rg in range(2):
                    r = g * 2 + rg
                    w = nodes[r]
                    tile = nbox_ref[w // 16]
                    base = jax.lax.rem(w, 16) * 8
                    sub = pltpu.roll(tile, -base, axis=1)[:, :8]
                    sub_t = jnp.transpose(sub)
                    hit = _slab8(sub_t, o, inv_d, best_t)
                    w_r = jnp.left_shift(jnp.int32(1), 8 * rg + child_pow)
                    h = jnp.max(jnp.where(hit, w_r, 0), axis=1, keepdims=True)
                    accv = h if accv is None else accv + h
                new_pending.append(accv)
            return (it + 1,) + tuple(new_pending)

        init = (jnp.int32(0),) + tuple(
            jnp.zeros((ROWS, 1), jnp.int32) for _ in range(4))
        out = jax.lax.while_loop(lambda c: c[0] < ITERS, body, init)
        out_ref[0] = out[0]

    f = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1,), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        scratch_shapes=[pltpu.SMEM((ROWS, STACK), jnp.int32),
                        pltpu.SMEM((ROWS, 2), jnp.int32)],
    )
    x = f(meta, nbox, o)
    jax.block_until_ready(x)
    t0 = time.perf_counter()
    n = 3
    for _ in range(n):
        x = f(meta, nbox, o)
    np.asarray(x)
    dt = (time.perf_counter() - t0) / n
    print(f"vcarry   {dt / ITERS * 1e9:8.1f} ns/iter", flush=True)


if os.environ.get("PT_VCARRY"):
    try:
        run_vcarry()
    except Exception as e:  # noqa: BLE001
        print(f"vcarry: FAIL {type(e).__name__}: "
              f"{str(e).splitlines()[0][:140]}", flush=True)
