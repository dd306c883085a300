"""Pallas TPU 8-wide BVH traversal kernel.

Evolution of the row-packet kernel (ops/traversal_pallas.py): each sublane
row (128 rays) still owns an independent walk, but over the 8-WIDE tree
(bvh/wide.py) instead of the binary skip-link tree, with a small per-row
SMEM stack replacing the skip links.  One step now tests a node's EIGHT
child AABBs against the row's 128 rays in a single (8, 128) slab test
(children on sublanes, rays on lanes), so a scalar sync round retires up to
8 boxes per row — ~8x fewer sequential sync rounds than the one-node-per-row
binary walk, at similar vector cost per retired box.  The 8-bit child hit
masks of 4 rows pack into one 32-bit vector→scalar sync (2 syncs per
8-row iteration).

The segmented walk/drain design with best-t feedback is inherited unchanged:
leaf children append packed (tri_start*64+count) words to per-row SMEM
lists; when a list nears SEG_CAP the chain switches to the Möller–Trumbore
drain (shared with the binary kernel), whose per-lane best_t tightens the
next segment's slab prune.  Chains are processed sequentially per kernel
instance via fori_loop (the unrolled-rows body compiles once), each chain
running its complete segmented traversal before the next starts.

Same reference contract as ops.traversal.traverse_bvh (closest hit;
layout ancestry: Bvh/bvh.cpp:244-330, walk Kernel/path_tracer_kernel.cu:85-161).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pathtracerwithcuda_tpu.bvh.wide import WideBVH, collapse_wide
from pathtracerwithcuda_tpu.ops import traversal_pallas as _tp
from pathtracerwithcuda_tpu.ops.traversal_pallas import (
    FAR_ORIGIN,
    INF,
    LANES,
    MAX_LEAF_K,
    PACKET,
    ROWS,
    _extract_col,
    _moller_trumbore_rows,
    _round_up,
    _rows_from_scalars,
    _t8,
)

import os as _os

# tree arity (children per wide node).  8 = one (8, 128) slab per pop;
# 16 halves the pop count (the per-iteration serialization floor is paid
# half as often) at 2x the vector work per pop — the vector side is <10%
# of the iteration budget, so wider wins whenever the walk is
# iteration-bound.  16 needs 2 sub-tile transposes per pop and full-32-bit
# sync words (see _any_hit_bits).
ARITY = int(_os.environ.get("PT_WIDE_ARITY", "8"))
_NPT = LANES // ARITY    # wide nodes per 128-lane nbox tile group
# rows packed per vector→scalar sync word (ARITY bits per row).  The
# packed reduce ORs rows into disjoint bit ranges via addition, so bit 31
# is usable (see _any_hit_bits) — 32 // ARITY rows always fit.
_RPS = int(_os.environ.get("PT_WIDE_RPS", "2"))
# fat-leaf merging: subtrees of <= this many contiguous triangles collapse
# into ONE leaf slot (bvh/wide.py collapse_wide leaf_run_max).  Raises slot
# fill at the bottom of the tree, which directly cuts walk iterations — the
# kernel's serialization floor — in exchange for cheap vector MT tests.
_LEAFRUN = int(_os.environ.get("PT_WIDE_LEAFRUN", "0"))
WIDE_CHAINS = 8          # chains per kernel instance (sequential fori)
# experiment knob (kprof): how phase 1 consumes the pending hit bits —
# "sparse" (production: clz-driven set-bit iteration — SMEM stores/meta
# reads only for actual hits), "when" (dense 8-slot loop gated by pl.when),
# "always" (dense, no branch).  All exact.
_SLOT_MODE = _os.environ.get("PT_WIDE_SLOT", "sparse")
# nodes popped per row per walk iteration (>1 trades visit order for fewer
# iterations; measured a net loss on v5e — keep 1)
_NPOP = int(_os.environ.get("PT_WIDE_NPOP", "1"))
# walk-body steps per while-loop iteration (halves loop back-edges at 2)
_UNROLL = int(_os.environ.get("PT_WIDE_UNROLL", "1"))
# pending-queue depth: how many iterations after issue a slab's hit bits
# are consumed.  2 was meant to hide the slab→sync latency behind a full
# iteration of scalar work, but measured slightly WORSE than 1 on v5e
# (extra idle pops + larger carry beat the latency saved) — keep 1.
_PDEPTH = int(_os.environ.get("PT_WIDE_PDEPTH", "1"))
# chains advanced together per walk-loop body (the round-5 "several
# independent ray blocks' phases inside ONE body" reorganization): each body
# pops+slab-tests C chains back-to-back (issuing their vector→scalar syncs),
# then runs the C scalar slot-loop phases — so by the time chain c's bits
# are read, C-1 further slab phases and c earlier consume phases have
# executed, hiding the sync latency that owns the serial loop's critical
# path.  Per-chain pop sequences (and results) are bit-identical to the
# unmerged loop; only the schedule changes.  1 = the original serial loop.
_CMERGE = int(_os.environ.get("PT_WIDE_CMERGE", "1"))
# per-row traversal stack; 16-wide trees are shallower but push up to 15
# deferred siblings per level, so their worst-case bound is larger
STACK_CAP = 64 if ARITY == 8 else 128
# Drain-segment length — deliberately SMALLER than the binary kernel's 64:
# with ordered descent the value of a drain is the best_t tightening it
# feeds back into the slab prune, so draining every ~2 leaf appends
# (leaf_k 8) beats batching 8+ of them.  Swept on v5e, 2.07M-ray flagship:
# primary 366→323 ms and bounce 1508→1373 ms going 64→16; 8 and 24 are
# both slightly worse.
SEG_CAP = 16
_BIG = jnp.float32(1e30)


def _list_cap() -> int:
    """Per-row drain-list capacity: a row at curs == SEG_CAP-1 can still
    have _PDEPTH in-flight pops of _NPOP nodes each appending up to ARITY
    leaves before the curs >= SEG_CAP gate blocks further pops."""
    return SEG_CAP + _PDEPTH * _NPOP * ARITY + 1


def _row_bcast(tile, r: int, nrows: int = ROWS):
    """(8,128) chain tile, static row r -> that row broadcast to (nrows,128)."""
    return jnp.broadcast_to(tile[r:r + 1, :], (nrows, LANES))


def _tA(sub):
    """(8 fields, ARITY children) -> (ARITY, 8) via native (8,8) transposes
    (Mosaic lowers square transposes exactly; see _t8)."""
    if ARITY == 8:
        return _t8(sub)
    return jnp.concatenate(
        [_t8(sub[:, k:k + 8]) for k in range(0, ARITY, 8)], axis=0)


def _any_hit_bits(hit, shift: int):
    """(ARITY, 128) hit mask -> (ARITY, 1) column whose sublane c holds
    2^(shift+c) if any lane of child c hit, else 0 — summing columns of
    disjoint bit ranges then ORs rows into one sync word via addition.
    Two-step (any-hit 0/1 first, then static power weights) so bit 31 is
    usable: 1<<31 wraps to INT32_MIN, and adding disjoint powers is
    carry-free, so the summed word's BIT PATTERN is exact even when the
    int32 goes negative (the scalar side reads it with logical shifts)."""
    h01 = jnp.max(jnp.where(hit, 1, 0), axis=1, keepdims=True)
    wcol = jnp.left_shift(
        jnp.int32(1),
        shift + jax.lax.broadcasted_iota(jnp.int32, (ARITY, 1), 0))
    return h01 * wcol


def _slab8(sub_t, o, inv_d, best_t):
    """sub_t: (ARITY children, 8 fields [minx..maxz]) box block; o/inv_d/
    best_t: per-row (ARITY,128) broadcasts.  Returns (ARITY children,
    128 rays) hit mask."""
    nrows = sub_t.shape[0]

    def f(q):
        return jnp.broadcast_to(sub_t[:, q:q + 1], (nrows, LANES))
    tx0 = (f(0) - o[0]) * inv_d[0]
    ty0 = (f(1) - o[1]) * inv_d[1]
    tz0 = (f(2) - o[2]) * inv_d[2]
    tx1 = (f(3) - o[0]) * inv_d[0]
    ty1 = (f(4) - o[1]) * inv_d[1]
    tz1 = (f(5) - o[2]) * inv_d[2]
    near = jnp.maximum(jnp.maximum(jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)),
                       jnp.minimum(tz0, tz1))
    far = jnp.minimum(jnp.minimum(jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)),
                      jnp.maximum(tz0, tz1))
    return (near <= far) & (far > 0.0) & (near <= best_t)


def _kernel_merged(meta_ref, axis_ref, ox_ref, oy_ref, oz_ref, ix_ref, iy_ref,
                   iz_ref, seed_ref, dx_ref, dy_ref, dz_ref, nbox_ref, tri_ref,
                   out_t_ref, out_tri_ref, stack_ref, list_ref, mail_ref,
                   bt_ref, btri_ref, *, num_wide: int, pad_tri: int,
                   chains: int, leaf_k: int, cmerge: int):
    """Chain-merged walk (see _CMERGE): C chains advance per loop body.

    Body schedule: [pop_c -> slab_c (sync issued)] for c in 0..C-1, then
    [consume_c (scalar slot loops)] for c in 0..C-1.  A chain's children
    pushed by consume in body k are popped in body k+1 — exactly the
    schedule of the serial pipelined loop (_PDEPTH=1), so per-chain pop
    sequences and all results are bit-identical; the merge only gives each
    vector→scalar sync C-1 slab phases plus earlier consume phases of slack
    before its bits are read.  Walk segments end when EVERY merged chain's
    rows are capped or empty (idle rows ride along masked), then the C
    drains run back-to-back.
    """
    C = cmerge
    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (16, LANES), 1)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (ROWS, 1), 0)
    child_pow = jax.lax.broadcasted_iota(jnp.int32, (ROWS, LANES), 0)
    row_w1 = jnp.left_shift(
        jnp.int32(1), jax.lax.broadcasted_iota(jnp.int32, (ROWS, 1), 0))
    CR = C * ROWS

    def group_body(g, _):
        i0 = g * C
        o_c, inv_c, d_c, sgn_c, iis = [], [], [], [], []
        for c in range(C):
            i = i0 + c
            iis.append(i)
            o_c.append([ox_ref[i], oy_ref[i], oz_ref[i]])
            inv_c.append([ix_ref[i], iy_ref[i], iz_ref[i]])
            d_c.append([dx_ref[i], dy_ref[i], dz_ref[i]])
            bt_ref[c] = seed_ref[i]
            btri_ref[c] = jnp.full((ROWS, LANES), -1, jnp.int32)
            for r in range(ROWS):
                stack_ref[i, r, 0] = jnp.int32(0)
        for c in range(C):
            sgn_c.append([
                jnp.sum(jnp.where(
                    jnp.sum(d_c[c][a], axis=1, keepdims=True) < 0.0,
                    row_w1, 0))
                for a in range(3)
            ])

        def outer_cond(carry):
            alive = carry[0] > 0
            for v in carry[1:]:
                alive = alive | (v > 0)
            return alive

        def outer_body(carry):
            def wcond(cc):
                sps, curs = cc[:CR], cc[CR:]
                alive = None
                for k in range(CR):
                    a = (sps[k] > 0) & (curs[k] < SEG_CAP)
                    alive = a if alive is None else alive | a
                return alive

            def wbody(cc):
                sps = list(cc[:CR])
                curs = list(cc[CR:])
                bits_all, nodes_all = [], []
                for c in range(C):
                    i = iis[c]
                    nodes, stepping = [], []
                    for r in range(ROWS):
                        k = c * ROWS + r
                        avail = sps[k]
                        step = (avail > 0) & (curs[k] < SEG_CAP)
                        top = jnp.maximum(avail - 1, 0)
                        w = jnp.clip(stack_ref[i, r, top], 0, num_wide - 1)
                        stepping.append(step)
                        nodes.append(w)
                        sps[k] = avail - jnp.where(step, 1, 0)
                    bt_tile = bt_ref[c]
                    accs = [None] * 4
                    for r in range(ROWS):
                        w = nodes[r]
                        tile = nbox_ref[w // 16]
                        base = (jax.lax.rem(w, 16)) * 8
                        sub = pltpu.roll(tile, -base, axis=1)[:, :8]
                        sub_t = _t8(sub)
                        ob = [_row_bcast(f, r) for f in o_c[c]]
                        ib = [_row_bcast(f, r) for f in inv_c[c]]
                        hit = _slab8(sub_t, ob, ib, _row_bcast(bt_tile, r))
                        hit = hit & stepping[r]
                        si, shift = r // 2, 8 * (r % 2)
                        w_r = jnp.left_shift(jnp.int32(1), shift + child_pow)
                        h = jnp.max(jnp.where(hit, w_r, 0), axis=1,
                                    keepdims=True)
                        accs[si] = h if accs[si] is None else accs[si] + h
                    bits_all.append([jnp.sum(a) for a in accs])
                    nodes_all.append(nodes)
                for c in range(C):
                    i = iis[c]
                    for r in range(ROWS):
                        k = c * ROWS + r
                        si, shift = r // 2, 8 * (r % 2)
                        bits_rj = jax.lax.shift_right_logical(
                            bits_all[c][si], shift) & 0xFF
                        w = nodes_all[c][r]
                        ax = axis_ref[w]
                        sgn = jnp.where(
                            ax == 0, sgn_c[c][0],
                            jnp.where(ax == 1, sgn_c[c][1], sgn_c[c][2]))
                        neg = (jax.lax.shift_right_logical(
                            sgn, jnp.int32(r)) & 1) > 0

                        def scond(cc2):
                            return cc2[0] != 0

                        def sbody(cc2, w=w, neg=neg, r=r, i=i):
                            bits, s, cur = cc2
                            k_hi = 31 - jax.lax.clz(bits)
                            k_lo = 31 - jax.lax.clz(bits & (-bits))
                            cslot = jnp.where(neg, k_lo, k_hi)
                            m = meta_ref[w * ARITY + cslot]
                            stack_ref[i, r, s] = m - 1
                            s = s + jnp.where(m > 0, 1, 0)
                            list_ref[i, r, cur] = -m
                            cur = cur + jnp.where(m < 0, 1, 0)
                            bits = bits & ~jax.lax.shift_left(
                                jnp.int32(1), cslot)
                            return bits, s, cur

                        _, s_out, c_out = jax.lax.while_loop(
                            scond, sbody, (bits_rj, sps[k], curs[k]))
                        sps[k] = s_out
                        curs[k] = c_out
                return tuple(sps) + tuple(curs)

            init = tuple(carry) + tuple(jnp.int32(0) for _ in range(CR))
            walked = jax.lax.while_loop(wcond, wbody, init)

            for c in range(C):
                i = iis[c]
                ns = [walked[CR + c * ROWS + r] for r in range(ROWS)]
                nmax = ns[0]
                for r in range(1, ROWS):
                    nmax = jnp.maximum(nmax, ns[r])

                def mt_body(l, carry2, i=i, ns=ns, c=c):
                    starts, counts = [], []
                    kmax = jnp.int32(0)
                    for r in range(ROWS):
                        packed = jnp.where(
                            l < ns[r],
                            list_ref[i, r, jnp.minimum(l, _list_cap() - 1)], 0)
                        start = packed // 64
                        count = packed - start * 64
                        counts.append(count)
                        starts.append(start)
                        kmax = jnp.maximum(kmax, count)

                    def k_body(k, carry3, counts=counts, starts=starts, c=c):
                        best_t, best_tri = carry3
                        tis = [jnp.where(k < counts[r], starts[r] + k, pad_tri)
                               for r in range(ROWS)]
                        cols = [
                            _extract_col(tri_ref[ti // LANES],
                                         jax.lax.rem(ti, LANES), lane_ids, 16)
                            for ti in tis
                        ]
                        c16 = jnp.concatenate(cols, axis=1)
                        t_lo = _t8(c16[0:8])
                        t_hi = _t8(c16[8:16])
                        f = [jnp.broadcast_to(t_lo[:, q:q + 1], (ROWS, LANES))
                             for q in range(8)]
                        f.append(jnp.broadcast_to(t_hi[:, 0:1], (ROWS, LANES)))
                        ti_col = _rows_from_scalars(tis, row_ids, jnp.int32)
                        return _moller_trumbore_rows(
                            f, ti_col, best_t, best_tri, o_c[c], d_c[c])

                    return jax.lax.fori_loop(0, kmax, k_body, carry2)

                best_t, best_tri = jax.lax.fori_loop(
                    0, nmax, mt_body, (bt_ref[c], btri_ref[c]))
                bt_ref[c] = best_t
                btri_ref[c] = best_tri
            return tuple(walked[:CR])

        outer_init = tuple(jnp.int32(1) for _ in range(CR))
        jax.lax.while_loop(outer_cond, outer_body, outer_init)
        for c in range(C):
            i = iis[c]
            out_t_ref[i] = bt_ref[c]
            out_tri_ref[i] = btri_ref[c]
        return 0

    jax.lax.fori_loop(0, chains // C, group_body, 0)


def _kernel(meta_ref, axis_ref, ox_ref, oy_ref, oz_ref, ix_ref, iy_ref, iz_ref,
            seed_ref, dx_ref, dy_ref, dz_ref, nbox_ref, tri_ref, out_t_ref,
            out_tri_ref, stack_ref, list_ref, mail_ref, bt_ref, btri_ref, *,
            num_wide: int, pad_tri: int, chains: int, leaf_k: int,
            walk_only: bool = False):
    """Wide-BVH traversal; see module docstring.

    meta_ref (SMEM, (8W,) i32): child slot meta (bvh/wide.py encoding:
      0 empty, >0 child wide id + 1, <0 -(tri_start*64+count)).
    axis_ref (SMEM, (W,) i32): per-node dominant axis; slots are pre-sorted
      front-to-back along it (pack_wide_tables), so a row whose majority
      direction sign on that axis is negative iterates slots reversed —
      the nearest child is always pushed LAST and therefore popped first.
    nbox_ref (WT, 8, 128) f32: wide node w's child c box field q at
      [w//16, q, (w%16)*8 + c].  Empty slots carry NaN boxes, which can
      never pass the slab test — so hit bits contain only real children
      and the sparse slot loop's trip count is the true hit count.
    stack_ref (SMEM (chains, ROWS, STACK_CAP)), list_ref (SMEM
      (chains, ROWS, _list_cap())): per-row walk stack / drain list.
    """
    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (16, LANES), 1)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (ROWS, 1), 0)
    # sync packing: child c of a sync group's row rg gets bit ARITY*rg + c
    # (see _any_hit_bits for why the full 32 bits are usable)
    row_w1 = jnp.left_shift(
        jnp.int32(1), jax.lax.broadcasted_iota(jnp.int32, (ROWS, 1), 0))

    def chain_body(i, _):
        o = [ox_ref[i], oy_ref[i], oz_ref[i]]
        inv = [ix_ref[i], iy_ref[i], iz_ref[i]]
        d = [dx_ref[i], dy_ref[i], dz_ref[i]]
        bt_ref[0] = seed_ref[i]
        btri_ref[0] = jnp.full((ROWS, LANES), -1, jnp.int32)
        ob = [[_row_bcast(f, r, ARITY) for f in o] for r in range(ROWS)]
        ib = [[_row_bcast(f, r, ARITY) for f in inv] for r in range(ROWS)]
        # per-row MAJORITY direction-sign bits per axis (one sync per axis
        # per chain, amortized over the whole walk); rows share an octant
        # after the production repack sort, so the majority is the row
        sgn_bits = [
            jnp.sum(jnp.where(jnp.sum(d[a], axis=1, keepdims=True) < 0.0,
                              row_w1, 0))
            for a in range(3)
        ]
        for r in range(ROWS):
            stack_ref[i, r, 0] = jnp.int32(0)

        def outer_cond(c):
            sps = c[:ROWS]
            alive = sps[0] > 0
            for r in range(1, ROWS):
                alive = alive | (sps[r] > 0)
            return alive

        def outer_body(c):
            # ---- walk segment, SOFTWARE-PIPELINED (round-5 step change).
            #
            # The round-4 loop consumed each slab's vector→scalar sync in
            # the same iteration that issued it: slab → bits → slot loop →
            # next pop → next slab, a serial chain that measured ~4 us per
            # 8-row iteration against ~0.4 us of actual vector work
            # (experiments/kwalk_micro.py: the sync→predicated-scalar
            # dependency stalls both units).  The loop now carries each
            # iteration's hit bits as PENDING state and processes them one
            # iteration later: the scalar slot loops for iteration k run
            # while the VPU computes iteration k+1's slab tests, so the
            # critical path is max(scalar, vector) instead of their sum
            # plus two pipeline drains.  The per-row pop sequence — and
            # therefore every traversal result — is bit-identical to the
            # unpipelined loop; only the schedule changes.
            #
            # Each iteration retires _NPOP nodes per row (8*_NPOP child
            # boxes): the serialization floor is per-iteration, so batching
            # pops amortizes it.  Popping 2-at-a-time permutes the visit
            # order slightly (the second pop runs before the first's
            # children) but closest-hit results are order-independent.
            #
            # Carry: sps[8], curs[8], pending bits32[NSYNC], pending
            # nodes[8*_NPOP], pending valid[8*_NPOP] (+ pops[8], stales[8]
            # when walk_only).
            NP = _NPOP if ARITY == 8 else 1
            NW = ROWS * NP
            D = max(_PDEPTH, 1)
            if NP == 1:  # _RPS rows x ARITY child bits per sync
                rps = max(1, min(_RPS, 32 // ARITY))
                sync_of = {(r, 0): (r // rps, ARITY * (r % rps))
                           for r in range(ROWS)}
                NSYNC = ROWS // rps
            else:        # one row per sync, 8 bits per popped node
                sync_of = {(r, j): (r, 8 * j)
                           for r in range(ROWS) for j in range(NP)}
                NSYNC = ROWS
            blk = NSYNC + 2 * NW  # one pending block: pb + pn + pv
            P0, C0 = 0, ROWS
            B0 = 2 * ROWS
            W0 = B0 + D * blk

            def pv_slice(cc, q):
                base = B0 + q * blk + NSYNC + NW
                return cc[base:base + NW]

            def wcond(cc):
                sps, curs = cc[P0:C0], cc[C0:B0]
                alive = None
                for q in range(D):
                    for v in pv_slice(cc, q):
                        alive = (v > 0) if alive is None else alive | (v > 0)
                for r in range(ROWS):
                    alive = alive | ((sps[r] > 0) & (curs[r] < SEG_CAP))
                return alive

            def wbody(cc):
                sps = list(cc[P0:C0])
                curs = list(cc[C0:B0])
                # consume the OLDEST pending block (q = D-1); the blocks
                # issued in the last D-1 iterations ride along untouched
                base = B0 + (D - 1) * blk
                pb = list(cc[base:base + NSYNC])
                pn = list(cc[base + NSYNC:base + NSYNC + NW])
                pv = list(cc[base + NSYNC + NW:base + blk])
                # walk_only diagnostics: pops / stale-pops per row ride the
                # carry (consumed by experiments/kwide_stats.py)
                pops = list(cc[W0:W0 + ROWS]) if walk_only else None
                stales = list(cc[W0 + ROWS:W0 + 2 * ROWS]) if walk_only else None

                # ---- phase 1 (scalar): process LAST iteration's hit bits.
                # j descending: the j=0 node was the stack top (nearest with
                # ordered descent), so its children are pushed LAST and
                # popped first.
                for r in range(ROWS):
                    for j in range(NP - 1, -1, -1):
                        k = r * NP + j
                        si, shift = sync_of[(r, j)]
                        bits_rj = jnp.where(
                            pv[k] > 0,
                            jax.lax.shift_right_logical(pb[si], shift)
                            & ((1 << ARITY) - 1),
                            0)
                        if walk_only:
                            stales[r] = stales[r] + jnp.where(
                                (pv[k] > 0) & (bits_rj == 0), 1, 0)
                        # ordered descent: slots are presorted front-to-back
                        # along axis_ref[w]; negative-majority rows walk
                        # them reversed.  Iterating far→near means the
                        # NEAREST child is pushed last → popped first, and
                        # near leaves land at the front of the drain list.
                        w = pn[k]
                        ax = axis_ref[w]
                        sgn = jnp.where(
                            ax == 0, sgn_bits[0],
                            jnp.where(ax == 1, sgn_bits[1], sgn_bits[2]))
                        neg = (jax.lax.shift_right_logical(
                            sgn, jnp.int32(r)) & 1) > 0
                        if _SLOT_MODE == "sparse":
                            # set-bit iteration: SMEM stores and meta reads
                            # only for actual hits (empty slots never hit —
                            # their boxes are NaN, pack_wide_tables), and
                            # the loop self-gates on bits == 0 with no
                            # pl.when/mailbox round trip
                            def scond(cc2):
                                return cc2[0] != 0

                            def sbody(cc2, w=w, neg=neg, r=r):
                                bits, s, cur = cc2
                                k_hi = 31 - jax.lax.clz(bits)
                                k_lo = 31 - jax.lax.clz(bits & (-bits))
                                cslot = jnp.where(neg, k_lo, k_hi)
                                m = meta_ref[w * ARITY + cslot]
                                stack_ref[i, r, s] = m - 1
                                s = s + jnp.where(m > 0, 1, 0)
                                list_ref[i, r, cur] = -m
                                cur = cur + jnp.where(m < 0, 1, 0)
                                bits = bits & ~jax.lax.shift_left(
                                    jnp.int32(1), cslot)
                                return bits, s, cur

                            _, s_out, c_out = jax.lax.while_loop(
                                scond, sbody, (bits_rj, sps[r], curs[r]))
                            sps[r] = s_out
                            curs[r] = c_out
                            continue
                        mail_ref[i, r, 0] = sps[r]
                        mail_ref[i, r, 1] = curs[r]

                        @pl.when((bits_rj != 0) | (_SLOT_MODE == "always"))
                        def _(r=r, w=w, bits_r=bits_rj, s0=sps[r],
                              c0=curs[r], neg=neg):
                            s, cur = s0, c0
                            for kk in range(ARITY - 1, -1, -1):
                                cslot = jnp.where(neg,
                                                  jnp.int32(ARITY - 1 - kk),
                                                  jnp.int32(kk))
                                hit_c = (jax.lax.shift_right_logical(
                                    bits_r, cslot) & 1) > 0
                                m = meta_ref[w * ARITY + cslot]
                                push = hit_c & (m > 0)
                                leaf = hit_c & (m < 0)
                                stack_ref[i, r, s] = m - 1
                                s = s + jnp.where(push, 1, 0)
                                list_ref[i, r, cur] = -m
                                cur = cur + jnp.where(leaf, 1, 0)
                            mail_ref[i, r, 0] = s
                            mail_ref[i, r, 1] = cur

                        sps[r] = mail_ref[i, r, 0]
                        curs[r] = mail_ref[i, r, 1]

                # ---- phase 2 (scalar): pop this iteration's nodes
                stepping = []
                nodes = []
                for r in range(ROWS):
                    avail = sps[r]
                    ok_cur = curs[r] < SEG_CAP
                    npopped = jnp.int32(0)
                    for j in range(NP):
                        step = (avail > j) & ok_cur
                        top = jnp.maximum(avail - 1 - j, 0)
                        # clamp: idle rows peek a garbage slot (the
                        # unconditional cursor store) — keep reads in bounds
                        w = jnp.clip(stack_ref[i, r, top], 0, num_wide - 1)
                        stepping.append(step)
                        nodes.append(w)
                        npopped = npopped + jnp.where(step, 1, 0)
                    sps[r] = avail - npopped
                    if walk_only:
                        pops[r] = pops[r] + npopped

                # ---- phase 3 (vector): slab-test the popped nodes; the
                # syncs land in the carry and are consumed NEXT iteration
                bt_tile = bt_ref[0]
                accs = [None] * NSYNC
                for r in range(ROWS):
                    for j in range(NP):
                        k = r * NP + j
                        si, shift = sync_of[(r, j)]
                        w = nodes[k]
                        tile = nbox_ref[w // _NPT]
                        base = (jax.lax.rem(w, _NPT)) * ARITY
                        # dynamic lane extraction: Mosaic lowers roll with a
                        # traced shift natively (verified exact on v5e);
                        # dynamic_slice on values is not lowered at all
                        sub = pltpu.roll(tile, -base, axis=1)[:, :ARITY]
                        sub_t = _tA(sub)  # (child, field)
                        hit = _slab8(sub_t, ob[r], ib[r],
                                     _row_bcast(bt_tile, r, ARITY))
                        hit = hit & stepping[k]
                        h = _any_hit_bits(hit, shift)
                        accs[si] = h if accs[si] is None else accs[si] + h
                bits32 = [jnp.sum(a) for a in accs]  # ONE sync each

                fresh = (tuple(bits32) + tuple(nodes)
                         + tuple(jnp.where(s, 1, 0) for s in stepping))
                # queue shift: fresh block becomes q=0, old q -> q+1
                out = tuple(sps) + tuple(curs) + fresh
                for q in range(D - 1):
                    qb = B0 + q * blk
                    out = out + tuple(cc[qb:qb + blk])
                if walk_only:
                    out = out + tuple(pops) + tuple(stales)
                return out

            init = (tuple(c[:ROWS])
                    + tuple(jnp.int32(0) for _ in range(ROWS))      # curs
                    + tuple(jnp.int32(0) for _ in range(D * blk)))  # pendings
            if walk_only:  # carried pop/stale counters resume across segments
                init = init + tuple(c[ROWS:3 * ROWS])
            body_n = wbody
            if _UNROLL > 1:  # exact: extra steps no-op once rows/pendings idle
                def body_n(cc):
                    for _ in range(_UNROLL):
                        cc = wbody(cc)
                    return cc
            walked = jax.lax.while_loop(wcond, body_n, init)
            if walk_only:  # timing diagnostics only — results are wrong
                return walked[:ROWS] + walked[W0:W0 + 2 * ROWS]

            # ---- drain segment (same design as the binary kernel)
            ns = [walked[ROWS + r] for r in range(ROWS)]
            nmax = ns[0]
            for r in range(1, ROWS):
                nmax = jnp.maximum(nmax, ns[r])

            def mt_body(l, carry):
                starts, counts = [], []
                kmax = jnp.int32(0)
                for r in range(ROWS):
                    packed = jnp.where(
                        l < ns[r],
                        list_ref[i, r, jnp.minimum(l, _list_cap() - 1)], 0)
                    start = packed // 64
                    count = packed - start * 64
                    counts.append(count)
                    starts.append(start)
                    kmax = jnp.maximum(kmax, count)

                def k_body(k, carry2):
                    best_t, best_tri = carry2
                    tis = [jnp.where(k < counts[r], starts[r] + k, pad_tri)
                           for r in range(ROWS)]
                    cols = [
                        _extract_col(tri_ref[ti // LANES],
                                     jax.lax.rem(ti, LANES), lane_ids, 16)
                        for ti in tis
                    ]
                    c16 = jnp.concatenate(cols, axis=1)   # (16, 8)
                    t_lo = _t8(c16[0:8])
                    t_hi = _t8(c16[8:16])
                    f = [jnp.broadcast_to(t_lo[:, q:q + 1], (ROWS, LANES))
                         for q in range(8)]
                    f.append(jnp.broadcast_to(t_hi[:, 0:1], (ROWS, LANES)))
                    ti_col = _rows_from_scalars(tis, row_ids, jnp.int32)
                    return _moller_trumbore_rows(f, ti_col, best_t, best_tri,
                                                 o, d)

                return jax.lax.fori_loop(0, kmax, k_body, carry)

            best_t, best_tri = jax.lax.fori_loop(
                0, nmax, mt_body, (bt_ref[0], btri_ref[0]))
            bt_ref[0] = best_t
            btri_ref[0] = best_tri
            return walked[:ROWS]

        outer_init = tuple(jnp.int32(1) for _ in range(ROWS))
        if walk_only:
            outer_init = outer_init + tuple(
                jnp.int32(0) for _ in range(2 * ROWS))
        final = jax.lax.while_loop(outer_cond, outer_body, outer_init)
        if walk_only:
            pops_col = _rows_from_scalars(final[ROWS:2 * ROWS], row_ids,
                                          jnp.int32)
            stale_col = _rows_from_scalars(
                [v.astype(jnp.float32) for v in final[2 * ROWS:3 * ROWS]],
                row_ids, jnp.float32)
            out_tri_ref[i] = jnp.broadcast_to(pops_col, (ROWS, LANES))
            out_t_ref[i] = jnp.broadcast_to(stale_col, (ROWS, LANES))
        else:
            out_t_ref[i] = bt_ref[0]
            out_tri_ref[i] = btri_ref[0]
        return 0

    jax.lax.fori_loop(0, chains, chain_body, 0)


@functools.partial(jax.jit, static_argnames=("num_wide", "pad_tri", "leaf_k",
                                             "chains", "interpret",
                                             "walk_only"))
def _run(fields, nbox, meta, axis, tris, num_wide: int, pad_tri: int,
         leaf_k: int, chains: int, interpret: bool = False,
         walk_only: bool = False):
    """fields: 10 arrays (num_packets, 8, 128): ox oy oz ix iy iz seed dx dy dz."""
    num_packets = fields[0].shape[0]
    grid = num_packets // chains
    cmerge = _CMERGE if (_CMERGE > 1 and not walk_only and ARITY == 8
                         and chains % _CMERGE == 0) else 1
    if cmerge > 1:
        kernel = functools.partial(_kernel_merged, num_wide=num_wide,
                                   pad_tri=pad_tri, chains=chains,
                                   leaf_k=leaf_k, cmerge=cmerge)
    else:
        kernel = functools.partial(_kernel, num_wide=num_wide, pad_tri=pad_tri,
                                   chains=chains, leaf_k=leaf_k,
                                   walk_only=walk_only)
    block = pl.BlockSpec((chains, ROWS, LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    out_t, out_tri = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 2
        + [block] * 10
        + [
            pl.BlockSpec(nbox.shape, lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(tris.shape, lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[block, block],
        out_shape=[
            jax.ShapeDtypeStruct((num_packets, ROWS, LANES), jnp.float32),
            jax.ShapeDtypeStruct((num_packets, ROWS, LANES), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.SMEM((chains, ROWS, STACK_CAP), jnp.int32),
            pltpu.SMEM((chains, ROWS, _list_cap()), jnp.int32),
            pltpu.SMEM((chains, ROWS, 2), jnp.int32),  # pl.when mailbox
            pltpu.VMEM((cmerge, ROWS, LANES), jnp.float32),
            pltpu.VMEM((cmerge, ROWS, LANES), jnp.int32),
        ],
        interpret=interpret,
    )(meta, axis, *fields, nbox, tris)
    return out_t, out_tri


# --------------------------------------------------------------------------
# packing + public API
# --------------------------------------------------------------------------

_STRUCT_CACHE: dict = {}
_STRUCT_IDS: dict = {}


def wide_structure(bvh_next, bvh_tri_start, bvh_tri_count) -> WideBVH:
    """collapse_wide with a topology-keyed cache.

    Transform refits replace only bvh_min/max semantically, but the refit
    jit returns a fresh buffer for EVERY SceneData leaf, so object identity
    is only a fast path; the durable key is a content hash of the topology
    arrays (~90 KB readback, sub-ms — vs a ~50 ms collapse).

    Never raises on a too-deep tree: callers gate on wide.max_stack
    (render/wavefront._wide_ok falls back to the binary row kernel;
    traverse_bvh_wide raises for the direct test path)."""
    fast = (id(bvh_next), id(bvh_tri_start), id(bvh_tri_count), ARITY)
    hit = _STRUCT_IDS.get(fast)
    if hit is not None:
        # entry keeps the keyed arrays alive, so the id tuple cannot have
        # been reused by different arrays
        return hit[0]
    nxt = np.asarray(bvh_next)
    ts = np.asarray(bvh_tri_start)
    tc = np.asarray(bvh_tri_count)
    key = (nxt.shape[0], hash(nxt.tobytes()), hash(ts.tobytes()),
           hash(tc.tobytes()), ARITY, _LEAFRUN)
    wide = _STRUCT_CACHE.get(key)
    if wide is None:
        wide = collapse_wide(nxt, ts, tc, arity=ARITY,
                             leaf_run_max=_LEAFRUN)
        if len(_STRUCT_CACHE) > 8:  # a handful of live scenes at most
            _STRUCT_CACHE.clear()
        _STRUCT_CACHE[key] = wide
    if len(_STRUCT_IDS) > 64:
        _STRUCT_IDS.clear()
    # hold strong refs to the keyed arrays: an id()-keyed cache is only sound
    # while the originals are alive (CPython reuses freed addresses)
    _STRUCT_IDS[fast] = (wide, (bvh_next, bvh_tri_start, bvh_tri_count))
    return wide


@functools.partial(jax.jit, static_argnames=("leaf_k",))
def pack_wide_tables(wide_src, wide_meta, bvh_min, bvh_max,
                     tri_v0, tri_v1, tri_v2, leaf_k: int):
    """Device-side packing into the wide kernel table layouts.

    wide_src/wide_meta: (W, 8) i32 from WideBVH (host constants are fine).
    Returns (nbox (WT, 8, 128) f32, meta (8W,) i32, axis (W,) i32,
    tris (TT, 16, 128) f32).  Boxes are gathered fresh from bvh_min/max so
    transform refits flow through without rebuilding the wide structure.

    Front-to-back slot ordering: each node's child slots are sorted by box
    centroid along the node's dominant hull axis (stored in `axis`), empty
    slots last.  The kernel iterates slots forward or reversed per the row's
    majority direction sign on that axis, so near subtrees are descended —
    and their leaves drained into best_t — before far siblings, which the
    slab prune (`near <= best_t`) then skips.  This is the TPU analog of the
    reference's `box_hit_t <= min_t` front-to-back prune
    (Kernel/path_tracer_kernel.cu:118).  Because the sort runs at pack time
    on the (possibly refitted) boxes, ordering stays fresh across transform
    edits with no wide-side rebuild.
    """
    if leaf_k > MAX_LEAF_K:
        raise ValueError(f"leaf_k {leaf_k} > {MAX_LEAF_K}")
    w = wide_src.shape[0]
    t = tri_v0.shape[0]
    w8 = w * ARITY
    w8_pad = _round_up(max(w8, 1), LANES)
    t_pad = _round_up(t + leaf_k, LANES)

    src = wide_src.reshape(w8)
    empty = src == -1
    virtual = src <= -2  # grouped-roots slot: box = hull of wide row -2-src
    vref = jnp.where(virtual, -2 - src, 0)
    safe = jnp.maximum(src, 0)
    boxless = empty | virtual
    cmin = jnp.where(boxless[:, None], _BIG, bvh_min[safe])   # (w8, 3)
    cmax = jnp.where(boxless[:, None], -_BIG, bvh_max[safe])
    nan = jnp.float32(jnp.nan)
    # fill virtual slots from the referenced rows' hulls (group rows hold
    # only real slots — collapse_wide allows one grouping level — so one
    # fill pass suffices; the sort below then recomputes hulls correctly)
    vm3 = boxless.reshape(w, ARITY, 1)
    ghl = jnp.min(jnp.where(vm3, _BIG, cmin.reshape(w, ARITY, 3)), axis=1)
    ghh = jnp.max(jnp.where(vm3, -_BIG, cmax.reshape(w, ARITY, 3)), axis=1)
    cmin = jnp.where(virtual[:, None], ghl[vref], cmin)
    cmax = jnp.where(virtual[:, None], ghh[vref], cmax)

    # ---- front-to-back slot sort (per node, along dominant hull axis)
    e3 = empty.reshape(w, ARITY, 1)
    cmin3 = cmin.reshape(w, ARITY, 3)
    cmax3 = cmax.reshape(w, ARITY, 3)
    hull_lo = jnp.min(jnp.where(e3, _BIG, cmin3), axis=1)    # (W, 3)
    hull_hi = jnp.max(jnp.where(e3, -_BIG, cmax3), axis=1)
    axis = jnp.argmax(hull_hi - hull_lo, axis=1).astype(jnp.int32)  # (W,)
    centroid = (cmin3 + cmax3) * 0.5                         # (W, 8, 3)
    key = jnp.take_along_axis(centroid, axis[:, None, None].astype(jnp.int32),
                              axis=2)[..., 0]                # (W, 8)
    key = jnp.where(empty.reshape(w, ARITY), _BIG, key)      # empties last
    perm = jnp.argsort(key, axis=1, stable=True)             # (W, 8)
    cmin = jnp.take_along_axis(cmin3, perm[:, :, None], axis=1).reshape(w8, 3)
    cmax = jnp.take_along_axis(cmax3, perm[:, :, None], axis=1).reshape(w8, 3)
    empty = jnp.take_along_axis(empty.reshape(w, ARITY), perm, axis=1).reshape(w8)
    wide_meta = jnp.take_along_axis(wide_meta, perm, axis=1)
    # re-apply the empty-slot sentinel after the permutation gather.  NaN
    # (not a swapped +/-BIG box): every comparison with NaN is false, so
    # _slab8 can NEVER report an empty slot as hit — the sparse slot loop
    # then iterates only real hits.  (A swapped box actually PASSES the
    # slab test after its per-axis min/max reordering.)
    cmin = jnp.where(empty[:, None], nan, cmin)
    cmax = jnp.where(empty[:, None], nan, cmax)

    nbox = jnp.zeros((8, w8_pad), jnp.float32)
    nbox = nbox.at[0:3, :w8].set(cmin.T)
    nbox = nbox.at[3:6, :w8].set(cmax.T)
    # padding lanes beyond w8 must also never hit
    if w8_pad > w8:
        nbox = nbox.at[0:3, w8:].set(nan)
        nbox = nbox.at[3:6, w8:].set(nan)
    nbox = nbox.reshape(8, w8_pad // LANES, LANES).transpose(1, 0, 2)

    meta = wide_meta.reshape(w8)

    tris = jnp.zeros((16, t_pad), jnp.float32)
    tris = tris.at[0:3, :t].set(tri_v0.T)
    tris = tris.at[3:6, :t].set(tri_v1.T)
    tris = tris.at[6:9, :t].set(tri_v2.T)
    tris = tris.reshape(16, t_pad // LANES, LANES).transpose(1, 0, 2)
    return nbox, meta, axis, tris


def vmem_table_bytes(num_wide: int, num_tris: int, leaf_k: int) -> int:
    w8_pad = _round_up(max(num_wide * ARITY, 1), LANES)
    t_pad = _round_up(num_tris + leaf_k, LANES)
    return 8 * w8_pad * 4 + 16 * t_pad * 4 + 2 * PACKET * 4


def smem_meta_bytes(num_wide: int) -> int:
    return (num_wide * (ARITY + 1) * 4  # slot meta + per-node axis
            # stack + drain list + pl.when mailbox scratch, per chain row
            + WIDE_CHAINS * ROWS * (STACK_CAP + _list_cap() + 2) * 4)


def traverse_packed_wide(origin, direction, min_t0, tables, *, num_wide: int,
                         num_tris: int, leaf_k: int,
                         chains: int = WIDE_CHAINS, interpret: bool = False):
    """Wide-kernel analog of traversal_pallas.traverse_packed: PREPACKED
    tables (pack_wide_tables); P must be a multiple of CHUNK_PACKETS*PACKET.
    Returns (tri_index, t) with -1/inf for no triangle beating min_t0."""
    nbox, meta, axis, tris = tables
    p = origin.shape[0]
    origin = jax.lax.stop_gradient(origin)
    direction = jax.lax.stop_gradient(direction)
    min_t0 = jax.lax.stop_gradient(min_t0)

    dead = min_t0 <= 0.0
    o = jnp.where(dead[:, None], FAR_ORIGIN, origin)
    d = jnp.where(direction == 0.0, 1e-20, direction)
    inv_d = 1.0 / d

    num_packets = p // PACKET
    # module-attribute read (not a value import) so tests that monkeypatch
    # traversal_pallas.CHUNK_PACKETS apply regardless of import order
    n_chunks = num_packets // _tp.CHUNK_PACKETS

    def shatter(x):
        return x.reshape(n_chunks, _tp.CHUNK_PACKETS, ROWS, LANES)

    fields = [shatter(o[:, 0]), shatter(o[:, 1]), shatter(o[:, 2]),
              shatter(inv_d[:, 0]), shatter(inv_d[:, 1]), shatter(inv_d[:, 2]),
              shatter(min_t0),
              shatter(d[:, 0]), shatter(d[:, 1]), shatter(d[:, 2])]
    outs = [
        _run([f[c] for f in fields], nbox, meta, axis, tris,
             num_wide=num_wide, pad_tri=num_tris, leaf_k=leaf_k,
             chains=chains, interpret=interpret)
        for c in range(n_chunks)
    ]
    out_t = jnp.concatenate([o_[0] for o_ in outs], axis=0)
    out_tri = jnp.concatenate([o_[1] for o_ in outs], axis=0)
    best_t = out_t.reshape(p)
    best_tri = out_tri.reshape(p)
    best_t = jnp.where(best_tri >= 0, best_t, INF)
    return best_tri, best_t


def traverse_bvh_wide(origin, direction, bvh_min, bvh_max, bvh_next,
                      bvh_tri_start, bvh_tri_count, tri_v0, tri_v1, tri_v2,
                      min_t0=None, *, leaf_k: int, chains: int = WIDE_CHAINS,
                      interpret: bool = False):
    """Drop-in wide-kernel analog of ops.traversal.traverse_bvh (collapses,
    packs, pads, runs).  For tests and experiments; the production host loop
    packs once per trace via wide_structure + pack_wide_tables."""
    p = origin.shape[0]
    num_tris = tri_v0.shape[0]
    if min_t0 is None:
        min_t0 = jnp.full((p,), INF)
    if bvh_min.shape[0] == 0:
        return jnp.full((p,), -1, jnp.int32), jnp.full((p,), INF)

    wide = wide_structure(bvh_next, bvh_tri_start, bvh_tri_count)
    if wide.max_stack > STACK_CAP:
        raise ValueError(f"wide stack bound {wide.max_stack} > {STACK_CAP}")
    tables = pack_wide_tables(jnp.asarray(wide.src), jnp.asarray(wide.meta),
                              bvh_min, bvh_max, tri_v0, tri_v1, tri_v2, leaf_k)

    chunk_rays = _tp.CHUNK_PACKETS * PACKET
    p_pad = _round_up(p, chunk_rays)
    pad = p_pad - p
    if pad:
        origin = jnp.pad(origin, ((0, pad), (0, 0)),
                         constant_values=FAR_ORIGIN)
        direction = jnp.pad(direction, ((0, pad), (0, 0)), constant_values=1.0)
        min_t0 = jnp.pad(min_t0, ((0, pad),))
    best_tri, best_t = traverse_packed_wide(
        origin, direction, min_t0, tables, num_wide=wide.num_wide,
        num_tris=num_tris, leaf_k=leaf_k, chains=chains, interpret=interpret)
    return best_tri[:p], best_t[:p]
