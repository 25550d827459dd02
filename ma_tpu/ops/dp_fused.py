"""Fused Pallas banded DP: forward row sweep + in-kernel traceback.

The kswcpp-equivalent flagship kernel (reference: libs/kswcpp/inc/
kswcpp_core.h:1-879 — banded 2-piece-affine z-drop DP; scoring semantics
from KswCppParam, kswcpp.h:44-129). Same recurrences, boundary conventions
and direction-byte layout as ma_tpu/ops/dp_rows.py, which remains the
XLA-scan reference implementation (and the CPU/test path).

Why fused: the split formulation writes a [P, M, N] direction tensor to
HBM and walks it with a lax.while_loop whose per-step 3-D gather
(dirs[p, i_p, j_p]) lowers to a serial per-problem loop on TPU — measured
0.6-1.0 s per bucket call, 87% of the round-2 pipeline wall time. Here a
block of problems lives entirely in VMEM:

* forward: one row per loop step, computed in TJ=128-lane TILES restricted
  to the block's live band window (see the tiled-sweep comment in _kernel)
  with all persistent state ([PB, N] planes) in VMEM, direction bytes into
  a [M, PB, N] int8 VMEM scratch — never to HBM;
* traceback: runs IN THE SAME KERNEL, vectorized across the problem block
  (lanes = reference positions, sublanes = problems). Each query row is
  visited exactly once (M/I moves leave a row immediately; D runs stay
  within one row and are consumed whole via a per-row cummax of
  continuation-bit boundaries), so the walk is max-qlen steps of pure
  VPU work instead of path-length steps of HBM gathers;
* output: merged CIGAR runs (op + length packed into one int32), score,
  max cell, z-drop — O(runs) bytes per problem leave the chip.

The row loop runs to the BLOCK's max query length (problems are sorted by
qlen by the caller), so padding rows cost nothing — the band-local
computation kswcpp gets from its st/en tracking (kswcpp_core.h) falls out
of the blocking.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ma_tpu.ops.dp import (
    CONT_E1,
    CONT_E2,
    CONT_F1,
    CONT_F2,
    DPParams,
    OP_D,
    OP_I,
    OP_M,
    SRC_DIAG,
    SRC_E1,
    SRC_E2,
    SRC_F1,
    SRC_F2,
    SRC_MASK,
)

NEG = -(2**30)
SENT = NEG // 2048  # row-reduction sentinel (packed 2048x must fit int32)
MAX_RUNS = 32  # per-problem run capacity; overflow lanes are flagged

# traceback modes
_TB_H, _TB_E1, _TB_E2, _TB_F1, _TB_F2 = 0, 1, 2, 3, 4

# book columns (per-lane scalars, [PB, 128] int32 scratch)
_GMAX, _GI, _GJ, _GD, _SCR, _DROP = 0, 1, 2, 3, 4, 5
_TJ, _TMODE, _TDONE, _TCNT, _TREMI, _TOVER, _TLAST, _TMOVED = 6, 7, 8, 9, 10, 11, 12, 13
_LRMAX, _LRARG = 14, 15  # best cell of each problem's LAST row (chunked ext)


def _shift_right(x, fill, k: int = 1):
    """x shifted right by k lanes along the last axis, filled with `fill`
    (a [PB, 1] or scalar)."""
    PB = x.shape[0]
    f = jnp.broadcast_to(jnp.asarray(fill, x.dtype), (PB, k))
    return jnp.concatenate([f, x[:, :-k]], axis=1)


def _cummax_lanes(x):
    """Inclusive cummax along the lane (last) axis via log-doubling."""
    n = x.shape[-1]
    lo = jnp.iinfo(x.dtype).min // 2
    sh = 1
    while sh < n:
        x = jnp.maximum(x, _shift_right(x, lo, sh))
        sh *= 2
    return x


def _sel_lane(arr, idx):
    """arr[p, idx[p]] via one-hot reduce. arr [PB, N], idx [PB, 1] -> [PB, 1]."""
    N = arr.shape[1]
    jj = jax.lax.broadcasted_iota(jnp.int32, arr.shape, 1)
    return jnp.sum(jnp.where(jj == idx, arr, 0), axis=1, keepdims=True)


def _kernel(q_ref, t_ref, meta_ref, runs_ref, mout_ref, dirs_ref, hp_ref,
            f1_ref, f2_ref, book_ref, *, M: int, N: int, R: int,
            params: DPParams, zdrop: int, is_global: bool):
    PB = t_ref.shape[0]
    go1, ge1 = params.gap_open, params.gap_extend
    go2, ge2 = params.gap_open2, params.gap_extend2
    jj = jax.lax.broadcasted_iota(jnp.int32, (PB, N), 1)

    # state dtype: int16 when the score envelope provably fits (kswcpp's
    # 16-bit SIMD lane trick, kswcpp.h:44-129 — there a runtime overflow
    # check picks the lane width; here the bucket dims make it static).
    # The [PB, N] recurrence planes then run at 2x VPU lane throughput.
    # Mosaic supports only i1/i32 SCALARS: every sdt value must live as a
    # vector (>= [PB, 1]); scalar math stays int32 and is splatted.
    sdt = hp_ref.dtype
    NEG_S = int(jnp.iinfo(sdt).min) // 2  # python int: weakly typed in ops
    jj_s = jj.astype(sdt)

    m = meta_ref[:, 0:1]  # qlen [PB, 1]
    n = meta_ref[:, 1:2]  # tlen
    w = meta_ref[:, 2:3]  # band

    def gap_cost(k):  # negative best cost of a length-k gap (k >= 1)
        return jnp.maximum(-(go1 + k * ge1), -(go2 + k * ge2))

    def gap_cost_s(k):  # sdt-typed variant for the recurrence planes
        return gap_cost(k).astype(sdt)

    def splat_s(v32):  # int32 scalar -> [PB, 1] sdt vector
        return jnp.broadcast_to(v32, (PB, 1)).astype(sdt)

    # ---- init ----
    hp_ref[:] = jnp.full((PB, N), NEG_S, sdt)
    f1_ref[:] = jnp.full((PB, N), NEG_S, sdt)
    f2_ref[:] = jnp.full((PB, N), NEG_S, sdt)
    book_ref[:] = jnp.zeros((PB, 128), jnp.int32)
    book_ref[:, _GMAX : _GMAX + 1] = jnp.full(
        (PB, 1), NEG if is_global else 0, jnp.int32
    )
    book_ref[:, _GI : _GI + 1] = jnp.full((PB, 1), -1, jnp.int32)
    book_ref[:, _GJ : _GJ + 1] = jnp.full((PB, 1), -1, jnp.int32)
    book_ref[:, _GD : _GD + 1] = jnp.full((PB, 1), 2**30, jnp.int32)
    book_ref[:, _SCR : _SCR + 1] = jnp.full((PB, 1), NEG, jnp.int32)
    book_ref[:, _LRMAX : _LRMAX + 1] = jnp.full((PB, 1), NEG, jnp.int32)
    book_ref[:, _LRARG : _LRARG + 1] = jnp.full((PB, 1), -1, jnp.int32)
    runs_ref[:] = jnp.zeros((PB, R), jnp.int32)

    m_max = jnp.max(meta_ref[:, 0:1])

    # ============================= forward row sweep, lane-tiled (v5 rework)
    # Rows are processed in TJ-lane tiles restricted to the block's live
    # window [i - w_blk - 1, min(n_blk - 1, i + w_blk)]: lanes outside any
    # problem's band/target never touch the VPU, which is the difference
    # between O(M*N) and O(M*band) work when band << N (the band-local
    # economics kswcpp gets from its st/en tracking, kswcpp_core.h). Tile
    # temporaries are a few VREGs instead of [PB, N] planes, so the chain
    # stays register-resident instead of round-tripping VMEM per op.
    # Cross-tile state is carried as [PB, 1] columns: the previous row's h
    # at the tile boundary (diag fill), the running scan values/maxima of
    # v1/v2 (exact continuations of the full-width cummax — includes the
    # virtual-column open, which dominates the carry across skipped tiles),
    # and the packed row-max accumulator.
    import os as _os

    # default tile width: the widest divisor <= 512 (on-chip sweep, round 5:
    # per-tile fixed costs dominate narrow tiles — TJ=128: 18.5 ms,
    # TJ=512: 10.2 ms, TJ=1024 (no window skip): 13.4 ms on the GCUPS
    # workload); MA_TPU_DP_TJ overrides for experiments
    TJ = int(_os.environ.get("MA_TPU_DP_TJ", "0"))
    if TJ <= 0:
        TJ = next((c for c in (512, 384, 256, 128) if N % c == 0), N)
    TJ = TJ if (N % TJ == 0 and N > TJ) else N
    n_tiles = N // TJ
    w_blk = jnp.max(meta_ref[:, 2:3])
    n_blk = jnp.max(meta_ref[:, 1:2])
    jt0 = jax.lax.broadcasted_iota(jnp.int32, (PB, TJ), 1)

    ext_book = not (is_global and zdrop < 0)

    def fwd_row(i, is_first: bool):
        dropped = book_ref[:, _DROP : _DROP + 1] != 0
        not_dropped = ~dropped
        qc = _sel_lane(q_ref[:], jnp.full((PB, 1), i, jnp.int32))  # [PB, 1]
        qn = qc >= 4
        virt32 = jnp.where(i > 0, gap_cost(i), NEG_S)  # scalar int32

        t_lo = jnp.maximum(i - w_blk - 1, 0) // TJ
        j_hi = jnp.minimum(n_blk - 1, i + w_blk)
        t_hi = jnp.minimum(j_hi // TJ + 1, n_tiles)

        # exact carries entering the first processed tile (lanes to its
        # left are invalid at rows i and i-1 by the 1-lane-generous t_lo)
        first0 = t_lo == 0
        jb = t_lo * TJ  # first lane of the first tile
        c_hp = splat_s(jnp.where(first0, gap_cost(i), NEG_S))
        c_v1 = splat_s(jnp.where(first0, virt32 - ge1, NEG_S + ge1 * (jb - 1)))
        c_v2 = splat_s(jnp.where(first0, virt32 - ge2, NEG_S + ge2 * (jb - 1)))
        c_a1 = splat_s(
            jnp.where(
                first0, NEG_S,
                jnp.maximum(virt32 - ge1, NEG_S + ge1 * (jb - 2)),
            )
        )
        c_a2 = splat_s(
            jnp.where(
                first0, NEG_S,
                jnp.maximum(virt32 - ge2, NEG_S + ge2 * (jb - 2)),
            )
        )
        rp0 = jnp.full((PB, 1), NEG, jnp.int32)  # packed row-max accum
        sc0 = jnp.full((PB, 1), NEG, jnp.int32)  # end-cell score accum

        def tile_body(t, carry):
            (c_hp, c_v1, c_v2, c_a1, c_a2, rowpack, scrrun) = carry
            j0 = t * TJ
            jj = jt0 + j0
            jj_s = jj.astype(sdt)
            h_prev_t = hp_ref[:, pl.ds(j0, TJ)]
            f1p = f1_ref[:, pl.ds(j0, TJ)]
            f2p = f2_ref[:, pl.ds(j0, TJ)]
            n_hp = h_prev_t[:, TJ - 1 :]  # stash before overwrite

            valid = (jj < n) & (i < m) & (jnp.abs(i - jj) <= w)
            if sdt == jnp.int32:
                valid_s = valid
            else:
                n_s = n.astype(sdt)
                m_s = m.astype(sdt)
                w_s = jnp.minimum(w, 1 << 14).astype(sdt)
                i_s = jnp.broadcast_to(i, (PB, 1)).astype(sdt)
                di_s = (i - jj).astype(sdt)
                valid_s = (jj_s < n_s) & (i_s < m_s) & (jnp.abs(di_s) <= w_s)

            if is_first:
                jj_pos = jj_s > 0
                h_up = jnp.where(jj_pos, gap_cost_s(jj_s), NEG_S)
                diag = jnp.where(jj_pos, gap_cost_s(jj_s), 0)
            else:
                h_up = h_prev_t
                # diag: previous row shifted right; the tile-0 fill is the
                # virtual column gap_cost(i) (folded into c_hp)
                diag = _shift_right(h_prev_t, c_hp)

            t1 = f1p - ge1
            t2 = h_up - (go1 + ge1)
            nf1 = jnp.maximum(t1, t2)
            cf1 = t1.astype(jnp.int32) >= t2.astype(jnp.int32)
            t3 = f2p - ge2
            t4 = h_up - (go2 + ge2)
            nf2 = jnp.maximum(t3, t4)
            cf2 = t3.astype(jnp.int32) >= t4.astype(jnp.int32)

            tc = t_ref[:, pl.ds(j0, TJ)]
            sc32 = jnp.where(
                qn | (tc >= 4), 0,
                jnp.where(qc == tc, params.match, -params.mismatch),
            )
            hd = diag + sc32.astype(sdt)
            h0 = jnp.where(
                valid_s, jnp.maximum(hd, jnp.maximum(nf1, nf2)), NEG_S
            )

            v1 = _shift_right(h0 + ge1 * jj_s, c_v1)
            a1 = jnp.maximum(_cummax_lanes(v1), c_a1)
            e1 = a1 - go1 - ge1 * jj_s
            # cont bit: e1(j-1) - ge1 >= h0(j-1) - go1 - ge1  <=>
            # A(j-1) >= v1(j)  (both sides share the +ge1*(j-1) offset)
            ce1 = (
                _shift_right(a1, c_a1).astype(jnp.int32)
                >= v1.astype(jnp.int32)
            )
            v2 = _shift_right(h0 + ge2 * jj_s, c_v2)
            a2 = jnp.maximum(_cummax_lanes(v2), c_a2)
            e2 = a2 - go2 - ge2 * jj_s
            ce2 = (
                _shift_right(a2, c_a2).astype(jnp.int32)
                >= v2.astype(jnp.int32)
            )

            h32r = hd.astype(jnp.int32)
            src = jnp.zeros((PB, TJ), jnp.int32)
            h = hd
            for cand, code in (
                (e1, SRC_E1), (nf1, SRC_F1), (e2, SRC_E2), (nf2, SRC_F2)
            ):
                c32 = cand.astype(jnp.int32)
                better = c32 > h32r
                h32r = jnp.maximum(h32r, c32)
                h = jnp.maximum(h, cand)
                src = jnp.where(better, code, src)
            h = jnp.where(valid_s, h, NEG_S)

            dirbyte = (
                src
                | jnp.where(ce1, CONT_E1, 0)
                | jnp.where(cf1, CONT_F1, 0)
                | jnp.where(ce2, CONT_E2, 0)
                | jnp.where(cf2, CONT_F2, 0)
            )
            dirs_ref[pl.ds(i, 1), :, pl.ds(j0, TJ)] = dirbyte.astype(
                jnp.int8
            )[None]

            hp_ref[:, pl.ds(j0, TJ)] = h
            f1_ref[:, pl.ds(j0, TJ)] = nf1
            f2_ref[:, pl.ds(j0, TJ)] = nf2

            if ext_book or is_global:
                h32 = jnp.where(valid, h.astype(jnp.int32), NEG)
            if ext_book:
                hm = jnp.where(valid & not_dropped, h32, SENT)
                packed = jnp.max(
                    hm * 2048 + (2047 - jj), axis=1, keepdims=True
                )
                rowpack = jnp.maximum(rowpack, packed)
            if is_global:
                endc = jnp.max(
                    jnp.where(valid & (jj == n - 1) & (i == m - 1), h32, NEG),
                    axis=1, keepdims=True,
                )
                scrrun = jnp.maximum(scrrun, endc)

            # carries for the next tile
            c_hp = n_hp
            hv = h0[:, TJ - 1 :]
            lastj = j0 + TJ - 1
            c_v1 = hv + ge1 * lastj.astype(sdt)
            c_v2 = hv + ge2 * lastj.astype(sdt)
            c_a1 = a1[:, TJ - 1 :]
            c_a2 = a2[:, TJ - 1 :]
            return (c_hp, c_v1, c_v2, c_a1, c_a2, rowpack, scrrun)

        (c_hp, c_v1, c_v2, c_a1, c_a2, rowpack, scrrun) = jax.lax.fori_loop(
            t_lo, t_hi, tile_body,
            (c_hp, c_v1, c_v2, c_a1, c_a2, rp0, sc0),
        )

        # ---- per-row bookkeeping (all [PB, 1]) ----
        if is_global:
            book_ref[:, _SCR : _SCR + 1] = jnp.where(
                scrrun > NEG, scrrun, book_ref[:, _SCR : _SCR + 1]
            )
        if ext_book:
            gmax = book_ref[:, _GMAX : _GMAX + 1]
            gi = book_ref[:, _GI : _GI + 1]
            gj = book_ref[:, _GJ : _GJ + 1]
            gd = book_ref[:, _GD : _GD + 1]
            rmax = rowpack >> 11
            rarg = 2047 - (rowpack & 2047)
            at_last_row = i == m - 1
            book_ref[:, _LRMAX : _LRMAX + 1] = jnp.where(
                at_last_row, rmax, book_ref[:, _LRMAX : _LRMAX + 1]
            )
            book_ref[:, _LRARG : _LRARG + 1] = jnp.where(
                at_last_row, rarg, book_ref[:, _LRARG : _LRARG + 1]
            )
            upd = (
                (rmax > gmax) | ((rmax == gmax) & (gi >= 0) & (i + rarg < gd))
            ) & not_dropped & (rmax > SENT)
            book_ref[:, _GMAX : _GMAX + 1] = jnp.where(upd, rmax, gmax)
            book_ref[:, _GI : _GI + 1] = jnp.where(upd, i, gi)
            book_ref[:, _GJ : _GJ + 1] = jnp.where(upd, rarg, gj)
            book_ref[:, _GD : _GD + 1] = jnp.where(upd, i + rarg, gd)
            if zdrop >= 0:
                gmax2 = book_ref[:, _GMAX : _GMAX + 1]
                gi2 = book_ref[:, _GI : _GI + 1]
                gj2 = book_ref[:, _GJ : _GJ + 1]
                diff = jnp.abs((i - gi2) - (rarg - gj2))
                # row i has a valid lane iff i < m and the band window
                # intersects [0, n): max(0, i-w) <= min(n-1, i+w)
                has = (i < m) & (i <= n - 1 + w) & (gi2 >= 0)
                ndrop = dropped | (has & (gmax2 - rmax > zdrop + diff * ge1))
                book_ref[:, _DROP : _DROP + 1] = ndrop.astype(jnp.int32)
        return 0

    def book_update(i_row, rowpack, scrrun):
        """Per-row bookkeeping, reading the CURRENT drop state from the
        book (so the second row of a fused pair sees the first row's
        z-drop update)."""
        dropped = book_ref[:, _DROP : _DROP + 1] != 0
        not_dropped = ~dropped
        if is_global:
            book_ref[:, _SCR : _SCR + 1] = jnp.where(
                scrrun > NEG, scrrun, book_ref[:, _SCR : _SCR + 1]
            )
        if ext_book:
            gmax = book_ref[:, _GMAX : _GMAX + 1]
            gi = book_ref[:, _GI : _GI + 1]
            gj = book_ref[:, _GJ : _GJ + 1]
            gd = book_ref[:, _GD : _GD + 1]
            rmax = rowpack >> 11
            rarg = 2047 - (rowpack & 2047)
            at_last_row = i_row == m - 1
            book_ref[:, _LRMAX : _LRMAX + 1] = jnp.where(
                at_last_row, rmax, book_ref[:, _LRMAX : _LRMAX + 1]
            )
            book_ref[:, _LRARG : _LRARG + 1] = jnp.where(
                at_last_row, rarg, book_ref[:, _LRARG : _LRARG + 1]
            )
            upd = (
                (rmax > gmax)
                | ((rmax == gmax) & (gi >= 0) & (i_row + rarg < gd))
            ) & not_dropped & (rmax > SENT)
            book_ref[:, _GMAX : _GMAX + 1] = jnp.where(upd, rmax, gmax)
            book_ref[:, _GI : _GI + 1] = jnp.where(upd, i_row, gi)
            book_ref[:, _GJ : _GJ + 1] = jnp.where(upd, rarg, gj)
            book_ref[:, _GD : _GD + 1] = jnp.where(upd, i_row + rarg, gd)
            if zdrop >= 0:
                gmax2 = book_ref[:, _GMAX : _GMAX + 1]
                gi2 = book_ref[:, _GI : _GI + 1]
                gj2 = book_ref[:, _GJ : _GJ + 1]
                diff = jnp.abs((i_row - gi2) - (rarg - gj2))
                has = (i_row < m) & (i_row <= n - 1 + w) & (gi2 >= 0)
                ndrop = dropped | (
                    has & (gmax2 - rmax > zdrop + diff * ge1)
                )
                book_ref[:, _DROP : _DROP + 1] = ndrop.astype(jnp.int32)

    def fwd_row_pair(i):
        """Rows i and i+1 fused into ONE tile pass: hp/f1/f2 are loaded
        and stored once per tile for two rows (the state-plane VMEM
        round trips halve), dirs write as one [2, PB, TJ] store, and the
        per-row window/carry fixed costs amortize. Row i+1 consumes row
        i's h/f planes directly from registers. Exactness notes: the
        row-i+1 row-max accumulator is masked after row i's z-drop
        update (drop state is per problem, so the correction is exact),
        and the entry-carry formulas hold for row i+1 at row i's t_lo
        because lanes left of it are invalid at rows i and i+1 alike."""
        dropped = book_ref[:, _DROP : _DROP + 1] != 0
        not_dropped = ~dropped
        iB = i + 1
        qcA = _sel_lane(q_ref[:], jnp.full((PB, 1), i, jnp.int32))
        qcB = _sel_lane(q_ref[:], jnp.full((PB, 1), iB, jnp.int32))
        qnA = qcA >= 4
        qnB = qcB >= 4
        virtA = jnp.where(i > 0, gap_cost(i), NEG_S)
        virtB = gap_cost(iB)  # iB >= 2 in the pair loop

        t_lo = jnp.maximum(i - w_blk - 1, 0) // TJ
        j_hi = jnp.minimum(n_blk - 1, iB + w_blk)
        t_hi = jnp.minimum(j_hi // TJ + 1, n_tiles)

        first0 = t_lo == 0
        jb = t_lo * TJ

        def entry(virt32):
            c_hp_fill = splat_s(jnp.where(first0, virt32, NEG_S))
            c_v1 = splat_s(
                jnp.where(first0, virt32 - ge1, NEG_S + ge1 * (jb - 1))
            )
            c_v2 = splat_s(
                jnp.where(first0, virt32 - ge2, NEG_S + ge2 * (jb - 1))
            )
            c_a1 = splat_s(
                jnp.where(
                    first0, NEG_S,
                    jnp.maximum(virt32 - ge1, NEG_S + ge1 * (jb - 2)),
                )
            )
            c_a2 = splat_s(
                jnp.where(
                    first0, NEG_S,
                    jnp.maximum(virt32 - ge2, NEG_S + ge2 * (jb - 2)),
                )
            )
            return c_hp_fill, c_v1, c_v2, c_a1, c_a2

        cA = entry(virtA)
        cB = entry(virtB)
        rp0 = jnp.full((PB, 1), NEG, jnp.int32)
        sc0 = jnp.full((PB, 1), NEG, jnp.int32)

        def row_step(i_row, qc, qn, h_up, diag, f1p, f2p, carry, j0, jj,
                     jj_s, tc):
            (c_v1, c_v2, c_a1, c_a2) = carry
            valid = (jj < n) & (i_row < m) & (jnp.abs(i_row - jj) <= w)
            if sdt == jnp.int32:
                valid_s = valid
            else:
                n_s = n.astype(sdt)
                m_s = m.astype(sdt)
                w_s = jnp.minimum(w, 1 << 14).astype(sdt)
                i_s = jnp.broadcast_to(i_row, (PB, 1)).astype(sdt)
                di_s = (i_row - jj).astype(sdt)
                valid_s = (jj_s < n_s) & (i_s < m_s) & (jnp.abs(di_s) <= w_s)

            t1 = f1p - ge1
            t2 = h_up - (go1 + ge1)
            nf1 = jnp.maximum(t1, t2)
            cf1 = t1.astype(jnp.int32) >= t2.astype(jnp.int32)
            t3 = f2p - ge2
            t4 = h_up - (go2 + ge2)
            nf2 = jnp.maximum(t3, t4)
            cf2 = t3.astype(jnp.int32) >= t4.astype(jnp.int32)

            sc32 = jnp.where(
                qn | (tc >= 4), 0,
                jnp.where(qc == tc, params.match, -params.mismatch),
            )
            hd = diag + sc32.astype(sdt)
            h0 = jnp.where(
                valid_s, jnp.maximum(hd, jnp.maximum(nf1, nf2)), NEG_S
            )

            v1 = _shift_right(h0 + ge1 * jj_s, c_v1)
            a1 = jnp.maximum(_cummax_lanes(v1), c_a1)
            e1 = a1 - go1 - ge1 * jj_s
            ce1 = (
                _shift_right(a1, c_a1).astype(jnp.int32)
                >= v1.astype(jnp.int32)
            )
            v2 = _shift_right(h0 + ge2 * jj_s, c_v2)
            a2 = jnp.maximum(_cummax_lanes(v2), c_a2)
            e2 = a2 - go2 - ge2 * jj_s
            ce2 = (
                _shift_right(a2, c_a2).astype(jnp.int32)
                >= v2.astype(jnp.int32)
            )

            h32r = hd.astype(jnp.int32)
            src = jnp.zeros((PB, TJ), jnp.int32)
            h = hd
            for cand, code in (
                (e1, SRC_E1), (nf1, SRC_F1), (e2, SRC_E2), (nf2, SRC_F2)
            ):
                c32 = cand.astype(jnp.int32)
                better = c32 > h32r
                h32r = jnp.maximum(h32r, c32)
                h = jnp.maximum(h, cand)
                src = jnp.where(better, code, src)
            h = jnp.where(valid_s, h, NEG_S)

            dirbyte = (
                src
                | jnp.where(ce1, CONT_E1, 0)
                | jnp.where(cf1, CONT_F1, 0)
                | jnp.where(ce2, CONT_E2, 0)
                | jnp.where(cf2, CONT_F2, 0)
            )
            hv = h0[:, TJ - 1 :]
            lastj = j0 + TJ - 1
            nc = (
                hv + ge1 * lastj.astype(sdt),
                hv + ge2 * lastj.astype(sdt),
                a1[:, TJ - 1 :],
                a2[:, TJ - 1 :],
            )
            return h, nf1, nf2, dirbyte, valid, nc

        def tile_body(t, carry):
            (cA_hp, cA_v1, cA_v2, cA_a1, cA_a2,
             cB_hp, cB_v1, cB_v2, cB_a1, cB_a2,
             rpA, rpB, scA, scB) = carry
            j0 = t * TJ
            jj = jt0 + j0
            jj_s = jj.astype(sdt)
            h_prev_t = hp_ref[:, pl.ds(j0, TJ)]
            f1p = f1_ref[:, pl.ds(j0, TJ)]
            f2p = f2_ref[:, pl.ds(j0, TJ)]
            n_hp = h_prev_t[:, TJ - 1 :]
            tc = t_ref[:, pl.ds(j0, TJ)]

            diagA = _shift_right(h_prev_t, cA_hp)
            hA, f1A, f2A, dirA, validA, ncA = row_step(
                i, qcA, qnA, h_prev_t, diagA, f1p, f2p,
                (cA_v1, cA_v2, cA_a1, cA_a2), j0, jj, jj_s, tc,
            )
            diagB = _shift_right(hA, cB_hp)
            hB, f1B, f2B, dirB, validB, ncB = row_step(
                iB, qcB, qnB, hA, diagB, f1A, f2A,
                (cB_v1, cB_v2, cB_a1, cB_a2), j0, jj, jj_s, tc,
            )

            dirs_ref[pl.ds(i, 2), :, pl.ds(j0, TJ)] = jnp.stack(
                [dirA, dirB]
            ).astype(jnp.int8)
            hp_ref[:, pl.ds(j0, TJ)] = hB
            f1_ref[:, pl.ds(j0, TJ)] = f1B
            f2_ref[:, pl.ds(j0, TJ)] = f2B

            if ext_book or is_global:
                hA32 = jnp.where(validA, hA.astype(jnp.int32), NEG)
                hB32 = jnp.where(validB, hB.astype(jnp.int32), NEG)
            if ext_book:
                hmA = jnp.where(validA & not_dropped, hA32, SENT)
                rpA = jnp.maximum(
                    rpA,
                    jnp.max(hmA * 2048 + (2047 - jj), axis=1, keepdims=True),
                )
                hmB = jnp.where(validB & not_dropped, hB32, SENT)
                rpB = jnp.maximum(
                    rpB,
                    jnp.max(hmB * 2048 + (2047 - jj), axis=1, keepdims=True),
                )
            if is_global:
                scA = jnp.maximum(
                    scA,
                    jnp.max(
                        jnp.where(
                            validA & (jj == n - 1) & (i == m - 1), hA32, NEG
                        ),
                        axis=1, keepdims=True,
                    ),
                )
                scB = jnp.maximum(
                    scB,
                    jnp.max(
                        jnp.where(
                            validB & (jj == n - 1) & (iB == m - 1), hB32, NEG
                        ),
                        axis=1, keepdims=True,
                    ),
                )

            return (
                n_hp, ncA[0], ncA[1], ncA[2], ncA[3],
                hA[:, TJ - 1 :], ncB[0], ncB[1], ncB[2], ncB[3],
                rpA, rpB, scA, scB,
            )

        out = jax.lax.fori_loop(
            t_lo, t_hi, tile_body,
            (cA[0], cA[1], cA[2], cA[3], cA[4],
             cB[0], cB[1], cB[2], cB[3], cB[4],
             rp0, rp0, sc0, sc0),
        )
        rpA, rpB, scA, scB = out[10], out[11], out[12], out[13]
        book_update(i, rpA, scA)
        if ext_book and zdrop >= 0:
            # problems dropped by row i's update must not contribute row
            # i+1's maxima (drop state is per problem)
            drop2 = book_ref[:, _DROP : _DROP + 1] != 0
            rpB = jnp.where(drop2, jnp.full_like(rpB, NEG), rpB)
        book_update(iB, rpB, scB)
        return 0

    fwd_row(jnp.int32(0), True)
    n_rest = m_max - 1  # rows 1 .. m_max-1 remain
    n_pairs = n_rest // 2
    jax.lax.fori_loop(
        0, n_pairs, lambda k, _: fwd_row_pair(1 + 2 * k), 0, unroll=False
    )

    @pl.when(n_rest % 2 == 1)
    def _odd_leftover():
        fwd_row(m_max - 1, False)

    import os as _os

    if _os.environ.get("MA_TPU_DP_NOTB"):  # profiling: forward only
        mout_ref[:, 0:1] = book_ref[:, _TCNT : _TCNT + 1]
        c = _SCR if is_global else _GMAX
        mout_ref[:, 1:2] = book_ref[:, c : c + 1]
        return
    # normalize the row-sentinel back to NEG for host consumers (nw.py
    # chunked extension reads lastrow_max) and the lr_ok check below
    lr_raw = book_ref[:, _LRMAX : _LRMAX + 1]
    book_ref[:, _LRMAX : _LRMAX + 1] = jnp.where(lr_raw <= SENT, NEG, lr_raw)

    # =================================================== in-kernel traceback
    if is_global:
        si = m - 1
        sj = n - 1
    else:
        # meta col 3: trace back from the LAST ROW's best cell instead of
        # the global max (the through-path of a chunked long-read
        # extension, pipeline/nw.py chunked z-drop re-alignment)
        from_last = meta_ref[:, 3:4] != 0
        lr_ok = book_ref[:, _LRMAX : _LRMAX + 1] > NEG
        si = jnp.where(
            from_last, jnp.where(lr_ok, m - 1, -1), book_ref[:, _GI : _GI + 1]
        )
        sj = jnp.where(
            from_last, book_ref[:, _LRARG : _LRARG + 1],
            book_ref[:, _GJ : _GJ + 1],
        )
    book_ref[:, _TJ : _TJ + 1] = sj
    book_ref[:, _TMODE : _TMODE + 1] = jnp.zeros((PB, 1), jnp.int32)
    book_ref[:, _TDONE : _TDONE + 1] = (si < 0).astype(jnp.int32)
    book_ref[:, _TCNT : _TCNT + 1] = jnp.zeros((PB, 1), jnp.int32)
    book_ref[:, _TREMI : _TREMI + 1] = jnp.full((PB, 1), -1, jnp.int32)
    book_ref[:, _TLAST : _TLAST + 1] = jnp.full((PB, 1), -1, jnp.int32)
    rr = jax.lax.broadcasted_iota(jnp.int32, (PB, R), 1)

    def emit(op, ln, mask):
        """Append/merge a run (stored back-to-front). op/ln/mask [PB, 1]."""
        cnt = book_ref[:, _TCNT : _TCNT + 1]
        last = book_ref[:, _TLAST : _TLAST + 1]
        mask = mask & (ln > 0)
        merge = mask & (last == op) & (cnt > 0)
        new = mask & ~merge
        over = new & (cnt >= R)
        new = new & ~over
        at_prev = rr == cnt - 1
        at_cnt = rr == cnt
        runs = runs_ref[:]
        runs = jnp.where(at_prev & merge, runs + ln * 4, runs)
        runs = jnp.where(at_cnt & new, ln * 4 + op, runs)
        runs_ref[:] = runs
        book_ref[:, _TCNT : _TCNT + 1] = cnt + new.astype(jnp.int32)
        book_ref[:, _TLAST : _TLAST + 1] = jnp.where(mask & ~over, op, last)
        book_ref[:, _TOVER : _TOVER + 1] = (
            book_ref[:, _TOVER : _TOVER + 1] | over.astype(jnp.int32)
        )

    def tb_row(carry):
        i, _ = carry
        # NOTE on the tiled forward: lanes of this row OUTSIDE the band
        # window hold stale bytes (from init or a previous grid block).
        # They are never consulted: the path only visits reachable (finite-
        # score) cells, whose recorded sources point at other reachable
        # cells, all inside the window; and the D-run stop search below
        # takes the RIGHTMOST cont-clear lane <= j — a real run always
        # terminates at its in-window gap-open cell (whose cont bit is
        # clear by construction), so garbage further left cannot win.
        row = dirs_ref[pl.ds(i, 1)][0].astype(jnp.int32)  # [PB, N]

        # reset per-row moved flags: lanes not active in this row count as
        # already moved so the inner loop skips them
        done0 = book_ref[:, _TDONE : _TDONE + 1] != 0
        act0 = ~done0 & (si >= i)
        book_ref[:, _TMOVED : _TMOVED + 1] = jnp.where(act0, 0, 1)

        def inner(c):
            it, _ = c
            j = book_ref[:, _TJ : _TJ + 1]
            mode = book_ref[:, _TMODE : _TMODE + 1]
            done = book_ref[:, _TDONE : _TDONE + 1] != 0
            moved0 = book_ref[:, _TMOVED : _TMOVED + 1] != 0
            in_row = ~done & ~moved0
            byte = _sel_lane(row, jnp.clip(j, 0, N - 1))
            src = byte & SRC_MASK

            # F continuation (entered this row in F mode)
            is_f = in_row & ((mode == _TB_F1) | (mode == _TB_F2))
            fbit = jnp.where(mode == _TB_F1, CONT_F1, CONT_F2)
            f_cont = (byte & fbit) != 0

            is_h = in_row & (mode == _TB_H)
            h_m = is_h & (src == SRC_DIAG)
            h_f1 = is_h & (src == SRC_F1)
            h_f2 = is_h & (src == SRC_F2)
            h_e1 = is_h & (src == SRC_E1)
            h_e2 = is_h & (src == SRC_E2)
            h_f = h_f1 | h_f2
            h_e = h_e1 | h_e2

            # --- emit I for F-continuation and fresh F, M for diag
            emit(jnp.full((PB, 1), OP_I, jnp.int32), jnp.ones((PB, 1), jnp.int32),
                 is_f | h_f)
            emit(jnp.full((PB, 1), OP_M, jnp.int32), jnp.ones((PB, 1), jnp.int32),
                 h_m)
            # --- D runs: consume cells j..stop where stop = rightmost
            # cont-clear column <= j (or column 0 if none). The two wide
            # cummax chains service ONE cell per problem, and most rows
            # take no deletion at all — compute them only when some lane
            # actually needs one this iteration (the common path is ~3
            # wide ops per row instead of ~23).
            def _with_runs(_):
                c1 = _cummax_lanes(jnp.where((row & CONT_E1) == 0, jj, -1))
                c2 = _cummax_lanes(jnp.where((row & CONT_E2) == 0, jj, -1))
                jc = jnp.clip(j, 0, N - 1)
                return jnp.where(
                    h_e1, _sel_lane(c1, jc), _sel_lane(c2, jc)
                )

            cpos = jax.lax.cond(
                jnp.sum(h_e.astype(jnp.int32)) > 0,
                _with_runs,
                lambda _: jnp.zeros((PB, 1), jnp.int32),
                None,
            )
            run_end = jnp.where(cpos >= 0, cpos, 0)
            d_len = jnp.where(cpos >= 0, j - run_end + 1, j + 1)
            emit(jnp.full((PB, 1), OP_D, jnp.int32), jnp.where(h_e, d_len, 0), h_e)

            # --- state updates
            nj = jnp.where(h_m, j - 1, j)
            nj = jnp.where(h_e, jnp.where(cpos >= 0, run_end - 1, -1), nj)
            # F: new mode carries to the next row; fresh F checks its own bit
            # (bit select in int32 — bool-valued select_n does not lower)
            fresh_cont = (byte & jnp.where(h_f1, CONT_F1, CONT_F2)) != 0
            nmode = jnp.where(is_f, jnp.where(f_cont, mode, _TB_H), mode)
            nmode = jnp.where(h_f1 & fresh_cont, _TB_F1, nmode)
            nmode = jnp.where(h_f2 & fresh_cont, _TB_F2, nmode)
            nmode = jnp.where((h_f1 | h_f2) & ~fresh_cont, _TB_H, nmode)
            nmode = jnp.where(h_m | h_e, _TB_H, nmode)

            moved = is_f | h_m | h_f  # leaves the row (i decrements)
            # done within this row: a D run walked past column 0
            row_done = in_row & h_e & (nj < 0)
            # moved off the grid: ni = i-1 < 0 handled by loop end; nj < 0
            # with rows left means a leading I residual of (i-1)+1
            move_off_j = in_row & moved & (nj < 0)
            book_ref[:, _TJ : _TJ + 1] = jnp.where(in_row, nj, j)
            book_ref[:, _TMODE : _TMODE + 1] = jnp.where(in_row, nmode, mode)
            remi = book_ref[:, _TREMI : _TREMI + 1]
            remi = jnp.where(row_done, i, remi)
            remi = jnp.where(move_off_j, i - 1, remi)
            book_ref[:, _TREMI : _TREMI + 1] = remi
            book_ref[:, _TDONE : _TDONE + 1] = (
                done | row_done | move_off_j
            ).astype(jnp.int32)
            book_ref[:, _TMOVED : _TMOVED + 1] = (
                moved0 | (in_row & moved)
            ).astype(jnp.int32)
            still = in_row & ~moved & ~row_done
            return it + 1, jnp.sum(still.astype(jnp.int32)) > 0

        jax.lax.while_loop(
            lambda c: c[1] & (c[0] < N + 2),
            inner,
            (jnp.int32(0), jnp.asarray(True)),
        )
        return i - 1, jnp.int32(0)

    jax.lax.while_loop(
        lambda c: c[0] >= 0, tb_row, (m_max - 1, jnp.int32(0))
    )

    # lanes that finished by walking off the query rows: rem_j = final j
    remi = book_ref[:, _TREMI : _TREMI + 1]
    j_fin = book_ref[:, _TJ : _TJ + 1]
    started = si >= 0
    remj = jnp.where(started & (remi < 0) & (j_fin >= 0), j_fin, -1)
    # residual leading gaps (forward order: D then I) — stored back-to-front,
    # so append I first, then D
    emit(jnp.full((PB, 1), OP_I, jnp.int32), remi + 1, remi >= 0)
    emit(jnp.full((PB, 1), OP_D, jnp.int32), remj + 1, remj >= 0)

    mout_ref[:, 0:1] = book_ref[:, _TCNT : _TCNT + 1]
    if is_global:
        mout_ref[:, 1:2] = book_ref[:, _SCR : _SCR + 1]
    else:
        mout_ref[:, 1:2] = book_ref[:, _GMAX : _GMAX + 1]
    mout_ref[:, 2:3] = book_ref[:, _GI : _GI + 1]
    mout_ref[:, 3:4] = book_ref[:, _GJ : _GJ + 1]
    mout_ref[:, 4:5] = book_ref[:, _DROP : _DROP + 1]
    mout_ref[:, 5:6] = book_ref[:, _TOVER : _TOVER + 1]
    mout_ref[:, 6:7] = book_ref[:, _LRMAX : _LRMAX + 1]
    mout_ref[:, 7:8] = book_ref[:, _LRARG : _LRARG + 1]


def _kernel_v2(q_ref, t_ref, meta_ref, runs_ref, mout_ref, dirs_hbm, st_ref,
               dbuf_ref, book_ref, sem, *, M: int, N: int, R: int, TJ: int,
               params: DPParams, zdrop: int, is_global: bool):
    """Access-minimized variant of _kernel (the v5 speed-of-light rework).

    On-chip measurement (profiling notes, round 5): a Mosaic VMEM ref
    load/store costs ~0.7-3.5 us essentially independent of size, while
    register-resident vector ops cost ~15 ns — the r4 kernel's ~22 ref
    touches per row put it at ~16 us/row regardless of tile width. This
    kernel restructures the MEMORY choreography, not the math:

    * per-tile state is ONE interleaved VMEM ref ([n_tiles, PB, 4*TJ]:
      h | f1 | f2 | target codes) — 1 load + 1 store per tile instead of 7;
    * all per-row bookkeeping (z-drop state, running max/argmax, last-row
      cell) lives in the row loop's CARRY, not in a ref — zero accesses;
    * the direction rows stream to an HBM-resident OUTPUT (Mosaic rejects
      non-VMEM scratch) through a double-buffered async DMA (write at row
      i, wait at row i+2), freeing VMEM so PB grows 8-16x — the grid
      shrinks from 16 blocks to 1-2, dividing the number of row iterations
      (and their fixed costs) by the same factor;
    * the traceback DMAs rows back HBM->VMEM with a 1-row prefetch.

    Tiles are STATIC (n_tiles <= 8, unrolled in python) — no band-window
    skipping; the dynamically-windowed _kernel remains the path for
    band << N shapes (long-read gap windows)."""
    PB = t_ref.shape[0]
    go1, ge1 = params.gap_open, params.gap_extend
    go2, ge2 = params.gap_open2, params.gap_extend2
    n_tiles = N // TJ
    # dirs_hbm is the WHOLE [M, Pp, N] output (ANY-space blocks must be
    # trivial); this grid step's problem rows start at p0
    p0 = pl.program_id(0) * PB

    sdt = st_ref.dtype
    NEG_S = int(jnp.iinfo(sdt).min) // 2

    m = meta_ref[:, 0:1]
    n = meta_ref[:, 1:2]
    w = meta_ref[:, 2:3]

    def gap_cost(k):
        return jnp.maximum(-(go1 + k * ge1), -(go2 + k * ge2))

    def gap_cost_s(k):
        return gap_cost(k).astype(sdt)

    def splat_s(v32):
        return jnp.broadcast_to(v32, (PB, 1)).astype(sdt)

    # ---- init ----
    for t in range(n_tiles):
        st_ref[t] = jnp.concatenate(
            [
                jnp.full((PB, 3 * TJ), NEG_S, sdt),
                t_ref[:, t * TJ : (t + 1) * TJ].astype(sdt),
            ],
            axis=1,
        )
    book_ref[:] = jnp.zeros((PB, 128), jnp.int32)
    runs_ref[:] = jnp.zeros((PB, R), jnp.int32)

    m_max = jnp.max(meta_ref[:, 0:1])
    jt_base = jax.lax.broadcasted_iota(jnp.int32, (PB, TJ), 1)
    ext_book = not (is_global and zdrop < 0)

    def fwd_row(i, bk, is_first: bool):
        (dropped_i, gmax, gi, gj, gd, scr, lrmax, lrarg) = bk
        dropped = dropped_i != 0
        not_dropped = ~dropped
        slot = i % 2

        # reuse of this dbuf slot: its DMA (started at row i-2) must be done
        @pl.when(i >= 2)
        def _():
            pltpu.make_async_copy(
                dbuf_ref.at[slot], dirs_hbm.at[i - 2, pl.ds(p0, PB)], sem.at[slot]
            ).wait()

        qc = _sel_lane(q_ref[:], jnp.full((PB, 1), i, jnp.int32))
        qn = qc >= 4
        virt32 = jnp.where(i > 0, gap_cost(i), NEG_S)

        c_hp = splat_s(gap_cost(i))
        c_v1 = splat_s(virt32 - ge1)
        c_v2 = splat_s(virt32 - ge2)
        c_a1 = splat_s(NEG_S)
        c_a2 = splat_s(NEG_S)
        rowpack = jnp.full((PB, 1), NEG, jnp.int32)
        scrrun = jnp.full((PB, 1), NEG, jnp.int32)

        for t in range(n_tiles):  # static unroll
            j0 = t * TJ
            jj = jt_base + j0
            jj_s = jj.astype(sdt)
            x = st_ref[t]  # ONE [PB, 4TJ] load: h | f1 | f2 | t-codes
            h_prev_t = x[:, :TJ]
            f1p = x[:, TJ : 2 * TJ]
            f2p = x[:, 2 * TJ : 3 * TJ]
            tc = x[:, 3 * TJ :].astype(jnp.int32)
            n_hp = h_prev_t[:, TJ - 1 :]

            valid = (jj < n) & (i < m) & (jnp.abs(i - jj) <= w)
            if sdt == jnp.int32:
                valid_s = valid
            else:
                n_s = n.astype(sdt)
                m_s = m.astype(sdt)
                w_s = jnp.minimum(w, 1 << 14).astype(sdt)
                i_s = jnp.broadcast_to(i, (PB, 1)).astype(sdt)
                di_s = (i - jj).astype(sdt)
                valid_s = (jj_s < n_s) & (i_s < m_s) & (jnp.abs(di_s) <= w_s)

            if is_first:
                jj_pos = jj_s > 0
                h_up = jnp.where(jj_pos, gap_cost_s(jj_s), NEG_S)
                diag = jnp.where(jj_pos, gap_cost_s(jj_s), 0)
            else:
                h_up = h_prev_t
                diag = _shift_right(h_prev_t, c_hp)

            t1 = f1p - ge1
            t2 = h_up - (go1 + ge1)
            nf1 = jnp.maximum(t1, t2)
            cf1 = t1.astype(jnp.int32) >= t2.astype(jnp.int32)
            t3 = f2p - ge2
            t4 = h_up - (go2 + ge2)
            nf2 = jnp.maximum(t3, t4)
            cf2 = t3.astype(jnp.int32) >= t4.astype(jnp.int32)

            sc32 = jnp.where(
                qn | (tc >= 4), 0,
                jnp.where(qc == tc, params.match, -params.mismatch),
            )
            hd = diag + sc32.astype(sdt)
            h0 = jnp.where(
                valid_s, jnp.maximum(hd, jnp.maximum(nf1, nf2)), NEG_S
            )

            v1 = _shift_right(h0 + ge1 * jj_s, c_v1)
            a1 = jnp.maximum(_cummax_lanes(v1), c_a1)
            e1 = a1 - go1 - ge1 * jj_s
            ce1 = (
                _shift_right(a1, c_a1).astype(jnp.int32)
                >= v1.astype(jnp.int32)
            )
            v2 = _shift_right(h0 + ge2 * jj_s, c_v2)
            a2 = jnp.maximum(_cummax_lanes(v2), c_a2)
            e2 = a2 - go2 - ge2 * jj_s
            ce2 = (
                _shift_right(a2, c_a2).astype(jnp.int32)
                >= v2.astype(jnp.int32)
            )

            h32r = hd.astype(jnp.int32)
            src = jnp.zeros((PB, TJ), jnp.int32)
            h = hd
            for cand, code in (
                (e1, SRC_E1), (nf1, SRC_F1), (e2, SRC_E2), (nf2, SRC_F2)
            ):
                c32 = cand.astype(jnp.int32)
                better = c32 > h32r
                h32r = jnp.maximum(h32r, c32)
                h = jnp.maximum(h, cand)
                src = jnp.where(better, code, src)
            h = jnp.where(valid_s, h, NEG_S)

            dirbyte = (
                src
                | jnp.where(ce1, CONT_E1, 0)
                | jnp.where(cf1, CONT_F1, 0)
                | jnp.where(ce2, CONT_E2, 0)
                | jnp.where(cf2, CONT_F2, 0)
            )
            dbuf_ref[slot, :, j0 : j0 + TJ] = dirbyte.astype(jnp.int8)
            st_ref[t, :, : 3 * TJ] = jnp.concatenate([h, nf1, nf2], axis=1)

            if ext_book or is_global:
                h32 = jnp.where(valid, h.astype(jnp.int32), NEG)
            if ext_book:
                hm = jnp.where(valid & not_dropped, h32, SENT)
                rowpack = jnp.maximum(
                    rowpack,
                    jnp.max(hm * 2048 + (2047 - jj), axis=1, keepdims=True),
                )
            if is_global:
                scrrun = jnp.maximum(
                    scrrun,
                    jnp.max(
                        jnp.where(
                            valid & (jj == n - 1) & (i == m - 1), h32, NEG
                        ),
                        axis=1, keepdims=True,
                    ),
                )

            c_hp = n_hp
            hv = h0[:, TJ - 1 :]
            lastj = j0 + TJ - 1
            c_v1 = hv + ge1 * jnp.asarray(lastj, sdt)
            c_v2 = hv + ge2 * jnp.asarray(lastj, sdt)
            c_a1 = a1[:, TJ - 1 :]
            c_a2 = a2[:, TJ - 1 :]

        # stream this row's direction bytes to HBM
        pltpu.make_async_copy(
            dbuf_ref.at[slot], dirs_hbm.at[i, pl.ds(p0, PB)], sem.at[slot]
        ).start()

        # ---- bookkeeping on the carried values ----
        if is_global:
            scr = jnp.where(scrrun > NEG, scrrun, scr)
        if ext_book:
            rmax = rowpack >> 11
            rarg = 2047 - (rowpack & 2047)
            at_last_row = i == m - 1
            lrmax = jnp.where(at_last_row, rmax, lrmax)
            lrarg = jnp.where(at_last_row, rarg, lrarg)
            upd = (
                (rmax > gmax) | ((rmax == gmax) & (gi >= 0) & (i + rarg < gd))
            ) & not_dropped & (rmax > SENT)
            ngmax = jnp.where(upd, rmax, gmax)
            ngi = jnp.where(upd, i, gi)
            ngj = jnp.where(upd, rarg, gj)
            gd = jnp.where(upd, i + rarg, gd)
            if zdrop >= 0:
                diff = jnp.abs((i - ngi) - (rarg - ngj))
                has = (i < m) & (i <= n - 1 + w) & (ngi >= 0)
                dropped = dropped | (
                    has & (ngmax - rmax > zdrop + diff * ge1)
                )
            gmax, gi, gj = ngmax, ngi, ngj
        return (dropped.astype(jnp.int32), gmax, gi, gj, gd, scr, lrmax,
                lrarg)

    bk0 = (
        jnp.zeros((PB, 1), jnp.int32),
        jnp.full((PB, 1), NEG if is_global else 0, jnp.int32),
        jnp.full((PB, 1), -1, jnp.int32),
        jnp.full((PB, 1), -1, jnp.int32),
        jnp.full((PB, 1), 2**30, jnp.int32),
        jnp.full((PB, 1), NEG, jnp.int32),
        jnp.full((PB, 1), NEG, jnp.int32),
        jnp.full((PB, 1), -1, jnp.int32),
    )
    bk = fwd_row(jnp.int32(0), bk0, True)
    bk = jax.lax.fori_loop(
        1, m_max, lambda i, b: fwd_row(i, b, False), bk, unroll=False
    )
    (dropped_i, gmax, gi, gj, gd, scr, lrmax, lrarg) = bk

    # drain the outstanding direction-row DMAs before the traceback reuses
    # the buffers
    @pl.when(m_max >= 2)
    def _():
        pltpu.make_async_copy(
            dbuf_ref.at[(m_max - 2) % 2], dirs_hbm.at[m_max - 2, pl.ds(p0, PB)],
            sem.at[(m_max - 2) % 2],
        ).wait()

    pltpu.make_async_copy(
        dbuf_ref.at[(m_max - 1) % 2], dirs_hbm.at[m_max - 1, pl.ds(p0, PB)],
        sem.at[(m_max - 1) % 2],
    ).wait()

    lrmax = jnp.where(lrmax <= SENT, NEG, lrmax)

    import os as _os

    if _os.environ.get("MA_TPU_DP_NOTB"):  # profiling: forward only
        mout_ref[:, 0:1] = jnp.zeros((PB, 1), jnp.int32)
        mout_ref[:, 1:2] = scr if is_global else gmax
        return

    # ============================== traceback (rows DMA'd back from HBM)
    if is_global:
        si = m - 1
        sj = n - 1
    else:
        from_last = meta_ref[:, 3:4] != 0
        lr_ok = lrmax > NEG
        si = jnp.where(from_last, jnp.where(lr_ok, m - 1, -1), gi)
        sj = jnp.where(from_last, lrarg, gj)
    book_ref[:, _TJ : _TJ + 1] = sj
    book_ref[:, _TMODE : _TMODE + 1] = jnp.zeros((PB, 1), jnp.int32)
    book_ref[:, _TDONE : _TDONE + 1] = (si < 0).astype(jnp.int32)
    book_ref[:, _TCNT : _TCNT + 1] = jnp.zeros((PB, 1), jnp.int32)
    book_ref[:, _TREMI : _TREMI + 1] = jnp.full((PB, 1), -1, jnp.int32)
    book_ref[:, _TLAST : _TLAST + 1] = jnp.full((PB, 1), -1, jnp.int32)
    rr = jax.lax.broadcasted_iota(jnp.int32, (PB, R), 1)
    jj = jax.lax.broadcasted_iota(jnp.int32, (PB, N), 1)

    def emit(op, ln, mask):
        cnt = book_ref[:, _TCNT : _TCNT + 1]
        last = book_ref[:, _TLAST : _TLAST + 1]
        mask = mask & (ln > 0)
        merge = mask & (last == op) & (cnt > 0)
        new = mask & ~merge
        over = new & (cnt >= R)
        new = new & ~over
        at_prev = rr == cnt - 1
        at_cnt = rr == cnt
        runs = runs_ref[:]
        runs = jnp.where(at_prev & merge, runs + ln * 4, runs)
        runs = jnp.where(at_cnt & new, ln * 4 + op, runs)
        runs_ref[:] = runs
        book_ref[:, _TCNT : _TCNT + 1] = cnt + new.astype(jnp.int32)
        book_ref[:, _TLAST : _TLAST + 1] = jnp.where(mask & ~over, op, last)
        book_ref[:, _TOVER : _TOVER + 1] = (
            book_ref[:, _TOVER : _TOVER + 1] | over.astype(jnp.int32)
        )

    # prefetch the last row
    pltpu.make_async_copy(
        dirs_hbm.at[m_max - 1, pl.ds(p0, PB)], dbuf_ref.at[(m_max - 1) % 2],
        sem.at[(m_max - 1) % 2],
    ).start()

    def tb_row(carry):
        i, _ = carry
        slot = i % 2

        @pl.when(i >= 1)
        def _():
            pltpu.make_async_copy(
                dirs_hbm.at[i - 1, pl.ds(p0, PB)], dbuf_ref.at[(i - 1) % 2],
                sem.at[(i - 1) % 2],
            ).start()

        pltpu.make_async_copy(
            dirs_hbm.at[i, pl.ds(p0, PB)], dbuf_ref.at[slot], sem.at[slot]
        ).wait()
        row = dbuf_ref[slot].astype(jnp.int32)  # [PB, N]

        done0 = book_ref[:, _TDONE : _TDONE + 1] != 0
        act0 = ~done0 & (si >= i)
        book_ref[:, _TMOVED : _TMOVED + 1] = jnp.where(act0, 0, 1)

        def inner(c):
            it, _ = c
            j = book_ref[:, _TJ : _TJ + 1]
            mode = book_ref[:, _TMODE : _TMODE + 1]
            done = book_ref[:, _TDONE : _TDONE + 1] != 0
            moved0 = book_ref[:, _TMOVED : _TMOVED + 1] != 0
            in_row = ~done & ~moved0
            byte = _sel_lane(row, jnp.clip(j, 0, N - 1))
            src = byte & SRC_MASK

            is_f = in_row & ((mode == _TB_F1) | (mode == _TB_F2))
            fbit = jnp.where(mode == _TB_F1, CONT_F1, CONT_F2)
            f_cont = (byte & fbit) != 0

            is_h = in_row & (mode == _TB_H)
            h_m = is_h & (src == SRC_DIAG)
            h_f1 = is_h & (src == SRC_F1)
            h_f2 = is_h & (src == SRC_F2)
            h_e1 = is_h & (src == SRC_E1)
            h_e2 = is_h & (src == SRC_E2)
            h_f = h_f1 | h_f2
            h_e = h_e1 | h_e2

            emit(jnp.full((PB, 1), OP_I, jnp.int32),
                 jnp.ones((PB, 1), jnp.int32), is_f | h_f)
            emit(jnp.full((PB, 1), OP_M, jnp.int32),
                 jnp.ones((PB, 1), jnp.int32), h_m)

            def _with_runs(_):
                c1 = _cummax_lanes(jnp.where((row & CONT_E1) == 0, jj, -1))
                c2 = _cummax_lanes(jnp.where((row & CONT_E2) == 0, jj, -1))
                jc = jnp.clip(j, 0, N - 1)
                return jnp.where(h_e1, _sel_lane(c1, jc), _sel_lane(c2, jc))

            cpos = jax.lax.cond(
                jnp.sum(h_e.astype(jnp.int32)) > 0,
                _with_runs,
                lambda _: jnp.zeros((PB, 1), jnp.int32),
                None,
            )
            run_end = jnp.where(cpos >= 0, cpos, 0)
            d_len = jnp.where(cpos >= 0, j - run_end + 1, j + 1)
            emit(jnp.full((PB, 1), OP_D, jnp.int32),
                 jnp.where(h_e, d_len, 0), h_e)

            nj = jnp.where(h_m, j - 1, j)
            nj = jnp.where(h_e, jnp.where(cpos >= 0, run_end - 1, -1), nj)
            fresh_cont = (byte & jnp.where(h_f1, CONT_F1, CONT_F2)) != 0
            nmode = jnp.where(is_f, jnp.where(f_cont, mode, _TB_H), mode)
            nmode = jnp.where(h_f1 & fresh_cont, _TB_F1, nmode)
            nmode = jnp.where(h_f2 & fresh_cont, _TB_F2, nmode)
            nmode = jnp.where((h_f1 | h_f2) & ~fresh_cont, _TB_H, nmode)
            nmode = jnp.where(h_m | h_e, _TB_H, nmode)

            moved = is_f | h_m | h_f
            row_done = in_row & h_e & (nj < 0)
            move_off_j = in_row & moved & (nj < 0)
            book_ref[:, _TJ : _TJ + 1] = jnp.where(in_row, nj, j)
            book_ref[:, _TMODE : _TMODE + 1] = jnp.where(in_row, nmode, mode)
            remi = book_ref[:, _TREMI : _TREMI + 1]
            remi = jnp.where(row_done, i, remi)
            remi = jnp.where(move_off_j, i - 1, remi)
            book_ref[:, _TREMI : _TREMI + 1] = remi
            book_ref[:, _TDONE : _TDONE + 1] = (
                done | row_done | move_off_j
            ).astype(jnp.int32)
            book_ref[:, _TMOVED : _TMOVED + 1] = (
                moved0 | (in_row & moved)
            ).astype(jnp.int32)
            still = in_row & ~moved & ~row_done
            return it + 1, jnp.sum(still.astype(jnp.int32)) > 0

        jax.lax.while_loop(
            lambda c: c[1] & (c[0] < N + 2),
            inner,
            (jnp.int32(0), jnp.asarray(True)),
        )
        return i - 1, jnp.int32(0)

    jax.lax.while_loop(
        lambda c: c[0] >= 0, tb_row, (m_max - 1, jnp.int32(0))
    )

    remi = book_ref[:, _TREMI : _TREMI + 1]
    j_fin = book_ref[:, _TJ : _TJ + 1]
    started = si >= 0
    remj = jnp.where(started & (remi < 0) & (j_fin >= 0), j_fin, -1)
    emit(jnp.full((PB, 1), OP_I, jnp.int32), remi + 1, remi >= 0)
    emit(jnp.full((PB, 1), OP_D, jnp.int32), remj + 1, remj >= 0)

    mout_ref[:, 0:1] = book_ref[:, _TCNT : _TCNT + 1]
    mout_ref[:, 1:2] = scr if is_global else gmax
    mout_ref[:, 2:3] = gi
    mout_ref[:, 3:4] = gj
    mout_ref[:, 4:5] = dropped_i
    mout_ref[:, 5:6] = book_ref[:, _TOVER : _TOVER + 1]
    mout_ref[:, 6:7] = lrmax
    mout_ref[:, 7:8] = lrarg


def _pick_tj_v2(N: int) -> int:
    """Static tile width for _kernel_v2 (n_tiles = N/TJ <= 8, TJ | N)."""
    if N <= 256:
        return N
    for cand in (256, 128):
        if N % cand == 0 and N // cand <= 8:
            return cand
    c = ((N // 8 + 127) // 128) * 128
    if c and N % c == 0:
        return c
    return N


def _pick_pb_v2(M: int, N: int, state_bytes: int = 4) -> int:
    """Problems per block for _kernel_v2: the interleaved state
    ([n_tiles, PB, 4*TJ]), dir-row double buffer, q/t blocks and book
    within ~10 MB VMEM (dirs live in HBM)."""
    budget = 10 * 2**20
    per_pb = 4 * N * state_bytes + 2 * N + 4 * N + 4 * M + 4 * 128 + 256
    pb = 512
    while pb > 32 and pb * per_pb > budget:
        pb //= 2
    return pb


def _pick_pb(M: int, N: int, state_bytes: int = 4) -> int:
    """Problems per block: dirs [M, PB, N] int8 + ~12 [PB, N] state planes
    within a VMEM budget; >= 32 (int8 sublane tile), <= 256.
    MA_TPU_DP_PB overrides for experiments."""
    import os as _os

    ov = int(_os.environ.get("MA_TPU_DP_PB", "0"))
    if ov:
        return ov
    budget = 10 * 2**20
    per_col = 14 * state_bytes
    pb = 256
    while pb > 32 and pb * (M * N + per_col * N) > budget:
        pb //= 2
    return pb


def _state_dtype(M: int, N: int, params: DPParams):
    """int16 state planes when the score envelope provably fits with margin
    (the static analog of kswcpp's 8/16-bit overflow check, kswcpp.h:44-129).

    OFF by default: kswcpp's narrow-lane trick is a CPU-SIMD economics —
    AVX2 doubles elements/instruction at 16 bit. The TPU VPU's 8x128 lanes
    are natively 32-bit; Mosaic (v5e) refuses i16 comparisons outright
    ("Target does not support this comparison") and i16-derived i1 masks
    cannot relayout into const/const selects, so sub-word state buys no
    throughput here — the kernel's headroom is loop structure, not lane
    width. MA_TPU_DP16=1 keeps the experiment reachable (it is cell-exact
    in interpret mode) for targets whose Mosaic lowers i16 compares."""
    import os

    if os.environ.get("MA_TPU_DP16", "0") != "1":
        return jnp.int32
    ge = max(params.gap_extend, params.gap_extend2)
    hi = M * params.match + ge * N
    lo = (
        params.gap_open + params.gap_open2 + ge * (M + N) + params.mismatch + 64
    )
    return jnp.int16 if max(hi, lo) < 14000 else jnp.int32


@functools.partial(
    jax.jit,
    static_argnames=("M", "N", "params", "zdrop", "is_global", "interpret",
                     "R"),
)
def banded_align_runs(
    q: jax.Array,  # [P, M] int32/uint8 query codes
    t: jax.Array,  # [P, N] int32/uint8 target codes
    qlen: jax.Array,  # [P]
    tlen: jax.Array,  # [P]
    band: jax.Array,  # [P]
    *,
    M: int,
    N: int,
    params: DPParams = DPParams(),
    zdrop: int = -1,
    is_global: bool = True,
    interpret: bool = False,
    tb_last=None,  # optional [P] flags: trace from the last row's best cell
    R: int = MAX_RUNS,  # per-problem run capacity (overflow lanes flagged;
    # 32 covers short-read problems, long-read 256-base chunks at ~5 percent
    # error need ~2 runs per indel event -> callers pass 96)
):
    """Fused DP + traceback. Returns (runs [P, R] int32 packed op+4*len in
    back-to-front order, meta [8, P] int32: n_runs, score, max_i, max_j,
    zdropped, run_overflow, lastrow_max, lastrow_arg)."""
    import os as _os

    P = q.shape[0]
    sdt = _state_dtype(M, N, params)
    sb = 2 if sdt == jnp.int16 else 4
    # v2 (access-minimized, dirs in HBM, big PB) measured 11.2 ms vs v1's
    # 10.2 ms on the GCUPS workload — the big-PB op planes spill to VMEM
    # and give back what the fewer ref accesses save; v1 with TJ=512 and
    # the band window stays the default. MA_TPU_DP_V2=1 re-enables v2.
    TJ2 = _pick_tj_v2(N)
    PB2 = _pick_pb_v2(M, N, sb)
    use_v2 = (
        _os.environ.get("MA_TPU_DP_V2", "0") == "1"
        and N % TJ2 == 0
        and N // TJ2 <= 8
        and PB2 >= 32
    )
    PB = min(
        PB2 if use_v2 else _pick_pb(M, N, sb), max(32, P)
    )
    Pp = ((P + PB - 1) // PB) * PB
    pad = Pp - P

    def padp(a, fill=0):
        a = jnp.asarray(a)
        if pad:
            a = jnp.concatenate(
                [a, jnp.full((pad,) + a.shape[1:], fill, a.dtype)], axis=0
            )
        return a

    q = padp(jnp.asarray(q, jnp.int32), 4)
    t = padp(jnp.asarray(t, jnp.int32), 4)
    if tb_last is None:
        tb_last = jnp.zeros((P,), jnp.int32)
    meta = jnp.stack(
        [
            padp(jnp.asarray(qlen, jnp.int32), 1),
            padp(jnp.asarray(tlen, jnp.int32), 1),
            padp(jnp.asarray(band, jnp.int32), 1),
            padp(jnp.asarray(tb_last, jnp.int32), 0),
        ],
        axis=1,
    )
    meta = jnp.concatenate([meta, jnp.zeros((Pp, 4), jnp.int32)], axis=1)

    grid = (Pp // PB,)
    if use_v2:
        kern = functools.partial(
            _kernel_v2, M=M, N=N, R=R, TJ=TJ2, params=params, zdrop=zdrop,
            is_global=is_global,
        )
        scratch = [
            pltpu.VMEM((N // TJ2, PB, 4 * TJ2), sdt),  # h | f1 | f2 | t
            pltpu.VMEM((2, PB, N), jnp.int8),  # dir-row double buffer
            pltpu.VMEM((PB, 128), jnp.int32),  # book (traceback state)
            pltpu.SemaphoreType.DMA((2,)),
        ]
    else:
        kern = functools.partial(
            _kernel, M=M, N=N, R=R, params=params, zdrop=zdrop,
            is_global=is_global,
        )
        scratch = [
            pltpu.VMEM((M, PB, N), jnp.int8),  # dirs
            pltpu.VMEM((PB, N), sdt),  # h_prev
            pltpu.VMEM((PB, N), sdt),  # f1
            pltpu.VMEM((PB, N), sdt),  # f2
            pltpu.VMEM((PB, 128), jnp.int32),  # book
        ]
    out_specs = [
        pl.BlockSpec((PB, R), lambda g: (g, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((PB, 8), lambda g: (g, 0), memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((Pp, R), jnp.int32),
        jax.ShapeDtypeStruct((Pp, 8), jnp.int32),
    ]
    if use_v2:
        # the direction stream lives in an HBM-resident output (Mosaic
        # rejects non-VMEM scratch); discarded after the in-kernel traceback
        out_specs.append(pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM))
        out_shape.append(jax.ShapeDtypeStruct((M, Pp, N), jnp.int8))
    res = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((PB, M), lambda g: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((PB, N), lambda g: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((PB, 8), lambda g: (g, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=interpret,
    )(q, t, meta)
    runs, mout = res[0], res[1]
    meta_t = jnp.transpose(mout[:P]).astype(jnp.int32)  # [8, P]
    return runs[:P], meta_t


def runs_to_cigar_host(runs_row: np.ndarray, n_runs: int):
    """Decode one packed run row (back-to-front) to a forward cigar."""
    out = []
    for k in range(n_runs - 1, -1, -1):
        v = int(runs_row[k])
        out.append((v & 3, v >> 2))
    return out
