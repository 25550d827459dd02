"""Banded 2-piece affine-gap dynamic programming (the kswcpp equivalent).

TPU re-design of the reference DP kernel
(reference: libs/kswcpp/ — ksw2-style anti-diagonal banded DP with 2-piece
affine gaps and z-drop, kswcpp_core.h:1-879; scoring matrix semantics from
KswCppParam: match/mismatch over A,C,G,T and 0 vs N, kswcpp.h:44-129).

Formulation: wavefront scan over anti-diagonals d = i + j. Cell (i, j)
depends only on diagonals d-1 (gap continuations) and d-2 (match), so each
scan step is pure vector work of width M with NO intra-step dependency —
this is the same dataflow the reference vectorizes with SSE/AVX2 and maps
directly onto the TPU VPU (a Pallas version lives in dp_pallas.py).

Outputs a per-cell direction byte for host-side traceback:
    bits 0..2: source of H (0=diag/match, 1=E1, 2=F1, 3=E2, 4=F2)
    bit 3/4/5/6: E1/F1/E2/F2 continuation (gap extends rather than opens)
E gaps consume the reference (CIGAR 'D'), F gaps consume the query ('I').

i indexes the query (length m <= M), j the reference (length n <= N).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = jnp.int32(-(2**30))

# direction byte layout
SRC_MASK = 0x07
SRC_DIAG, SRC_E1, SRC_F1, SRC_E2, SRC_F2 = 0, 1, 2, 3, 4
CONT_E1, CONT_F1, CONT_E2, CONT_F2 = 0x08, 0x10, 0x20, 0x40


class DPParams(NamedTuple):
    match: int = 2
    mismatch: int = 4  # positive penalty
    gap_open: int = 4
    gap_extend: int = 2
    gap_open2: int = 24
    gap_extend2: int = 1


class DPResult(NamedTuple):
    dirs: jax.Array  # uint8 [P, M+N-1, M] direction bytes per (diagonal, i)
    score: jax.Array  # int32 [P] — global: H(m-1,n-1); extension: max-cell H
    max_i: jax.Array  # int32 [P] max cell query index (extension)
    max_j: jax.Array  # int32 [P] max cell ref index
    zdropped: jax.Array  # bool [P]


def _score_cell(qc, tc, match, mismatch):
    """Score of aligning codes qc vs tc: match/-mismatch; 0 if either is N
    (KswCppParam::fillScoringMatrix, kswcpp.h:85-96)."""
    is_n = (qc >= 4) | (tc >= 4)
    return jnp.where(is_n, 0, jnp.where(qc == tc, match, -mismatch)).astype(jnp.int32)


def banded_align(
    q: jax.Array,  # int32/uint8 [P, M] query codes
    t: jax.Array,  # int32/uint8 [P, N] ref codes
    qlen: jax.Array,  # int32 [P]
    tlen: jax.Array,  # int32 [P]
    band: jax.Array,  # int32 [P] band width w: cells with |i-j| > w skipped
    params: DPParams = DPParams(),
    zdrop: int = -1,  # <0 disables (global mode)
    is_global: bool = True,
) -> DPResult:
    """Batched banded 2-piece affine DP. See module docstring."""
    q = jnp.asarray(q, jnp.int32)
    t = jnp.asarray(t, jnp.int32)
    P, M = q.shape
    N = t.shape[1]
    D = M + N - 1
    qlen = jnp.asarray(qlen, jnp.int32)
    tlen = jnp.asarray(tlen, jnp.int32)
    band = jnp.asarray(band, jnp.int32)

    go1, ge1 = params.gap_open, params.gap_extend
    go2, ge2 = params.gap_open2, params.gap_extend2

    def gap_cost(k):  # best cost of a length-k gap (k >= 1), negative
        return jnp.maximum(-(go1 + k * ge1), -(go2 + k * ge2)).astype(jnp.int32)

    ii = jnp.arange(M, dtype=jnp.int32)  # query index lane

    def one(qv, tv, m, n, w):
        # per-diagonal target chars tv[d - i] as a contiguous dynamic slice
        # of the reversed target (gathers are slow on TPU; slices are not):
        # out[i] = tv[d-i] = rev(tv)[N-1-d+i] -> slice at (M-1) + (N-1-d)
        rtp = jnp.concatenate(
            [jnp.full((M - 1,), 4, tv.dtype), tv[::-1], jnp.full((M,), 4, tv.dtype)]
        )
        def step(carry, d):
            h1, h2, e1, e2, f1, f2, gmax, gi, gj, scr, dropped = carry
            jv = d - ii  # ref index per lane
            valid = (ii < m) & (jv >= 0) & (jv < n) & (jnp.abs(ii - jv) <= w)

            # ---- E (ref gap, from (i, j-1) on diag d-1)
            h_left = jnp.where(jv > 0, h1, jnp.where(ii > 0, gap_cost(ii), NEG_INF))
            # h_left at j==0 is virtual column H(i,-1); at i==j==0 -> 0? ksw2
            # anchors (0,0) via diag; opening from H(0,-1)=gap_cost not 0:
            ne1 = jnp.maximum(h_left - (go1 + ge1), jnp.where(jv > 0, e1 - ge1, NEG_INF))
            ne2 = jnp.maximum(h_left - (go2 + ge2), jnp.where(jv > 0, e2 - ge2, NEG_INF))
            ce1 = jnp.where(jv > 0, e1 - ge1, NEG_INF) >= h_left - (go1 + ge1)
            ce2 = jnp.where(jv > 0, e2 - ge2, NEG_INF) >= h_left - (go2 + ge2)

            # ---- F (query gap, from (i-1, j) on diag d-1)
            h_up_s = jnp.concatenate([jnp.full((1,), NEG_INF), h1[:-1]])
            f1_s = jnp.concatenate([jnp.full((1,), NEG_INF), f1[:-1]])
            f2_s = jnp.concatenate([jnp.full((1,), NEG_INF), f2[:-1]])
            h_up = jnp.where(ii > 0, h_up_s, jnp.where(jv > 0, gap_cost(jv), NEG_INF))
            nf1 = jnp.maximum(h_up - (go1 + ge1), jnp.where(ii > 0, f1_s - ge1, NEG_INF))
            nf2 = jnp.maximum(h_up - (go2 + ge2), jnp.where(ii > 0, f2_s - ge2, NEG_INF))
            cf1 = jnp.where(ii > 0, f1_s - ge1, NEG_INF) >= h_up - (go1 + ge1)
            cf2 = jnp.where(ii > 0, f2_s - ge2, NEG_INF) >= h_up - (go2 + ge2)

            # ---- diagonal (from (i-1, j-1) on diag d-2)
            h_diag_s = jnp.concatenate([jnp.full((1,), NEG_INF), h2[:-1]])
            diag_prev = jnp.where(
                (ii > 0) & (jv > 0),
                h_diag_s,
                jnp.where(
                    (ii == 0) & (jv == 0),
                    0,
                    jnp.where(ii == 0, gap_cost(jv), gap_cost(ii)),
                ),
            )
            tc = jax.lax.dynamic_slice(rtp, (M - 1 + N - 1 - d,), (M,))
            sc = _score_cell(qv, tc, params.match, params.mismatch)
            hd = diag_prev + sc

            # ---- combine (preference order on ties: diag, E1, F1, E2, F2 —
            # matches the reference's backtrack bit priority, kswcpp_core.h:68-71)
            h = hd
            src = jnp.zeros(M, jnp.int32)
            for cand, code in ((ne1, SRC_E1), (nf1, SRC_F1), (ne2, SRC_E2), (nf2, SRC_F2)):
                better = cand > h
                h = jnp.maximum(h, cand)
                src = jnp.where(better, code, src)
            h = jnp.where(valid, h, NEG_INF)

            dirbyte = (
                src
                | jnp.where(ce1, CONT_E1, 0)
                | jnp.where(cf1, CONT_F1, 0)
                | jnp.where(ce2, CONT_E2, 0)
                | jnp.where(cf2, CONT_F2, 0)
            ).astype(jnp.uint8)

            # ---- bookkeeping: global end cell / extension max / z-drop
            end_here = valid & (ii == m - 1) & (jv == n - 1)
            scr = jnp.where(jnp.any(end_here), jnp.max(jnp.where(end_here, h, NEG_INF)), scr)

            hm = jnp.where(valid & ~dropped, h, NEG_INF)
            dmax = jnp.max(hm)
            darg = jnp.argmax(hm).astype(jnp.int32)
            upd = (dmax > gmax) & ~dropped
            gmax = jnp.where(upd, dmax, gmax)
            gi = jnp.where(upd, darg, gi)
            gj = jnp.where(upd, d - darg, gj)
            if zdrop >= 0:
                di = darg - gi
                dj = (d - darg) - gj
                diff = jnp.abs(di - dj)
                has = jnp.any(valid) & (gi >= 0)
                dropped = dropped | (
                    has & (gmax - dmax > zdrop + diff.astype(jnp.int32) * ge1)
                )

            return (h, h1, ne1, ne2, nf1, nf2, gmax, gi, gj, scr, dropped), dirbyte

        init = (
            jnp.full((M,), NEG_INF),  # h1 (diag d-1)
            jnp.full((M,), NEG_INF),  # h2 (diag d-2)
            jnp.full((M,), NEG_INF),  # e1
            jnp.full((M,), NEG_INF),  # e2
            jnp.full((M,), NEG_INF),  # f1
            jnp.full((M,), NEG_INF),  # f2
            # extension mode mirrors ksw2: max starts at 0 with cell (-1,-1)
            # so an all-negative extension aligns nothing (ksw2 reset_extz)
            NEG_INF if is_global else jnp.int32(0),  # gmax
            jnp.int32(-1),
            jnp.int32(-1),
            NEG_INF,  # global score
            jnp.asarray(False),
        )
        (h, _, _, _, _, _, gmax, gi, gj, scr, dropped), dirs = jax.lax.scan(
            step, init, jnp.arange(D, dtype=jnp.int32)
        )
        return dirs, scr, gmax, gi, gj, dropped

    dirs, scr, gmax, gi, gj, dropped = jax.vmap(one)(q, t, qlen, tlen, band)
    score = scr if is_global else gmax
    return DPResult(dirs=dirs, score=score, max_i=gi, max_j=gj, zdropped=dropped)


# --------------------------------------------------------------------- host
# CIGAR op codes (SAM): 0=M 1=I 2=D
OP_M, OP_I, OP_D = 0, 1, 2
OP_NONE = 255

# traceback modes
_TB_H, _TB_E1, _TB_E2, _TB_F1, _TB_F2 = 0, 1, 2, 3, 4


def traceback_device(dirs: jax.Array, si: jax.Array, sj: jax.Array):
    """Batched on-device traceback (device analog of traceback_one).

    dirs [P, D, M] uint8, si/sj [P] start cells (si < 0 = skip problem).
    Returns (ops [P, S] uint8 emitted back-to-front with OP_NONE padding,
    n_ops [P], rem_i [P], rem_j [P]) where rem_* are the residual leading
    gap lengths (i+1 inserts, j+1 dels) to prepend on host.

    Keeping the traceback on device means the [P, D, M] direction tensor
    never leaves HBM — only O(path length) op codes are transferred.
    """
    P, D, M = dirs.shape
    N = D - M + 1
    S = M + N
    parr = jnp.arange(P)

    def step(carry, _):
        i, j, mode, done = carry
        active = ~done & (i >= 0) & (j >= 0)
        byte = dirs[parr, jnp.clip(i + j, 0, D - 1), jnp.clip(i, 0, M - 1)].astype(
            jnp.int32
        )
        src = byte & SRC_MASK
        # H mode decides which run we are in; gap modes continue their run
        e_mode = jnp.where(
            mode == _TB_H,
            jnp.where(src == SRC_E1, _TB_E1,
                      jnp.where(src == SRC_E2, _TB_E2,
                                jnp.where(src == SRC_F1, _TB_F1,
                                          jnp.where(src == SRC_F2, _TB_F2, _TB_H)))),
            mode,
        )
        is_m = e_mode == _TB_H
        is_e = (e_mode == _TB_E1) | (e_mode == _TB_E2)
        op = jnp.where(is_m, OP_M, jnp.where(is_e, OP_D, OP_I)).astype(jnp.uint8)
        op = jnp.where(active, op, jnp.uint8(OP_NONE))
        cont_bit = jnp.where(
            e_mode == _TB_E1, CONT_E1,
            jnp.where(e_mode == _TB_E2, CONT_E2,
                      jnp.where(e_mode == _TB_F1, CONT_F1, CONT_F2)),
        )
        cont = (~is_m) & ((byte & cont_bit) != 0)
        ni = jnp.where(active & (is_m | ~is_e), i - 1, i)
        nj = jnp.where(active & (is_m | is_e), j - 1, j)
        nmode = jnp.where(is_m | ~cont, _TB_H, e_mode)
        ndone = done | (~active) | (ni < 0) | (nj < 0)
        # when a gap run is mid-flight as we cross the border, the host
        # residual handles the rest; mode resets naturally
        return (ni, nj, jnp.where(active, nmode, mode), ndone), op

    si = jnp.asarray(si, jnp.int32)
    sj = jnp.asarray(sj, jnp.int32)
    done0 = si < 0
    (fi, fj, _, _), ops = jax.lax.scan(
        step, (si, sj, jnp.zeros(P, jnp.int32), done0), None, length=S
    )
    ops = jnp.moveaxis(ops, 0, 1)  # [P, S] in back-to-front emit order
    n_ops = (ops != OP_NONE).sum(axis=1).astype(jnp.int32)
    return ops, n_ops, fi, fj


import functools


@functools.partial(
    jax.jit, static_argnames=("params", "zdrop", "is_global")
)
def banded_align_traceback(
    q, t, qlen, tlen, band,
    params: DPParams = DPParams(), zdrop: int = -1, is_global: bool = True,
):
    """banded_align + on-device traceback in one XLA program.

    The [P, D, M] direction tensor stays in HBM; only op codes, counts and
    scalars are returned. Start cell: (qlen-1, tlen-1) for global mode, the
    max cell for extensions (si = -1 -> nothing aligned, empty output)."""
    import os

    kernel = os.environ.get("MA_TPU_DP", "rows")
    if kernel == "pallas":
        from ma_tpu.ops.dp_pallas import banded_align_pallas

        res = banded_align_pallas(
            q, t, qlen, tlen, band, params=params, zdrop=zdrop,
            is_global=is_global,
        )
    elif kernel == "rows":
        from ma_tpu.ops.dp_rows import banded_align_rows, traceback_device_rows

        res = banded_align_rows(q, t, qlen, tlen, band, params, zdrop, is_global)
        if is_global:
            si = jnp.asarray(qlen, jnp.int32) - 1
            sj = jnp.asarray(tlen, jnp.int32) - 1
        else:
            si, sj = res.max_i, res.max_j
        ops, n_ops, rem_i, rem_j = traceback_device_rows(res.dirs, si, sj)
        return (ops, n_ops, rem_i, rem_j, res.score, res.max_i, res.max_j,
                res.zdropped)
    else:
        res = banded_align(q, t, qlen, tlen, band, params, zdrop, is_global)
    if is_global:
        si = jnp.asarray(qlen, jnp.int32) - 1
        sj = jnp.asarray(tlen, jnp.int32) - 1
    else:
        si, sj = res.max_i, res.max_j
    ops, n_ops, rem_i, rem_j = traceback_device(res.dirs, si, sj)
    return ops, n_ops, rem_i, rem_j, res.score, res.max_i, res.max_j, res.zdropped


def pack_codes_host(arr: np.ndarray):
    """2-bit pack a [P, L] uint8 code batch + an N bitmask for upload.

    Tunnel-attached chips move ~30 MB/s host->device; shipping 1 byte per
    base dominated the DP stage, so codes go up 2-bit packed (4 bases/byte)
    with a 1-bit-per-base N sideband (codes >= 4 score 0 against anything).
    Returns (packed [P, ceil(L/4)] uint8, nmask [P, ceil(L/8)] uint8)."""
    arr = np.asarray(arr, np.uint8)
    P, L = arr.shape
    pad4 = (-L) % 4
    a = np.pad(arr, ((0, 0), (0, pad4))) if pad4 else arr
    two = (a & 3).reshape(P, -1, 4)
    packed = (
        two[:, :, 0] | (two[:, :, 1] << 2) | (two[:, :, 2] << 4)
        | (two[:, :, 3] << 6)
    ).astype(np.uint8)
    pad8 = (-L) % 8
    n = (arr >= 4).astype(np.uint8)
    n = np.pad(n, ((0, 0), (0, pad8))) if pad8 else n
    n = n.reshape(P, -1, 8)
    nmask = np.zeros(n.shape[:2], np.uint8)
    for b in range(8):
        nmask |= n[:, :, b] << b
    return packed, nmask


def unpack_codes_dev(packed: jax.Array, nmask: jax.Array, L: int) -> jax.Array:
    """Device-side inverse of pack_codes_host -> [P, L] int32 codes."""
    P = packed.shape[0]
    shifts = jnp.asarray([0, 2, 4, 6], jnp.uint8)
    codes = ((packed[:, :, None] >> shifts[None, None, :]) & 3).reshape(P, -1)[
        :, :L
    ]
    bshifts = jnp.asarray(np.arange(8), jnp.uint8)
    is_n = ((nmask[:, :, None] >> bshifts[None, None, :]) & 1).reshape(P, -1)[
        :, :L
    ]
    return jnp.where(is_n == 1, jnp.int32(4), codes.astype(jnp.int32))


@functools.partial(jax.jit, static_argnames=("M", "N", "params", "zdrop", "is_global"))
def _dp_tb_packed(buf, meta_in, M, N, params, zdrop, is_global):
    """banded_align_traceback with packed-uint8 input and stacked outputs.

    buf  [P, W] uint8: concat of (q packed, q nmask, t packed, t nmask)
    meta_in [3, P] int32: qlen, tlen, band
    Returns (ops [P, S128] uint8, meta_out [7, P] int32:
             n_ops, rem_i, rem_j, score, max_i, max_j, zdropped)."""
    q4, q8 = -(-M // 4), -(-M // 8)
    t4, t8 = -(-N // 4), -(-N // 8)
    o = 0
    qp = buf[:, o : o + q4]; o += q4
    qn = buf[:, o : o + q8]; o += q8
    tp = buf[:, o : o + t4]; o += t4
    tn = buf[:, o : o + t8]
    q = unpack_codes_dev(qp, qn, M)
    t = unpack_codes_dev(tp, tn, N)
    qlen, tlen, band = meta_in[0], meta_in[1], meta_in[2]
    ops, n_ops, rem_i, rem_j, score, max_i, max_j, zd = banded_align_traceback(
        q, t, qlen, tlen, band, params=params, zdrop=zdrop, is_global=is_global
    )
    meta_out = jnp.stack(
        [n_ops, rem_i, rem_j, score, max_i, max_j, zd.astype(jnp.int32)]
    ).astype(jnp.int32)
    return ops, meta_out



def banded_align_traceback_packed(
    qa: np.ndarray, ta: np.ndarray, qlen, tlen, band,
    params: DPParams = DPParams(), zdrop: int = -1, is_global: bool = True,
):
    """Host wrapper: pack inputs, one upload + one small download, then a
    column-sliced ops download sized by the actual longest traceback.
    Returns (ops [P, S] uint8 edit-op codes, meta [7, P] int32); callers
    run-length-encode ops themselves via rle_ops_batch — see nw.py."""
    P, M = qa.shape
    N = ta.shape[1]
    qp, qn = pack_codes_host(qa)
    tp, tn = pack_codes_host(ta)
    buf = np.concatenate([qp, qn, tp, tn], axis=1)
    # pad the upload width to a multiple of 128: misaligned trailing dims
    # transfer ~100x slower through the tunnel
    padw = (-buf.shape[1]) % 128
    if padw:
        buf = np.concatenate([buf, np.zeros((P, padw), np.uint8)], axis=1)
    meta_in = np.stack([
        np.asarray(qlen, np.int32), np.asarray(tlen, np.int32),
        np.asarray(band, np.int32),
    ])
    ops_d, meta_d = _dp_tb_packed(
        jnp.asarray(buf), jnp.asarray(meta_in), M=M, N=N, params=params,
        zdrop=zdrop, is_global=is_global,
    )
    meta = np.asarray(meta_d)
    smax = int(meta[0].max(initial=0))
    S128 = min(ops_d.shape[1], max(128, ((smax + 127) // 128) * 128))
    ops = np.asarray(ops_d[:, :S128])
    return ops, meta


def _dp_tb_desc_core(text, seqs, desc, M, N, params, zdrop, is_global):
    """banded_align_traceback with DEVICE-RESIDENT operands.

    The tunnel moves ~20-30 MB/s, so shipping per-problem query/ref windows
    (the old packed path) dominated the DP stage wall time. Here the genome
    text (folded [0,2L) codes) and the read batch are already on device; the
    host ships only an int32 descriptor per problem.

    text: uint8 [T] folded genome codes (0..4)
    seqs: uint8 [B, L] read-batch codes (padding rows are fine)
    desc: int32 [8, P]: b, q_off, q_len, q_rev, t_start, t_len, t_rev, band
    Returns (ops [P, S] uint8, meta_out [7, P] int32) like _dp_tb_packed.
    """
    q, t, q_len, t_len, band = _desc_operands(text, seqs, desc, M, N)
    ops, n_ops, rem_i, rem_j, score, max_i, max_j, zd = banded_align_traceback(
        q, t, q_len, t_len, band, params=params, zdrop=zdrop, is_global=is_global
    )
    meta_out = jnp.stack(
        [n_ops, rem_i, rem_j, score, max_i, max_j, zd.astype(jnp.int32)]
    ).astype(jnp.int32)
    return ops, meta_out


_dp_tb_desc = functools.partial(jax.jit, static_argnames=("M", "N", "params", "zdrop", "is_global"))(_dp_tb_desc_core)


def banded_align_traceback_desc(
    text_dev, seqs_dev, desc: np.ndarray, M: int, N: int,
    params: DPParams = DPParams(), zdrop: int = -1, is_global: bool = True,
):
    """Host wrapper for the descriptor path: one small int32 upload, then a
    column-sliced ops download sized by the actual longest traceback."""
    ops_d, meta_d = _dp_tb_desc(
        text_dev, seqs_dev, jnp.asarray(desc, jnp.int32), M=M, N=N,
        params=params, zdrop=zdrop, is_global=is_global,
    )
    meta = np.asarray(meta_d)
    smax = int(meta[0].max(initial=0))
    S128 = min(ops_d.shape[1], max(128, ((smax + 127) // 128) * 128))
    ops = np.asarray(ops_d[:, :S128])
    return ops, meta


MAX_RUNS = 32  # device-side run cap; rows with more runs fall back to ops


def _pack_runs_core(ops, n_ops):
    """Run-length boundaries of each traceback row, on device.

    ops [P, S] uint8 rows in back-to-front order, n_ops [P]. Returns
    (run_op [P, R] uint8, run_start [P, R] int32, n_runs [P]) with runs in
    the STORED (reversed) order — a row's full CIGAR usually compresses to
    a handful of runs, so downloading boundaries instead of the [P, S]
    byte matrix shrinks the d2h traffic ~S/R (the tunnel moves ~30 MB/s).
    """
    P, S = ops.shape
    jj = jnp.arange(S, dtype=jnp.int32)[None, :]
    valid = jj < n_ops[:, None]
    prev = jnp.concatenate([jnp.full((P, 1), 255, ops.dtype), ops[:, :-1]], axis=1)
    ch = valid & ((ops != prev) | (jj == 0))
    rid = jnp.cumsum(ch.astype(jnp.int32), axis=1) - 1
    n_runs = jnp.where(n_ops > 0, rid[:, -1] + 1, 0)
    flat = (
        jnp.arange(P, dtype=jnp.int32)[:, None] * MAX_RUNS
        + jnp.where(ch & (rid < MAX_RUNS), rid, P * MAX_RUNS)
    ).reshape(-1)
    run_start = (
        jnp.zeros(P * MAX_RUNS, jnp.int32)
        .at[flat].set(jnp.broadcast_to(jj, (P, S)).reshape(-1), mode="drop")
        .reshape(P, MAX_RUNS)
    )
    run_op = (
        jnp.zeros(P * MAX_RUNS, jnp.uint8)
        .at[flat].set(ops.reshape(-1), mode="drop")
        .reshape(P, MAX_RUNS)
    )
    return run_op, run_start, n_runs


@functools.partial(
    jax.jit, static_argnames=("M", "N", "params", "zdrop", "is_global")
)
def _dp_tb_desc_runs(text, seqs, desc, M, N, params, zdrop, is_global):
    """_dp_tb_desc plus device-side run packing (see _pack_runs_core)."""
    ops, meta_out = _dp_tb_desc_core(
        text, seqs, desc, M, N, params, zdrop, is_global
    )
    run_op, run_start, n_runs = _pack_runs_core(ops, meta_out[0])
    return ops, meta_out, run_op, run_start, n_runs


def _desc_operands(text, seqs, desc, M, N):
    """Materialize [P, M] query / [P, N] target code windows from int32
    descriptors against the device-resident genome text and read batch
    (shared by the split and fused DP paths; see _dp_tb_desc_core)."""
    b, q_off, q_len, q_rev, t_start, t_len, t_rev, band = desc
    L = seqs.shape[1]
    T = text.shape[0]
    mi = jnp.arange(M, dtype=jnp.int32)[None, :]
    qidx = jnp.where(
        q_rev[:, None] == 1,
        q_off[:, None] + q_len[:, None] - 1 - mi,
        q_off[:, None] + mi,
    )
    qflat = (b[:, None] * L + jnp.clip(qidx, 0, L - 1)).reshape(-1)
    q = seqs.reshape(-1)[qflat].reshape(-1, M)
    q = jnp.where(mi < q_len[:, None], q, jnp.uint8(4)).astype(jnp.int32)
    nj = jnp.arange(N, dtype=jnp.int32)[None, :]
    tidx = jnp.where(
        t_rev[:, None] == 1,
        t_start[:, None] + t_len[:, None] - 1 - nj,
        t_start[:, None] + nj,
    )
    t = text[jnp.clip(tidx, 0, T - 1)]
    t = jnp.where(nj < t_len[:, None], t, jnp.uint8(4)).astype(jnp.int32)
    return q, t, q_len, t_len, band


RUNS_HEAD = 12  # runs shipped in the combined first download per problem


@functools.partial(
    jax.jit,
    static_argnames=("M", "N", "params", "zdrop", "is_global", "interpret"),
)
def _dp_desc_runs_fused(text, seqs, desc, M, N, params, zdrop, is_global,
                        interpret=False, tb_last=None):
    """Descriptor-mode DP through the fused Pallas kernel (ops/dp_fused.py):
    forward + traceback on-chip, only packed runs + meta leave the device.

    Returns (comb [8 + RUNS_HEAD, P] int16, runs_t [R, P] int32). comb rows
    0-7 are the meta (n_runs, score, max_i, max_j, zdropped, overflow, 0, 0)
    and rows 8.. the first RUNS_HEAD packed runs — ONE small int16 download
    covers the common case (the tunnel is round-trip-bound: each separate
    np.asarray costs ~15 ms of latency); rows with more runs fall back to a
    slice of the full int32 runs_t."""
    from ma_tpu.ops.dp_fused import banded_align_runs

    # no TPU -> Pallas interpret mode (CPU tests of the fused path)
    interpret = interpret or jax.default_backend() == "cpu"
    q, t, q_len, t_len, band = _desc_operands(text, seqs, desc, M, N)
    # run capacity scales with the query bucket: 256-base problems on noisy
    # long reads carry ~2 runs per indel event (5% error ~ 26 events), so
    # R=32 overflowed ~12 problems per 32-read batch into the host fallback
    R = 32 if M <= 64 else 96
    runs, meta = banded_align_runs(
        q, t, q_len, t_len, band, M=M, N=N, params=params, zdrop=zdrop,
        is_global=is_global, interpret=interpret, tb_last=tb_last, R=R,
    )
    runs_t = jnp.transpose(runs)
    # packed run values are <= 4*(M+N)+3 and meta fields are tiny once
    # clipped, so int16 halves the transfer
    comb = jnp.concatenate(
        [jnp.clip(meta, -32768, 32767), runs_t[:RUNS_HEAD]], axis=0
    ).astype(jnp.int16)
    return comb, runs_t


def packed_runs_to_cigars(runs_t: np.ndarray, n_runs: np.ndarray):
    """Decode downloaded packed runs ([R', P] back-to-front, op+4*len) into
    forward-order cigars. Rows with n_runs > the downloaded prefix (run
    overflow) return None — caller falls back per problem."""
    Rp = runs_t.shape[0]
    out = []
    for p in range(len(n_runs)):
        nr = int(n_runs[p])
        if nr > Rp:
            out.append(None)
            continue
        cigar = []
        for k in range(nr - 1, -1, -1):
            v = int(runs_t[k, p])
            cigar.append((v & 3, v >> 2))
        out.append(cigar)
    return out


def runs_to_cigars(run_op, run_start, n_ops, n_runs, rem_i, rem_j):
    """Host: expand downloaded run boundaries to forward-order cigars,
    exactly matching rle_ops_batch (residual D/I prefix, adjacent-op merge).
    Rows with n_runs > MAX_RUNS return None (caller falls back to the full
    ops row)."""
    P = run_op.shape[0]
    out = []
    for p in range(P):
        nr = int(n_runs[p])
        if nr > MAX_RUNS:
            out.append(None)
            continue
        cigar: list = []
        if rem_j[p] >= 0:
            cigar.append((OP_D, int(rem_j[p]) + 1))
        if rem_i[p] >= 0:
            cigar.append((OP_I, int(rem_i[p]) + 1))
        total = int(n_ops[p])
        if nr and total:
            starts = run_start[p]
            for r in range(nr - 1, -1, -1):  # stored order is back-to-front
                end = total if r == nr - 1 else int(starts[r + 1])
                op, ln = int(run_op[p, r]), end - int(starts[r])
                if cigar and cigar[-1][0] == op:
                    cigar[-1] = (op, cigar[-1][1] + ln)
                else:
                    cigar.append((op, ln))
        out.append([c for c in cigar if c[1] > 0])
    return out


def rle_ops_batch(ops: np.ndarray, n_ops: np.ndarray, rem_i: np.ndarray,
                  rem_j: np.ndarray):
    """Vectorized host RLE of a whole traceback batch.

    ops [P, S] uint8 back-to-front rows, n_ops/rem_i/rem_j [P].
    Returns a list of P cigars ([(op, len)] forward order) — one numpy pass
    over the batch instead of a Python loop per problem (the per-problem
    rle_ops dominated wall time at ~10k problems per read batch).
    """
    P, S = ops.shape
    n_ops = np.asarray(n_ops, np.int64)
    # forward order: row p is ops[p, :n[p]][::-1] -> gather at n-1-j, clip
    j = np.arange(S, dtype=np.int64)
    idx = np.clip(n_ops[:, None] - 1 - j[None, :], 0, S - 1)
    fwd = np.take_along_axis(ops, idx, axis=1)
    valid = j[None, :] < n_ops[:, None]
    fwd = np.where(valid, fwd, OP_NONE)
    # run starts: first valid col, or op change while valid
    start = valid & ((j[None, :] == 0) | (fwd != np.roll(fwd, 1, axis=1)))
    rp, rj = np.nonzero(start)
    run_op = fwd[rp, rj]
    # run end = next start in same row or n_ops[row]
    next_start = np.empty(len(rp), np.int64)
    next_start[:-1] = np.where(rp[:-1] == rp[1:], rj[1:], n_ops[rp[:-1]])
    if len(rp):
        next_start[-1] = n_ops[rp[-1]]
    run_len = next_start - rj
    # split into per-problem lists
    row_bounds = np.searchsorted(rp, np.arange(P + 1))
    cigars: list[list[tuple[int, int]]] = []
    rem_i = np.asarray(rem_i)
    rem_j = np.asarray(rem_j)
    for p in range(P):
        cigar: list[tuple[int, int]] = []
        if rem_j[p] >= 0:
            cigar.append((OP_D, int(rem_j[p]) + 1))
        if rem_i[p] >= 0:
            cigar.append((OP_I, int(rem_i[p]) + 1))
        s, e = row_bounds[p], row_bounds[p + 1]
        for k in range(s, e):
            op, ln = int(run_op[k]), int(run_len[k])
            if cigar and cigar[-1][0] == op:
                cigar[-1] = (op, cigar[-1][1] + ln)
            else:
                cigar.append((op, ln))
        cigars.append([c for c in cigar if c[1] > 0])
    return cigars


def rle_ops(ops_row: np.ndarray, n: int, rem_i: int, rem_j: int):
    """Host: reverse + run-length encode a device traceback row into
    [(op, len)] forward order, prepending residual leading gaps."""
    ops = ops_row[:n][::-1]
    cigar: list[tuple[int, int]] = []
    # host traceback appends I then D back-to-front -> forward order D, I
    if rem_j >= 0:
        cigar.append((OP_D, rem_j + 1))
    if rem_i >= 0:
        cigar.append((OP_I, rem_i + 1))
    if n:
        change = np.flatnonzero(ops[1:] != ops[:-1]) + 1
        bounds = np.concatenate(([0], change, [len(ops)]))
        for s, e in zip(bounds[:-1], bounds[1:]):
            op, ln = int(ops[s]), int(e - s)
            if cigar and cigar[-1][0] == op:
                cigar[-1] = (op, cigar[-1][1] + ln)
            else:
                cigar.append((op, ln))
    return [c for c in cigar if c[1] > 0]


def traceback_one(dirs: np.ndarray, si: int, sj: int) -> list[tuple[int, int]]:
    """Host traceback from cell (si, sj) back to (0, 0)-anchored start.

    dirs: [D, M] direction bytes for one problem. Returns CIGAR as
    [(op, length)] in forward order. Leading gaps (paths entering the
    virtual row/column) are emitted as leading D/I runs.
    """
    ops: list[int] = []
    i, j = si, sj
    while i >= 0 and j >= 0:
        byte = int(dirs[i + j, i])
        src = byte & SRC_MASK
        if src == SRC_DIAG:
            ops.append(OP_M)
            i -= 1
            j -= 1
        elif src in (SRC_E1, SRC_E2):
            cont_bit = CONT_E1 if src == SRC_E1 else CONT_E2
            while j >= 0:
                byte = int(dirs[i + j, i])
                ops.append(OP_D)
                cont = byte & cont_bit
                j -= 1
                if not cont:
                    break
        else:  # F1 / F2
            cont_bit = CONT_F1 if src == SRC_F1 else CONT_F2
            while i >= 0:
                byte = int(dirs[i + j, i])
                ops.append(OP_I)
                cont = byte & cont_bit
                i -= 1
                if not cont:
                    break
    # leading gaps through the virtual row/column
    if i >= 0:
        ops.extend([OP_I] * (i + 1))
    if j >= 0:
        ops.extend([OP_D] * (j + 1))
    ops.reverse()
    # run-length encode
    cigar: list[tuple[int, int]] = []
    for op in ops:
        if cigar and cigar[-1][0] == op:
            cigar[-1] = (op, cigar[-1][1] + 1)
        else:
            cigar.append((op, 1))
    return cigar


def cigar_score(
    cigar, q: np.ndarray, t: np.ndarray, params: DPParams = DPParams()
) -> int:
    """Recompute the DP score of a CIGAR (test helper)."""
    s, i, j = 0, 0, 0
    for op, ln in cigar:
        if op == OP_M:
            for k in range(ln):
                if q[i + k] >= 4 or t[j + k] >= 4:
                    pass  # N scores 0
                elif q[i + k] == t[j + k]:
                    s += params.match
                else:
                    s -= params.mismatch
            i += ln
            j += ln
        elif op == OP_I:
            s -= min(params.gap_open + ln * params.gap_extend,
                     params.gap_open2 + ln * params.gap_extend2)
            i += ln
        else:
            s -= min(params.gap_open + ln * params.gap_extend,
                     params.gap_open2 + ln * params.gap_extend2)
            j += ln
    return s


def nw_alignment(q: np.ndarray, t: np.ndarray, params: DPParams = DPParams()):
    """Plain global alignment of two sequences -> (score, cigar) — the
    NWAlignment module's role (needlemanWunsch.h:131-156). Unbanded
    (band = max(len)) single-problem convenience wrapper."""
    q = np.asarray(q, np.uint8)
    t = np.asarray(t, np.uint8)
    M, N = max(len(q), 1), max(len(t), 1)
    band = max(M, N)
    ops, n_ops, rem_i, rem_j, score, _mi, _mj, _zd = banded_align_traceback(
        jnp.asarray(q[None] if len(q) else np.full((1, 1), 4, np.uint8)),
        jnp.asarray(t[None] if len(t) else np.full((1, 1), 4, np.uint8)),
        jnp.asarray([len(q) or 1], jnp.int32),
        jnp.asarray([len(t) or 1], jnp.int32),
        jnp.asarray([band], jnp.int32),
        params=params, zdrop=-1, is_global=True,
    )
    cigar = rle_ops(np.asarray(ops)[0], int(n_ops[0]), int(rem_i[0]),
                    int(rem_j[0]))
    return int(score[0]), cigar
