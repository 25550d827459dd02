"""Pallas TPU kernel for the banded 2-piece-affine-gap wavefront DP.

The kswcpp-equivalent hot kernel (reference: libs/kswcpp/ — SSE/AVX2
anti-diagonal DP) as a Mosaic kernel: the grid iterates anti-diagonals,
every grid step advances ALL problems of the batch 16 diagonals using pure
VPU work ([P, M] lanes), carries live in VMEM scratch across grid steps
(the TPU grid is sequential), and each step's direction bytes stream
straight to the HBM output slab — identical recurrence and direction-byte
encoding to ma_tpu.ops.dp.banded_align, verified cell-exact against it.

Measured on a v5e chip this kernel exactly matches the jitted XLA scan
(47 ms for a (512, 256, 1024) extension bucket): both are bound by the
same per-diagonal vector work, i.e. XLA already compiles the scan to a
near-roofline loop once its gathers are gone. The kernel remains the
platform for sub-int32 lanes (kswcpp's 8/16-bit trick) and for fusing
traceback in-kernel; select it with MA_TPU_DP=pallas.
"""
from __future__ import annotations

import functools
from typing import Tuple

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
    SRC_E1,
    SRC_E2,
    SRC_F1,
    SRC_F2,
    DPParams,
    DPResult,
)

NEG_INF = -(2**30)  # plain int: jnp scalars would be captured as consts


def _shift_right(x, fill):
    """x[:, i-1] with `fill` in lane 0."""
    M = x.shape[1]
    rolled = pltpu.roll(x, 1, 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(lane == 0, fill, rolled)


def _dp_kernel(
    q_ref, rtp_ref, qlen_ref, tlen_ref, band_ref,
    dirs_ref, score_ref, gmax_ref, gi_ref, gj_ref, drop_ref,
    h1, h2, e1, e2, f1, f2, gmax_s, gi_s, gj_s, scr_s, drop_s,
    *, params: DPParams, zdrop: int, is_global: bool, M: int, N: int,
    KD: int, D: int,
):
    g = pl.program_id(0)
    P = q_ref.shape[0]
    go1, ge1 = params.gap_open, params.gap_extend
    go2, ge2 = params.gap_open2, params.gap_extend2

    @pl.when(g == 0)
    def _():
        neg = jnp.full((P, M), NEG_INF, jnp.int32)
        h1[:] = neg
        h2[:] = neg
        e1[:] = neg
        e2[:] = neg
        f1[:] = neg
        f2[:] = neg
        gmax_s[:] = jnp.full(
            (P, 1), NEG_INF if is_global else 0, jnp.int32
        )
        gi_s[:] = jnp.full((P, 1), -1, jnp.int32)
        gj_s[:] = jnp.full((P, 1), -1, jnp.int32)
        scr_s[:] = jnp.full((P, 1), NEG_INF, jnp.int32)
        drop_s[:] = jnp.zeros((P, 1), jnp.int32)

    ii = jax.lax.broadcasted_iota(jnp.int32, (P, M), 1)
    m = qlen_ref[:]  # [P, 1]
    n = tlen_ref[:]
    w = band_ref[:]

    def gap_cost(k):
        return jnp.maximum(-(go1 + k * ge1), -(go2 + k * ge2)).astype(jnp.int32)

    def one_diag(kd, _):
        d = g * KD + kd
        jv = d - ii
        valid = (ii < m) & (jv >= 0) & (jv < n) & (jnp.abs(ii - jv) <= w)
        ch1 = h1[:]
        ch2 = h2[:]
        ce1v = e1[:]
        ce2v = e2[:]
        cf1v = f1[:]
        cf2v = f2[:]

        # ---- E (ref gap, from (i, j-1) on diag d-1)
        h_left = jnp.where(jv > 0, ch1, jnp.where(ii > 0, gap_cost(ii), NEG_INF))
        ne1 = jnp.maximum(h_left - (go1 + ge1), jnp.where(jv > 0, ce1v - ge1, NEG_INF))
        ne2 = jnp.maximum(h_left - (go2 + ge2), jnp.where(jv > 0, ce2v - ge2, NEG_INF))
        ce1 = jnp.where(jv > 0, ce1v - ge1, NEG_INF) >= h_left - (go1 + ge1)
        ce2 = jnp.where(jv > 0, ce2v - ge2, NEG_INF) >= h_left - (go2 + ge2)

        # ---- F (query gap, from (i-1, j) on diag d-1)
        h_up_s = _shift_right(ch1, NEG_INF)
        f1_s = _shift_right(cf1v, NEG_INF)
        f2_s = _shift_right(cf2v, NEG_INF)
        h_up = jnp.where(ii > 0, h_up_s, jnp.where(jv > 0, gap_cost(jv), NEG_INF))
        nf1 = jnp.maximum(h_up - (go1 + ge1), jnp.where(ii > 0, f1_s - ge1, NEG_INF))
        nf2 = jnp.maximum(h_up - (go2 + ge2), jnp.where(ii > 0, f2_s - ge2, NEG_INF))
        cf1 = jnp.where(ii > 0, f1_s - ge1, NEG_INF) >= h_up - (go1 + ge1)
        cf2 = jnp.where(ii > 0, f2_s - ge2, NEG_INF) >= h_up - (go2 + ge2)

        # ---- diagonal (from (i-1, j-1) on diag d-2)
        h_diag_s = _shift_right(ch2, NEG_INF)
        diag_prev = jnp.where(
            (ii > 0) & (jv > 0),
            h_diag_s,
            jnp.where((ii == 0) & (jv == 0), 0,
                      jnp.where(ii == 0, gap_cost(jv), gap_cost(ii))),
        )
        # Mosaic requires lane-dim slice starts to be 128-aligned: load an
        # aligned window and rotate by the residual offset (dynamic roll)
        start = M - 1 + N - 1 - d
        base = (start // 128) * 128
        off = start - base
        W = ((M + 127) // 128 + 1) * 128
        win = rtp_ref[:, pl.ds(base, W)]
        rolled = pltpu.roll(win, -off, 1)
        tc = rolled[:, :M]
        qc = q_ref[:]
        is_n = (qc >= 4) | (tc >= 4)
        sc = jnp.where(is_n, 0,
                       jnp.where(qc == tc, params.match, -params.mismatch)
                       ).astype(jnp.int32)
        hd = diag_prev + sc

        # ---- combine (tie order diag, E1, F1, E2, F2)
        h = hd
        src = jnp.zeros((P, M), jnp.int32)
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
        dirs_ref[kd] = dirbyte

        # ---- bookkeeping
        end_here = valid & (ii == m - 1) & (jv == n - 1)
        any_end = end_here.any(axis=1, keepdims=True)
        end_val = jnp.max(jnp.where(end_here, h, NEG_INF), axis=1, keepdims=True)
        scr_s[:] = jnp.where(any_end, end_val, scr_s[:])

        dropped = drop_s[:] > 0
        hm = jnp.where(valid & ~dropped, h, NEG_INF)
        dmax = jnp.max(hm, axis=1, keepdims=True)
        # first-max index (Mosaic argmax supports only f32): min lane of the max
        darg = jnp.min(
            jnp.where(hm == dmax, ii, 2**30), axis=1, keepdims=True
        ).astype(jnp.int32)
        upd = (dmax > gmax_s[:]) & ~dropped
        new_gi = jnp.where(upd, darg, gi_s[:])
        new_gj = jnp.where(upd, d - darg, gj_s[:])
        gmax_s[:] = jnp.where(upd, dmax, gmax_s[:])
        if zdrop >= 0:
            di = darg - new_gi
            dj = (d - darg) - new_gj
            diff = jnp.abs(di - dj)
            has = valid.any(axis=1, keepdims=True) & (new_gi >= 0)
            newly = has & (gmax_s[:] - dmax > zdrop + diff * params.gap_extend)
            drop_s[:] = jnp.where(dropped | newly, 1, 0)
        gi_s[:] = new_gi
        gj_s[:] = new_gj

        h2[:] = ch1
        h1[:] = h
        e1[:] = ne1
        e2[:] = ne2
        f1[:] = nf1
        f2[:] = nf2


        return 0

    jax.lax.fori_loop(0, KD, one_diag, 0, unroll=False)

    @pl.when(g == pl.num_programs(0) - 1)
    def _():
        score_ref[:] = scr_s[:] if is_global else gmax_s[:]
        gmax_ref[:] = gmax_s[:]
        gi_ref[:] = gi_s[:]
        gj_ref[:] = gj_s[:]
        drop_ref[:] = drop_s[:]


@functools.partial(
    jax.jit, static_argnames=("params", "zdrop", "is_global", "interpret")
)
def banded_align_pallas(
    q: jax.Array,  # [P, M] codes
    t: jax.Array,  # [P, N] codes
    qlen: jax.Array,
    tlen: jax.Array,
    band: jax.Array,
    params: DPParams = DPParams(),
    zdrop: int = -1,
    is_global: bool = True,
    interpret: bool = False,
) -> DPResult:
    """Drop-in equivalent of ma_tpu.ops.dp.banded_align (dirs come back as
    [P, D, M] like the XLA version)."""
    q = jnp.asarray(q, jnp.int32)
    t = jnp.asarray(t, jnp.int32)
    P, M = q.shape
    N = t.shape[1]
    D = M + N - 1
    # reversed-padded targets: tc[i] = t[d-i] = rtp[(M-1)+(N-1-d)+i];
    # padded so every 128-aligned window read stays in bounds
    W = ((M + 127) // 128 + 1) * 128
    base_len = (M - 1) + N + M
    total = ((base_len + W + 127) // 128) * 128
    rtp = jnp.concatenate(
        [
            jnp.full((P, M - 1), 4, t.dtype),
            t[:, ::-1],
            jnp.full((P, total - (M - 1) - N), 4, t.dtype),
        ],
        axis=1,
    )
    col = lambda x: jnp.asarray(x, jnp.int32).reshape(P, 1)
    KD = 16  # diagonals per grid step (amortizes per-step grid overhead)
    G = -(-D // KD)
    kernel = functools.partial(
        _dp_kernel, params=params, zdrop=zdrop, is_global=is_global, M=M, N=N,
        KD=KD, D=D,
    )
    out_shapes = (
        jax.ShapeDtypeStruct((G * KD, P, M), jnp.uint8),
        jax.ShapeDtypeStruct((P, 1), jnp.int32),  # score
        jax.ShapeDtypeStruct((P, 1), jnp.int32),  # gmax
        jax.ShapeDtypeStruct((P, 1), jnp.int32),  # gi
        jax.ShapeDtypeStruct((P, 1), jnp.int32),  # gj
        jax.ShapeDtypeStruct((P, 1), jnp.int32),  # dropped
    )
    scratch = [pltpu.VMEM((P, M), jnp.int32) for _ in range(6)] + [
        pltpu.VMEM((P, 1), jnp.int32) for _ in range(5)
    ]
    vec = pl.BlockSpec(memory_space=pltpu.VMEM)
    fixed = lambda shape: pl.BlockSpec(shape, lambda d: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)
    dirs, score, gmax, gi, gj, dropped = pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=[
            fixed((P, M)),
            fixed((P, rtp.shape[1])),
            fixed((P, 1)),
            fixed((P, 1)),
            fixed((P, 1)),
        ],
        out_specs=(
            pl.BlockSpec((KD, P, M), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            fixed((P, 1)),
            fixed((P, 1)),
            fixed((P, 1)),
            fixed((P, 1)),
            fixed((P, 1)),
        ),
        out_shape=out_shapes,
        scratch_shapes=scratch,
        interpret=interpret,
    )(q, rtp, col(qlen), col(tlen), col(band))
    score_v = score[:, 0] if is_global else gmax[:, 0]
    return DPResult(
        dirs=jnp.moveaxis(dirs[:D], 0, 1),
        score=score_v,
        max_i=gi[:, 0],
        max_j=gj[:, 0],
        zdropped=dropped[:, 0] > 0,
    )
