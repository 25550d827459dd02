"""Row-sweep banded 2-piece affine-gap DP (the fast default kernel).

Same recurrences and boundary conventions as the anti-diagonal kernel in
ma_tpu/ops/dp.py (itself the kswcpp equivalent — reference:
libs/kswcpp/inc/kswcpp_core.h:1-879), but swept ROW by row over the query:

* F gaps (query gaps) carry row-to-row exactly like the classic DP.
* E gaps (ref gaps) within a row are a max-plus prefix over the row:
      E_p(i,j) = max_{k<j} ( H~(i,k) - o_p - e_p (j-k) )
               = cummax_k ( H~(i,k) + e_p k ) - o_p - e_p j
  where H~ = max(diag, F1, F2) EXCLUDES same-row E contributions. Opening a
  gap from a cell whose H came from another same-row gap is always dominated
  by extending the direct gap (each piece opens once; o_p > 0 and
  e1 > e2 make every mixed split strictly worse), so scores are EXACT —
  equal to the sequential recurrence for every cell that can win.
* Direction bytes use the same bit layout as ops/dp.py and are
  self-consistent with the scan values, so tracebacks yield score-identical
  (tie-wise possibly different) CIGARs.

Why: the anti-diagonal sweep runs M+N-1 sequential steps; read-end
extension problems have tiny query overhangs (m <= 64) against ~band-sized
ref windows (n ~ 520), so it burned 1279 steps where this kernel needs m.
Max-cell tie-breaks replicate the anti-diagonal order (smaller i+j, then
smaller i). Z-drop is checked per ROW (ksw2's ksw_extz row variant) instead
of per anti-diagonal — trigger points can differ slightly on dropped
extensions; scores of undropped alignments are identical.

Direction tensor layout: [P, M, N] (row-major per problem), traced back by
traceback_device_rows.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ma_tpu.ops.dp import (
    CONT_E1,
    CONT_E2,
    CONT_F1,
    CONT_F2,
    DPParams,
    NEG_INF,
    OP_D,
    OP_I,
    OP_M,
    OP_NONE,
    SRC_DIAG,
    SRC_E1,
    SRC_E2,
    SRC_F1,
    SRC_F2,
    SRC_MASK,
    _score_cell,
)


class RowDPResult(NamedTuple):
    dirs: jax.Array  # uint8 [P, M, N] direction bytes per (i, j)
    score: jax.Array  # int32 [P]
    max_i: jax.Array  # int32 [P]
    max_j: jax.Array  # int32 [P]
    zdropped: jax.Array  # bool [P]


def banded_align_rows(
    q: jax.Array,  # [P, M] query codes
    t: jax.Array,  # [P, N] ref codes
    qlen: jax.Array,  # int32 [P]
    tlen: jax.Array,  # int32 [P]
    band: jax.Array,  # int32 [P]
    params: DPParams = DPParams(),
    zdrop: int = -1,
    is_global: bool = True,
) -> RowDPResult:
    q = jnp.asarray(q, jnp.int32)
    t = jnp.asarray(t, jnp.int32)
    P, M = q.shape
    N = t.shape[1]
    qlen = jnp.asarray(qlen, jnp.int32)
    tlen = jnp.asarray(tlen, jnp.int32)
    band = jnp.asarray(band, jnp.int32)
    go1, ge1 = params.gap_open, params.gap_extend
    go2, ge2 = params.gap_open2, params.gap_extend2

    def gap_cost(k):  # best cost of a length-k gap (k >= 1), negative
        return jnp.maximum(-(go1 + k * ge1), -(go2 + k * ge2)).astype(jnp.int32)

    jj = jnp.arange(N, dtype=jnp.int32)

    def one(qv, tv, m, n, w):
        def step(carry, i):
            h_prev, f1p, f2p, gmax, gi, gj, gd, scr, dropped = carry
            valid = (jj < n) & (i < m) & (jnp.abs(i - jj) <= w)

            # ---- F (query gap, from row i-1); boundary row i==0 uses the
            # virtual h_up = gc(j) for j>0 (dp.py step: h_up branch)
            h_up = jnp.where(
                i == 0, jnp.where(jj > 0, gap_cost(jj), NEG_INF), h_prev
            )
            nf1 = jnp.maximum(h_up - (go1 + ge1), f1p - ge1)
            nf2 = jnp.maximum(h_up - (go2 + ge2), f2p - ge2)
            cf1 = f1p - ge1 >= h_up - (go1 + ge1)
            cf2 = f2p - ge2 >= h_up - (go2 + ge2)

            # ---- diagonal
            h_prev_r = jnp.concatenate([jnp.full((1,), NEG_INF), h_prev[:-1]])
            diag = jnp.where(
                i == 0,
                jnp.where(jj == 0, 0, gap_cost(jj)),
                jnp.where(jj > 0, h_prev_r, gap_cost(i)),
            )
            sc = _score_cell(qv[i], tv, params.match, params.mismatch)
            hd = diag + sc

            # ---- H~ (no same-row E) and the E prefix scans
            h0 = jnp.where(valid, jnp.maximum(hd, jnp.maximum(nf1, nf2)), NEG_INF)
            virt = jnp.where(i > 0, gap_cost(i), NEG_INF)  # H(i,-1)

            # e_p(j) = max(virt - ge, max_{k<j}(h0[k] + ge k)) - go - ge j
            v1 = jnp.concatenate([(virt - ge1)[None], (h0 + ge1 * jj)[:-1]])
            e1 = jax.lax.cummax(v1) - go1 - ge1 * jj
            v2 = jnp.concatenate([(virt - ge2)[None], (h0 + ge2 * jj)[:-1]])
            e2 = jax.lax.cummax(v2) - go2 - ge2 * jj

            # scan-consistent continuation bits:
            # ce_p(j) = e_p(j-1) - ge >= open0(j) where open0(j) is the
            # opening candidate at j (h0[j-1] for j>0, virt at j=0)
            open_src = jnp.concatenate([virt[None], h0[:-1]])
            ce1 = (
                jnp.concatenate([jnp.full((1,), NEG_INF), e1[:-1]]) - ge1
                >= open_src - (go1 + ge1)
            )
            ce2 = (
                jnp.concatenate([jnp.full((1,), NEG_INF), e2[:-1]]) - ge2
                >= open_src - (go2 + ge2)
            )

            # ---- combine (tie preference diag, E1, F1, E2, F2 — dp.py order)
            h = hd
            src = jnp.zeros(N, jnp.int32)
            for cand, code in ((e1, SRC_E1), (nf1, SRC_F1), (e2, SRC_E2), (nf2, SRC_F2)):
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

            # ---- bookkeeping
            scr = jnp.where(
                i == m - 1,
                jnp.where(jnp.any(valid & (jj == n - 1)),
                          h[jnp.clip(n - 1, 0, N - 1)], scr),
                scr,
            )
            hm = jnp.where(valid & ~dropped, h, NEG_INF)
            rmax = jnp.max(hm)
            rarg = jnp.argmax(hm).astype(jnp.int32)
            # replicate the anti-diagonal tie order: update on strictly
            # better score, or equal score at a smaller diagonal d = i + j
            # equal-score ties only reorder among real cells — never against
            # the virtual (-1,-1) extension start (anti-diag updates are
            # strictly-greater, so score-0 cells must not displace it)
            upd = (
                (rmax > gmax) | ((rmax == gmax) & (gi >= 0) & (i + rarg < gd))
            ) & ~dropped
            upd = upd & (rmax > NEG_INF)
            gmax = jnp.where(upd, rmax, gmax)
            gi = jnp.where(upd, i, gi)
            gj = jnp.where(upd, rarg, gj)
            gd = jnp.where(upd, i + rarg, gd)
            if zdrop >= 0:
                di = i - gi
                dj = rarg - gj
                diff = jnp.abs(di - dj)
                has = jnp.any(valid) & (gi >= 0)
                dropped = dropped | (
                    has & (gmax - rmax > zdrop + diff.astype(jnp.int32) * ge1)
                )

            return (h, nf1, nf2, gmax, gi, gj, gd, scr, dropped), dirbyte

        init = (
            jnp.full((N,), NEG_INF),  # h_prev (row i-1; i==0 handled inline)
            jnp.full((N,), NEG_INF),  # f1
            jnp.full((N,), NEG_INF),  # f2
            NEG_INF if is_global else jnp.int32(0),  # gmax (ksw2 reset_extz)
            jnp.int32(-1),
            jnp.int32(-1),
            jnp.int32(2**30),  # gd
            NEG_INF,  # global score
            jnp.asarray(False),
        )
        (h, _, _, gmax, gi, gj, _, scr, dropped), dirs = jax.lax.scan(
            step, init, jnp.arange(M, dtype=jnp.int32)
        )
        return dirs, scr, gmax, gi, gj, dropped

    dirs, scr, gmax, gi, gj, dropped = jax.vmap(one)(q, t, qlen, tlen, band)
    score = scr if is_global else gmax
    return RowDPResult(dirs=dirs, score=score, max_i=gi, max_j=gj, zdropped=dropped)


# traceback modes (same as dp.py)
_TB_H, _TB_E1, _TB_E2, _TB_F1, _TB_F2 = 0, 1, 2, 3, 4


def traceback_device_rows(dirs: jax.Array, si: jax.Array, sj: jax.Array):
    """Batched on-device traceback over [P, M, N] row-major direction bytes.

    Same contract as dp.traceback_device: returns (ops [P, S] uint8 emitted
    back-to-front, n_ops [P], rem_i [P], rem_j [P])."""
    P, M, N = dirs.shape
    S_path = M + N
    # pad the op buffer to a multiple of 128 lanes: device->host transfers
    # of misaligned trailing dims are catastrophically slow on the tunnel
    S = ((S_path + 127) // 128) * 128
    parr = jnp.arange(P)

    def cond(carry):
        i, j, mode, done, k, ops = carry
        return (~jnp.all(done)) & (k < S_path)

    def body(carry):
        i, j, mode, done, k, ops = carry
        active = ~done & (i >= 0) & (j >= 0)
        byte = dirs[parr, jnp.clip(i, 0, M - 1), jnp.clip(j, 0, N - 1)].astype(
            jnp.int32
        )
        src = byte & SRC_MASK
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
        ops = jax.lax.dynamic_update_index_in_dim(ops, op, k, axis=1)
        return (ni, nj, jnp.where(active, nmode, mode), ndone, k + 1, ops)

    si = jnp.asarray(si, jnp.int32)
    sj = jnp.asarray(sj, jnp.int32)
    done0 = si < 0
    ops0 = jnp.full((P, S), OP_NONE, jnp.uint8)
    fi, fj, _, _, _, ops = jax.lax.while_loop(
        cond, body, (si, sj, jnp.zeros(P, jnp.int32), done0, jnp.int32(0), ops0)
    )
    n_ops = (ops != OP_NONE).sum(axis=1).astype(jnp.int32)
    return ops, n_ops, fi, fj
