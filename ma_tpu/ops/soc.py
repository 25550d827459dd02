"""Strip of Consideration (SoC) on device.

TPU re-design of the reference SoC stage
(reference: stripOfConsideration.cpp StripOfConsiderationSeeds::execute:12-160,
soc.h SoCOrder:26-90 / push_back_no_overlap:362-404 / rectangularSoC:200-233):

* seeds sorted by delta; strip window width = (match*|q| - gap) / extend
  (stripOfConsideration.h getStripSize:55-61)
* per window-start score = accumulated seed length (tie-break: lower
  accumulated ambiguity) — computed here with prefix sums over the sorted
  order instead of the reference's incremental add/subtract
* the overlap "vacuum" sweep (push_back_no_overlap) is run as a batched
  micro-op `lax.while_loop`: one O(1) stack operation per lane per step —
  amortized-O(n) like the reference's monotonic stack
* rectangular mode re-collects each SoC as all seeds within its reference
  span, re-sorted by ref position (soc.h rectangularSoC)

Outputs SoC windows as (start, end) ranges into the returned (re)sorted
seed arrays, ordered best-score-first (the reference's max heap).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ma_tpu.ops.extract import SeedBatch

INT_MAX = jnp.int32(2**31 - 1)


class SoCBatch(NamedTuple):
    seeds: SeedBatch  # sorted seed arrays the windows index into
    start: jax.Array  # int32 [B, K] window start (seed index)
    end: jax.Array  # int32 [B, K] window end (exclusive)
    score: jax.Array  # int32 [B, K] accumulative seed length
    amb: jax.Array  # int32 [B, K] accumulative ambiguity
    n_socs: jax.Array  # int32 [B]
    overflow: jax.Array  # bool [B]


def _permute_seeds(seeds: SeedBatch, order: jax.Array) -> SeedBatch:
    g = lambda a: jnp.take_along_axis(a, order, axis=1)
    return SeedBatch(
        q_start=g(seeds.q_start),
        length=g(seeds.length),
        ref_start=g(seeds.ref_start),
        on_forward=g(seeds.on_forward),
        ambiguity=g(seeds.ambiguity),
        delta=g(seeds.delta),
        soc_nt=g(seeds.soc_nt),
        valid=g(seeds.valid),
        n_seeds=seeds.n_seeds,
        overflow=seeds.overflow,
    )


def _exclusive(c: jax.Array) -> jax.Array:
    return jnp.concatenate([jnp.zeros_like(c[:, :1]), c[:, :-1]], axis=1)


def _order_less(len_a, amb_a, len_b, amb_b):
    """SoCOrder::operator< (soc.h:71-76): by length, tie -> HIGHER amb is less."""
    return jnp.where(len_a == len_b, amb_a > amb_b, len_a < len_b)


def soc_collect(
    seeds: SeedBatch,
    qlen: jax.Array,  # int32 [B]
    contig_starts: jax.Array,  # int32 [C]
    match: int = 2,
    extend: int = 2,
    gap: int = 4,
    fixed_width: int = 0,
    rectangular: bool = True,
    min_score: jax.Array | int = 0,  # fMinLen (0 for small genomes)
    max_socs: int = 64,
) -> SoCBatch:
    B, S = seeds.delta.shape
    # ---- 1. sort by delta (padding has delta INT_MAX -> sorts last)
    order = jnp.argsort(seeds.delta, axis=1, stable=True)
    sd = _permute_seeds(seeds, order)
    n = sd.n_seeds
    valid = sd.valid
    min_score = jnp.broadcast_to(jnp.asarray(min_score, jnp.int32), (B,))

    # ---- 2. per-seed contig / strand run grouping
    contig = jnp.searchsorted(contig_starts, sd.ref_start, side="right").astype(jnp.int32) - 1
    key = contig
    if not rectangular:
        key = contig * 2 + sd.on_forward.astype(jnp.int32)
    change = jnp.concatenate(
        [jnp.ones((B, 1), bool), key[:, 1:] != key[:, :-1]], axis=1
    )
    run_id = jnp.cumsum(change.astype(jnp.int32), axis=1)  # 1-based run ids
    # run_end[i] = first index after i with a different run id
    run_end = jax.vmap(lambda r: jnp.searchsorted(r, r, side="right"))(run_id).astype(jnp.int32)

    # ---- 3. prefix sums for O(1) range scores
    plen = jnp.cumsum(jnp.where(valid, sd.length, 0), axis=1)
    pamb = jnp.cumsum(jnp.where(valid, sd.ambiguity, 0), axis=1)
    plen_ex = _exclusive(plen)
    pamb_ex = _exclusive(pamb)

    # gathers/scatters with per-lane indices are slow on TPU; all loop-body
    # lookups below use masked reductions over the (small) row instead, and
    # the barrier keeps XLA from rematerializing the prefix sums per step
    plen, pamb, plen_ex, pamb_ex = jax.lax.optimization_barrier(
        (plen, pamb, plen_ex, pamb_ex)
    )
    S_range = jnp.arange(S)[None, :]

    def sel_s(arr, idx):  # arr [B, S], idx [B] -> arr[b, idx[b]]
        return jnp.where(S_range == idx[:, None], arr, 0).sum(axis=1)

    def range_score(l, r):  # over [l, r)
        l = jnp.clip(l, 0, S - 1)
        rr = jnp.clip(r - 1, 0, S - 1)
        sl = jnp.where(r > l, sel_s(plen, rr) - sel_s(plen_ex, l), 0)
        sa = jnp.where(r > l, sel_s(pamb, rr) - sel_s(pamb_ex, l), 0)
        return sl, sa

    # ---- 4. window ends per start
    if fixed_width:
        width = jnp.full((B,), fixed_width, jnp.int32)
    else:
        width = ((match * qlen - gap) // extend).astype(jnp.int32)
    limit = sd.delta + width[:, None]
    j_raw = jax.vmap(lambda d, lim: jnp.searchsorted(d, lim, side="right"))(sd.delta, limit)
    win_end = jnp.minimum(jnp.minimum(j_raw.astype(jnp.int32), run_end), n[:, None])
    win_end = jax.lax.optimization_barrier(win_end)

    # ---- 5. the push_back_no_overlap sweep as a micro-op loop
    M_EVAL, M_VAC = 0, 1
    barr = jnp.arange(B)

    class Carry(NamedTuple):
        i: jax.Array
        mode: jax.Array
        c_start: jax.Array
        c_end: jax.Array
        c_len: jax.Array
        c_amb: jax.Array
        st_start: jax.Array  # [B, K]
        st_end: jax.Array
        st_len: jax.Array
        st_amb: jax.Array
        sp: jax.Array
        over: jax.Array
        iters: jax.Array

    z = jnp.zeros(B, jnp.int32)
    carry0 = Carry(
        i=z,
        mode=jnp.full(B, M_EVAL, jnp.int32),
        c_start=z,
        c_end=z,
        c_len=z,
        c_amb=z,
        st_start=jnp.zeros((B, max_socs), jnp.int32),
        st_end=jnp.zeros((B, max_socs), jnp.int32),
        st_len=jnp.zeros((B, max_socs), jnp.int32),
        st_amb=jnp.zeros((B, max_socs), jnp.int32),
        sp=z,
        over=jnp.zeros(B, bool),
        iters=jnp.int32(0),
    )
    iter_cap = 6 * S + 32

    def cond(c: Carry):
        return jnp.any(c.i < n) & (c.iters < iter_cap)

    def body(c: Carry) -> Carry:
        active = c.i < n
        at_eval = active & (c.mode == M_EVAL)
        at_vac = active & (c.mode == M_VAC)

        # EVAL: form candidate (score over [i, win_end[i]))
        we = sel_s(win_end, jnp.clip(c.i, 0, S - 1))
        sl, sa = range_score(c.i, we)
        good = at_eval & (sl >= min_score) & (sl > 0)
        # candidates below min score are skipped (stripOfConsideration.cpp:137-141)
        i_next = jnp.where(at_eval & ~good, c.i + 1, c.i)
        mode = jnp.where(good, M_VAC, c.mode)
        c_start = jnp.where(good, c.i, c.c_start)
        c_end = jnp.where(good, we, c.c_end)
        c_len = jnp.where(good, sl, c.c_len)
        c_amb = jnp.where(good, sa, c.c_amb)

        # VACUUM: one iteration of push_back_no_overlap's while loop
        sp1 = jnp.maximum(c.sp - 1, 0)
        K_range = jnp.arange(max_socs)[None, :]
        sel_k = lambda st: jnp.where(K_range == sp1[:, None], st, 0).sum(axis=1)
        back_end = sel_k(c.st_end)
        back_start = sel_k(c.st_start)
        back_len = sel_k(c.st_len)
        back_amb = sel_k(c.st_amb)
        overlap = at_vac & (c.sp > 0) & (back_end > c.c_start)
        back_lower = _order_less(back_len, back_amb, c.c_len, c.c_amb)

        # case A: back SoC is lower -> shrink back to [back_start, c_start)
        case_a = overlap & back_lower
        a_len, a_amb = range_score(back_start, c.c_start)
        drop_back = case_a & ((a_len < min_score) | (a_len == 0))
        at_sp1 = (K_range == sp1[:, None]) & case_a[:, None]
        st_end = jnp.where(at_sp1, c.c_start[:, None], c.st_end)
        st_len = jnp.where(at_sp1, a_len[:, None], c.st_len)
        st_amb = jnp.where(at_sp1, a_amb[:, None], c.st_amb)
        sp = c.sp - drop_back.astype(jnp.int32)

        # case B: candidate is lower -> shrink candidate to [back_end, c_end)
        case_b = overlap & ~back_lower
        b_len, b_amb = range_score(back_end, c.c_end)
        drop_cand = case_b & ((b_len < min_score) | (b_len == 0))
        c_start = jnp.where(case_b, back_end, c_start)
        c_len = jnp.where(case_b, b_len, c_len)
        c_amb = jnp.where(case_b, b_amb, c_amb)

        # no overlap (anymore) -> push candidate
        do_push = at_vac & ~overlap
        can_push = do_push & (sp < max_socs)
        slot = jnp.minimum(sp, max_socs - 1)
        at_slot = (K_range == slot[:, None]) & can_push[:, None]
        pv = lambda st, v: jnp.where(at_slot, v[:, None], st)
        st_start = pv(c.st_start, c_start)
        st_end = pv(st_end, c_end)
        st_len = pv(st_len, c_len)
        st_amb = pv(st_amb, c_amb)
        sp = sp + can_push.astype(jnp.int32)
        over = c.over | (do_push & ~can_push)

        finished_vac = do_push | drop_cand
        i_next = jnp.where(finished_vac, c.i + 1, i_next)
        mode = jnp.where(finished_vac, M_EVAL, mode)

        return Carry(
            i=i_next, mode=mode, c_start=c_start, c_end=c_end, c_len=c_len, c_amb=c_amb,
            st_start=st_start, st_end=st_end, st_len=st_len, st_amb=st_amb,
            sp=sp, over=over, iters=c.iters + 1,
        )

    fin = jax.lax.while_loop(cond, body, carry0)
    n_socs = fin.sp
    soc_valid = jnp.arange(max_socs)[None, :] < n_socs[:, None]
    soc_start, soc_end = fin.st_start, fin.st_end
    soc_len, soc_amb = fin.st_len, fin.st_amb
    overflow = seeds.overflow | fin.over | (fin.i < n)

    # ---- 6. rectangular re-collection (soc.h rectangularSoC:200-233)
    if rectangular:
        idx = jnp.arange(S)[None, None, :]
        in_win = (idx >= soc_start[:, :, None]) & (idx < soc_end[:, :, None])
        refs = sd.ref_start[:, None, :]
        ref_min = jnp.min(jnp.where(in_win, refs, INT_MAX), axis=2)
        ref_max = jnp.max(jnp.where(in_win, refs, -1), axis=2)
        # re-sort seeds by ref position (invalid last)
        ref_key = jnp.where(sd.valid, sd.ref_start, INT_MAX)
        order2 = jnp.argsort(ref_key, axis=1, stable=True)
        sd = _permute_seeds(sd, order2)
        ref_sorted = jnp.where(sd.valid, sd.ref_start, INT_MAX)
        soc_start = jax.vmap(lambda r, lo: jnp.searchsorted(r, lo, side="left"))(
            ref_sorted, ref_min
        ).astype(jnp.int32)
        soc_end = jax.vmap(lambda r, hi: jnp.searchsorted(r, hi, side="right"))(
            ref_sorted, ref_max
        ).astype(jnp.int32)
        soc_end = jnp.minimum(soc_end, n[:, None])
        plen2 = jnp.cumsum(jnp.where(sd.valid, sd.length, 0), axis=1)
        pamb2 = jnp.cumsum(jnp.where(sd.valid, sd.ambiguity, 0), axis=1)
        plen2_ex = _exclusive(plen2)
        pamb2_ex = _exclusive(pamb2)
        lidx = jnp.clip(soc_start, 0, S - 1)
        ridx = jnp.clip(soc_end - 1, 0, S - 1)
        b2 = jnp.arange(B)[:, None]
        soc_len = jnp.where(soc_end > soc_start, plen2[b2, ridx] - plen2_ex[b2, lidx], 0)
        soc_amb = jnp.where(soc_end > soc_start, pamb2[b2, ridx] - pamb2_ex[b2, lidx], 0)

    # ---- 7. heap order: best score first (len desc, amb asc, index asc)
    sort_len = jnp.where(soc_valid, soc_len, -1)
    sort_amb = jnp.where(soc_valid, soc_amb, INT_MAX)
    rank = jnp.lexsort((jnp.arange(max_socs)[None, :].repeat(B, 0), sort_amb, -sort_len), axis=1)
    g2 = lambda a: jnp.take_along_axis(a, rank, axis=1)
    return SoCBatch(
        seeds=sd,
        start=g2(soc_start),
        end=g2(soc_end),
        score=g2(soc_len),
        amb=g2(soc_amb),
        n_socs=n_socs,
        overflow=overflow,
    )
