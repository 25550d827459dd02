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

    # ---- 4. window ends per start + full-window scores, all vectorized
    if fixed_width:
        width = jnp.full((B,), fixed_width, jnp.int32)
    else:
        width = ((match * qlen - gap) // extend).astype(jnp.int32)
    limit = sd.delta + width[:, None]
    j_raw = jax.vmap(lambda d, lim: jnp.searchsorted(d, lim, side="right"))(sd.delta, limit)
    win_end = jnp.minimum(jnp.minimum(j_raw.astype(jnp.int32), run_end), n[:, None])

    # prefix values at each candidate's window boundaries (one gather, done
    # once — the sweep below then needs NO dynamic [B, S] lookups at all)
    b2 = jnp.arange(B)[:, None]
    ridx = jnp.clip(win_end - 1, 0, S - 1)
    nonempty = win_end > jnp.arange(S)[None, :]
    pend_all = jnp.where(nonempty, plen[b2, ridx], plen_ex)  # == plen_ex[win_end]
    aend_all = jnp.where(nonempty, pamb[b2, ridx], pamb_ex)
    sl_all = pend_all - plen_ex
    sa_all = aend_all - pamb_ex

    # candidate table [S, B, 7]: slicing along axis 0 (major) is contiguous
    cand_all = jnp.stack(
        [sl_all, sa_all, win_end, plen_ex, pamb_ex, pend_all, aend_all], axis=-1
    ).transpose(1, 0, 2)
    cand_all = jax.lax.optimization_barrier(cand_all)

    # ---- 5. push_back_no_overlap (soc.h:362-404) as a candidate-synchronized
    # sweep: the outer loop walks a SCALAR candidate index i (all lanes in
    # lockstep — per-candidate values are contiguous slices of cand_all), and
    # the inner vacuum loop resolves overlaps against a [B, K] stack that
    # carries, per strip, the prefix-sum values at its boundaries, so every
    # shrunk-range score is pure carried arithmetic. Per-step cost is
    # O(B*K) instead of the O(B*S) of per-lane masked lookups.
    K = max_socs
    Krange = jnp.arange(K)[None, :]
    n_max = jnp.max(n)
    # stack planes: 0=start 1=end 2=len 3=amb 4=pexs 5=pend 6=aexs 7=aend
    st0 = jnp.zeros((B, K, 8), jnp.int32)
    z = jnp.zeros(B, jnp.int32)

    def outer_cond(c):
        i, st, sp, over = c
        return i < n_max

    def outer_body(c):
        i, st, sp, over = c
        col = jax.lax.dynamic_slice_in_dim(cand_all, i, 1, axis=0)[0]  # [B, 7]
        sl, sa, we = col[:, 0], col[:, 1], col[:, 2]
        pexs, aexs, pend, aend = col[:, 3], col[:, 4], col[:, 5], col[:, 6]
        # candidates below min score are skipped (stripOfConsideration.cpp:137-141)
        active = (i < n) & (sl >= min_score) & (sl > 0)

        # inner state: (stack, sp, over, cand start/len/amb/pexs/aexs, done, it)
        def inner_cond(s):
            return jnp.any(~s[9]) & (s[10] < K + 2)

        def inner_body(s):
            st, sp, over, c_start, c_len, c_amb, c_pexs, c_aexs, i_b, done, it = s
            sp1 = jnp.maximum(sp - 1, 0)
            at_top = Krange == sp1[:, None]
            top = jnp.where(at_top[:, :, None], st, 0).sum(axis=1)  # [B, 8]
            top_start, top_end = top[:, 0], top[:, 1]
            top_len, top_amb = top[:, 2], top[:, 3]
            top_pexs, top_pend = top[:, 4], top[:, 5]
            top_aexs, top_aend = top[:, 6], top[:, 7]

            act = ~done
            overlap = act & (sp > 0) & (top_end > c_start)
            back_lower = _order_less(top_len, top_amb, c_len, c_amb)

            # case A: back strip is lower -> shrink back to [back_start, c_start)
            case_a = overlap & back_lower
            a_len = c_pexs - top_pexs
            a_amb = c_aexs - top_aexs
            drop_back = case_a & ((a_len < min_score) | (a_len <= 0))
            shrink_back = case_a & ~drop_back

            # case B: candidate is lower -> shrink candidate to [back_end, c_end)
            case_b = overlap & ~back_lower
            b_len = pend - top_pend
            b_amb = aend - top_aend
            drop_cand = case_b & ((b_len < min_score) | (b_len <= 0))
            keep_b = case_b & ~drop_cand

            # shrink the top in place (its start/pexs/aexs are unchanged)
            top_new = jnp.stack(
                [top_start, c_start, a_len, a_amb, top_pexs, c_pexs, top_aexs, c_aexs],
                axis=-1,
            )
            st = jnp.where(
                (at_top & shrink_back[:, None])[:, :, None], top_new[:, None, :], st
            )

            # push the candidate: after case A's shrink or case B's advance the
            # overlap is resolved (reference re-checks and exits the while)
            p_start = jnp.where(keep_b, top_end, c_start)
            p_len = jnp.where(keep_b, b_len, c_len)
            p_amb = jnp.where(keep_b, b_amb, c_amb)
            p_pexs = jnp.where(keep_b, top_pend, c_pexs)
            p_aexs = jnp.where(keep_b, top_aend, c_aexs)
            push_l = act & (~overlap | shrink_back | keep_b)
            can_push = push_l & (sp < K)
            cand_new = jnp.stack(
                [p_start, we, p_len, p_amb, p_pexs, pend, p_aexs, aend], axis=-1
            )
            at_slot = Krange == jnp.minimum(sp, K - 1)[:, None]
            st = jnp.where(
                (at_slot & can_push[:, None])[:, :, None], cand_new[:, None, :], st
            )
            sp = sp + can_push.astype(jnp.int32) - drop_back.astype(jnp.int32)
            over = over | (push_l & ~can_push)
            done = done | (act & ~drop_back)
            return (st, sp, over, p_start, p_len, p_amb, p_pexs, p_aexs, i_b,
                    done, it + 1)

        ib = jnp.full(B, 0, jnp.int32) + i
        s0 = (st, sp, over, ib, sl, sa, pexs, aexs, ib, ~active, jnp.int32(0))
        st, sp, over = jax.lax.while_loop(inner_cond, inner_body, s0)[:3]
        return (i + 1, st, sp, over)

    _, st_f, sp_f, over_f = jax.lax.while_loop(
        outer_cond, outer_body, (jnp.int32(0), st0, z, jnp.zeros(B, bool))
    )
    n_socs = sp_f
    soc_valid = jnp.arange(max_socs)[None, :] < n_socs[:, None]
    soc_start, soc_end = st_f[:, :, 0], st_f[:, :, 1]
    soc_len, soc_amb = st_f[:, :, 2], st_f[:, :, 3]
    overflow = seeds.overflow | over_f

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
