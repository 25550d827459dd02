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


def _sort_seeds_by(seeds: SeedBatch, *keys: jax.Array) -> SeedBatch:
    """Stable sort of the seed planes by the given keys (major first) in
    ONE variadic sort — argsort + 8 take_along_axis costs ~25 ms per take
    on TPU (profiling/profile_truth.py), the variadic sort ~1 ms/operand."""
    from ma_tpu.ops.sortops import sort_with_payloads

    _, (q, l, r, fw, amb, dl, nt, va) = sort_with_payloads(
        list(keys),
        [seeds.q_start, seeds.length, seeds.ref_start, seeds.on_forward,
         seeds.ambiguity, seeds.delta, seeds.soc_nt, seeds.valid],
    )
    return SeedBatch(
        q_start=q, length=l, ref_start=r, on_forward=fw, ambiguity=amb,
        delta=dl, soc_nt=nt, valid=va,
        n_seeds=seeds.n_seeds, overflow=seeds.overflow,
    )


def _exclusive(c: jax.Array) -> jax.Array:
    return jnp.concatenate([jnp.zeros_like(c[:, :1]), c[:, :-1]], axis=1)


def _contig_of(contig_starts: jax.Array, ref_start: jax.Array) -> jax.Array:
    """Contig id per ref position; comparison-reduce for small contig
    tables (a searchsorted is log-C rounds of gathers)."""
    C = contig_starts.shape[0]
    if C <= 64:
        return (ref_start[..., None] >= contig_starts).sum(axis=-1).astype(jnp.int32) - 1
    return jnp.searchsorted(contig_starts, ref_start, side="right").astype(jnp.int32) - 1


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
    from ma_tpu.ops.sortops import merge_rank, run_ends

    B, S = seeds.delta.shape
    # ---- 1. sort by delta (padding has delta INT_MAX -> sorts last)
    sd = _sort_seeds_by(seeds, seeds.delta)
    n = sd.n_seeds
    valid = sd.valid
    min_score = jnp.broadcast_to(jnp.asarray(min_score, jnp.int32), (B,))

    # ---- 2. per-seed contig / strand run grouping
    contig = _contig_of(contig_starts, sd.ref_start)
    key = contig
    if not rectangular:
        key = contig * 2 + sd.on_forward.astype(jnp.int32)
    change = jnp.concatenate(
        [jnp.ones((B, 1), bool), key[:, 1:] != key[:, :-1]], axis=1
    )
    # run_end[i] = first index after i with a different run id
    run_end = run_ends(change)

    # ---- 3. prefix sums for O(1) range scores
    plen = jnp.cumsum(jnp.where(valid, sd.length, 0), axis=1)
    pamb = jnp.cumsum(jnp.where(valid, sd.ambiguity, 0), axis=1)
    plen_ex = _exclusive(plen)
    pamb_ex = _exclusive(pamb)

    # ---- 4. window ends per start + full-window scores. Row-wise
    # searchsorted is 9 rounds of minor-axis gathers (~225 ms at [4096,512]);
    # both the values and the queries are sorted here, so a sort-merge rank
    # (ops/sortops.py merge_rank) replaces it outright.
    if fixed_width:
        width = jnp.full((B,), fixed_width, jnp.int32)
    else:
        width = ((match * qlen - gap) // extend).astype(jnp.int32)
    limit = jnp.where(
        sd.delta >= INT_MAX - width[:, None], INT_MAX, sd.delta + width[:, None]
    )
    j_raw, _, _ = merge_rank(sd.delta, limit)
    win_end = jnp.minimum(jnp.minimum(j_raw.astype(jnp.int32), run_end), n[:, None])

    # prefix values at the window ends: plen_ex[win_end] == forward-filled
    # plen at the last index <= win_end - 1 (win_end is non-decreasing, so a
    # second merge delivers all of them without a gather)
    iota_s = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32), (B, S))
    _, (pend_all, aend_all), _ = merge_rank(iota_s, win_end - 1, carries=[plen, pamb])
    sl_all = pend_all - plen_ex
    sa_all = aend_all - pamb_ex

    # candidate table [S, B, 7]: slicing along axis 0 (major) is contiguous
    cand_all = jnp.stack(
        [sl_all, sa_all, win_end, plen_ex, pamb_ex, pend_all, aend_all], axis=-1
    ).transpose(1, 0, 2)
    cand_all = jax.lax.optimization_barrier(cand_all)

    import os as _os

    _soc_mode = _os.environ.get("MA_TPU_SOC", "auto")
    use_pallas_sweep = _soc_mode == "pallas" or (
        _soc_mode == "auto" and jax.devices()[0].platform not in ("cpu",)
    )
    if use_pallas_sweep:
        # VMEM-resident monotonic-stack sweep (ops/soc_pallas.py); the XLA
        # while_loop below is the reference implementation and CPU path
        from ma_tpu.ops.soc_pallas import soc_sweep_pallas

        st_f, sp_f, over_f = soc_sweep_pallas(
            cand_all, n, min_score, K=max_socs
        )
        n_socs = sp_f
        soc_valid = jnp.arange(max_socs)[None, :] < n_socs[:, None]
        soc_start, soc_end = st_f[:, :, 0], st_f[:, :, 1]
        soc_len, soc_amb = st_f[:, :, 2], st_f[:, :, 3]
        overflow = seeds.overflow | over_f
        return _soc_finish(
            sd, n, soc_start, soc_end, soc_len, soc_amb, soc_valid, n_socs,
            overflow, rectangular, S,
        )

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
    return _soc_finish(
        sd, n, soc_start, soc_end, soc_len, soc_amb, soc_valid, n_socs,
        overflow, rectangular, S,
    )


def _soc_finish(sd, n, soc_start, soc_end, soc_len, soc_amb, soc_valid,
                n_socs, overflow, rectangular, S):
    """Rectangular re-collection + heap ordering (shared tail of both
    sweep implementations)."""
    # ---- 6. rectangular re-collection (soc.h rectangularSoC:200-233)
    if rectangular:
        from ma_tpu.ops.sortops import searchsorted_rows, sel_minor

        idx = jnp.arange(S)[None, None, :]
        in_win = (idx >= soc_start[:, :, None]) & (idx < soc_end[:, :, None])
        refs = sd.ref_start[:, None, :]
        ref_min = jnp.min(jnp.where(in_win, refs, INT_MAX), axis=2)
        ref_max = jnp.max(jnp.where(in_win, refs, -1), axis=2)
        # re-sort seeds by ref position (invalid last)
        ref_key = jnp.where(sd.valid, sd.ref_start, INT_MAX)
        sd = _sort_seeds_by(sd, ref_key)
        ref_sorted = jnp.where(sd.valid, sd.ref_start, INT_MAX)
        soc_start = searchsorted_rows(ref_sorted, ref_min, side="left")
        soc_end = searchsorted_rows(ref_sorted, ref_max, side="right")
        soc_end = jnp.minimum(soc_end, n[:, None])
        plen2 = jnp.cumsum(jnp.where(sd.valid, sd.length, 0), axis=1)
        pamb2 = jnp.cumsum(jnp.where(sd.valid, sd.ambiguity, 0), axis=1)
        plen2_ex = _exclusive(plen2)
        pamb2_ex = _exclusive(pamb2)
        lidx = jnp.clip(soc_start, 0, S - 1)
        ridx = jnp.clip(soc_end - 1, 0, S - 1)
        nonempty = soc_end > soc_start
        soc_len = jnp.where(
            nonempty, sel_minor(plen2, ridx) - sel_minor(plen2_ex, lidx), 0
        )
        soc_amb = jnp.where(
            nonempty, sel_minor(pamb2, ridx) - sel_minor(pamb2_ex, lidx), 0
        )

    # ---- 7. heap order: best score first (len desc, amb asc, index asc —
    # index order via sort stability)
    from ma_tpu.ops.sortops import sort_with_payloads

    sort_len = jnp.where(soc_valid, soc_len, -1)
    sort_amb = jnp.where(soc_valid, soc_amb, INT_MAX)
    _, (o_start, o_end, o_len, o_amb) = sort_with_payloads(
        [-sort_len, sort_amb], [soc_start, soc_end, soc_len, soc_amb]
    )
    return SoCBatch(
        seeds=sd,
        start=o_start,
        end=o_end,
        score=o_len,
        amb=o_amb,
        n_socs=n_socs,
        overflow=overflow,
    )
