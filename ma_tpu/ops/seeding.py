"""Batched FMD-index seeding on device.

TPU re-design of the reference BinarySeeding module
(reference: libs/ma/inc/ma/module/binarySeeding.h:26-585,
libs/ma/src/module/binarySeeding.cpp:32-103):

* maximally-spanning extension: two segments per center — (right-then-left)
  and (left-then-right) extension (binarySeeding.h maximallySpanningExtension)
* divide & conquer center selection: cover [0, len) by recursing on the
  uncovered left/right parts (binarySeeding.cpp procesInterval)

The reference runs this as a recursive, data-dependent per-read loop on a
thread pool. Here every read in a [B]-batch advances one state-machine step
per iteration of a single `lax.while_loop`, so each iteration performs one
batched `extend_backward` (2 occ gathers) across all reads — the per-base
FMD extension (the aligner's hottest loop, SURVEY.md §3.1) becomes wide
vector work instead of pointer chasing.

Static shapes: MAX_SEGS segments and a MAX_STACK interval stack per read;
overflow is counted, not fatal (the reference's recursion is similarly
heuristic about what it covers).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ma_tpu.ops.occ import FMDDev, SAI
from ma_tpu.ops.occ import extend_backward as _extend_backward
from ma_tpu.ops.occ import init_interval as _init_interval

# state-machine phases
P_NEW_CENTER = 0
P_RIGHT1 = 1
P_LEFT1 = 2
P_INIT2 = 3
P_LEFT2 = 4
P_RIGHT2 = 5
P_SPLIT = 6
P_DONE = 7


class SegmentBatch(NamedTuple):
    """Fixed-shape segment output: query interval + SA interval per segment.

    q_start/q_size use the reference Segment convention (segment.h:39):
    the matched query span is [q_start, q_start+q_size] INCLUSIVE, i.e. the
    seed length is q_size + 1.
    """

    q_start: jax.Array  # int32 [B, S]
    q_size: jax.Array  # int32 [B, S]
    sai_start: jax.Array  # int32 [B, S]
    sai_rc: jax.Array  # int32 [B, S]
    sai_size: jax.Array  # int32 [B, S]  (0 rows = unused slots)
    n_segs: jax.Array  # int32 [B]
    overflow: jax.Array  # bool [B] — segment/stack capacity exceeded


class _State(NamedTuple):
    phase: jax.Array  # int32 [B]
    s: jax.Array  # int32 [B] current area start
    e: jax.Array  # int32 [B] current area end (exclusive)
    center: jax.Array  # int32 [B]
    i: jax.Array  # int32 [B] extension cursor
    ik: SAI  # current interval [B]
    st1: jax.Array
    en1: jax.Array
    st2: jax.Array
    en2: jax.Array
    cov_s: jax.Array  # covered interval bookkeeping
    cov_e: jax.Array
    stack_s: jax.Array  # int32 [B, K]
    stack_e: jax.Array  # int32 [B, K]
    sp: jax.Array  # int32 [B]
    segs: SegmentBatch
    iters: jax.Array  # int32 scalar


def _emplace(segs: SegmentBatch, do: jax.Array, qs, qsize, ik: SAI) -> SegmentBatch:
    """Append a segment for lanes where `do`; drop on overflow."""
    slot = jnp.minimum(segs.n_segs, segs.q_start.shape[1] - 1)
    can = do & (segs.n_segs < segs.q_start.shape[1])
    b = jnp.arange(segs.q_start.shape[0])

    def put(arr, val):
        return arr.at[b, slot].set(jnp.where(can, val, arr[b, slot]))

    return SegmentBatch(
        q_start=put(segs.q_start, qs),
        q_size=put(segs.q_size, qsize),
        sai_start=put(segs.sai_start, ik.start),
        sai_rc=put(segs.sai_rc, ik.start_rc),
        sai_size=put(segs.sai_size, ik.size),
        n_segs=segs.n_segs + can.astype(jnp.int32),
        overflow=segs.overflow | (do & ~can),
    )


def max_spanning_seeding(
    fmd: FMDDev,
    seqs: jax.Array,  # int32/uint8 [B, L] codes (pad = 4)
    lens: jax.Array,  # int32 [B]
    max_segs: int = 64,
    max_stack: int = 16,
    min_ambiguity: int = 0,
    max_ambiguity: int = 100,
    iter_cap: int | None = None,
    ext_ops=None,
) -> SegmentBatch:
    """Maximally-spanning seeding for a batch of reads.

    Returns a SegmentBatch; empty reads (len==0) produce no segments.
    `ext_ops` overrides (init_interval, extend_backward) — used by the
    sharded-index path (parallel/sharded_fmd.py) to swap in collective
    lookups without duplicating the state machine.
    """
    init_interval, extend_backward = ext_ops or (_init_interval, _extend_backward)
    seqs = jnp.asarray(seqs, jnp.int32)
    B, L = seqs.shape
    lens = jnp.asarray(lens, jnp.int32)
    if iter_cap is None:
        iter_cap = 8 * L + 64

    z = jnp.zeros(B, jnp.int32)
    segs0 = SegmentBatch(
        q_start=jnp.zeros((B, max_segs), jnp.int32),
        q_size=jnp.zeros((B, max_segs), jnp.int32),
        sai_start=jnp.zeros((B, max_segs), jnp.int32),
        sai_rc=jnp.zeros((B, max_segs), jnp.int32),
        sai_size=jnp.zeros((B, max_segs), jnp.int32),
        n_segs=z,
        overflow=jnp.zeros(B, bool),
    )
    st0 = _State(
        phase=jnp.where(lens > 0, P_NEW_CENTER, P_DONE).astype(jnp.int32),
        s=z,
        e=lens,
        center=z,
        i=z,
        ik=SAI(z, z, z),
        st1=z,
        en1=z,
        st2=z,
        en2=z,
        cov_s=z,
        cov_e=z,
        stack_s=jnp.zeros((B, max_stack), jnp.int32),
        stack_e=jnp.zeros((B, max_stack), jnp.int32),
        sp=z,
        segs=segs0,
        iters=jnp.int32(0),
    )

    comp = lambda c: jnp.where(c < 4, 3 - c, c)  # N stays invalid
    barr = jnp.arange(B)

    def gather_q(idx):
        return seqs[barr, jnp.clip(idx, 0, L - 1)]

    def cond(st: _State):
        return jnp.any(st.phase != P_DONE) & (st.iters < iter_cap)

    def body(st: _State) -> _State:
        phase = st.phase

        # ---------------- the one batched extension for this iteration ----
        # extension char: right loops use complement(q[i]), left loops q[i]
        in_right = (phase == P_RIGHT1) | (phase == P_RIGHT2)
        in_left = (phase == P_LEFT1) | (phase == P_LEFT2)
        qi = gather_q(st.i)
        ext_c = jnp.where(in_right, comp(qi), qi)
        ok = extend_backward(fmd, st.ik, ext_c)

        # loop-exit conditions shared by all four extension loops
        # (binarySeeding.h:107-116 etc.)
        brk = (ok.size <= 0) | ((ok.size <= min_ambiguity) & (st.ik.size <= max_ambiguity))
        # bounds: right loops run while i < len; left loops while i >= 0
        in_bounds = jnp.where(in_right, st.i < st.e * 0 + lens, st.i >= 0)
        step_ok = in_bounds & ~brk  # lane takes the extension
        exiting = (in_right | in_left) & ~step_ok

        # ------------------------------- update for continuing extensions -
        new_ik = SAI(
            jnp.where(step_ok, ok.start, st.ik.start),
            jnp.where(step_ok, ok.start_rc, st.ik.start_rc),
            jnp.where(step_ok, ok.size, st.ik.size),
        )
        di = jnp.where(in_right, 1, -1).astype(jnp.int32)
        new_i = jnp.where(step_ok, st.i + di, st.i)
        en1 = jnp.where(step_ok & (phase == P_RIGHT1), st.i, st.en1)
        st1 = jnp.where(step_ok & (phase == P_LEFT1), st.i, st.st1)
        st2 = jnp.where(step_ok & (phase == P_LEFT2), st.i, st.st2)
        en2 = jnp.where(step_ok & (phase == P_RIGHT2), st.i, st.en2)

        # ------------------------------------------ phase transition logic
        segs = st.segs
        next_phase = phase
        ik_out = new_ik
        i_out = new_i
        s_out, e_out = st.s, st.e
        center_out = st.center
        cov_s, cov_e = st.cov_s, st.cov_e
        stack_s, stack_e, sp = st.stack_s, st.stack_e, st.sp

        # --- P_NEW_CENTER: pick center, init first interval
        at_new = phase == P_NEW_CENTER
        ctr = st.s + (st.e - st.s) // 2
        qc = gather_q(ctr)
        ik_init = init_interval(fmd, comp(qc))
        init_fail = (qc >= 4) | (ik_init.size == 0)
        # N / absent char: covered = [center, center+1) (binarySeeding.h:70-86)
        next_phase = jnp.where(at_new, jnp.where(init_fail, P_SPLIT, P_RIGHT1), next_phase)
        center_out = jnp.where(at_new, ctr, center_out)
        cov_s = jnp.where(at_new & init_fail, ctr, cov_s)
        cov_e = jnp.where(at_new & init_fail, ctr + 1, cov_e)
        ik_out = SAI(
            jnp.where(at_new, ik_init.start, ik_out.start),
            jnp.where(at_new, ik_init.start_rc, ik_out.start_rc),
            jnp.where(at_new, ik_init.size, ik_out.size),
        )
        i_out = jnp.where(at_new, ctr + 1, i_out)
        en1 = jnp.where(at_new, ctr, en1)

        # --- P_RIGHT1 exit -> swap to revcomp, go left from center-1
        ex_r1 = (phase == P_RIGHT1) & exiting
        next_phase = jnp.where(ex_r1, P_LEFT1, next_phase)
        ik_out = SAI(
            jnp.where(ex_r1, ik_out.start_rc, ik_out.start),
            jnp.where(ex_r1, ik_out.start, ik_out.start_rc),
            ik_out.size,
        )
        i_out = jnp.where(ex_r1, st.center - 1, i_out)
        st1 = jnp.where(ex_r1, st.center, st1)

        # --- P_LEFT1 exit -> emplace segment 1, init second block
        ex_l1 = (phase == P_LEFT1) & exiting
        segs = _emplace(segs, ex_l1, st1, en1 - st1, ik_out)
        ik2 = init_interval(fmd, qc * 0 + gather_q(st.center))
        next_phase = jnp.where(ex_l1, P_LEFT2, next_phase)
        ik_out = SAI(
            jnp.where(ex_l1, ik2.start, ik_out.start),
            jnp.where(ex_l1, ik2.start_rc, ik_out.start_rc),
            jnp.where(ex_l1, ik2.size, ik_out.size),
        )
        i_out = jnp.where(ex_l1, st.center - 1, i_out)
        st2 = jnp.where(ex_l1, st.center, st2)

        # --- P_LEFT2 exit -> swap to revcomp, go right from center+1
        ex_l2 = (phase == P_LEFT2) & exiting
        next_phase = jnp.where(ex_l2, P_RIGHT2, next_phase)
        ik_out = SAI(
            jnp.where(ex_l2, ik_out.start_rc, ik_out.start),
            jnp.where(ex_l2, ik_out.start, ik_out.start_rc),
            ik_out.size,
        )
        i_out = jnp.where(ex_l2, st.center + 1, i_out)
        en2 = jnp.where(ex_l2, st.center, en2)

        # --- P_RIGHT2 exit -> maybe emplace segment 2, compute covered area
        ex_r2 = (phase == P_RIGHT2) & exiting
        same = (st1 == st2) & (en1 == en2)
        # segment 2 records ik.revComp() (binarySeeding.h:238)
        segs = _emplace(segs, ex_r2 & ~same, st2, en2 - st2, ik_out.rev_comp())
        cov_s = jnp.where(ex_r2, jnp.minimum(st1, st2), cov_s)
        cov_e = jnp.where(ex_r2, jnp.maximum(en1, en2), cov_e)
        next_phase = jnp.where(ex_r2, P_SPLIT, next_phase)

        # --- P_SPLIT: push uncovered left part, continue right part or pop
        at_split = phase == P_SPLIT
        push = at_split & (cov_s != 0) & (st.s + 1 < cov_s)
        can_push = push & (sp < max_stack)
        slot = jnp.minimum(sp, max_stack - 1)
        stack_s = stack_s.at[barr, slot].set(jnp.where(can_push, st.s, stack_s[barr, slot]))
        stack_e = stack_e.at[barr, slot].set(jnp.where(can_push, cov_s, stack_e[barr, slot]))
        sp = sp + can_push.astype(jnp.int32)
        segs = segs._replace(overflow=segs.overflow | (push & ~can_push))
        cont_right = at_split & (st.e > cov_e + 1)
        s_out = jnp.where(cont_right, cov_e, s_out)
        # pop (or finish) when not continuing right
        do_pop = at_split & ~cont_right & (sp > 0)
        pslot = jnp.maximum(sp - 1, 0)
        s_out = jnp.where(do_pop, stack_s[barr, pslot], s_out)
        e_out = jnp.where(do_pop, stack_e[barr, pslot], e_out)
        sp = sp - do_pop.astype(jnp.int32)
        next_phase = jnp.where(
            at_split,
            jnp.where(cont_right | do_pop, P_NEW_CENTER, P_DONE),
            next_phase,
        )

        return _State(
            phase=next_phase.astype(jnp.int32),
            s=s_out,
            e=e_out,
            center=center_out,
            i=i_out,
            ik=ik_out,
            st1=st1,
            en1=en1,
            st2=st2,
            en2=en2,
            cov_s=cov_s,
            cov_e=cov_e,
            stack_s=stack_s,
            stack_e=stack_e,
            sp=sp,
            segs=segs,
            iters=st.iters + 1,
        )

    final = jax.lax.while_loop(cond, body, st0)
    segs = final.segs
    # mark reads that hit the iteration cap as overflowed
    segs = segs._replace(overflow=segs.overflow | (final.phase != P_DONE))
    return segs


# --------------------------------------------------------------------- SMEM
# phases of the SMEM state machine
S_NEW = 0
S_FWD = 1
S_BWD = 2
S_SPLIT = 3
S_DONE = 4


class _SmemState(NamedTuple):
    phase: jax.Array  # int32 [B]
    s: jax.Array  # area start
    e: jax.Array  # area end (exclusive)
    center: jax.Array
    i: jax.Array
    ik: SAI  # forward-phase interval [B]
    # pending interval list for the backward phase [B, K]
    p_qs: jax.Array
    p_sz: jax.Array
    p_sai: SAI
    p_n: jax.Array  # int32 [B]
    cov_s: jax.Array
    cov_e: jax.Array
    stack_s: jax.Array
    stack_e: jax.Array
    sp: jax.Array
    segs: SegmentBatch
    iters: jax.Array


def smem_seeding(
    fmd: FMDDev,
    seqs: jax.Array,
    lens: jax.Array,
    max_segs: int = 64,
    max_stack: int = 16,
    max_pending: int = 16,
    min_ambiguity: int = 0,
    max_ambiguity: int = 100,
    iter_cap: int | None = None,
    ext_ops=None,
) -> SegmentBatch:
    """Li's SMEM extension scheme, batched (binarySeeding.h smemExtension:261-452).

    Per center: forward extension recording an interval at every hit-loss
    point, then a joint backward extension of all recorded intervals —
    emitting the non-enclosed maximal matches. Center selection / interval
    splitting is shared with max_spanning_seeding (procesInterval,
    binarySeeding.cpp).

    The backward step extends all <= max_pending intervals of every read in
    one vectorized [B, K] occ gather per iteration.
    """
    init_interval, extend_backward = ext_ops or (_init_interval, _extend_backward)
    seqs = jnp.asarray(seqs, jnp.int32)
    B, L = seqs.shape
    K = max_pending
    lens = jnp.asarray(lens, jnp.int32)
    if iter_cap is None:
        iter_cap = 8 * L + 64

    z = jnp.zeros(B, jnp.int32)
    zk = jnp.zeros((B, K), jnp.int32)
    segs0 = SegmentBatch(
        q_start=jnp.zeros((B, max_segs), jnp.int32),
        q_size=jnp.zeros((B, max_segs), jnp.int32),
        sai_start=jnp.zeros((B, max_segs), jnp.int32),
        sai_rc=jnp.zeros((B, max_segs), jnp.int32),
        sai_size=jnp.zeros((B, max_segs), jnp.int32),
        n_segs=z,
        overflow=jnp.zeros(B, bool),
    )
    st0 = _SmemState(
        phase=jnp.where(lens > 0, S_NEW, S_DONE).astype(jnp.int32),
        s=z,
        e=lens,
        center=z,
        i=z,
        ik=SAI(z, z, z),
        p_qs=zk,
        p_sz=zk,
        p_sai=SAI(zk, zk, zk),
        p_n=z,
        cov_s=z,
        cov_e=z,
        stack_s=jnp.zeros((B, max_stack), jnp.int32),
        stack_e=jnp.zeros((B, max_stack), jnp.int32),
        sp=z,
        segs=segs0,
        iters=jnp.int32(0),
    )

    comp = lambda c: jnp.where(c < 4, 3 - c, c)
    barr = jnp.arange(B)
    karr = jnp.arange(K)

    def gather_q(idx):
        return seqs[barr, jnp.clip(idx, 0, L - 1)]

    def push_pending(stt, do, qs, sz, sai: SAI):
        slot = jnp.minimum(stt["n"], K - 1)
        can = do & (stt["n"] < K)
        put = lambda a, v: a.at[barr, slot].set(jnp.where(can, v, a[barr, slot]))
        return dict(
            qs=put(stt["qs"], qs),
            sz=put(stt["sz"], sz),
            sai=SAI(
                put(stt["sai"].start, sai.start),
                put(stt["sai"].start_rc, sai.start_rc),
                put(stt["sai"].size, sai.size),
            ),
            n=stt["n"] + can.astype(jnp.int32),
            over=stt["over"] | (do & ~can),
        )

    def cond(st: _SmemState):
        return jnp.any(st.phase != S_DONE) & (st.iters < iter_cap)

    def body(st: _SmemState) -> _SmemState:
        phase = st.phase
        segs = st.segs
        next_phase = phase
        ik_out = st.ik
        i_out = st.i
        s_out, e_out = st.s, st.e
        center_out = st.center
        cov_s, cov_e = st.cov_s, st.cov_e
        stack_s, stack_e, sp = st.stack_s, st.stack_e, st.sp
        pend = dict(qs=st.p_qs, sz=st.p_sz, sai=st.p_sai, n=st.p_n,
                    over=segs.overflow)

        # ---- S_NEW: pick center, init
        at_new = phase == S_NEW
        ctr = st.s + (st.e - st.s) // 2
        qc = gather_q(ctr)
        ik_init = init_interval(fmd, comp(qc))
        init_fail = (qc >= 4) | (ik_init.size == 0)
        next_phase = jnp.where(at_new, jnp.where(init_fail, S_SPLIT, S_FWD), next_phase)
        center_out = jnp.where(at_new, ctr, center_out)
        cov_s = jnp.where(at_new, ctr, cov_s)
        cov_e = jnp.where(at_new, ctr, cov_e)
        sel = lambda c, a, b: SAI(
            jnp.where(c, a.start, b.start),
            jnp.where(c, a.start_rc, b.start_rc),
            jnp.where(c, a.size, b.size),
        )
        ik_out = sel(at_new, ik_init, ik_out)
        i_out = jnp.where(at_new, ctr + 1, i_out)
        pend["n"] = jnp.where(at_new, 0, pend["n"])

        # ---- S_FWD: one forward extension (complement chars)
        at_fwd = phase == S_FWD
        qi = gather_q(st.i)
        in_bounds = st.i < lens
        ok = extend_backward(fmd, st.ik, comp(qi))
        lost = at_fwd & in_bounds & (ok.size != st.ik.size)
        # record interval before the loss (ik.revComp; q span [center, i-1])
        pend = push_pending(
            pend, lost, st.center, st.i - st.center - 1, st.ik.rev_comp()
        )
        at_qend = at_fwd & in_bounds & (st.i == lens - 1) & (ok.size != 0)
        pend = push_pending(
            pend, at_qend, st.center, st.i - st.center, ok.rev_comp()
        )
        brk = (ok.size <= 0) | (
            (ok.size <= min_ambiguity) & (st.ik.size <= max_ambiguity)
        )
        step_ok = at_fwd & in_bounds & ~brk
        ik_out = sel(step_ok, ok, ik_out)
        cov_e = jnp.where(step_ok, st.i, cov_e)
        i_out = jnp.where(step_ok, st.i + 1, i_out)
        fwd_exit = at_fwd & ~step_ok
        # reverse the pending list (longest-first order for the bwd phase)
        rev_idx = jnp.clip(pend["n"][:, None] - 1 - karr[None, :], 0, K - 1)
        rv = lambda a: jnp.where(karr[None, :] < pend["n"][:, None],
                                 jnp.take_along_axis(a, rev_idx, axis=1), a)
        pend_rev = dict(
            qs=rv(pend["qs"]), sz=rv(pend["sz"]),
            sai=SAI(rv(pend["sai"].start), rv(pend["sai"].start_rc),
                    rv(pend["sai"].size)),
            n=pend["n"], over=pend["over"],
        )
        do_rev = fwd_exit[:, None]
        pend = dict(
            qs=jnp.where(do_rev, pend_rev["qs"], pend["qs"]),
            sz=jnp.where(do_rev, pend_rev["sz"], pend["sz"]),
            sai=SAI(
                jnp.where(do_rev, pend_rev["sai"].start, pend["sai"].start),
                jnp.where(do_rev, pend_rev["sai"].start_rc, pend["sai"].start_rc),
                jnp.where(do_rev, pend_rev["sai"].size, pend["sai"].size),
            ),
            n=pend["n"], over=pend["over"],
        )
        can_bwd = (st.center > 0) & (pend["n"] > 0)
        next_phase = jnp.where(
            fwd_exit, jnp.where(can_bwd, S_BWD, S_SPLIT), next_phase
        )
        # no backward phase: emplace the longest pending interval directly
        # (covers center == 0; reference falls through to the final emplace)
        no_bwd_emplace = fwd_exit & ~can_bwd & (pend["n"] > 0)
        segs = _emplace(
            segs, no_bwd_emplace, pend["qs"][:, 0], pend["sz"][:, 0],
            SAI(pend["sai"].start[:, 0], pend["sai"].start_rc[:, 0],
                pend["sai"].size[:, 0]),
        )
        i_out = jnp.where(fwd_exit & can_bwd, st.center - 1, i_out)

        # ---- S_BWD: extend all pending intervals at query index i
        at_bwd = phase == S_BWD
        live = karr[None, :] < st.p_n[:, None]
        qi_b = gather_q(st.i)[:, None]
        okk = extend_backward(fmd, st.p_sai, jnp.broadcast_to(qi_b, (B, K)))
        # first live entry whose extension dies -> emplace its pre-extension
        # state (bHaveOne logic: later ones are enclosed)
        dead = live & (okk.size <= min_ambiguity)
        has_dead = dead.any(axis=1)
        first_dead = jnp.argmax(dead, axis=1)
        emp = at_bwd & has_dead
        gk = lambda a: a[barr, first_dead]
        segs = _emplace(
            segs, emp, gk(st.p_qs), gk(st.p_sz),
            SAI(gk(st.p_sai.start), gk(st.p_sai.start_rc), gk(st.p_sai.size)),
        )
        # keep entries that extend (reference: ok>minAmb or (ok>0 and
        # segment size >= maxAmbiguity)); update to the extended state.
        # The emplaced (first dead) entry is never kept — it took the
        # if-branch, all other entries take the else-if (binarySeeding.h:399-412)
        emplaced_onehot = dead & (karr[None, :] == first_dead[:, None])
        keep = live & ~emplaced_onehot & (
            (okk.size > min_ambiguity)
            | ((okk.size > 0) & (st.p_sz >= max_ambiguity))
        )
        pos = jnp.cumsum(keep.astype(jnp.int32), axis=1) - 1
        n_keep = keep.sum(axis=1).astype(jnp.int32)

        # order-preserving compaction: kept entries scatter-add to their
        # cumsum position (unique); dropped lanes add 0 at slot K-1
        def compact(vals):
            idx = jnp.where(keep, pos, K - 1)
            contrib = jnp.where(keep, vals, 0)
            return jax.vmap(
                lambda ix, v: jnp.zeros(K, vals.dtype).at[ix].add(v)
            )(idx, contrib)

        new_qs = compact(jnp.broadcast_to(st.i[:, None], (B, K)))
        new_sz = compact(st.p_sz + 1)
        new_sai = SAI(compact(okk.start), compact(okk.start_rc), compact(okk.size))
        upd = at_bwd[:, None]
        p_qs = jnp.where(upd, new_qs, pend["qs"])
        p_sz = jnp.where(upd, new_sz, pend["sz"])
        p_sai = SAI(
            jnp.where(upd, new_sai.start, pend["sai"].start),
            jnp.where(upd, new_sai.start_rc, pend["sai"].start_rc),
            jnp.where(upd, new_sai.size, pend["sai"].size),
        )
        p_n = jnp.where(at_bwd, n_keep, pend["n"])
        cov_s = jnp.where(at_bwd & (n_keep > 0), st.i, cov_s)
        bwd_done = at_bwd & ((n_keep == 0) | (st.i == 0))
        # reached query start with live intervals: emplace the longest (front)
        final_emp = bwd_done & (n_keep > 0)
        segs = _emplace(
            segs, final_emp, p_qs[:, 0], p_sz[:, 0],
            SAI(p_sai.start[:, 0], p_sai.start_rc[:, 0], p_sai.size[:, 0]),
        )
        i_out = jnp.where(at_bwd & ~bwd_done, st.i - 1, i_out)
        next_phase = jnp.where(bwd_done, S_SPLIT, next_phase)

        # ---- S_SPLIT: identical to the max-spanning split
        at_split = phase == S_SPLIT
        cov_e_excl = cov_e + 1  # cov_e is inclusive here
        push = at_split & (cov_s != 0) & (st.s + 1 < cov_s)
        can_push = push & (sp < max_stack)
        slot = jnp.minimum(sp, max_stack - 1)
        stack_s = stack_s.at[barr, slot].set(
            jnp.where(can_push, st.s, stack_s[barr, slot])
        )
        stack_e = stack_e.at[barr, slot].set(
            jnp.where(can_push, cov_s, stack_e[barr, slot])
        )
        sp = sp + can_push.astype(jnp.int32)
        segs = segs._replace(overflow=segs.overflow | (push & ~can_push) | pend["over"])
        cont_right = at_split & (st.e > cov_e_excl)
        s_out = jnp.where(cont_right, cov_e_excl - 1, s_out)
        do_pop = at_split & ~cont_right & (sp > 0)
        pslot = jnp.maximum(sp - 1, 0)
        s_out = jnp.where(do_pop, stack_s[barr, pslot], s_out)
        e_out = jnp.where(do_pop, stack_e[barr, pslot], e_out)
        sp = sp - do_pop.astype(jnp.int32)
        next_phase = jnp.where(
            at_split,
            jnp.where(cont_right | do_pop, S_NEW, S_DONE),
            next_phase,
        )

        return _SmemState(
            phase=next_phase.astype(jnp.int32),
            s=s_out,
            e=e_out,
            center=center_out,
            i=i_out,
            ik=ik_out,
            p_qs=p_qs,
            p_sz=p_sz,
            p_sai=p_sai,
            p_n=p_n,
            cov_s=cov_s,
            cov_e=cov_e,
            stack_s=stack_s,
            stack_e=stack_e,
            sp=sp,
            segs=segs,
            iters=st.iters + 1,
        )

    final = jax.lax.while_loop(cond, body, st0)
    segs = final.segs
    segs = segs._replace(overflow=segs.overflow | (final.phase != S_DONE))
    return segs
