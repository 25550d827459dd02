"""Seed harmonization on device.

TPU re-design of the reference Harmonization module
(reference: libs/ma/src/module/harmonization.cpp, harmonization.h):

* pops SoCs best-first with the heuristic skip/break rules of
  Harmonization::execute (harmonization.cpp:371-540) — here all top-K SoCs
  are harmonized in parallel and the sequential skip/break logic is replayed
  afterwards over the per-SoC scores (same decisions, no wasted wall-clock
  on TPU because the batch is uniform work)
* per SoC: strand split (reverse seeds mirrored to text coordinates,
  harmonization.cpp:437-442), robust guide-line estimate (the reference
  uses PCL RANSAC with a MAD threshold and a 20..70 degree angle gate,
  ransac.cpp:100-116; here: deterministic candidate-pair RANSAC — evenly
  spread seed-midpoint pairs scored by inlier count, then least squares
  over the best candidate's inliers, lin_regres.h:54-136), outlier removal
  (harmonization.cpp:283-290), and the two shadow line sweeps
  (harmonization.cpp:182-249)
* applyFilters: delta-distance artifact filter (+ optional gap-cost
  cutting) (harmonization.cpp:14-178)

Shapes: [B, K, M] = batch x SoCs x seeds-per-SoC; strand axis doubles K.
"""
from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ma_tpu.ops.soc import SoCBatch

NEG = jnp.float32(-1e30)
POS = jnp.float32(1e30)


class HarmBatch(NamedTuple):
    """Harmonized seed sets: [B, G, M] where G = 2*K (forward/reverse set
    per SoC, forward first — harmonization.cpp:500-509 push order)."""

    q_start: jax.Array  # int32 [B, G, M]
    length: jax.Array  # int32 [B, G, M]
    ref_start: jax.Array  # int32 [B, G, M] text coords [0, 2L)
    on_forward: jax.Array  # bool [B, G]
    valid: jax.Array  # bool [B, G, M]
    set_valid: jax.Array  # bool [B, G] — kept by the execute heuristics
    soc_of: jax.Array  # int32 [B, G] — originating SoC rank


def _sel_minor(arr: jax.Array, idx: jax.Array) -> jax.Array:
    """arr[..., idx[..., k]] without a minor-axis gather: take_along_axis on
    the last axis of a >2-D array lowers to a ~60 ms gather on TPU
    (profiling/profile_sweep_bisect.py); a one-hot mask + reduce is pure
    vector work. arr [..., P], idx [..., K] -> [..., K]."""
    P = arr.shape[-1]
    mask = jnp.arange(P) == idx[..., None]
    return jnp.where(mask, arr[..., None, :], 0).sum(axis=-1).astype(arr.dtype)


def _masked_median(vals: jax.Array, mask: jax.Array) -> jax.Array:
    """Median per C++ Median (test_ransac.h:25-39): sorted middle element,
    averaging the two middles for even counts. vals [..., P]."""
    big = jnp.where(mask, vals, POS)
    s = jnp.sort(big, axis=-1)
    cnt = mask.sum(axis=-1)
    hi_i = jnp.maximum(cnt // 2, 0)
    lo_i = jnp.maximum((cnt - 1) // 2, 0)
    sel = _sel_minor(s, jnp.stack([lo_i, hi_i], axis=-1))
    med = (sel[..., 0] + sel[..., 1]) * 0.5
    return jnp.where(cnt > 0, med, 0.0)


def _delta_distance(q0, r0, angle, rstart):
    """deltaDistance (harmonization.h:82-89)."""
    y = r0 + q0 / jnp.tan(math.pi / 2 - angle)
    x = (y - rstart) * jnp.sin(angle)
    x1 = q0 / jnp.sin(math.pi / 2 - angle)
    return jnp.abs(x - x1)


def _fit_guide_line(q, l, r, valid, n_cand: int = 8):
    """Deterministic RANSAC-like line fit. Returns (angle, rstart, mad).

    Points: per seed (start, mid, end) in the (x=ref, y=query) plane
    (harmonization.cpp:262-274). Candidates: all pairs of up to n_cand
    evenly spread valid-seed midpoints, gated to 20..70 degrees
    (ransac.cpp:100-116), scored by inliers within MAD euclidean distance;
    least squares over the winner's inliers (lin_regres.h).
    """
    M = q.shape[-1]
    fq = q.astype(jnp.float32)
    fl = l.astype(jnp.float32)
    fr = r.astype(jnp.float32)
    # 3M points
    xs = jnp.concatenate([fr + fl / 2.0, fr, fr + fl], axis=-1)
    ys = jnp.concatenate([fq + fl / 2.0, fq, fq + fl], axis=-1)
    pmask = jnp.concatenate([valid] * 3, axis=-1)
    mad = _masked_median(jnp.abs(ys - _masked_median(ys, pmask)[..., None]), pmask)

    # candidate midpoints: n_cand evenly spread valid seeds
    cnt = valid.sum(axis=-1)
    order = jnp.argsort(~valid, axis=-1, stable=True)  # valid first
    j = jnp.arange(n_cand)
    denom = jnp.clip(jnp.minimum(cnt, n_cand), 1, n_cand)
    sel = (j[None, :] * jnp.maximum(cnt, 1)[..., None]) // denom[..., None]
    sel_idx = _sel_minor(order, jnp.minimum(sel, M - 1))
    cx = _sel_minor(fr + fl / 2.0, sel_idx)
    cy = _sel_minor(fq + fl / 2.0, sel_idx)
    cvalid = j[None, :] < jnp.minimum(cnt, n_cand)[..., None]

    pairs = [(a, b) for a in range(n_cand) for b in range(a + 1, n_cand)]
    pa = jnp.array([p[0] for p in pairs])
    pb = jnp.array([p[1] for p in pairs])
    x1, y1 = cx[..., pa], cy[..., pa]
    x2, y2 = cx[..., pb], cy[..., pb]
    dx, dy = x2 - x1, y2 - y1
    # angle gate 20..70 deg on |dy/dx| in the first quadrant
    adx = jnp.where((dx <= 0) & (dy <= 0), -dx, dx)
    ady = jnp.where((dx <= 0) & (dy <= 0), -dy, dy)
    ang_deg = jnp.where(
        (adx > 0) & (ady > 0), jnp.degrees(jnp.arctan2(ady, jnp.maximum(adx, 1e-9))), -90.0
    )
    cand_ok = (
        cvalid[..., pa] & cvalid[..., pb] & (ang_deg >= 20) & (ang_deg <= 70)
        & ((dx != 0) | (dy != 0))
    )
    # point-line distances: |cross| / norm  [.., P, 3M]
    nrm = jnp.sqrt(dx * dx + dy * dy)
    cross = (xs[..., None, :] - x1[..., :, None]) * dy[..., :, None] - (
        ys[..., None, :] - y1[..., :, None]
    ) * dx[..., :, None]
    dist = jnp.abs(cross) / jnp.maximum(nrm[..., :, None], 1e-9)
    inl = pmask[..., None, :] & (dist <= mad[..., None, None])
    n_inl = jnp.where(cand_ok, inl.sum(axis=-1), -1)
    best = jnp.argmax(n_inl, axis=-1)  # first max wins
    has_cand = jnp.max(n_inl, axis=-1) > 0
    # row `best` of inl, one-hot over the candidate axis (no gather)
    best_oh = jnp.arange(n_inl.shape[-1]) == best[..., None]
    binl = (best_oh[..., None] & inl).any(axis=-2) & pmask

    # least squares over inliers (lin_regres.h:54-136)
    w = binl.astype(jnp.float32)
    nw = jnp.maximum(w.sum(axis=-1), 1.0)
    mx = (xs * w).sum(axis=-1) / nw
    my = (ys * w).sum(axis=-1) / nw
    sxx = (w * (xs - mx[..., None]) ** 2).sum(axis=-1)
    sxy = (w * (xs - mx[..., None]) * (ys - my[..., None])).sum(axis=-1)
    slope = sxy / jnp.maximum(sxx, 1e-9)
    intercept = my - slope * mx
    ok = has_cand & (jnp.abs(slope) > 1e-6)
    angle = jnp.where(ok, jnp.arctan(slope), jnp.float32(0.785398))
    # fallback: 45 deg through the median seed (harmonization.cpp #else branch)
    med_i = _sel_minor(order, jnp.maximum(cnt // 2, 0)[..., None])[..., 0]
    med_rs = (
        _sel_minor(fr, med_i[..., None]) - _sel_minor(fq, med_i[..., None])
    )[..., 0]
    rstart = jnp.where(ok, -intercept / jnp.where(jnp.abs(slope) > 1e-6, slope, 1.0), med_rs)
    return angle, rstart, mad


def _window_extract(planes: jax.Array, starts: jax.Array, M: int) -> jax.Array:
    """Extract K windows of M consecutive elements per row without a gather.

    planes [P, B, S] (S a power of two), starts [B, K] in [0, S-1] ->
    [P, B, K, M]: each read row is rolled left by its window start with
    log2(S) masked STATIC shifts (a barrel shifter), shrinking the live
    width once the remaining shift bound allows. The flat 1-D gather this
    replaces costs ~85 ms at [4096, 8, 64] on TPU vs ~11 ms for the shifts
    (profiling/profile_gather_tricks.py) — TPU gathers from HBM are
    per-element loads; masked selects of statically-shifted copies are pure
    vector work.
    """
    P, B, S = planes.shape
    K = starts.shape[1]
    assert S & (S - 1) == 0, "S must be a power of two"
    outs = []
    for k in range(K):
        st = starts[:, k]
        cur = planes
        width = S
        for bit in reversed(range(int(math.log2(S)))):
            sh = 1 << bit
            if sh >= width:
                continue
            shifted = jnp.concatenate(
                [cur[..., sh:], jnp.zeros((P, B, sh), cur.dtype)], axis=-1
            )
            on = (st & sh) != 0
            cur = jnp.where(on[None, :, None], shifted, cur)
            # remaining shift < sh: columns past M + sh - 1 are dead
            need = M + sh - 1
            if need < width:
                width = need
                cur = cur[..., :width]
        outs.append(cur[..., :M])
    return jnp.stack(outs, axis=2)  # [P, B, K, M]


def _use_sweep_pallas() -> bool:
    """Pallas sweep on accelerators; XLA scan on CPU (and under tests)."""
    import os

    mode = os.environ.get("MA_TPU_SWEEP", "auto")
    if mode == "pallas":
        return True
    if mode == "xla":
        return False
    return jax.devices()[0].platform not in ("cpu",)


def _linesweep(starts, ends, dists, seed_idx, valid):
    """One shadow line sweep (harmonization.cpp linesweep:182-249).

    All arrays [..., M]; returns a survivor mask over the ORIGINAL seed
    indices. Elements processed in (start asc, end desc) order. seed_idx
    must be the identity (arange) over the last axis — both callers pass
    that; the Pallas fast path relies on it.
    """
    M = starts.shape[-1]
    lead = starts.shape[:-1]
    R = 1
    for d in lead:
        R *= int(d)
    # ONE stable variadic sort carries every payload through the sorting
    # network: minor-axis take_along_axis gathers on >2-D arrays lower to
    # ~60 ms EACH on TPU (profile_sweep_bisect.py), so sort keys + payloads
    # together on a 2-D reshape instead. Order: invalid last, start asc,
    # end desc.
    key_start = jnp.where(valid, starts, jnp.int32(2**30)).reshape(R, M)
    orig = jnp.broadcast_to(jnp.arange(M, dtype=jnp.int32), (R, M))
    _, _, s_end2, s_dist2, s_valid2, s_orig2 = jax.lax.sort(
        (
            key_start,
            (-ends).reshape(R, M),
            ends.reshape(R, M),
            dists.reshape(R, M),
            valid.reshape(R, M).astype(jnp.int32),
            orig,
        ),
        num_keys=2,
        is_stable=True,
    )

    if _use_sweep_pallas():
        from ma_tpu.ops.harmonize_pallas import linesweep_sorted_pallas

        # the kernel reports survivors at ORIGINAL positions directly
        return linesweep_sorted_pallas(
            s_end2, s_dist2, s_valid2, s_orig2
        ).reshape(*lead, M)
    # the barrier stops XLA from rematerializing the (sorted) producer
    # chain inside every scan iteration — a fusion pathology that made the
    # 64-step sweep ~40x slower when fed from fused upstream compute
    s_end, s_dist, s_seed, s_valid = jax.lax.optimization_barrier(
        (
            s_end2.reshape(*lead, M),
            s_dist2.reshape(*lead, M),
            s_orig2.reshape(*lead, M),
            s_valid2.reshape(*lead, M).astype(bool),
        )
    )

    st_end0 = jnp.full(lead + (M,), 2**30, jnp.int32)  # +inf so searchsorted works
    st_dist0 = jnp.zeros(lead + (M,), jnp.float32)
    st_seed0 = jnp.full(lead + (M,), -1, jnp.int32)
    sp0 = jnp.zeros(lead, jnp.int32)
    x0 = jnp.full(lead, -1, jnp.int32)

    pos_range = jnp.arange(M)

    def step(carry, elem):
        st_end, st_dist, st_seed, sp, x = carry
        e, d, si, va = elem
        # push position: either sp (grow) or the start of the >=e suffix
        ge_mask = (pos_range < sp[..., None]) & (st_end >= e[..., None])
        suffix_pos = jnp.where(
            ge_mask.any(axis=-1), jnp.argmax(ge_mask, axis=-1), sp
        )
        grow = e > x
        any_closer = (ge_mask & (st_dist <= d[..., None])).any(axis=-1)
        do_push = va & (grow | ~any_closer)
        put = jnp.where(grow, sp, suffix_pos)
        upd = va & do_push
        oh = jax.nn.one_hot(put, M, dtype=bool) & upd[..., None]
        st_end = jnp.where(oh, e[..., None], st_end)
        st_dist = jnp.where(oh, d[..., None], st_dist)
        st_seed = jnp.where(oh, si[..., None], st_seed)
        # entries past the push position die (suffix replacement keeps sorted inv.)
        new_sp = jnp.where(upd, put + 1, sp)
        kill = (pos_range >= new_sp[..., None]) & (pos_range < sp[..., None])
        st_end = jnp.where(kill, 2**30, st_end)
        st_seed = jnp.where(kill, -1, st_seed)
        x = jnp.where(va, jnp.maximum(x, e), x)
        return (st_end, st_dist, st_seed, new_sp, x), None

    elems = (
        jnp.moveaxis(s_end, -1, 0),
        jnp.moveaxis(s_dist, -1, 0),
        jnp.moveaxis(s_seed, -1, 0),
        jnp.moveaxis(s_valid, -1, 0),
    )
    (st_end, st_dist, st_seed, sp, _), _ = jax.lax.scan(
        step, (st_end0, st_dist0, st_seed0, sp0, x0), elems
    )
    # survivor mask over original seed slots. A scatter here is slow on TPU;
    # the [.., M, M] comparison-broadcast reduction is pure vector work.
    alive = (pos_range < sp[..., None]) & (st_seed >= 0)
    surv = (
        (st_seed[..., :, None] == pos_range[None, :]) & alive[..., :, None]
    ).any(axis=-2)
    return surv


def harmonize_sets(q, l, r, valid, n_cand: int = 8):
    """harmonizeOne (harmonization.cpp:251-370) batched over leading dims.

    q/l/r int32 [..., M] (r in text coords), valid bool. Returns a new valid
    mask (subset, or the single fallback center seed).
    """
    M = q.shape[-1]
    cnt = valid.sum(axis=-1)
    angle, rstart, mad = _fit_guide_line(q, l, r, valid, n_cand=n_cand)
    dist = _delta_distance(q.astype(jnp.float32), r.astype(jnp.float32), angle[..., None],
                           rstart[..., None])
    kept = valid & (dist <= mad[..., None])  # outlier removal
    seed_idx = jnp.broadcast_to(jnp.arange(M), q.shape).astype(jnp.int32)

    # left shadows: (start=q_start, end=end_ref)
    surv1 = _linesweep(q, r + l, dist, seed_idx, kept)
    # right shadows: (start=ref_start, end=end_q)
    surv2 = _linesweep(r, q + l, dist, seed_idx, kept & surv1)
    out = kept & surv1 & surv2

    # fallback: center seed of the outlier-removed set when <=1 remain
    n_out = out.sum(axis=-1)
    k_cnt = kept.sum(axis=-1)
    order = jnp.argsort(~kept, axis=-1, stable=True)
    center = _sel_minor(order, jnp.maximum(k_cnt // 2, 0)[..., None])[..., 0]
    fb = jax.nn.one_hot(center, M, dtype=bool) & (k_cnt > 0)[..., None]
    out = jnp.where((n_out <= 1)[..., None], fb, out)
    # single input seed passes through; empty input stays empty
    out = jnp.where((cnt <= 1)[..., None], valid, out)
    return out


def artifact_filter(q, l, r, valid, max_delta_dist=0.1, min_delta_dist=16):
    """Delta-distance artifact filter (applyFilters, harmonization.cpp:137-178).

    Operates on seeds sorted by (ref asc, q asc); flagged seeds get length 0
    (here: valid=False). Returns new valid mask.
    """
    M = q.shape[-1]
    lead = q.shape[:-1]
    R = 1
    for d in lead:
        R *= int(d)
    # variadic sort instead of lexsort+takes (see _linesweep comment).
    # key_r stands in for r below: they agree on valid elements, and invalid
    # ones sort last and are never read (active requires 1 <= i < n-1).
    key_r = jnp.where(valid, r, jnp.int32(2**30))
    orig = jnp.broadcast_to(jnp.arange(M, dtype=jnp.int32), (R, M))
    key_r2, sq2, sv2, sord2 = jax.lax.sort(
        (
            key_r.reshape(R, M),
            q.reshape(R, M),
            valid.reshape(R, M).astype(jnp.int32),
            orig,
        ),
        num_keys=2,
        is_stable=True,
    )
    sr = key_r2.reshape(*lead, M)
    sq = sq2.reshape(*lead, M)
    sv = sv2.reshape(*lead, M).astype(bool)
    ordr = sord2.reshape(*lead, M)
    delta = sr - sq  # int32; |delta| < 2L
    n = sv.sum(axis=-1)

    # the scan carries the previous kept element's delta VALUE (the reference
    # carries an index; a per-row index gather each step is slow on TPU) and
    # consumes the per-position delta/delta-next as scan xs
    delta_x, delta_post_x = jax.lax.optimization_barrier((
        jnp.moveaxis(delta, -1, 0),
        jnp.moveaxis(
            jnp.concatenate([delta[..., 1:], delta[..., -1:]], axis=-1), -1, 0
        ),
    ))

    def step(carry, xs):
        d_prev, i = carry
        d_ctr, d_post = xs
        active = (i >= 1) & (i + 1 < n)
        dist_pre = jnp.abs(d_prev - d_ctr)
        dist_post = jnp.abs(d_post - d_ctr)
        both_zero = (dist_pre + dist_post) == 0
        diff = jnp.abs(dist_pre - dist_post) * 2.0 / jnp.maximum(
            (dist_pre + dist_post).astype(jnp.float32), 1.0
        )
        # C++ divides by zero -> NaN -> comparison false; replicate via mask
        trigger = active & ~both_zero & (diff < max_delta_dist) & (dist_pre > min_delta_dist)
        d_prev = jnp.where(active & ~trigger, d_ctr, d_prev)
        return (d_prev, i + 1), trigger

    d_prev0 = delta[..., 0]
    (_, _), killed_t = jax.lax.scan(
        step, (d_prev0, jnp.int32(0)), (delta_x, delta_post_x)
    )
    killed = jnp.moveaxis(killed_t, 0, -1)
    new_sv = sv & ~killed
    # scatter-free mapping back to original slots (see _linesweep comment)
    out = (
        (ordr[..., :, None] == jnp.arange(M)[None, :]) & new_sv[..., :, None]
    ).any(axis=-2)
    return out


def compact_harm(harm: HarmBatch, max_sets: int) -> HarmBatch:
    """Gather the (few) valid harmonized sets to the front and truncate the
    set axis to `max_sets` — shrinks the device->host transfer by ~G/max_sets
    (most of the G = 2*K candidate sets are invalid after the heuristics)."""
    B, G, M = harm.q_start.shape
    order = jnp.argsort(~harm.set_valid, axis=1, stable=True)[:, :max_sets]
    g2 = lambda a: jnp.take_along_axis(a, order, axis=1)
    g3 = lambda a: jnp.take_along_axis(a, order[..., None], axis=1)
    return HarmBatch(
        q_start=g3(harm.q_start),
        length=g3(harm.length),
        ref_start=g3(harm.ref_start),
        on_forward=g2(harm.on_forward),
        valid=g3(harm.valid),
        set_valid=g2(harm.set_valid),
        soc_of=g2(harm.soc_of),
    )


def harmonization(
    soc: SoCBatch,
    qlen: jax.Array,  # int32 [B]
    text_len,  # n = 2L (python int or scalar)
    max_socs: int = 30,  # uiMaxTries = Maximal Number of SoCs
    min_socs: int = 1,  # uiMinTries = Minimal Number of SoCs
    seeds_per_soc: int = 64,
    n_cand: int = 8,
    do_heuristics: bool = True,
    switch_qlen: int = 800,
    score_tolerance: float = 0.1,
    harm_score_min: int = 18,
    harm_score_min_rel: float = 0.002,
    score_diff_tolerance: float = 0.0001,
    max_lookahead: int = 3,
    max_delta_dist: float = 0.1,
    min_delta_dist: int = 16,
) -> HarmBatch:
    """Full Harmonization::execute (harmonization.cpp:371-560) for a batch.

    All top-K SoCs are harmonized in parallel; the sequential skip/break
    heuristics are replayed over the resulting scores afterwards.
    """
    B = soc.n_socs.shape[0]
    K = min(max_socs, soc.start.shape[1])
    M = seeds_per_soc
    sd = soc.seeds

    # ---- extract SoC windows to [B, K, M] via the barrel shifter
    # (_window_extract): strand folds into ref's sign and validity into a
    # zeroed length, so only 3 planes ride the shifts
    S_seeds = sd.q_start.shape[1]
    offs = jnp.arange(M)[None, None, :]
    idx = soc.start[:, :K, None] + offs
    in_win = (idx < soc.end[:, :K, None]) & (
        jnp.arange(K)[None, :, None] < soc.n_socs[:, None, None]
    )
    l_eff = jnp.where(sd.valid, sd.length, 0)
    ref_signed = jnp.where(sd.on_forward, sd.ref_start, -sd.ref_start - 1)
    planes = jnp.stack([sd.q_start, l_eff, ref_signed])
    starts_c = jnp.clip(soc.start[:, :K], 0, S_seeds - 1)
    win = _window_extract(planes, starts_c, M)
    va = in_win & (win[1] > 0)
    q = jnp.where(va, win[0], 0)
    l = jnp.where(va, win[1], 0)
    fw = win[2] >= 0
    ref = jnp.where(va, jnp.where(fw, win[2], -win[2] - 1), 0)
    fw = fw & va

    soc_score = jnp.where(va, l, 0).sum(axis=-1)  # uiCurrSoCScore [B, K]

    # ---- strand split; reverse seeds mirrored to text coords
    # (harmonization.cpp:437-442: pos = refLen - pos - 1)
    ref_rev = text_len - ref - 1
    q2 = jnp.stack([q, q], axis=2)  # [B, K, 2, M]
    l2 = jnp.stack([l, l], axis=2)
    r2 = jnp.stack([ref, ref_rev], axis=2)
    va2 = jnp.stack([va & fw, va & ~fw], axis=2)

    harm_valid = harmonize_sets(q2, l2, r2, va2, n_cand=n_cand)
    harm_score = jnp.where(harm_valid, l2, 0).sum(axis=(-2, -1))  # [B, K]
    set_nonempty = harm_valid.any(axis=-1)  # [B, K, 2]

    filt_valid = artifact_filter(
        q2, l2, r2, harm_valid, max_delta_dist=max_delta_dist, min_delta_dist=min_delta_dist
    )

    # ---- replay the sequential heuristics over K SoCs
    qf = qlen.astype(jnp.float32)

    def replay(carry, k):
        last, best, repeat, broken, pushes = carry
        num_tries = k + 1
        is_soc = k < soc.n_socs
        cs = soc_score[:, k]
        ch = harm_score[:, k]
        after_min = do_heuristics & (num_tries > min_socs)
        long_q = (qlen > switch_qlen) & (switch_qlen != 0)
        short_q = (qlen < switch_qlen) & (switch_qlen != 0)

        brk = broken | (num_tries > max_socs) | ~is_soc
        skip1 = after_min & long_q & (last > cs)
        brk = brk | (after_min & ~skip1 & (best.astype(jnp.float32) * score_tolerance > cs.astype(jnp.float32)) & (score_tolerance > 0))
        alive = ~brk & ~skip1
        best = jnp.where(alive, jnp.maximum(best, cs), best)
        skip2 = after_min & (ch < harm_score_min)
        skip3 = jnp.asarray(do_heuristics) & (ch.astype(jnp.float32) < qf * harm_score_min_rel)
        skip4 = after_min & long_q & (last > ch)
        keep = alive & ~skip2 & ~skip3 & ~skip4

        n_push = jnp.where(
            keep,
            set_nonempty[:, k, 0].astype(jnp.int32) + set_nonempty[:, k, 1].astype(jnp.int32),
            0,
        )
        repeat = repeat + jnp.where(keep, n_push, 0)
        # short-query lookahead bookkeeping (harmonization.cpp:512-528)
        in_la = after_min & short_q
        tol = qf * score_diff_tolerance
        same = (ch.astype(jnp.float32) + tol >= last.astype(jnp.float32)) & (
            ch.astype(jnp.float32) - tol <= last.astype(jnp.float32)
        )
        repeat = jnp.where(keep & in_la & ~same, 0, repeat)
        brk_la = keep & in_la & (repeat >= max_lookahead) & (max_lookahead != 0)
        repeat = jnp.where(keep & ~in_la, 0, repeat)
        broken = brk | brk_la
        last = jnp.where(keep, ch, last)
        return (last, best, repeat, broken, pushes + n_push), (keep, n_push)

    z = jnp.zeros(B, jnp.int32)
    carry0 = (z, z, z, jnp.zeros(B, bool), z)
    (last, best, repeat_f, _, total), (keeps, n_pushes) = jax.lax.scan(
        replay, carry0, jnp.arange(K, dtype=jnp.int32)
    )
    keeps = jnp.moveaxis(keeps, 0, 1)  # [B, K]
    n_pushes = jnp.moveaxis(n_pushes, 0, 1)

    # trailing pop: drop the last `repeat` pushes while > minTries
    if do_heuristics:
        final_cnt = jnp.where(
            total > min_socs, jnp.maximum(min_socs, total - repeat_f), total
        )
    else:
        final_cnt = total
    push_before = jnp.cumsum(n_pushes, axis=1) - n_pushes  # [B, K]
    # push index of fw set = push_before, rev set = push_before + fw_nonempty
    fw_ok = keeps & set_nonempty[:, :K, 0]
    rv_ok = keeps & set_nonempty[:, :K, 1]
    fw_rank = push_before
    rv_rank = push_before + fw_ok.astype(jnp.int32)
    fw_keep = fw_ok & (fw_rank < final_cnt[:, None])
    rv_keep = rv_ok & (rv_rank < final_cnt[:, None])

    set_valid = jnp.stack([fw_keep, rv_keep], axis=2).reshape(B, K * 2)
    out_valid = filt_valid & jnp.stack([fw_keep, rv_keep], axis=2)[..., None]
    return HarmBatch(
        q_start=q2.reshape(B, K * 2, M),
        length=l2.reshape(B, K * 2, M),
        ref_start=r2.reshape(B, K * 2, M),
        on_forward=jnp.broadcast_to(
            jnp.array([True, False])[None, None, :], (B, K, 2)
        ).reshape(B, K * 2),
        valid=out_valid.reshape(B, K * 2, M),
        set_valid=set_valid,
        soc_of=jnp.broadcast_to(jnp.arange(K)[None, :, None], (B, K, 2)).reshape(B, K * 2),
    )
