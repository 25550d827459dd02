"""Device seed filters.

TPU re-design of the reference seed-filter modules
(reference: libs/ma/inc/ma/module/seedFilters.h — SeedLumping:169,
SortRemoveDuplicates:343, MinLength:473, FilterContigBorder:436):

* seed_lump: merge seeds on the same (strand, diagonal) whose query
  intervals overlap or touch, via prefix-max interval merging (the
  reference's sequential sweep becomes sort + segmented reductions).
  The reference additionally extends seeds over matching bases between
  them (fExtendSeedRightFunc); exact-overlap merging is the device
  subset of that behavior.
* sort_remove_duplicates: exact-duplicate removal by sort + neighbor
  compare.
* min_length: drop seeds shorter than a threshold.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ma_tpu.ops.extract import SeedBatch

INT_MAX = jnp.int32(2**31 - 1)


def _lump_delta(seeds: SeedBatch) -> jax.Array:
    """SeedLumping::getDelta (seedFilters.h:181-187)."""
    return jnp.where(
        seeds.on_forward,
        seeds.ref_start - seeds.q_start,
        seeds.ref_start + seeds.q_start,
    )


def _repack(seeds: SeedBatch, q_start, length, ref_start, on_forward, ambiguity,
            delta, valid) -> SeedBatch:
    zero = jnp.zeros_like(q_start)
    return SeedBatch(
        q_start=jnp.where(valid, q_start, zero),
        length=jnp.where(valid, length, zero),
        ref_start=jnp.where(valid, ref_start, zero),
        on_forward=on_forward & valid,
        ambiguity=jnp.where(valid, ambiguity, zero),
        delta=jnp.where(valid, delta, INT_MAX),
        soc_nt=zero,
        valid=valid,
        n_seeds=valid.sum(axis=1).astype(jnp.int32),
        overflow=seeds.overflow,
    )


def seed_lump(seeds: SeedBatch) -> SeedBatch:
    """Merge same-diagonal overlapping seeds (SeedLumping, seedFilters.h:169-290).

    Sort by (strand, diagonal-delta, q_start); a seed opens a new merged run
    when the diagonal changes or its query start lies beyond the running
    maximum end; runs reduce to (min start, max end).
    """
    from ma_tpu.ops.sortops import sort_with_payloads

    B, S = seeds.q_start.shape
    ld = _lump_delta(seeds)
    fwd = seeds.on_forward.astype(jnp.int32)
    # sort: invalid last, fwd first (reference comparator), delta, q_start —
    # one variadic sort instead of lexsort + per-plane takes (see sortops.py)
    key_major = jnp.where(seeds.valid, (1 - fwd), 2)
    (_, sld, sq), (sl, sfw, sam, sva) = sort_with_payloads(
        [key_major, ld, seeds.q_start],
        [seeds.length, seeds.on_forward, seeds.ambiguity, seeds.valid],
    )
    send = sq + sl

    same_group = (
        (sld == jnp.roll(sld, 1, axis=1))
        & (sfw == jnp.roll(sfw, 1, axis=1))
        & sva
        & jnp.roll(sva, 1, axis=1)
    )
    same_group = same_group.at[:, 0].set(False)
    grp = jnp.cumsum(~same_group, axis=1)  # group id per slot

    # segmented prefix-max of ends (reset at group boundaries)
    def comb_max(a, b):
        ga, ea = a
        gb, eb = b
        return gb, jnp.where(ga == gb, jnp.maximum(ea, eb), eb)

    _, pmax_end = jax.lax.associative_scan(comb_max, (grp, send), axis=1)
    pmax_before = jnp.concatenate(
        [jnp.zeros((B, 1), send.dtype), pmax_end[:, :-1]], axis=1
    )
    new_run = ~same_group | (sq > pmax_before)
    run_id = jnp.cumsum(new_run.astype(jnp.int32), axis=1)

    # scatter-free segmented aggregation: instead of compacting runs, mark
    # each run's LAST element as the merged seed. The merged start is the
    # run's first q (propagated forward), the merged end the segmented
    # prefix-max of ends (segment_min/max ops lower to scatters — slow on
    # TPU — while associative scans are pure vector work).
    def comb_first(a, b):
        ga, va_ = a
        gb, vb_ = b
        return gb, jnp.where(ga == gb, va_, vb_)

    _, run_first_q = jax.lax.associative_scan(
        comb_first, (run_id, sq), axis=1
    )
    _, run_first_amb = jax.lax.associative_scan(
        comb_first, (run_id, sam), axis=1
    )
    _, run_max_e = jax.lax.associative_scan(comb_max, (run_id, send), axis=1)
    is_last = jnp.concatenate(
        [run_id[:, 1:] != run_id[:, :-1], jnp.ones((B, 1), bool)], axis=1
    )
    valid = is_last & sva
    q_start = jnp.where(valid, run_first_q, 0)
    length = jnp.where(valid, run_max_e - run_first_q, 0)
    ref_start = jnp.where(sfw, sld + q_start, sld - q_start)
    return _repack(seeds, q_start, length, ref_start, sfw,
                   jnp.where(valid, run_first_amb, 0),
                   jnp.where(valid, sld, INT_MAX), valid)


def sort_remove_duplicates(seeds: SeedBatch) -> SeedBatch:
    """Drop exact duplicate (q_start, ref_start, length, strand) seeds
    (SortRemoveDuplicates, seedFilters.h:343)."""
    from ma_tpu.ops.sortops import sort_with_payloads

    B, S = seeds.q_start.shape
    key_major = jnp.where(seeds.valid, seeds.on_forward.astype(jnp.int32), 2)
    (_, sr, sq, sl), (sfw, sam, sva, sd) = sort_with_payloads(
        [key_major, seeds.ref_start, seeds.q_start, seeds.length],
        [seeds.on_forward, seeds.ambiguity, seeds.valid, seeds.delta],
    )
    dup = (
        (sq == jnp.roll(sq, 1, axis=1))
        & (sr == jnp.roll(sr, 1, axis=1))
        & (sl == jnp.roll(sl, 1, axis=1))
        & (sfw == jnp.roll(sfw, 1, axis=1))
        & sva
        & jnp.roll(sva, 1, axis=1)
    )
    dup = dup.at[:, 0].set(False)
    valid = sva & ~dup
    return _repack(seeds, sq, sl, sr, sfw, sam, sd, valid)


def min_length(seeds: SeedBatch, min_len: int) -> SeedBatch:
    """Drop seeds shorter than min_len (MinLength, seedFilters.h:473)."""
    valid = seeds.valid & (seeds.length >= min_len)
    return _repack(seeds, seeds.q_start, seeds.length, seeds.ref_start,
                   seeds.on_forward, seeds.ambiguity, seeds.delta, valid)
