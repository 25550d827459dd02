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
    B, S = seeds.q_start.shape
    ld = _lump_delta(seeds)
    fwd = seeds.on_forward.astype(jnp.int32)
    # sort: invalid last, fwd first (reference comparator), delta, q_start
    key_major = jnp.where(seeds.valid, (1 - fwd), 2)
    order = jnp.lexsort((seeds.q_start, ld, key_major), axis=-1)
    g = lambda a: jnp.take_along_axis(a, order, axis=1)
    sq, sl, sld, sfw, sam, sva = (
        g(seeds.q_start), g(seeds.length), g(ld),
        g(seeds.on_forward), g(seeds.ambiguity), g(seeds.valid),
    )
    send = sq + sl

    same_group = (
        (sld == jnp.roll(sld, 1, axis=1))
        & (sfw == jnp.roll(sfw, 1, axis=1))
        & sva
        & jnp.roll(sva, 1, axis=1)
    )
    same_group = same_group.at[:, 0].set(False)
    # prefix max of ends within the row, reset at group boundaries: compute
    # via cummax of (end where same position chain) — standard trick: use
    # global segment ids from group change, then within group prefix-max
    grp = jnp.cumsum(~same_group, axis=1)  # group id per slot (1-based-ish)
    # prefix max of end per group: sort is stable by q_start so a prefix max
    # within the group; implement via associative_scan with masked reset
    def comb(a, b):
        ga, ea = a
        gb, eb = b
        return gb, jnp.where(ga == gb, jnp.maximum(ea, eb), eb)

    _, pmax_end = jax.lax.associative_scan(comb, (grp, send), axis=1)
    pmax_before = jnp.concatenate(
        [jnp.zeros((B, 1), send.dtype), pmax_end[:, :-1]], axis=1
    )
    new_run = ~same_group | (sq > pmax_before)
    run_id = jnp.cumsum(new_run.astype(jnp.int32), axis=1) - 1  # 0-based

    seg_min_q = jax.vmap(
        lambda rid, v: jax.ops.segment_min(v, rid, num_segments=S)
    )(run_id, jnp.where(sva, sq, INT_MAX))
    seg_max_e = jax.vmap(
        lambda rid, v: jax.ops.segment_max(v, rid, num_segments=S)
    )(run_id, jnp.where(sva, send, -1))
    seg_delta = jax.vmap(
        lambda rid, v: jax.ops.segment_min(v, rid, num_segments=S)
    )(run_id, jnp.where(sva, sld, INT_MAX))
    seg_fwd = jax.vmap(
        lambda rid, v: jax.ops.segment_max(v, rid, num_segments=S)
    )(run_id, jnp.where(sva, sfw.astype(jnp.int32), 0)).astype(bool)
    seg_amb = jax.vmap(
        lambda rid, v: jax.ops.segment_min(v, rid, num_segments=S)
    )(run_id, jnp.where(sva, sam, INT_MAX))
    seg_has = jax.vmap(
        lambda rid, v: jax.ops.segment_sum(v, rid, num_segments=S)
    )(run_id, sva.astype(jnp.int32))
    n_runs = (seg_has > 0).sum(axis=1)

    slot = jnp.arange(S)[None, :]
    valid = slot < n_runs[:, None]
    q_start = jnp.where(valid, seg_min_q, 0)
    length = jnp.where(valid, seg_max_e - seg_min_q, 0)
    ref_start = jnp.where(
        seg_fwd, seg_delta + q_start, seg_delta - q_start
    )
    return _repack(seeds, q_start, length, ref_start, seg_fwd,
                   jnp.where(valid, seg_amb, 0), jnp.where(valid, seg_delta, INT_MAX),
                   valid)


def sort_remove_duplicates(seeds: SeedBatch) -> SeedBatch:
    """Drop exact duplicate (q_start, ref_start, length, strand) seeds
    (SortRemoveDuplicates, seedFilters.h:343)."""
    B, S = seeds.q_start.shape
    key_major = jnp.where(seeds.valid, seeds.on_forward.astype(jnp.int32), 2)
    order = jnp.lexsort(
        (seeds.length, seeds.q_start, seeds.ref_start, key_major), axis=-1
    )
    g = lambda a: jnp.take_along_axis(a, order, axis=1)
    sq, sl, sr, sfw, sam, sva, sd = (
        g(seeds.q_start), g(seeds.length), g(seeds.ref_start),
        g(seeds.on_forward), g(seeds.ambiguity), g(seeds.valid), g(seeds.delta),
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
