"""Segment -> seed materialization on device.

TPU analog of the reference seed extraction
(reference: segment.h forEachSeed:89-115 / SegmentVector::forEachSeed:318-350,
stripOfConsideration.h ExtractSeeds:84-158):

* every BWT row of a segment's SA interval becomes one seed via the sampled-SA
  walk (bwt_sa); over-ambiguous segments are subsampled with stride
  size/maxAmbiguity (or skipped, segment.h:332-339)
* reverse-strand hits are mirrored to forward coordinates
  (segment.h:99-104: ref = n - ref - 1, on_forward = ref < n/2)
* each seed gets its SoC delta value incl. per-contig offsets
  (stripOfConsideration.h getPositionForBucketing:41-53, setDeltaOfSeed:97-112)

Static shapes: each read yields at most `max_seeds` seeds, assigned via a
prefix-sum compaction over per-segment counts.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ma_tpu.ops.occ import FMDDev, sa_lookup
from ma_tpu.ops.seeding import SegmentBatch


class SeedBatch(NamedTuple):
    """Fixed-shape seed set per read (reference Seed, seed.h:34-140).

    ref_start is in FORWARD strand coordinates [0, L); for reverse-strand
    seeds it is the mirrored position (largest coordinate of the match,
    decreasing along the query).
    """

    q_start: jax.Array  # int32 [B, S]
    length: jax.Array  # int32 [B, S]
    ref_start: jax.Array  # int32 [B, S]
    on_forward: jax.Array  # bool [B, S]
    ambiguity: jax.Array  # int32 [B, S]
    delta: jax.Array  # int32 [B, S] — SoC bucketing value
    soc_nt: jax.Array  # int32 [B, S] — accumulative SoC nt (filled by SoC stage)
    valid: jax.Array  # bool [B, S]
    n_seeds: jax.Array  # int32 [B]
    overflow: jax.Array  # bool [B]


def compute_delta(
    q_start: jax.Array,
    length: jax.Array,
    ref_start: jax.Array,
    on_forward: jax.Array,
    qlen: jax.Array,  # [B] or broadcastable
    contig_starts: jax.Array,  # int32 [C]
    ref_len_forward,  # L (scalar)
    rectangular: bool,
) -> jax.Array:
    """Delta/bucketing value (getPositionForBucketing + setDeltaOfSeed)."""
    num_contigs = contig_starts.shape[0]
    split = not rectangular
    pos = ref_start
    if split:
        far = 2 * (ref_len_forward + (qlen + 1) * num_contigs)
        pos = jnp.where(on_forward, ref_start, far - (ref_start - length))
    delta = pos + (qlen - q_start)
    contig = jnp.searchsorted(contig_starts, ref_start, side="right").astype(jnp.int32) - 1
    if split:
        contig = jnp.where(on_forward, contig, num_contigs - contig)
    return delta + (qlen + 1) * contig


def extract_seeds(
    fmd: FMDDev,
    segs: SegmentBatch,
    qlen: jax.Array,  # int32 [B]
    contig_starts: jax.Array,  # int32 [C]
    max_seeds: int = 512,
    max_ambiguity: int = 100,
    min_seed_len: int = 16,
    skip_ambiguous: bool = False,
    rectangular: bool = True,
    sa_fn=None,
) -> SeedBatch:
    # sa_fn overrides sa_lookup for the sharded-index path
    # (parallel/sharded_fmd.py); fmd then only needs to expose `.n`.
    sa = sa_fn or sa_lookup
    B, S = segs.q_start.shape
    slot_idx = jnp.arange(S)[None, :]
    live = slot_idx < segs.n_segs[:, None]
    z = segs.sai_size
    # min length: reference compares the segment SIZE (seed length - 1)
    # against Minimal Seed Length (SegmentVector::forEachSeed, segment.h:326)
    use = live & (segs.q_size >= min_seed_len) & (z > 0)
    over = (z > max_ambiguity) & (max_ambiguity != 0)
    if skip_ambiguous:
        use = use & ~over
        jump = jnp.ones_like(z)
    else:
        jump = jnp.where(over, jnp.maximum(z // max_ambiguity, 1), 1)
    cnt = jnp.where(use, (z + jump - 1) // jump, 0)  # ceil(z / jump) rows

    cum = jnp.cumsum(cnt, axis=1)  # inclusive
    total = cum[:, -1]
    overflow = segs.overflow | (total > max_seeds)

    k = jnp.arange(max_seeds)[None, :].astype(jnp.int32)  # [1, M]
    # segment owning output slot k: first segment with cum > k
    seg_of = jax.vmap(lambda c, kk: jnp.searchsorted(c, kk, side="right"))(
        cum, jnp.broadcast_to(k, (B, max_seeds))
    )
    seg_of = jnp.minimum(seg_of, S - 1).astype(jnp.int32)
    cum_ex = cum - cnt  # exclusive
    barr = jnp.arange(B)[:, None]
    j = k - cum_ex[barr, seg_of]
    valid = (k < total[:, None]) & (j >= 0) & (j < cnt[barr, seg_of])

    rows = segs.sai_start[barr, seg_of] + j * jump[barr, seg_of]
    rows = jnp.where(valid, rows, 1)  # row 1 is always a legal BWT row
    pos = sa(fmd, rows)

    half = fmd.n // 2
    on_forw = pos < half
    ref = jnp.where(on_forw, pos, fmd.n - pos - 1)

    q_start = segs.q_start[barr, seg_of]
    length = segs.q_size[barr, seg_of] + 1  # seed length = segment size + 1
    ambiguity = z[barr, seg_of]
    delta = compute_delta(
        q_start, length, ref, on_forw, qlen[:, None], contig_starts, half, rectangular
    )
    zero = jnp.zeros((B, max_seeds), jnp.int32)
    return SeedBatch(
        q_start=jnp.where(valid, q_start, zero),
        length=jnp.where(valid, length, zero),
        ref_start=jnp.where(valid, ref, zero),
        on_forward=on_forw & valid,
        ambiguity=jnp.where(valid, ambiguity, zero),
        delta=jnp.where(valid, delta, jnp.int32(2**31 - 1)),  # pad sorts last
        soc_nt=zero,
        valid=valid,
        n_seeds=jnp.minimum(total, max_seeds).astype(jnp.int32),
        overflow=overflow,
    )
