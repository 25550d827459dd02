"""Device-side FMD-index operations (batched, JAX).

The TPU equivalent of the reference's occ counting and FMD extension
(reference: fMIndex.h bwt_occ4:448-520 / bwt_2occ4:668-760,
fMIndex.cpp extend_backward:21-101, fMIndex.h bwt_sa:788-814).

Data layout (built host-side in ma_tpu/index/fmd_index.py):
* `bwt_words` uint32 [nb, 8] — 128 2-bit BWT crumbs per checkpoint block
* `occ_cp`   int32 [nb, 4]  — counts of each base before the block
* occ within a block = XOR + popcount on the VPU (the vectorized analog of
  __occ_aux4's byte-table trick, fMIndex.h:421-436)

All functions are batched: `k`, `c`, interval components are arrays of any
shape. Everything is int32 (genomes up to 2^31 text length; whole-genome
64-bit support is planned via index sharding).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ma_tpu.index.fmd_index import FMDIndex, OCC_INTERVAL, SA_INTERVAL


class FMDDev(NamedTuple):
    """FMD-index device arrays (a pytree; pass through jit freely)."""

    bwt_words: jax.Array  # uint32 [nb, 8]
    occ_cp: jax.Array  # int32 [nb, 4]
    L2: jax.Array  # int32 [5]
    primary: jax.Array  # int32 scalar
    ssa: jax.Array  # int32 [n // 32 + 1]
    n: jax.Array  # int32 scalar (text length)

    @classmethod
    def from_host(cls, fmd: FMDIndex) -> "FMDDev":
        if fmd.n >= 2**31:
            raise ValueError("int32 device index supports text length < 2^31")
        return cls(
            bwt_words=jnp.asarray(fmd.bwt_words, dtype=jnp.uint32),
            occ_cp=jnp.asarray(fmd.occ_cp, dtype=jnp.int32),
            L2=jnp.asarray(fmd.L2, dtype=jnp.int32),
            primary=jnp.asarray(fmd.primary, dtype=jnp.int32),
            ssa=jnp.asarray(fmd.ssa, dtype=jnp.int32),
            n=jnp.asarray(fmd.n, dtype=jnp.int32),
        )


_CRUMB_LO = jnp.uint32(0x55555555)


def _match_bits(words: jax.Array, c) -> jax.Array:
    """Bit at even position 2j set iff crumb j of the word equals c."""
    pat = (jnp.asarray(c, jnp.uint32) * _CRUMB_LO).astype(jnp.uint32)
    y = words ^ pat
    return (~y) & ((~y) >> jnp.uint32(1)) & _CRUMB_LO


def _inclusive_masks(off: jax.Array) -> jax.Array:
    """[..., 8] uint32 masks keeping crumbs 0..off (inclusive) of a block."""
    w_idx = jnp.arange(8, dtype=jnp.int32)
    keep = jnp.clip(off[..., None] + 1 - w_idx * 16, 0, 16)  # [...,8] in [0,16]
    keep_c = jnp.minimum(keep, 15).astype(jnp.uint32)
    full = jnp.uint32(0xFFFFFFFF)
    return jnp.where(keep >= 16, full, (jnp.uint32(1) << (2 * keep_c)) - jnp.uint32(1))


def occ4(fmd: FMDDev, k: jax.Array) -> jax.Array:
    """Counts of A,C,G,T in BWT rows [0..k] inclusive; k == -1 -> zeros.

    Device analog of bwt_occ4 (fMIndex.h:448-520), including the
    "$ is not stored" index adjustment.
    """
    k = jnp.asarray(k, jnp.int32)
    valid = k >= 0
    kk = jnp.maximum(k - (k >= fmd.primary).astype(jnp.int32), 0)
    b = kk >> 7
    off = kk & (OCC_INTERVAL - 1)
    cp = fmd.occ_cp[b]  # [...,4]
    words = fmd.bwt_words[b]  # [...,8]
    mask = _inclusive_masks(off)
    counts = []
    for c in range(4):
        z = _match_bits(words, c) & mask
        cnt = jax.lax.population_count(z).astype(jnp.int32).sum(axis=-1)
        counts.append(cp[..., c] + cnt)
    out = jnp.stack(counts, axis=-1)
    return jnp.where(valid[..., None], out, 0)


def occ1(fmd: FMDDev, k: jax.Array, c: jax.Array) -> jax.Array:
    """occ4(...)[c] for a per-element char c (single-char gather variant)."""
    k = jnp.asarray(k, jnp.int32)
    valid = k >= 0
    kk = jnp.maximum(k - (k >= fmd.primary).astype(jnp.int32), 0)
    b = kk >> 7
    off = kk & (OCC_INTERVAL - 1)
    cp = jnp.take_along_axis(fmd.occ_cp[b], c[..., None].astype(jnp.int32), axis=-1)[..., 0]
    words = fmd.bwt_words[b]
    z = _match_bits(words, c[..., None]) & _inclusive_masks(off)
    cnt = jax.lax.population_count(z).astype(jnp.int32).sum(axis=-1)
    return jnp.where(valid, cp + cnt, 0)


def bwt_char(fmd: FMDDev, kk: jax.Array) -> jax.Array:
    """Stored-BWT code at stored index kk (caller must pre-adjust for $)."""
    kk = jnp.asarray(kk, jnp.int32)
    b = kk >> 7
    w = (kk & (OCC_INTERVAL - 1)) >> 4
    j = (kk & 15).astype(jnp.uint32)
    words = fmd.bwt_words[b]
    word = jnp.take_along_axis(words, w[..., None], axis=-1)[..., 0]
    return ((word >> (2 * j)) & jnp.uint32(3)).astype(jnp.int32)


class SAI(NamedTuple):
    """Batched bidirectional SA interval (SAInterval, fMIndex.h:44-130)."""

    start: jax.Array  # int32
    start_rc: jax.Array  # int32 — start of the reverse-complement interval
    size: jax.Array  # int32

    def rev_comp(self) -> "SAI":
        return SAI(self.start_rc, self.start, self.size)


def init_interval(fmd: FMDDev, c: jax.Array) -> SAI:
    """Interval of the single char c (fMIndex.h init_interval:768-775)."""
    c = jnp.asarray(c, jnp.int32)
    cc = jnp.clip(c, 0, 3)
    valid = c < 4
    z = jnp.int32(0)
    return SAI(
        start=jnp.where(valid, fmd.L2[cc] + 1, z),
        start_rc=jnp.where(valid, fmd.L2[3 - cc] + 1, z),
        size=jnp.where(valid, fmd.L2[cc + 1] - fmd.L2[cc], z),
    )


def extend_backward(fmd, ik: SAI, c: jax.Array, occ4_fn=None) -> SAI:
    """Backward extension by char c updating the revcomp interval.

    Device analog of FMIndex::extend_backward (fMIndex.cpp:21-101).
    Inputs where c >= 4 or ik.size <= 0 produce empty intervals.
    `occ4_fn` overrides the occ table lookup (sharded-index path,
    parallel/sharded_fmd.py); fmd then only needs `.primary`/`.L2`.
    """
    occ = occ4_fn or occ4
    c = jnp.asarray(c, jnp.int32)
    cntk = occ(fmd, ik.start - 1)
    cntl = occ(fmd, ik.start + ik.size - 1)
    cnts = cntl - cntk  # [...,4]
    straddles = (ik.start <= fmd.primary) & (ik.start + ik.size > fmd.primary)
    base = ik.start_rc + straddles.astype(jnp.int32)
    # cntk2[i] = base + sum_{j<i} cnts[complement(j)]; complement(j) = 3-j
    comp_cnts = cnts[..., ::-1]
    cum = jnp.cumsum(comp_cnts, axis=-1)
    cntk2 = base[..., None] + jnp.concatenate(
        [jnp.zeros_like(cum[..., :1]), cum[..., :-1]], axis=-1
    )
    cc = jnp.clip(c, 0, 3)
    take = lambda a: jnp.take_along_axis(a, cc[..., None], axis=-1)[..., 0]
    new = SAI(
        start=fmd.L2[cc] + take(cntk) + 1,
        start_rc=take(cntk2[..., ::-1]),  # cntk2[complement(c)] = cntk2[3-c]
        size=take(cnts),
    )
    valid = (c < 4) & (ik.size > 0)
    z = jnp.int32(0)
    return SAI(
        jnp.where(valid, new.start, z),
        jnp.where(valid, new.start_rc, z),
        jnp.where(valid, new.size, z),
    )


def inv_psi(fmd: FMDDev, k: jax.Array) -> jax.Array:
    """One LF step (bwt_invPsi); row `primary` maps to row 0."""
    k = jnp.asarray(k, jnp.int32)
    kk = jnp.maximum(k - (k > fmd.primary).astype(jnp.int32), 0)
    c = bwt_char(fmd, kk)
    res = fmd.L2[c] + occ1(fmd, k, c)
    return jnp.where(k == fmd.primary, jnp.int32(0), res)


def sa_lookup(fmd: FMDDev, k: jax.Array) -> jax.Array:
    """Reference positions for BWT rows k (batched bwt_sa, fMIndex.h:788-814).

    Walks LF until hitting a sampled row; at most SA_INTERVAL-1 steps, all
    lanes in lockstep with masking.
    """
    k = jnp.asarray(k, jnp.int32)
    steps = jnp.zeros_like(k)

    def cond(state):
        kc, _ = state
        return jnp.any((kc & (SA_INTERVAL - 1)) != 0)

    def body(state):
        kc, st = state
        active = (kc & (SA_INTERVAL - 1)) != 0
        k2 = inv_psi(fmd, kc)
        return jnp.where(active, k2, kc), st + active.astype(jnp.int32)

    k, steps = jax.lax.while_loop(cond, body, (k, steps))
    return steps + fmd.ssa[k >> 5]
