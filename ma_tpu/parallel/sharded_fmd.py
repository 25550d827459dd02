"""FMD index sharded by BWT-row range over a device mesh.

For genomes whose occ table + sampled SA exceed one device's HBM, the
checkpoint blocks (`bwt_words`/`occ_cp`) and the sampled SA shard into
contiguous row ranges across the mesh's "shard" axis. Every occ query is
then owner-computes: each device resolves the query against its local
slab if the block falls in its range (else contributes zeros) and one
`psum` merges — after which every device holds the full answer, so the
seeding state machines (ops/seeding.py) run replicated and unchanged,
with the collective lookups injected via their `ext_ops`/`sa_fn` hooks.

This is the FMD analog of the hash-range-sharded minimizer index
(parallel/sharded_index.py) and covers the reference's single-node
shared-memory FMD index (fMIndex.h) at multi-chip scale: one psum per
extension step rides ICI, replacing pointer-chasing into a table too
large for any single HBM.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ma_tpu.index.fmd_index import FMDIndex, OCC_INTERVAL, SA_INTERVAL
from ma_tpu.ops.extract import SeedBatch, extract_seeds
from ma_tpu.ops.occ import (
    SAI,
    _inclusive_masks,
    _match_bits,
    extend_backward,
    init_interval,
)
from ma_tpu.ops.seeding import SegmentBatch, max_spanning_seeding, smem_seeding

SHARD_AXIS = "shard"


class FMDShardDev(NamedTuple):
    """One device's slab of the row-sharded FMD index (a pytree).

    Field names L2/primary/n match FMDDev so ops that only touch those
    (init_interval, extend_backward's interval bookkeeping, extract_seeds'
    strand fold) accept a slab directly.
    """

    bwt_words: jax.Array  # uint32 [nb_local, 8]
    occ_cp: jax.Array  # int32 [nb_local, 4]
    ssa: jax.Array  # int32 [ns_local]
    L2: jax.Array  # int32 [5] (replicated)
    primary: jax.Array  # int32 scalar (replicated)
    n: jax.Array  # int32 scalar (replicated)
    block_lo: jax.Array  # int32 scalar — first checkpoint block of this slab
    ssa_lo: jax.Array  # int32 scalar — first sampled-SA slot of this slab


def shard_fmd_index(fmd: FMDIndex, n_shards: int):
    """Split occ blocks and sampled SA into contiguous equal ranges
    (host side). Returns stacked per-shard arrays + replicated scalars."""
    nb = fmd.bwt_words.shape[0]
    per_b = -(-nb // n_shards)
    BW = np.zeros((n_shards, per_b, 8), np.uint32)
    CP = np.zeros((n_shards, per_b, 4), np.int32)
    ns = len(fmd.ssa)
    per_s = -(-ns // n_shards)
    SS = np.zeros((n_shards, per_s), np.int32)
    b_lo = np.zeros(n_shards, np.int32)
    s_lo = np.zeros(n_shards, np.int32)
    for i in range(n_shards):
        lo, hi = i * per_b, min((i + 1) * per_b, nb)
        BW[i, : hi - lo] = fmd.bwt_words[lo:hi]
        CP[i, : hi - lo] = fmd.occ_cp[lo:hi]
        b_lo[i] = lo
        lo, hi = i * per_s, min((i + 1) * per_s, ns)
        SS[i, : hi - lo] = fmd.ssa[lo:hi]
        s_lo[i] = lo
    rep = dict(
        L2=np.asarray(fmd.L2, np.int32),
        primary=np.int32(fmd.primary),
        n=np.int32(fmd.n),
    )
    return BW, CP, SS, b_lo, s_lo, rep


# ---------------------------------------------------------------- lookups
# Owner-computes + psum variants of ops/occ.py occ4/occ1/bwt_char/inv_psi/
# sa_lookup (reference: fMIndex.h bwt_occ4:448-520, bwt_sa:788-814). Each
# device evaluates against its clipped local slab, masks to its row range,
# and a psum yields the full answer on every device.


def _local_block(sh: FMDShardDev, b: jax.Array):
    nbl = sh.bwt_words.shape[0]
    lb = b - sh.block_lo
    owned = (lb >= 0) & (lb < nbl)
    lbc = jnp.clip(lb, 0, nbl - 1)
    return sh.occ_cp[lbc], sh.bwt_words[lbc], owned


def occ4_sharded(sh: FMDShardDev, k: jax.Array, axis: str = SHARD_AXIS):
    k = jnp.asarray(k, jnp.int32)
    valid = k >= 0
    kk = jnp.maximum(k - (k >= sh.primary).astype(jnp.int32), 0)
    cp, words, owned = _local_block(sh, kk >> 7)
    mask = _inclusive_masks(kk & (OCC_INTERVAL - 1))
    counts = []
    for c in range(4):
        z = _match_bits(words, c) & mask
        cnt = jax.lax.population_count(z).astype(jnp.int32).sum(axis=-1)
        counts.append(cp[..., c] + cnt)
    out = jnp.stack(counts, axis=-1)
    out = jnp.where((valid & owned)[..., None], out, 0)
    return jax.lax.psum(out, axis)


def occ1_sharded(sh: FMDShardDev, k: jax.Array, c: jax.Array, axis: str = SHARD_AXIS):
    k = jnp.asarray(k, jnp.int32)
    valid = k >= 0
    kk = jnp.maximum(k - (k >= sh.primary).astype(jnp.int32), 0)
    cp, words, owned = _local_block(sh, kk >> 7)
    cpc = jnp.take_along_axis(cp, c[..., None].astype(jnp.int32), axis=-1)[..., 0]
    z = _match_bits(words, c[..., None]) & _inclusive_masks(kk & (OCC_INTERVAL - 1))
    cnt = jax.lax.population_count(z).astype(jnp.int32).sum(axis=-1)
    out = jnp.where(valid & owned, cpc + cnt, 0)
    return jax.lax.psum(out, axis)


def bwt_char_sharded(sh: FMDShardDev, kk: jax.Array, axis: str = SHARD_AXIS):
    kk = jnp.asarray(kk, jnp.int32)
    _, words, owned = _local_block(sh, kk >> 7)
    w = (kk & (OCC_INTERVAL - 1)) >> 4
    j = (kk & 15).astype(jnp.uint32)
    word = jnp.take_along_axis(words, w[..., None], axis=-1)[..., 0]
    ch = ((word >> (2 * j)) & jnp.uint32(3)).astype(jnp.int32)
    # chars can legitimately be 0, so psum (char+1) and shift back
    return jax.lax.psum(jnp.where(owned, ch + 1, 0), axis) - 1


def inv_psi_sharded(sh: FMDShardDev, k: jax.Array, axis: str = SHARD_AXIS):
    k = jnp.asarray(k, jnp.int32)
    kk = jnp.maximum(k - (k > sh.primary).astype(jnp.int32), 0)
    c = bwt_char_sharded(sh, kk, axis)
    res = sh.L2[jnp.clip(c, 0, 3)] + occ1_sharded(sh, k, jnp.clip(c, 0, 3), axis)
    return jnp.where(k == sh.primary, jnp.int32(0), res)


def ssa_sharded(sh: FMDShardDev, idx: jax.Array, axis: str = SHARD_AXIS):
    nsl = sh.ssa.shape[0]
    li = idx - sh.ssa_lo
    owned = (li >= 0) & (li < nsl)
    val = sh.ssa[jnp.clip(li, 0, nsl - 1)]
    return jax.lax.psum(jnp.where(owned, val, 0), axis)


def sa_lookup_sharded(sh: FMDShardDev, k: jax.Array, axis: str = SHARD_AXIS):
    """Batched bwt_sa over the sharded index: LF steps in lockstep, one
    psum'd char + occ lookup per step (ops/occ.py sa_lookup)."""
    k = jnp.asarray(k, jnp.int32)
    steps = jnp.zeros_like(k)

    def cond(state):
        kc, _ = state
        return jnp.any((kc & (SA_INTERVAL - 1)) != 0)

    def body(state):
        kc, st = state
        active = (kc & (SA_INTERVAL - 1)) != 0
        k2 = inv_psi_sharded(sh, kc, axis)
        return jnp.where(active, k2, kc), st + active.astype(jnp.int32)

    k, steps = jax.lax.while_loop(cond, body, (k, steps))
    return steps + ssa_sharded(sh, k >> 5, axis)


# ---------------------------------------------------------------- driver


def sharded_fmd_seeding(
    mesh: Mesh,
    shards,
    seqs,
    lens,
    contig_starts,
    technique: str = "SMEMs",
    max_segs: int = 64,
    max_seeds: int = 512,
    max_ambiguity: int = 100,
    min_seed_len: int = 16,
) -> SeedBatch:
    """Full seeding + seed extraction against the row-sharded FMD index.

    The state machine runs replicated on every device; only the occ/SA
    lookups are collective. Output equals the single-device path exactly
    (tests/test_sharded_fmd.py)."""
    BW, CP, SS, b_lo, s_lo, rep = shards
    sh_spec = NamedSharding(mesh, P(SHARD_AXIS))
    rep_spec = NamedSharding(mesh, P())
    put = lambda a, s: jax.device_put(jnp.asarray(a), s)
    args = (
        put(BW, sh_spec), put(CP, sh_spec), put(SS, sh_spec),
        put(b_lo, sh_spec), put(s_lo, sh_spec),
        put(rep["L2"], rep_spec), put(rep["primary"], rep_spec),
        put(rep["n"], rep_spec),
        put(np.asarray(seqs, np.int32), rep_spec),
        put(np.asarray(lens, np.int32), rep_spec),
        put(np.asarray(contig_starts, np.int32), rep_spec),
    )
    seed_fn = smem_seeding if technique == "SMEMs" else max_spanning_seeding

    def local(bw, cp, ss, blo, slo, L2, primary, n, sq, ln, cst):
        slab = FMDShardDev(
            bwt_words=bw[0], occ_cp=cp[0], ssa=ss[0], L2=L2,
            primary=primary, n=n, block_lo=blo[0], ssa_lo=slo[0],
        )
        ext_ops = (
            init_interval,  # touches only L2 (replicated on the slab)
            lambda f, ik, c: extend_backward(
                f, ik, c, occ4_fn=lambda f2, k: occ4_sharded(f2, k)
            ),
        )
        segs = seed_fn(
            slab, sq, ln, max_segs=max_segs, max_ambiguity=max_ambiguity,
            ext_ops=ext_ops,
        )
        return extract_seeds(
            slab, segs, ln, cst, max_seeds=max_seeds,
            max_ambiguity=max_ambiguity, min_seed_len=min_seed_len,
            sa_fn=lambda f, rows: sa_lookup_sharded(f, rows),
        )

    sharded = P(SHARD_AXIS)
    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(sharded, sharded, sharded, sharded, sharded,
                  P(), P(), P(), P(), P(), P()),
        out_specs=SeedBatch(
            q_start=P(), length=P(), ref_start=P(), on_forward=P(),
            ambiguity=P(), delta=P(), soc_nt=P(), valid=P(),
            n_seeds=P(), overflow=P(),
        ),
        check_vma=False,
    )
    return jax.jit(fn)(*args)
