"""Sharded minimizer-index lookup over a device mesh.

For genomes whose index exceeds one device's HBM (the GRCh38 target,
BASELINE.json config #4), the sorted minimizer arrays are sharded by hash
range across the mesh's "shard" axis. Every device runs the same batched
lookup against its local shard — a hash either falls inside the local
range (hits) or not (no-op) — and the per-shard seed lists merge with one
`all_gather` along the seed axis. This replaces the reference's
shared-memory index + SQL fabric with XLA collectives over ICI
(SURVEY.md §2.9/§7 step 8).

The FMD occ table shards the same way by BWT row ranges; the minimizer
path is the primary scale-out seeding path.
"""
from __future__ import annotations

from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ma_tpu.index.minimizer import (
    MinimizerIndex,
    MinimizerIndexDev,
    build_bucket_table,
    minimizer_seeding,
)
from ma_tpu.ops.extract import SeedBatch

SHARD_AXIS = "shard"


def shard_minimizer_index(
    mmi: MinimizerIndex, n_shards: int
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Split the sorted arrays into n equal-size contiguous hash ranges,
    padded to a common length (host-side; arrays stay hash-sorted)."""
    n = len(mmi.hash_sorted)
    per = -(-n // n_shards) if n else 1
    H = np.full((n_shards, per), np.uint32(0xFFFFFFFF), np.uint32)
    Pp = np.zeros((n_shards, per), np.int32)
    S = np.zeros((n_shards, per), np.int32)
    for i in range(n_shards):
        lo, hi = i * per, min((i + 1) * per, n)
        if hi > lo:
            H[i, : hi - lo] = mmi.hash_sorted[lo:hi]
            Pp[i, : hi - lo] = mmi.pos[lo:hi]
            S[i, : hi - lo] = mmi.strand[lo:hi]
            # pad tail with the last real entry's hash to keep sortedness
            # without creating phantom 0xFFFFFFFF matches
            if hi - lo < per:
                H[i, hi - lo :] = mmi.hash_sorted[hi - 1]
                Pp[i, hi - lo :] = mmi.pos[hi - 1]
                S[i, hi - lo :] = mmi.strand[hi - 1]
    # per-shard bucket tables with a common shift/step count
    tables = [build_bucket_table(H[i]) for i in range(n_shards)]
    shift = tables[0][1] if tables else 16
    # bucket bit-width can differ per shard only via n; it does not here
    steps = max((t[2] for t in tables), default=1)
    BL = np.stack([t[0] for t in tables]) if tables else np.zeros((0, 2), np.int32)
    return H, Pp, S, BL, shift, steps


def sharded_minimizer_seeding(
    mesh: Mesh,
    shards: Tuple[np.ndarray, np.ndarray, np.ndarray],
    seqs,
    lens,
    contig_starts,
    ref_len_forward: int,
    k: int = 15,
    w: int = 10,
    max_occ: int = 50,
    max_seeds_per_shard: int = 256,
) -> SeedBatch:
    """Batched lookup against every index shard + all_gather merge.

    Returns a SeedBatch with max_seeds_per_shard * n_shards seed slots per
    read (invalid slots masked as usual).
    """
    H, Pp, S, BL, shift, steps = shards
    n_shards = H.shape[0]
    sh = NamedSharding(mesh, P(SHARD_AXIS, None))
    rep = NamedSharding(mesh, P())
    H_d = jax.device_put(jnp.asarray(H), sh)
    P_d = jax.device_put(jnp.asarray(Pp), sh)
    S_d = jax.device_put(jnp.asarray(S), sh)
    B_d = jax.device_put(jnp.asarray(BL), sh)
    seqs = jax.device_put(jnp.asarray(seqs, jnp.int32), rep)
    lens = jax.device_put(jnp.asarray(lens, jnp.int32), rep)
    cst = jax.device_put(jnp.asarray(contig_starts, jnp.int32), rep)

    def local(h, p, s, bl, sq, ln, cs):
        mmi = MinimizerIndexDev(
            hash_sorted=h[0], pos=p[0], strand=s[0], bucket_lo=bl[0],
            shift=shift, steps=steps,
        )
        sb = minimizer_seeding(
            mmi, sq, ln, cs, ref_len_forward, k=k, w=w, max_occ=max_occ,
            max_seeds=max_seeds_per_shard, rectangular=True,
        )
        # gather every shard's seed block along the seed axis
        cat = lambda a: jax.lax.all_gather(
            a, SHARD_AXIS, axis=1, tiled=True
        )
        return SeedBatch(
            q_start=cat(sb.q_start),
            length=cat(sb.length),
            ref_start=cat(sb.ref_start),
            on_forward=cat(sb.on_forward),
            ambiguity=cat(sb.ambiguity),
            delta=cat(sb.delta),
            soc_nt=cat(sb.soc_nt),
            valid=cat(sb.valid),
            n_seeds=jax.lax.psum(sb.n_seeds, SHARD_AXIS),
            overflow=jax.lax.psum(
                sb.overflow.astype(jnp.int32), SHARD_AXIS
            ).astype(bool),
        )

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(SHARD_AXIS, None), P(SHARD_AXIS, None), P(SHARD_AXIS, None),
                  P(SHARD_AXIS, None), P(), P(), P()),
        out_specs=SeedBatch(
            q_start=P(), length=P(), ref_start=P(), on_forward=P(),
            ambiguity=P(), delta=P(), soc_nt=P(), valid=P(),
            n_seeds=P(), overflow=P(),
        ),
        check_vma=False,
    )
    return jax.jit(fn)(H_d, P_d, S_d, B_d, seqs, lens, cst)
