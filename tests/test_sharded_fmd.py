"""Row-sharded FMD index: collective lookups must equal the local ones,
and the full sharded seeding path must reproduce the single-device seeds
exactly (parallel/sharded_fmd.py)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from ma_tpu.containers.nucseq import encode_seq
from ma_tpu.containers.pack import Pack
from ma_tpu.index.fmd_index import FMDIndex
from ma_tpu.ops.extract import extract_seeds
from ma_tpu.ops.occ import FMDDev, occ4, sa_lookup
from ma_tpu.ops.seeding import smem_seeding
from ma_tpu.parallel.sharded_fmd import (
    SHARD_AXIS,
    FMDShardDev,
    occ4_sharded,
    sa_lookup_sharded,
    shard_fmd_index,
    sharded_fmd_seeding,
)


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(42)
    genome = rng.integers(0, 4, size=20_000).astype(np.uint8)
    pack = Pack.empty()
    pack.append("c0", genome[:12_000])
    pack.append("c1", genome[12_000:])
    fmd = FMDIndex.build(pack)
    mesh = Mesh(np.array(jax.devices()[:8]), (SHARD_AXIS,))
    return pack, fmd, mesh, rng


def _reads(pack, rng, n=16, L=120):
    from ma_tpu.containers.nucseq import revcomp_codes
    seq = pack.codes
    seqs = np.full((n, L), 4, np.uint8)
    lens = np.zeros(n, np.int32)
    for i in range(n):
        p = int(rng.integers(0, len(seq) - L))
        r = seq[p : p + L]
        seqs[i] = revcomp_codes(r) if i % 2 else r
        lens[i] = L
    return seqs, lens


def test_sharded_lookups_match_local(setup):
    pack, fmd, mesh, rng = setup
    dev = FMDDev.from_host(fmd)
    shards = shard_fmd_index(fmd, 8)
    BW, CP, SS, b_lo, s_lo, rep = shards
    ks = np.concatenate([[-1, 0, 1], rng.integers(0, fmd.n, 61)]).astype(np.int32)

    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    def local(bw, cp, ss, blo, slo, k):
        slab = FMDShardDev(
            bwt_words=bw[0], occ_cp=cp[0], ssa=ss[0],
            L2=jnp.asarray(rep["L2"]), primary=jnp.int32(rep["primary"]),
            n=jnp.int32(rep["n"]), block_lo=blo[0], ssa_lo=slo[0],
        )
        return occ4_sharded(slab, k), sa_lookup_sharded(slab, jnp.abs(k))

    sharded = P(SHARD_AXIS)
    fn = shard_map(
        local, mesh=mesh,
        in_specs=(sharded,) * 5 + (P(),),
        out_specs=(P(), P()), check_vma=False,
    )
    o4, sa = fn(jnp.asarray(BW), jnp.asarray(CP), jnp.asarray(SS),
                jnp.asarray(b_lo), jnp.asarray(s_lo), jnp.asarray(ks))
    np.testing.assert_array_equal(np.asarray(o4), np.asarray(occ4(dev, ks)))
    np.testing.assert_array_equal(
        np.asarray(sa), np.asarray(sa_lookup(dev, jnp.abs(jnp.asarray(ks))))
    )


def test_sharded_seeding_equals_local(setup):
    pack, fmd, mesh, rng = setup
    seqs, lens = _reads(pack, rng)
    dev = FMDDev.from_host(fmd)
    cst = np.asarray(pack.starts, np.int32)

    segs = smem_seeding(dev, jnp.asarray(seqs, jnp.int32), jnp.asarray(lens))
    ref = extract_seeds(dev, segs, jnp.asarray(lens), jnp.asarray(cst))

    got = sharded_fmd_seeding(
        mesh, shard_fmd_index(fmd, 8), seqs, lens, cst, technique="SMEMs"
    )

    def seedset(sb):
        v = np.asarray(sb.valid)
        cols = [np.asarray(x)[v] for x in
                (sb.q_start, sb.length, sb.ref_start, sb.on_forward)]
        rows = np.asarray(sb.valid).nonzero()[0]
        return set(zip(rows, *cols))

    assert seedset(got) == seedset(ref)
    assert seedset(ref)  # non-trivial
    np.testing.assert_array_equal(np.asarray(got.n_seeds), np.asarray(ref.n_seeds))
