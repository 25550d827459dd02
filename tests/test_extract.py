"""Seed extraction vs host reference (segment.h forEachSeed semantics)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ma_tpu.containers.nucseq import revcomp_codes
from ma_tpu.index import FMDIndex
from ma_tpu.ops import occ as occ_ops
from ma_tpu.ops.extract import extract_seeds
from ma_tpu.ops.seeding import max_spanning_seeding

from test_seeding import host_max_spanning, make_index, sample_read


def host_extract(fmd, segs, qlen, contig_starts, max_amb=100, min_len=16, skip=False,
                 rectangular=True):
    """Transcription of SegmentVector::forEachSeed + setDeltaOfSeed."""
    n = fmd.n
    half = n // 2
    num_contigs = len(contig_starts)
    seeds = []
    for (q_start, q_size, sai_start, sai_rc, sai_size) in segs:
        if q_size < min_len:
            continue
        jump = 1
        if sai_size > max_amb and max_amb != 0:
            if skip:
                continue
            jump = sai_size // max_amb
        row = sai_start
        while row < sai_start + sai_size:
            pos = fmd.bwt_sa(row)
            on_forw = pos < half
            ref = pos if on_forw else n - pos - 1
            length = q_size + 1
            # delta (getPositionForBucketing / setDeltaOfSeed)
            split = not rectangular
            p = ref
            if split and not on_forw:
                p = 2 * (half + (qlen + 1) * num_contigs) - (ref - length)
            delta = p + (qlen - q_start)
            contig = int(np.searchsorted(contig_starts, ref, side="right")) - 1
            if split and not on_forw:
                contig = num_contigs - contig
            delta += (qlen + 1) * contig
            seeds.append((q_start, length, ref, on_forw, sai_size, delta))
            row += jump
    return sorted(seeds)


@pytest.mark.parametrize("rectangular", [True, False])
def test_extract_matches_host(rectangular):
    fmd, dev, fwd, rng = make_index(3)
    B, L = 4, 48
    reads = [sample_read(rng, fwd, L, revcomp=(b % 2 == 1)) for b in range(B)]
    seqs = np.stack(reads).astype(np.int32)
    lens = np.full(B, L, np.int32)
    contig_starts = np.array([0], dtype=np.int32)

    segs = max_spanning_seeding(dev, jnp.asarray(seqs), jnp.asarray(lens))
    out = extract_seeds(
        dev, segs, jnp.asarray(lens), jnp.asarray(contig_starts),
        max_seeds=256, max_ambiguity=100, min_seed_len=16, rectangular=rectangular,
    )
    for b in range(B):
        host_segs = host_max_spanning(fmd, reads[b])
        want = host_extract(fmd, host_segs, L, contig_starts, rectangular=rectangular)
        v = np.asarray(out.valid[b])
        got = sorted(
            zip(
                np.asarray(out.q_start[b])[v].tolist(),
                np.asarray(out.length[b])[v].tolist(),
                np.asarray(out.ref_start[b])[v].tolist(),
                np.asarray(out.on_forward[b])[v].tolist(),
                np.asarray(out.ambiguity[b])[v].tolist(),
                np.asarray(out.delta[b])[v].tolist(),
            )
        )
        assert got == want, f"read {b}"


def test_extract_min_len_filter():
    fmd, dev, fwd, rng = make_index(5)
    L = 40
    r = sample_read(rng, fwd, L, mut_rate=0.2)  # many short segments
    seqs = r[None, :].astype(np.int32)
    lens = np.array([L], np.int32)
    segs = max_spanning_seeding(dev, jnp.asarray(seqs), jnp.asarray(lens))
    out = extract_seeds(
        dev, segs, jnp.asarray(lens), jnp.asarray(np.array([0], np.int32)),
        max_seeds=256, min_seed_len=30,
    )
    v = np.asarray(out.valid[0])
    # every produced seed spans a segment of size >= 30 (i.e. length >= 31)
    assert all(np.asarray(out.length[0])[v] >= 31)
