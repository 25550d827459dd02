"""Paired-end pipeline tests (reference: libs/ma/tests/random_paired_alignments.cpp,
paired_io.py)."""
import io

import numpy as np
import pytest

from ma_tpu.containers.nucseq import NucSeq, decode_seq, revcomp_codes
from ma_tpu.containers.pack import Pack
from ma_tpu.index.fmd_index import FMDIndex
from ma_tpu.pipeline.aligner import Aligner
from ma_tpu.pipeline.paired import PairedAligner, pick_paired

pytestmark = pytest.mark.slow  # full device-stage compile


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(31)
    L = 16384
    genome = rng.integers(0, 4, size=L).astype(np.uint8)
    pack = Pack.empty()
    pack.append("chrP", genome)
    fmd = FMDIndex.build(pack)
    return pack, fmd, genome


def simulate_pairs(genome, n, read_len=100, insert_mean=400, insert_std=30, seed=13):
    """FR Illumina pairs: mate1 forward at p, mate2 = revcomp at p+insert-len."""
    rng = np.random.default_rng(seed)
    pairs, truth = [], []
    for i in range(n):
        insert = int(rng.normal(insert_mean, insert_std))
        insert = max(2 * read_len + 10, insert)
        p = int(rng.integers(0, len(genome) - insert))
        m1 = genome[p : p + read_len]
        m2 = revcomp_codes(genome[p + insert - read_len : p + insert])
        pairs.append(
            (
                NucSeq.from_str(decode_seq(m1), name=f"p{i}/1"),
                NucSeq.from_str(decode_seq(m2), name=f"p{i}/2"),
            )
        )
        truth.append((p, p + insert - read_len))
    return pairs, truth


def test_paired_alignment_positions(setup):
    pack, fmd, genome = setup
    pairs, truth = simulate_pairs(genome, 16)
    paligner = PairedAligner(Aligner(pack, fmd))
    res = paligner.align_pairs(pairs)
    for alns, (p1, p2) in zip(res, truth):
        assert len(alns) == 2
        first = next(a for a in alns if a.stats.first)
        second = next(a for a in alns if not a.stats.first)
        assert first.sam_position(pack) - 1 == p1
        assert second.sam_position(pack) - 1 == p2
        assert first.stats.other is second


def test_paired_sam_records(setup):
    pack, fmd, genome = setup
    pairs, truth = simulate_pairs(genome, 8, seed=17)
    paligner = PairedAligner(Aligner(pack, fmd))
    buf = io.StringIO()
    n = paligner.align_to_sam(iter(pairs), buf, batch_size=4)
    assert n == 16
    recs = [l.split("\t") for l in buf.getvalue().splitlines() if not l.startswith("@")]
    assert len(recs) == 16
    by_name = {}
    for f in recs:
        by_name.setdefault(f[0].rsplit("/", 1)[0], []).append(f)
    for name, fs in by_name.items():
        assert len(fs) == 2
        flags = sorted(int(f[1]) & 0xC0 for f in fs)
        assert flags == [0x40, 0x80]
        for f in fs:
            flag = int(f[1])
            assert flag & 0x1 and flag & 0x2
            assert f[6] == "="  # same contig
            assert int(f[8]) != 0  # TLEN set
        # TLEN signs: first positive, last negative; magnitudes equal
        tl = {int(f[8]) for f in fs}
        assert len(tl) == 2 and sum(tl) == 0
        # PNEXT cross-references POS
        pos = {f: int(x[3]) for f, x in zip(("a", "b"), fs)}
        assert int(fs[0][7]) == pos["b"] and int(fs[1][7]) == pos["a"]


def test_pick_paired_bonus_prefers_proper_pair(setup):
    pack, _, _ = setup

    def mk(pos, rev=False, score=200, first=True):
        a = Alignment = __import__(
            "ma_tpu.containers.alignment", fromlist=["Alignment"]
        ).Alignment
        x = a(begin_on_ref=pos if not rev else 2 * 16384 - pos - 100)
        x.append("s", 100)
        x.iscore = score
        x.stats.first = first
        return x

    # mate1 two candidates: lone high-scorer far away vs pairable slightly lower
    a_far = mk(1000, score=210)
    a_near = mk(5000, score=200)
    b = mk(5000 + 400 - 100, rev=True, score=200, first=False)
    res = pick_paired([a_far, a_near], [b], pack, 100, 100)
    assert res[0] is a_near  # 1.25 * 400 > 410
    assert res[0].stats.other is b


def test_one_sided_pair(setup):
    pack, fmd, genome = setup
    pairs, _ = simulate_pairs(genome, 2, seed=23)
    # destroy mate2 of the first pair (random junk that cannot align)
    rng = np.random.default_rng(99)
    junk = NucSeq.from_str(decode_seq(rng.integers(0, 4, 100).astype(np.uint8)),
                           name="junk/2")
    pairs[0] = (pairs[0][0], junk)
    paligner = PairedAligner(Aligner(pack, fmd))
    res = paligner.align_pairs(pairs)
    # mate1 alignments come back unpaired
    assert all(a.stats.first for a in res[0])
