"""End-to-end pipeline tests in the spirit of the reference's
random_alignments self-check (reference: libs/ma/tests/random_alignments.py:1-40 —
random genome + simulated reads through the full graph, then verify)."""
import io

import numpy as np
import pytest

from ma_tpu.containers.nucseq import NucSeq, decode_seq, revcomp_codes
from ma_tpu.containers.pack import Pack
from ma_tpu.index.fmd_index import FMDIndex
from ma_tpu.pipeline.aligner import Aligner

pytestmark = pytest.mark.slow  # full device-stage compile


@pytest.fixture(scope="module")
def small_genome():
    rng = np.random.default_rng(11)
    L = 16384
    genome = rng.integers(0, 4, size=L).astype(np.uint8)
    pack = Pack.empty()
    pack.append("chr1", genome)
    fmd = FMDIndex.build(pack)
    return pack, fmd, genome


def simulate_reads(genome, n, read_len, sub_rate, seed=3):
    rng = np.random.default_rng(seed)
    reads, truth = [], []
    for i in range(n):
        p = int(rng.integers(0, len(genome) - read_len))
        codes = genome[p : p + read_len].copy()
        for j in np.nonzero(rng.random(read_len) < sub_rate)[0]:
            codes[j] = (codes[j] + rng.integers(1, 4)) % 4
        rev = bool(rng.integers(0, 2))
        if rev:
            codes = revcomp_codes(codes)
        reads.append(NucSeq.from_str(decode_seq(codes), name=f"r{i}"))
        truth.append((p, rev))
    return reads, truth


def check(pack, alns_per_read, truth, tol=5):
    ok = 0
    for alns, (p, rev) in zip(alns_per_read, truth):
        if not alns:
            continue
        a = alns[0]
        pos0 = a.sam_position(pack) - 1
        arev = bool(pack.is_reverse_strand(a.begin_on_ref))
        if arev == rev and abs(pos0 - p) <= tol:
            ok += 1
    return ok


def test_align_batch_exact_reads(small_genome):
    pack, fmd, genome = small_genome
    reads, truth = simulate_reads(genome, 24, 100, 0.0)
    aligner = Aligner(pack, fmd)
    res = aligner.align_batch(reads)
    assert check(pack, res, truth) == 24
    # exact reads must align end-to-end with a perfect score
    for alns, read in zip(res, reads):
        assert alns[0].score() == 2 * len(read)
        assert alns[0].begin_on_query == 0 and alns[0].end_on_query == len(read)


def test_align_batch_noisy_reads(small_genome):
    pack, fmd, genome = small_genome
    reads, truth = simulate_reads(genome, 32, 150, 0.02, seed=5)
    aligner = Aligner(pack, fmd)
    res = aligner.align_batch(reads)
    assert check(pack, res, truth) >= 31


def test_align_batch_long_noisy_reads(small_genome):
    pack, fmd, genome = small_genome
    reads, truth = simulate_reads(genome, 6, 1000, 0.05, seed=7)
    aligner = Aligner(pack, fmd)
    res = aligner.align_batch(reads)
    assert check(pack, res, truth, tol=20) >= 5


def test_align_to_sam_stream(small_genome):
    pack, fmd, genome = small_genome
    reads, truth = simulate_reads(genome, 12, 100, 0.01, seed=9)
    # mixed lengths exercise bucketing
    reads.extend(simulate_reads(genome, 4, 220, 0.01, seed=10)[0])
    aligner = Aligner(pack, fmd)
    buf = io.StringIO()
    n = aligner.align_to_sam(iter(reads), buf, batch_size=8)
    assert n == 16
    lines = buf.getvalue().splitlines()
    assert lines[0].startswith("@HD")
    assert any(l.startswith("@SQ\tSN:chr1\tLN:16384") for l in lines)
    recs = [l.split("\t") for l in lines if not l.startswith("@")]
    assert len(recs) >= 16
    for f in recs:
        assert len(f) == 11
        assert f[2] == "chr1"
        assert 0 < int(f[3]) <= 16384


def test_multi_contig_alignment():
    rng = np.random.default_rng(21)
    contigs = [rng.integers(0, 4, size=4000).astype(np.uint8) for _ in range(3)]
    pack = Pack.empty()
    for i, c in enumerate(contigs):
        pack.append(f"ctg{i}", c)
    fmd = FMDIndex.build(pack)
    aligner = Aligner(pack, fmd)
    reads, meta = [], []
    for i in range(12):
        ci = int(rng.integers(0, 3))
        p = int(rng.integers(0, 4000 - 120))
        codes = contigs[ci][p : p + 120]
        reads.append(NucSeq.from_str(decode_seq(codes), name=f"m{i}"))
        meta.append((ci, p))
    res = aligner.align_batch(reads)
    for alns, (ci, p) in zip(res, meta):
        assert alns, (ci, p)
        a = alns[0]
        assert a.contig(pack) == f"ctg{ci}"
        assert a.sam_position(pack) - 1 == p


def test_profiler_collects_stage_times(small_genome):
    from ma_tpu.utils.profile import AnalyzeRuntimes

    pack, fmd, genome = small_genome
    reads, truth = simulate_reads(genome, 8, 100, 0.01, seed=31)
    aligner = Aligner(pack, fmd)
    aligner.profiler = AnalyzeRuntimes()
    aligner.align_batch(reads)
    stages = dict(aligner.profiler.times)
    assert "device seed+soc+harmonize" in stages
    assert "device banded DP + traceback" in stages
    assert all(v >= 0 for v in stages.values())
    table = aligner.profiler.analyze()
    assert "ratio" in table


def test_ngmlr_tags_emitted(small_genome):
    pack, fmd, genome = small_genome
    reads, truth = simulate_reads(genome, 4, 100, 0.02, seed=41)
    aligner = Aligner(pack, fmd)
    aligner.pset.set("Emulate NGMLR's tag output", True)
    buf = io.StringIO()
    aligner.align_to_sam(iter(reads), buf, batch_size=4)
    recs = [l for l in buf.getvalue().splitlines() if not l.startswith("@")]
    assert recs
    for l in recs:
        assert "\tMD:Z:" in l and "\tNM:i:" in l and "\tAS:i:" in l
        assert "\tQS:i:" in l and "\tCV:f:" in l
        # MD tag must be consistent: matches+mismatches count == aligned ref
        import re
        md = re.search(r"MD:Z:(\S+)", l).group(1)
        cons = sum(int(x) for x in re.findall(r"\d+", md.replace("^", " ")))
        mm = len(re.findall(r"(?<!\^)[ACGTN]", re.sub(r"\^[ACGTN]+", "", md)))
        cig = l.split("\t")[5]
        ref_consumed = sum(int(n) for n, op in re.findall(r"(\d+)([MD=X])", cig)
                           if op in "M=X")
        dels = sum(int(n) for n, op in re.findall(r"(\d+)([D])", cig))
        assert cons + mm == ref_consumed, (md, cig)


def test_long_reads_high_error_minimizer_path(small_genome):
    """PacBio/ONT-style config (BASELINE.json config #3 analog)."""
    pack, fmd, genome = small_genome
    rng = np.random.default_rng(47)
    aligner = Aligner(pack, fmd)
    aligner.pset.set("Seeding Technique", "minimizers")
    reads, truth = [], []
    for i in range(3):
        p = int(rng.integers(0, len(genome) - 3000))
        codes = genome[p : p + 3000].copy()
        for j in np.nonzero(rng.random(3000) < 0.08)[0]:
            codes[j] = (codes[j] + rng.integers(1, 4)) % 4
        rev = i == 2
        if rev:
            codes = revcomp_codes(codes)
        reads.append(NucSeq.from_str(decode_seq(codes), name=f"lr{i}"))
        truth.append((p, rev))
    res = aligner.align_batch(reads)
    for alns, (p, rev) in zip(res, truth):
        assert alns
        a = alns[0]
        assert bool(pack.is_reverse_strand(a.begin_on_ref)) == rev
        assert abs(a.sam_position(pack) - 1 - p) < 100
        assert a.end_on_query - a.begin_on_query > 2000


def test_quick_align_and_self_check(small_genome):
    from ma_tpu.pipeline.quick import quick_align, test_aligner as self_check

    pack, fmd, genome = small_genome
    read = decode_seq(genome[2000:2120])
    alns = quick_align(read, pack, fmd)
    assert alns and alns[0].sam_position(pack) - 1 == 2000
    # self check on a tiny random genome
    frac = self_check(genome_size=8192, n_reads=12, seed=3)
    assert frac >= 11 / 12


@pytest.mark.parametrize("tech", ["maxSpan", "SMEMs", "minimizers"])
def test_reads_with_n_bases(small_genome, tech):
    """N handling through every seeding technique (reference:
    libs/ma/tests/extract_n.cpp role)."""
    pack, fmd, genome = small_genome
    aligner = Aligner(pack, fmd)
    aligner.pset.set("Seeding Technique", tech)
    p = 5000
    codes = genome[p : p + 150].copy()
    codes[40] = 4
    codes[41] = 4
    codes[90] = 4
    read = NucSeq.from_str(decode_seq(codes), name="withN")
    res = aligner.align_batch([read])[0]
    assert res, tech
    a = res[0]
    assert a.sam_position(pack) - 1 == p
    # N positions score 0; boundary effects may cost a few more points
    assert a.score() >= 2 * 150 - 40


def test_random_alignments_fuzz(small_genome):
    """Larger random round-trip in the spirit of random_alignments.py
    (1,100 reads there; trimmed for CI time here)."""
    pack, fmd, genome = small_genome
    reads, truth = simulate_reads(genome, 150, 100, 0.015, seed=99)
    aligner = Aligner(pack, fmd)
    res = aligner.align_batch(reads)
    assert check(pack, res, truth) >= 148
    # every alignment internally consistent: spans match CIGAR lengths
    for alns in res:
        for a in alns:
            ref_span = sum(l for op, l in a.data if op in "s=XD")
            q_span = sum(l for op, l in a.data if op in "s=XI")
            assert a.end_on_ref - a.begin_on_ref == ref_span
            assert a.end_on_query - a.begin_on_query == q_span
