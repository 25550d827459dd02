"""K-mer occurrence filter + call combining
(reference: count_k_mers.h, combineOverlappingCalls.h)."""
import numpy as np

from ma_tpu.containers.nucseq import NucSeq, decode_seq
from ma_tpu.msv.calls import SvCall
from ma_tpu.msv.kmer_filter import (
    KMerCounter,
    combine_overlapping_calls,
    filter_frequent_seeds,
)


def test_counter_counts_repeats():
    rng = np.random.default_rng(11)
    base = rng.integers(0, 4, 200).astype(np.uint8)
    c = KMerCounter(k=15, w=10)
    for _ in range(5):
        c.add_sequence(base)  # same sequence 5x -> every minimizer 5x
    uniq = rng.integers(0, 4, 200).astype(np.uint8)
    c.add_sequence(uniq)
    from ma_tpu.index.minimizer import _sketch_arrays
    sel, h, _, _ = _sketch_arrays(base.astype(np.int32), 15, 10, np)
    hits = h[np.flatnonzero(sel)]
    assert all(c.occurrences(x) >= 5 for x in hits)
    assert not c.is_unique(hits, max_occ=4)
    assert c.is_unique(hits, max_occ=5)


def test_filter_frequent_seeds():
    rng = np.random.default_rng(13)
    rep = rng.integers(0, 4, 100).astype(np.uint8)
    reads = [NucSeq.from_str(decode_seq(rep), name=f"r{i}") for i in range(10)]
    c = KMerCounter(k=15, w=10)
    for r in reads:
        c.add_sequence(r.codes)
    seeds = [[(0, 60, 1000, True, 0)] for _ in reads]
    out = filter_frequent_seeds(seeds, reads, c, max_occ=5)
    assert all(len(s) == 0 for s in out)  # every k-mer occurs 10x
    out2 = filter_frequent_seeds(seeds, reads, c, max_occ=10)
    assert all(len(s) == 1 for s in out2)


def test_combine_overlapping_calls():
    a = SvCall(100, 500, 5, 5, True, True, supp_reads=3, supp_nt=50)
    b = SvCall(120, 520, 5, 5, True, True, supp_reads=2, supp_nt=70)
    far = SvCall(9000, 9500, 5, 5, True, True, supp_reads=4, supp_nt=60)
    other_strand = SvCall(110, 510, 5, 5, True, False, supp_reads=1, supp_nt=10)
    out = combine_overlapping_calls([a, b, far, other_strand], max_dist=200)
    assert len(out) == 3
    merged = [c for c in out if c.from_pos == 100][0]
    assert merged.supp_reads == 5 and merged.supp_nt == 120
    assert any(c.from_pos == 9000 for c in out)
    assert any(c.to_forward is False for c in out)


def test_diagonal_and_low_score_filters():
    from ma_tpu.msv.jumps import JumpParams, compute_jumps
    from ma_tpu.msv.sweep import (
        filter_diagonal_line_calls,
        filter_low_score_calls,
    )

    good = SvCall(100, 5000, 0, 0, True, True, supp_nt=100,
                  reference_ambiguity=1)
    bad = SvCall(100, 5000, 0, 0, True, True, supp_nt=1,
                 reference_ambiguity=1)
    assert filter_low_score_calls([good, bad], min_score=2.0) == [good]

    # line artifact: supporting jumps with from+to ~ constant but from-to
    # spread out -> (y-x) variance huge, (y+x) variance tiny => dropped
    # (sweepSvJumps.h:607-610 keeps only stdA/stdB < threshold or stdB < 10)
    params = JumpParams(do_dummy_jumps=False)
    line_jumps = []
    for k in range(6):
        f = 1000 + k * 1000
        # f + t nearly constant with small jitter (a perfectly constant sum
        # hits the reference's stdB<10 keep-clause)
        t = 13000 - k * 1000 + (k % 3) * 12
        line_jumps.extend(compute_jumps(
            [(0, 30, f - 29, True, 60), (30, 30, t, True, 60)], 60, k,
            params=params))
    call = SvCall(5000, 9000, 0, 0, True, True, supp_reads=6)
    kept = filter_diagonal_line_calls([call], jumps_of=lambda c: line_jumps,
                                      threshold=3)
    assert kept == []
    # a normal tight cluster is kept
    tight = []
    for k in range(6):
        tight.extend(compute_jumps(
            [(0, 30, 4971 + k, True, 60), (30, 30, 9000 + k, True, 60)], 60,
            k, params=params))
    kept2 = filter_diagonal_line_calls([call], jumps_of=lambda c: tight,
                                       threshold=3)
    assert kept2 == [call]


def test_alignment_printer():
    import numpy as np
    from ma_tpu.containers.alignment import Alignment, SEED, MISMATCH
    from ma_tpu.containers.pack import Pack
    from ma_tpu.utils.printer import format_alignment

    rng = np.random.default_rng(3)
    genome = rng.integers(0, 4, 100).astype(np.uint8)
    pack = Pack.empty()
    pack.append("p", genome)
    query = genome[10:40].copy()
    query[5] = (query[5] + 1) % 4
    a = Alignment(begin_on_ref=10, begin_on_query=0)
    a.append(SEED, 5)
    a.append(MISMATCH, 1)
    a.append(SEED, 24)
    text = format_alignment(a, query, pack)
    assert "Q " in text and "R " in text
    assert text.count("*") == 1  # exactly one mismatch bar
