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
