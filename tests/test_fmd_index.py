"""FMD-index correctness vs brute force.

Mirrors the reference's built-in self test (fMIndex.h test/testSaInterval:
sample random substrings, check every reported occurrence) plus explicit
suffix-array / occ / LF-mapping property tests.
"""
import numpy as np
import pytest

from ma_tpu.containers import Pack
from ma_tpu.containers.nucseq import decode_seq, revcomp_codes
from ma_tpu.index import FMDIndex, suffix_array
from ma_tpu.index.suffix_array import suffix_array_doubling


def naive_suffix_array(text):
    n = len(text)
    suf = [tuple(text[i:]) + (-1,) for i in range(n)] + [(-1,)]
    return np.array(sorted(range(n + 1), key=lambda i: tuple(text[i:]) + (-1,)), dtype=np.int64)


def random_codes(n, seed):
    return np.random.default_rng(seed).integers(0, 4, size=n).astype(np.uint8)


@pytest.mark.parametrize("n,seed", [(1, 0), (13, 1), (100, 2), (1000, 3)])
def test_suffix_array_matches_naive(n, seed):
    t = random_codes(n, seed)
    sa = suffix_array_doubling(t)
    assert np.array_equal(sa, naive_suffix_array(t))


def test_suffix_array_repetitive():
    t = np.array([0, 0, 0, 0, 1, 0, 0, 0, 0], dtype=np.uint8)
    assert np.array_equal(suffix_array_doubling(t), naive_suffix_array(t))


def _brute_occurrences(text, pattern):
    n, m = len(text), len(pattern)
    return {
        i
        for i in range(n - m + 1)
        if np.array_equal(text[i : i + m], pattern)
    }


def _interval_positions(fmd, ik):
    start, _, size = ik
    return {fmd.bwt_sa(r) for r in range(start, start + size)}


def _backward_search(fmd, pattern):
    """Find the SA interval of `pattern` by backward search (getInterval,
    fMIndex.cpp:104-114)."""
    ik = fmd.init_interval(int(pattern[-1]))
    for c in pattern[-2::-1]:
        if ik[2] <= 0:
            break
        ik = fmd.extend_backward(ik, int(c))
    return ik


@pytest.mark.parametrize("seed", [0, 1])
def test_backward_search_finds_all_occurrences(seed):
    rng = np.random.default_rng(seed)
    text = random_codes(300, seed + 10)
    fmd = FMDIndex.from_text(text)
    for _ in range(30):
        m = int(rng.integers(1, 12))
        i = int(rng.integers(0, len(text) - m))
        pattern = text[i : i + m]
        ik = _backward_search(fmd, pattern)
        expected = _brute_occurrences(text, pattern)
        assert ik[2] == len(expected)
        assert _interval_positions(fmd, ik) == expected


def test_backward_search_absent_pattern():
    text = np.zeros(50, dtype=np.uint8)  # all A
    fmd = FMDIndex.from_text(text)
    ik = _backward_search(fmd, np.array([1, 2, 3], dtype=np.uint8))  # CGT
    assert ik[2] == 0


def test_fmd_symmetry_revcomp_interval():
    """For fwd||revcomp text, the carried revcomp interval must be the true
    SA interval of the reverse complement of the pattern (SAInterval.revComp,
    fMIndex.h:85-88)."""
    rng = np.random.default_rng(7)
    fwd = random_codes(200, 11)
    text = np.concatenate([fwd, revcomp_codes(fwd)])
    fmd = FMDIndex.from_text(text)
    for _ in range(20):
        m = int(rng.integers(1, 10))
        i = int(rng.integers(0, len(text) - m))
        pattern = text[i : i + m]
        ik = _backward_search(fmd, pattern)
        rc = revcomp_codes(pattern)
        ik_rc = _backward_search(fmd, rc)
        # revComp() swaps start and startRevComp with equal size
        assert ik[2] == ik_rc[2]
        assert ik[1] == ik_rc[0]
        assert ik[0] == ik_rc[1]


def test_bwt_sa_full_walk():
    text = random_codes(500, 3)
    fmd = FMDIndex.from_text(text)
    sa = suffix_array(text)
    for k in range(1, len(text) + 1):
        assert fmd.bwt_sa(k) == sa[k], k


def test_occ4_matches_naive():
    text = random_codes(400, 5)
    fmd = FMDIndex.from_text(text)
    sa = suffix_array(text)
    # reconstruct BWT incl. $ at primary
    bwt_full = np.array(
        [text[sa[i] - 1] if sa[i] > 0 else 255 for i in range(len(sa))], dtype=np.int64
    )
    for k in [-1, 0, 1, 127, 128, 129, 200, 399, 400]:
        cnt = fmd.occ4(k)
        for c in range(4):
            assert cnt[c] == int((bwt_full[: k + 1] == c).sum()), (k, c)


def test_build_from_pack_and_roundtrip(tmp_path):
    p = Pack.from_contigs([("c1", "ACGTACGTACGTTTGACGAT"), ("c2", "GGGGCCCCATAT")])
    fmd = FMDIndex.build(p)
    assert fmd.n == 2 * p.unpacked_size_forward_strand
    prefix = str(tmp_path / "idx")
    fmd.store(prefix)
    fmd2 = FMDIndex.load(prefix)
    assert fmd2.primary == fmd.primary
    assert np.array_equal(fmd2.bwt_words, fmd.bwt_words)
    assert np.array_equal(fmd2.ssa, fmd.ssa)
