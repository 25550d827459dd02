"""Packed-40-bit SA-IS + streaming FMD build (native/sais40.cpp) vs the
int64 path — field-identical indexes (the bwt_large.cpp role; reference:
libs/ma/src/container/bwt_large.cpp:1522,1607)."""
import numpy as np
import pytest

from ma_tpu.index.fmd_index import FMDIndex
from ma_tpu.native.sais import fmd_arrays_large, suffix_array


@pytest.mark.parametrize("n", [1, 2, 5, 97, 1000, 40_000])
def test_sa40_matches_int64(n):
    rng = np.random.default_rng(n)
    text = rng.integers(0, 4, size=n).astype(np.uint8)
    sa = suffix_array(text)
    import ctypes

    from ma_tpu.native.sais import _load40

    lib = _load40()
    u8p = ctypes.POINTER(ctypes.c_uint8)
    sa40 = np.empty(5 * (n + 1) + 8, dtype=np.uint8)
    assert lib.sais40_u8(
        np.ascontiguousarray(text).ctypes.data_as(u8p), ctypes.c_int64(n),
        sa40.ctypes.data_as(u8p),
    ) == 0
    # unpack 40-bit entries
    vals = np.zeros(n + 1, dtype=np.int64)
    b = sa40[: 5 * (n + 1)].reshape(n + 1, 5).astype(np.int64)
    for k in range(5):
        vals |= b[:, k] << (8 * k)
    np.testing.assert_array_equal(vals, sa)


# 2 Mbp runs the 40-bit path at a size where its packing/recursion
# workspace layout actually matters (VERDICT r3 #3; ~6 s in CI)
@pytest.mark.parametrize("n", [64, 1000, 250_000, 2_000_000])
def test_fmd_large_build_field_identical(n):
    rng = np.random.default_rng(n + 7)
    half = rng.integers(0, 4, size=n).astype(np.uint8)
    from ma_tpu.containers.nucseq import revcomp_codes

    text = np.concatenate([half, revcomp_codes(half)])
    a = FMDIndex.from_text(text)
    b = FMDIndex.from_text_large(text)
    assert a.n == b.n and a.primary == b.primary
    np.testing.assert_array_equal(a.L2, b.L2)
    np.testing.assert_array_equal(a.bwt_words, b.bwt_words)
    np.testing.assert_array_equal(a.occ_cp, b.occ_cp)
    np.testing.assert_array_equal(a.ssa, b.ssa)


def test_fmd_large_repetitive_text():
    """Repetitive text exercises the deep recursion path (names < n1)."""
    unit = np.array([0, 1, 2, 3, 0, 0, 1, 2], np.uint8)
    text = np.concatenate([np.tile(unit, 2000), np.arange(4, dtype=np.uint8)])
    a = FMDIndex.from_text(text)
    b = FMDIndex.from_text_large(text)
    assert a.primary == b.primary
    np.testing.assert_array_equal(a.bwt_words, b.bwt_words)
    np.testing.assert_array_equal(a.ssa, b.ssa)
