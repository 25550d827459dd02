"""Native SA-IS vs the numpy prefix-doubling builder."""
import numpy as np
import pytest

from ma_tpu.index.suffix_array import suffix_array_doubling


def native_available():
    try:
        from ma_tpu.native import sais
        sais.suffix_array(np.array([0, 1, 2], np.uint8))
        return True
    except Exception:
        return False


pytestmark = pytest.mark.skipif(not native_available(),
                                reason="no native toolchain")


@pytest.mark.parametrize("seed,n", [(0, 10), (1, 100), (2, 1000), (3, 20000)])
def test_matches_doubling(seed, n):
    from ma_tpu.native import sais

    rng = np.random.default_rng(seed)
    codes = rng.integers(0, 4, n).astype(np.uint8)
    assert np.array_equal(sais.suffix_array(codes),
                          suffix_array_doubling(codes))


def test_with_n_bases():
    from ma_tpu.native import sais

    codes = np.array([0, 4, 1, 4, 2, 3, 0, 4], np.uint8)
    assert np.array_equal(sais.suffix_array(codes),
                          suffix_array_doubling(codes))


def test_repeat_heavy():
    from ma_tpu.native import sais

    codes = np.tile(np.array([0, 1, 0, 1, 2], np.uint8), 500)
    assert np.array_equal(sais.suffix_array(codes),
                          suffix_array_doubling(codes))
