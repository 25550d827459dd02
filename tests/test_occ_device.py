"""Device FMD ops vs host reference implementation."""
import numpy as np
import pytest

import jax.numpy as jnp

from ma_tpu.containers.nucseq import revcomp_codes
from ma_tpu.index import FMDIndex
from ma_tpu.ops import occ as occ_ops


@pytest.fixture(scope="module")
def fmd_pair():
    rng = np.random.default_rng(123)
    fwd = rng.integers(0, 4, size=700).astype(np.uint8)
    text = np.concatenate([fwd, revcomp_codes(fwd)])
    fmd = FMDIndex.from_text(text)
    return fmd, occ_ops.FMDDev.from_host(fmd), text


def test_occ4_batch_matches_host(fmd_pair):
    fmd, dev, text = fmd_pair
    ks = np.array([-1, 0, 1, 5, 127, 128, 129, 255, 256, 700, 1399, 1400], dtype=np.int32)
    got = np.asarray(occ_ops.occ4(dev, jnp.asarray(ks)))
    for i, k in enumerate(ks):
        np.testing.assert_array_equal(got[i], fmd.occ4(int(k)), err_msg=f"k={k}")


def test_occ1_matches_occ4(fmd_pair):
    _, dev, _ = fmd_pair
    rng = np.random.default_rng(0)
    ks = rng.integers(-1, 1400, size=64).astype(np.int32)
    cs = rng.integers(0, 4, size=64).astype(np.int32)
    full = np.asarray(occ_ops.occ4(dev, jnp.asarray(ks)))
    one = np.asarray(occ_ops.occ1(dev, jnp.asarray(ks), jnp.asarray(cs)))
    np.testing.assert_array_equal(one, full[np.arange(64), cs])


def test_extend_backward_matches_host(fmd_pair):
    fmd, dev, text = fmd_pair
    rng = np.random.default_rng(1)
    # random patterns, walk both implementations in lockstep
    for trial in range(10):
        m = int(rng.integers(2, 15))
        i = int(rng.integers(0, len(text) - m))
        pat = text[i : i + m]
        h = fmd.init_interval(int(pat[-1]))
        d = occ_ops.init_interval(dev, jnp.asarray([int(pat[-1])], dtype=jnp.int32))
        assert (int(d.start[0]), int(d.start_rc[0]), int(d.size[0])) == h
        for c in pat[-2::-1]:
            h = fmd.extend_backward(h, int(c))
            d = occ_ops.extend_backward(dev, d, jnp.asarray([int(c)], dtype=jnp.int32))
            assert (int(d.start[0]), int(d.start_rc[0]), int(d.size[0])) == h
            if h[2] == 0:
                break


def test_extend_backward_n_char(fmd_pair):
    _, dev, _ = fmd_pair
    ik = occ_ops.init_interval(dev, jnp.asarray([0], dtype=jnp.int32))
    out = occ_ops.extend_backward(dev, ik, jnp.asarray([4], dtype=jnp.int32))
    assert int(out.size[0]) == 0


def test_sa_lookup_matches_host(fmd_pair):
    fmd, dev, text = fmd_pair
    rng = np.random.default_rng(2)
    ks = rng.integers(1, len(text) + 1, size=128).astype(np.int32)
    got = np.asarray(occ_ops.sa_lookup(dev, jnp.asarray(ks)))
    want = np.array([fmd.bwt_sa(int(k)) for k in ks])
    np.testing.assert_array_equal(got, want)


def test_inv_psi_primary_row(fmd_pair):
    fmd, dev, _ = fmd_pair
    out = occ_ops.inv_psi(dev, jnp.asarray([fmd.primary], dtype=jnp.int32))
    assert int(out[0]) == 0
