"""Pallas DP kernel vs the XLA reference implementation (cell-exact)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ma_tpu.ops.dp import DPParams, banded_align
from ma_tpu.ops.dp_pallas import banded_align_pallas


@pytest.mark.parametrize("is_global,zdrop", [(True, -1), (False, 200)])
def test_pallas_matches_xla(is_global, zdrop):
    rng = np.random.default_rng(0)
    P, M, N = 8, 32, 64
    q = rng.integers(0, 4, (P, M)).astype(np.uint8)
    t = rng.integers(0, 4, (P, N)).astype(np.uint8)
    # half the problems: t contains q (strong alignment)
    for p in range(0, P, 2):
        t[p, 10 : 10 + M] = q[p]
    qlen = rng.integers(8, M + 1, P).astype(np.int32)
    tlen = rng.integers(16, N + 1, P).astype(np.int32)
    band = np.full(P, 64, np.int32)

    ref = banded_align(q, t, qlen, tlen, band, DPParams(), zdrop=zdrop,
                       is_global=is_global)
    pal = banded_align_pallas(
        jnp.asarray(q), jnp.asarray(t), jnp.asarray(qlen), jnp.asarray(tlen),
        jnp.asarray(band), params=DPParams(), zdrop=zdrop,
        is_global=is_global, interpret=True,
    )
    assert np.array_equal(np.asarray(ref.score), np.asarray(pal.score))
    assert np.array_equal(np.asarray(ref.max_i), np.asarray(pal.max_i))
    assert np.array_equal(np.asarray(ref.max_j), np.asarray(pal.max_j))
    assert np.array_equal(np.asarray(ref.zdropped), np.asarray(pal.zdropped))
    assert np.array_equal(np.asarray(ref.dirs), np.asarray(pal.dirs))
