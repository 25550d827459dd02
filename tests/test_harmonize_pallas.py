"""Pallas shadow-linesweep kernel vs the XLA scan formulation (exact)."""
import numpy as np
import pytest

import jax.numpy as jnp

from ma_tpu.ops import harmonize as H
from ma_tpu.ops.harmonize_pallas import linesweep_sorted_pallas


def _xla_reference(starts, ends, dists, valid):
    M = starts.shape[-1]
    seed_idx = jnp.broadcast_to(jnp.arange(M), starts.shape).astype(jnp.int32)
    import os

    os.environ["MA_TPU_SWEEP"] = "xla"
    try:
        return np.asarray(H._linesweep(starts, ends, dists, seed_idx, valid))
    finally:
        os.environ.pop("MA_TPU_SWEEP", None)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_pallas_sweep_matches_scan(seed):
    rng = np.random.default_rng(seed)
    B, K, M = 5, 3, 64
    starts = rng.integers(0, 500, (B, K, M)).astype(np.int32)
    lens = rng.integers(1, 60, (B, K, M)).astype(np.int32)
    ends = starts + lens
    dists = rng.random((B, K, M), np.float32) * 30
    valid = rng.random((B, K, M)) < 0.7
    # duplicate some starts and ends to stress tie handling
    starts[:, :, 10:20] = starts[:, :, 10:11]
    ends[:, :, 30:36] = ends[:, :, 30:31]

    want = _xla_reference(
        jnp.asarray(starts), jnp.asarray(ends), jnp.asarray(dists), jnp.asarray(valid)
    )

    key_start = jnp.where(jnp.asarray(valid), jnp.asarray(starts), jnp.int32(2**30))
    ordr = jnp.lexsort((-jnp.asarray(ends), key_start), axis=-1)
    take = lambda a: jnp.take_along_axis(jnp.asarray(a), ordr, axis=-1)
    surv_sorted = linesweep_sorted_pallas(
        take(ends).reshape(-1, M),
        take(dists).reshape(-1, M),
        take(valid).reshape(-1, M),
        interpret=True,
    ).reshape(B, K, M)
    got = np.asarray(
        (
            (ordr[..., :, None] == jnp.arange(M)[None, :]) & surv_sorted[..., :, None]
        ).any(axis=-2)
    )
    assert (got == want).all()


def test_pallas_sweep_empty_and_single():
    M = 64
    ends = np.zeros((2, M), np.int32)
    dists = np.zeros((2, M), np.float32)
    valid = np.zeros((2, M), bool)
    ends[1, 0], valid[1, 0] = 10, True  # single element survives
    surv = np.asarray(
        linesweep_sorted_pallas(
            jnp.asarray(ends), jnp.asarray(dists), jnp.asarray(valid), interpret=True
        )
    )
    assert not surv[0].any()
    assert surv[1, 0] and not surv[1, 1:].any()
