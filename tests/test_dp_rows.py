"""Row-sweep DP kernel vs the anti-diagonal kernel: exact score parity,
score-consistent tracebacks (CIGAR op choices may differ on ties)."""
import numpy as np
import pytest

import jax.numpy as jnp

from ma_tpu.ops.dp import (
    DPParams,
    banded_align,
    cigar_score,
    rle_ops_batch,
    traceback_device,
)
from ma_tpu.ops.dp_rows import banded_align_rows, traceback_device_rows

P = DPParams()


def _random_problems(rng, n_prob, M, N, related=True):
    q = rng.integers(0, 4, (n_prob, M)).astype(np.uint8)
    if related:
        t = np.full((n_prob, N), 4, np.uint8)
        for p in range(n_prob):
            # mutated copy of q with indels so alignments are non-trivial
            s = list(q[p])
            for _ in range(rng.integers(0, 6)):
                k = int(rng.integers(0, len(s)))
                r = rng.random()
                if r < 0.4:
                    s[k] = int(rng.integers(0, 4))
                elif r < 0.7 and len(s) > 4:
                    del s[k]
                else:
                    s.insert(k, int(rng.integers(0, 4)))
            s = (s * (N // len(s) + 1))[:N]
            t[p] = np.asarray(s, np.uint8)
    else:
        t = rng.integers(0, 4, (n_prob, N)).astype(np.uint8)
    qlen = rng.integers(1, M + 1, n_prob).astype(np.int32)
    tlen = rng.integers(1, N + 1, n_prob).astype(np.int32)
    band = rng.integers(4, max(M, N) + 8, n_prob).astype(np.int32)
    # keep the global end cell inside the band (production guarantees
    # band >= |dt - dq| + 10, nw.py _plan_dyn_prg)
    band = np.maximum(band, np.abs(qlen - tlen) + 10).astype(np.int32)
    return q, t, qlen, tlen, band


@pytest.mark.parametrize("seed,M,N,is_global", [
    (0, 16, 64, True),
    (1, 32, 32, True),
    (2, 16, 96, False),
    (3, 48, 48, False),
])
def test_rows_score_parity(seed, M, N, is_global):
    rng = np.random.default_rng(seed)
    q, t, qlen, tlen, band = _random_problems(rng, 48, M, N)
    zd = -1 if is_global else 200
    ref = banded_align(q, t, qlen, tlen, band, P, zdrop=zd, is_global=is_global)
    got = banded_align_rows(q, t, qlen, tlen, band, P, zdrop=zd,
                            is_global=is_global)
    rs = np.asarray(ref.score)
    gs = np.asarray(got.score)
    if is_global:
        np.testing.assert_array_equal(gs, rs)
    else:
        # undropped extensions must agree exactly on score and max cell
        und = ~np.asarray(ref.zdropped) & ~np.asarray(got.zdropped)
        np.testing.assert_array_equal(gs[und], rs[und])
        np.testing.assert_array_equal(np.asarray(got.max_i)[und],
                                      np.asarray(ref.max_i)[und])
        np.testing.assert_array_equal(np.asarray(got.max_j)[und],
                                      np.asarray(ref.max_j)[und])
        assert und.mean() > 0.5  # the comparison must not be vacuous


def test_rows_zdrop_rate_close_to_diagonal():
    """The row-sweep kernel evaluates z-drop per row (vs per anti-diagonal
    in ops/dp.py); trigger points can differ on individual problems, but the
    aggregate drop rate must stay close — a regression in the row-variant
    formula (e.g. dropping everything, or never dropping) is caught here."""
    rng = np.random.default_rng(99)
    # unrelated sequences: extensions wander off and z-drop fires often
    q, t, qlen, tlen, band = _random_problems(rng, 256, 128, 256,
                                              related=False)
    ref = banded_align(q, t, qlen, tlen, band, P, zdrop=20, is_global=False)
    got = banded_align_rows(q, t, qlen, tlen, band, P, zdrop=20,
                            is_global=False)
    r = np.asarray(ref.zdropped).mean()
    g = np.asarray(got.zdropped).mean()
    assert r > 0.05, "z-drop comparison is vacuous (reference never drops)"
    assert abs(r - g) < 0.15, (r, g)
    # problems both kernels leave undropped must agree exactly (already
    # covered above, re-asserted here on the drop-heavy workload)
    und = ~np.asarray(ref.zdropped) & ~np.asarray(got.zdropped)
    np.testing.assert_array_equal(np.asarray(got.score)[und],
                                  np.asarray(ref.score)[und])


@pytest.mark.parametrize("seed,M,N,is_global", [
    (10, 16, 64, True),
    (11, 16, 96, False),
    (12, 32, 48, True),
])
def test_rows_traceback_score_consistent(seed, M, N, is_global):
    rng = np.random.default_rng(seed)
    q, t, qlen, tlen, band = _random_problems(rng, 32, M, N)
    zd = -1 if is_global else 200
    res = banded_align_rows(q, t, qlen, tlen, band, P, zdrop=zd,
                            is_global=is_global)
    if is_global:
        si, sj = jnp.asarray(qlen) - 1, jnp.asarray(tlen) - 1
    else:
        si, sj = res.max_i, res.max_j
    ops, n_ops, rem_i, rem_j = traceback_device_rows(res.dirs, si, sj)
    cigars = rle_ops_batch(np.asarray(ops), np.asarray(n_ops),
                           np.asarray(rem_i), np.asarray(rem_j))
    score = np.asarray(res.score)
    mi = np.asarray(si)
    mj = np.asarray(sj)
    for p in range(len(cigars)):
        if not is_global and mi[p] < 0:
            continue
        # a traceback must reproduce its own DP score over the aligned span
        sc = cigar_score(cigars[p], q[p][: mi[p] + 1], t[p][: mj[p] + 1], P)
        assert sc == score[p], (p, cigars[p], sc, score[p])
        # and consume exactly the aligned spans
        nq = sum(l for op, l in cigars[p] if op != 2)
        nt = sum(l for op, l in cigars[p] if op != 1)
        assert nq == mi[p] + 1, (p, cigars[p])
        assert nt == mj[p] + 1, (p, cigars[p])
