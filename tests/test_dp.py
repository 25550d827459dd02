"""Banded 2-piece affine DP vs a naive full-matrix implementation."""
import numpy as np
import pytest

import jax.numpy as jnp

from ma_tpu.ops.dp import (
    DPParams,
    banded_align,
    cigar_score,
    traceback_one,
    OP_M,
    OP_I,
    OP_D,
)

P = DPParams()
NEG = -(2**30)


def naive_dp(q, t, w=10**9, params=P):
    """Full-matrix 2-piece affine DP, same boundary conventions:
    virtual row/col = best gap cost; returns (H, score_global, max_cell)."""
    m, n = len(q), len(t)
    go1, ge1, go2, ge2 = params.gap_open, params.gap_extend, params.gap_open2, params.gap_extend2

    def gc(k):
        return max(-(go1 + k * ge1), -(go2 + k * ge2))

    H = np.full((m, n), NEG, dtype=np.int64)
    E1 = np.full((m, n), NEG, dtype=np.int64)
    E2 = np.full((m, n), NEG, dtype=np.int64)
    F1 = np.full((m, n), NEG, dtype=np.int64)
    F2 = np.full((m, n), NEG, dtype=np.int64)

    def s(i, j):
        if q[i] >= 4 or t[j] >= 4:
            return 0
        return params.match if q[i] == t[j] else -params.mismatch

    for i in range(m):
        for j in range(n):
            if abs(i - j) > w:
                continue
            h_left = H[i, j - 1] if j > 0 else (gc(i) if i > 0 else NEG)
            e1 = max(h_left - (go1 + ge1), (E1[i, j - 1] - ge1) if j > 0 else NEG)
            e2 = max(h_left - (go2 + ge2), (E2[i, j - 1] - ge2) if j > 0 else NEG)
            h_up = H[i - 1, j] if i > 0 else (gc(j) if j > 0 else NEG)
            f1 = max(h_up - (go1 + ge1), (F1[i - 1, j] - ge1) if i > 0 else NEG)
            f2 = max(h_up - (go2 + ge2), (F2[i - 1, j] - ge2) if i > 0 else NEG)
            if i > 0 and j > 0:
                diag = H[i - 1, j - 1]
            elif i == 0 and j == 0:
                diag = 0
            elif i == 0:
                diag = gc(j)
            else:
                diag = gc(i)
            E1[i, j], E2[i, j], F1[i, j], F2[i, j] = e1, e2, f1, f2
            H[i, j] = max(diag + s(i, j), e1, f1, e2, f2)
    return H


def run_one(q, t, w, is_global=True, zdrop=-1, M=None, N=None):
    M = M or len(q)
    N = N or len(t)
    qa = np.full((1, M), 4, np.int32)
    ta = np.full((1, N), 4, np.int32)
    qa[0, : len(q)] = q
    ta[0, : len(t)] = t
    return banded_align(
        jnp.asarray(qa), jnp.asarray(ta),
        jnp.asarray([len(q)], jnp.int32), jnp.asarray([len(t)], jnp.int32),
        jnp.asarray([w], jnp.int32), P, zdrop=zdrop, is_global=is_global,
    )


def check_cigar(cigar, m, n, anchored_end=None):
    qi = sum(l for op, l in cigar if op in (OP_M, OP_I))
    ti = sum(l for op, l in cigar if op in (OP_M, OP_D))
    if anchored_end:
        assert (qi, ti) == anchored_end


@pytest.mark.parametrize("seed", range(5))
def test_global_matches_naive(seed):
    rng = np.random.default_rng(seed)
    m = int(rng.integers(1, 30))
    n = int(rng.integers(1, 30))
    q = rng.integers(0, 4, m).astype(np.int32)
    t = rng.integers(0, 4, n).astype(np.int32)
    w = max(abs(m - n) + 10, 20)
    res = run_one(q, t, w)
    H = naive_dp(q, t, w)
    assert int(res.score[0]) == H[m - 1, n - 1]
    cig = traceback_one(np.asarray(res.dirs[0]), m - 1, n - 1)
    check_cigar(cig, m, n, anchored_end=(m, n))
    assert cigar_score(cig, q, t) == H[m - 1, n - 1]


@pytest.mark.parametrize("seed", range(3))
def test_extension_max_cell(seed):
    rng = np.random.default_rng(seed + 50)
    # query = prefix of ref with mutations, then junk: extension should stop early
    t = rng.integers(0, 4, 120).astype(np.int32)
    q = t[:60].copy()
    q[50:] = (q[50:] + 1) % 4  # diverge after 50 bases
    res = run_one(q, t, w=50, is_global=False, zdrop=200)
    H = naive_dp(q, t, 50)
    mi, mj = int(res.max_i[0]), int(res.max_j[0])
    assert int(res.score[0]) == H.max()
    assert H[mi, mj] == H.max()
    # max should be around the divergence point
    assert 40 <= mi <= 55
    cig = traceback_one(np.asarray(res.dirs[0]), mi, mj)
    assert cigar_score(cig, q, t) == H.max()
    check_cigar(cig, len(q), len(t), anchored_end=(mi + 1, mj + 1))


def test_zdrop_triggers():
    rng = np.random.default_rng(3)
    t = rng.integers(0, 4, 400).astype(np.int32)
    q = t[:40].copy()
    # rest of query is anti-matched -> deep score drop -> zdrop
    q = np.concatenate([q, (t[40:360] + 2) % 4]).astype(np.int32)
    res = run_one(q, t, w=100, is_global=False, zdrop=100)
    assert bool(res.zdropped[0])
    assert 30 <= int(res.max_i[0]) <= 45


def test_perfect_match_score():
    q = np.array([0, 1, 2, 3, 0, 1, 2, 3], np.int32)
    res = run_one(q, q, w=10)
    assert int(res.score[0]) == 8 * P.match
    cig = traceback_one(np.asarray(res.dirs[0]), 7, 7)
    assert cig == [(OP_M, 8)]


def test_single_deletion():
    t = np.array([0, 1, 2, 3, 0, 1, 2, 3, 2, 0, 3, 1], np.int32)
    q = np.concatenate([t[:5], t[8:]]).astype(np.int32)  # 3-base deletion
    res = run_one(q, t, w=20)
    cig = traceback_one(np.asarray(res.dirs[0]), len(q) - 1, len(t) - 1)
    assert (OP_D, 3) in cig
    assert int(res.score[0]) == 9 * P.match - min(
        P.gap_open + 3 * P.gap_extend, P.gap_open2 + 3 * P.gap_extend2
    )


def test_n_scores_zero():
    q = np.array([0, 4, 2], np.int32)
    t = np.array([0, 1, 2], np.int32)
    res = run_one(q, t, w=10)
    assert int(res.score[0]) == 2 * P.match + 0
