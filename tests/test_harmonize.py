"""Harmonization device ops vs host transcriptions / properties."""
import math

import numpy as np
import pytest

import jax.numpy as jnp

from ma_tpu.ops.harmonize import (
    _delta_distance,
    _linesweep,
    artifact_filter,
    harmonize_sets,
)


def host_linesweep(shadows):
    """Transcription of Harmonization::linesweep (harmonization.cpp:182-249).
    shadows: list of (seed_idx, start, end, dist). Returns surviving seed idx set."""
    shadows = sorted(shadows, key=lambda t: (t[1], -t[2]))
    stack = []
    x = -1
    for (si, s, e, d) in shadows:
        if x < e:
            stack.append((si, s, e, d))
            x = e
        else:
            pos = len(stack)
            closer = True
            while pos > 0 and stack[pos - 1][2] >= e:
                if stack[pos - 1][3] <= d:
                    closer = False
                    break
                pos -= 1
            if closer:
                while stack and stack[-1][2] >= e:
                    stack.pop()
                stack.append((si, s, e, d))
    return {t[0] for t in stack}


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_linesweep_matches_host(seed):
    rng = np.random.default_rng(seed)
    M = 24
    n = int(rng.integers(1, M))
    starts = rng.integers(0, 60, size=M).astype(np.int32)
    ends = (starts + rng.integers(1, 40, size=M)).astype(np.int32)
    dists = rng.random(M).astype(np.float32)
    valid = np.zeros(M, bool)
    valid[:n] = True
    idx = np.arange(M, dtype=np.int32)

    surv = np.asarray(
        _linesweep(
            jnp.asarray(starts)[None], jnp.asarray(ends)[None], jnp.asarray(dists)[None],
            jnp.asarray(idx)[None], jnp.asarray(valid)[None],
        )
    )[0]
    want = host_linesweep([(int(i), int(starts[i]), int(ends[i]), float(dists[i])) for i in range(n)])
    assert set(np.nonzero(surv)[0].tolist()) == want


def test_harmonize_collinear_survive():
    # five perfectly collinear seeds on the diagonal -> all survive
    M = 16
    q = np.zeros(M, np.int32)
    l = np.zeros(M, np.int32)
    r = np.zeros(M, np.int32)
    v = np.zeros(M, bool)
    for k in range(5):
        q[k], l[k], r[k] = 10 + 20 * k, 15, 1000 + 20 * k
        v[k] = True
    out = np.asarray(harmonize_sets(jnp.asarray(q)[None], jnp.asarray(l)[None],
                                    jnp.asarray(r)[None], jnp.asarray(v)[None]))[0]
    assert set(np.nonzero(out)[0]) == {0, 1, 2, 3, 4}


def test_harmonize_outlier_removed():
    M = 16
    q = np.zeros(M, np.int32)
    l = np.zeros(M, np.int32)
    r = np.zeros(M, np.int32)
    v = np.zeros(M, bool)
    for k in range(5):
        q[k], l[k], r[k] = 10 + 20 * k, 15, 1000 + 20 * k
        v[k] = True
    # a contradicting seed far off the diagonal, overlapping seed 2's query span
    q[5], l[5], r[5] = 50, 15, 5000
    v[5] = True
    out = np.asarray(harmonize_sets(jnp.asarray(q)[None], jnp.asarray(l)[None],
                                    jnp.asarray(r)[None], jnp.asarray(v)[None]))[0]
    assert 5 not in set(np.nonzero(out)[0])
    assert {0, 1, 2, 3, 4} <= set(np.nonzero(out)[0])


def test_harmonize_single_and_empty():
    M = 8
    q = np.zeros(M, np.int32); l = np.zeros(M, np.int32); r = np.zeros(M, np.int32)
    v = np.zeros(M, bool)
    v[3] = True
    q[3], l[3], r[3] = 5, 20, 700
    out = np.asarray(harmonize_sets(jnp.asarray(q)[None], jnp.asarray(l)[None],
                                    jnp.asarray(r)[None], jnp.asarray(v)[None]))[0]
    assert set(np.nonzero(out)[0]) == {3}
    out0 = np.asarray(harmonize_sets(jnp.zeros((1, M), jnp.int32), jnp.zeros((1, M), jnp.int32),
                                     jnp.zeros((1, M), jnp.int32), jnp.zeros((1, M), bool)))[0]
    assert not out0.any()


def host_artifact(seeds, max_dd=0.1, min_dd=16):
    """Transcription of the artifact filter (harmonization.cpp:137-178).
    seeds sorted by (ref, q); returns surviving indices."""
    seeds = sorted(seeds, key=lambda s: (s[2], s[0]))
    killed = set()
    if len(seeds) > 2:
        pre, ctr = 0, 1
        while ctr < len(seeds) - 1:
            dpre = seeds[pre][2] - seeds[pre][0]
            dctr = seeds[ctr][2] - seeds[ctr][0]
            dpost = seeds[ctr + 1][2] - seeds[ctr + 1][0]
            a, b = abs(dpre - dctr), abs(dpost - dctr)
            if a + b == 0:
                diff = float("nan")
            else:
                diff = abs(a - b) * 2 / (a + b)
            if diff < max_dd and a > min_dd:
                killed.add(ctr)
                ctr += 1
            else:
                ctr += 1
                pre = ctr - 1
    return [s for i, s in enumerate(seeds) if i not in killed]


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_artifact_filter_matches_host(seed):
    rng = np.random.default_rng(seed)
    M = 16
    n = int(rng.integers(3, M))
    q = rng.integers(0, 100, size=M).astype(np.int32)
    l = rng.integers(16, 30, size=M).astype(np.int32)
    r = rng.integers(0, 50, size=M).astype(np.int32) + q  # deltas in [0,50)
    v = np.zeros(M, bool)
    v[:n] = True
    out = np.asarray(
        artifact_filter(jnp.asarray(q)[None], jnp.asarray(l)[None],
                        jnp.asarray(r)[None], jnp.asarray(v)[None])
    )[0]
    got = sorted((int(q[i]), int(l[i]), int(r[i])) for i in np.nonzero(out)[0])
    want = sorted(host_artifact([(int(q[i]), int(l[i]), int(r[i])) for i in range(n)]))
    assert got == want


def test_delta_distance_diagonal():
    # point exactly on a 45-degree line through rstart has distance ~0
    d = _delta_distance(jnp.float32(50.0), jnp.float32(1050.0),
                        jnp.float32(math.pi / 4), jnp.float32(1000.0))
    assert float(d) < 1e-3
