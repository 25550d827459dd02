"""Device SoC collection vs host transcription of the reference sweep
(stripOfConsideration.cpp execute + soc.h push_back_no_overlap/rectangularSoC)."""
import numpy as np
import pytest

import jax.numpy as jnp

from ma_tpu.ops.extract import SeedBatch
from ma_tpu.ops.soc import soc_collect


def host_soc(seeds, qlen, contig_starts, match=2, extend=2, gap=4, fixed_width=0,
             rectangular=True, min_score=0):
    """seeds: list of (q_start, length, ref, on_forw, amb, delta). Returns list of
    (score_len, score_amb, [seed tuples]) in best-first order."""
    if not seeds:
        return []
    seeds = sorted(seeds, key=lambda s: s[5])
    n = len(seeds)
    width = fixed_width if fixed_width else (match * qlen - gap) // extend
    contig = lambda s: int(np.searchsorted(contig_starts, s[2], side="right")) - 1

    def rscore(l, r):
        sl = sum(s[1] for s in seeds[l:r])
        sa = sum(s[4] for s in seeds[l:r])
        return sl, sa

    def order_less(a, b):  # SoCOrder <
        if a[0] == b[0]:
            return a[1] > b[1]
        return a[0] < b[0]

    maxima = []  # entries [score_len, score_amb, start, end]
    for i in range(n):
        j = i
        while (j < n and seeds[i][5] + width >= seeds[j][5]
               and contig(seeds[i]) == contig(seeds[j])
               and (rectangular or seeds[i][3] == seeds[j][3])):
            j += 1
        sl, sa = rscore(i, j)
        if sl < min_score or sl <= 0:
            continue
        # push_back_no_overlap
        s, e, cl, ca = i, j, sl, sa
        keep = True
        while maxima and maxima[-1][3] > s:
            back = maxima[-1]
            if order_less((back[0], back[1]), (cl, ca)):
                back[0], back[1] = rscore(back[2], s)
                back[3] = s
                if back[0] < min_score or back[0] == 0:
                    maxima.pop()
            else:
                cl, ca = rscore(back[3], e)
                s = back[3]
                if cl < min_score or cl == 0:
                    keep = False
                    break
        if keep:
            maxima.append([cl, ca, s, e])

    if rectangular:
        spans = []
        for cl, ca, s, e in maxima:
            refs = [seeds[k][2] for k in range(s, e)]
            spans.append((min(refs), max(refs)))
        seeds = sorted(seeds, key=lambda s: s[2])
        maxima = []
        for lo, hi in spans:
            s = 0
            while s < n and seeds[s][2] < lo:
                s += 1
            e = s
            while e < n and seeds[e][2] <= hi:
                e += 1
            cl, ca = rscore(s, e)
            maxima.append([cl, ca, s, e])

    out = [(cl, ca, sorted(seeds[k][:5] for k in range(s, e))) for cl, ca, s, e in maxima]
    out.sort(key=lambda t: (-t[0], t[1]))
    return out


def mk_batch(per_read, S=64):
    B = len(per_read)
    f = lambda: np.zeros((B, S), np.int32)
    qs, ln, rf, am, dl = f(), f(), f(), f(), f()
    fw = np.zeros((B, S), bool)
    va = np.zeros((B, S), bool)
    ns = np.zeros(B, np.int32)
    for b, seeds in enumerate(per_read):
        for k, (q, l, r, o, a, d) in enumerate(seeds):
            qs[b, k], ln[b, k], rf[b, k], fw[b, k], am[b, k], dl[b, k] = q, l, r, o, a, d
            va[b, k] = True
        ns[b] = len(seeds)
        dl[b, len(seeds):] = 2**31 - 1
    return SeedBatch(
        q_start=jnp.asarray(qs), length=jnp.asarray(ln), ref_start=jnp.asarray(rf),
        on_forward=jnp.asarray(fw), ambiguity=jnp.asarray(am), delta=jnp.asarray(dl),
        soc_nt=jnp.asarray(np.zeros((B, S), np.int32)), valid=jnp.asarray(va),
        n_seeds=jnp.asarray(ns), overflow=jnp.asarray(np.zeros(B, bool)),
    )


def rand_seeds(rng, n, qlen, glen):
    out = []
    for _ in range(n):
        q = int(rng.integers(0, qlen - 16))
        l = int(rng.integers(16, min(40, qlen - q + 1)))
        r = int(rng.integers(0, glen - l))
        o = bool(rng.integers(0, 2))
        a = int(rng.integers(1, 5))
        d = r + (qlen - q)  # rectangular-mode delta, single contig
        out.append((q, l, r, o, a, d))
    return out


@pytest.mark.parametrize("rectangular", [True, False])
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_soc_matches_host(seed, rectangular):
    rng = np.random.default_rng(seed)
    qlen, glen = 100, 5000
    per_read = [rand_seeds(rng, int(rng.integers(1, 40)), qlen, glen) for _ in range(4)]
    contig_starts = np.array([0], np.int32)
    batch = mk_batch(per_read)
    out = soc_collect(
        batch, jnp.asarray(np.full(4, qlen, np.int32)), jnp.asarray(contig_starts),
        rectangular=rectangular, min_score=0, max_socs=64,
    )
    assert not bool(np.asarray(out.overflow).any())
    for b in range(4):
        want = host_soc(per_read[b], qlen, contig_starts, rectangular=rectangular)
        k = int(out.n_socs[b])
        got = []
        for s in range(k):
            st, en = int(out.start[b, s]), int(out.end[b, s])
            members = sorted(
                (
                    int(out.seeds.q_start[b, i]),
                    int(out.seeds.length[b, i]),
                    int(out.seeds.ref_start[b, i]),
                    bool(out.seeds.on_forward[b, i]),
                    int(out.seeds.ambiguity[b, i]),
                )
                for i in range(st, en)
            )
            got.append((int(out.score[b, s]), int(out.amb[b, s]), members))
        got.sort(key=lambda t: (-t[0], t[1]))
        assert [(g[0], g[1]) for g in got] == [(w[0], w[1]) for w in want], f"read {b} scores"
        assert got == want, f"read {b} contents"


def test_soc_min_score_filter():
    # two clusters, one below min score
    seeds = [
        (0, 20, 100, True, 1, 200),
        (20, 30, 120, True, 1, 200 + 10),
        (0, 17, 4000, True, 1, 4100),
    ]
    batch = mk_batch([seeds])
    out = soc_collect(
        batch, jnp.asarray(np.array([100], np.int32)), jnp.asarray(np.array([0], np.int32)),
        min_score=30, max_socs=8,
    )
    assert int(out.n_socs[0]) == 1
    assert int(out.score[0, 0]) == 50


def test_soc_empty():
    batch = mk_batch([[]])
    out = soc_collect(
        batch, jnp.asarray(np.array([100], np.int32)), jnp.asarray(np.array([0], np.int32))
    )
    assert int(out.n_socs[0]) == 0
