"""Section-decomposed MSV sweep == monolithic sweep (VERDICT r2 item #7).

_independent_sections cuts where the active set provably empties, so
clustering a whole-genome jump set in sections must give exactly the
calls of the single-pass sweep (sweepSvJumps.h GenomeSectionFactory role).
"""
import numpy as np

from ma_tpu.msv.jumps import JumpParams, SvJump
from ma_tpu.msv.sweep import _finalize, _sweep_fast, sweep_jumps


def _random_jumps(rng, n, span=5_000_000):
    out = []
    for i in range(n):
        # clustered sites + noise
        if rng.random() < 0.7:
            site = int(rng.integers(0, 200)) * (span // 200)
            f = site + int(rng.integers(0, 40))
            t = site + 1000 + int(rng.integers(0, 40))
        else:
            f = int(rng.integers(0, span))
            t = f + int(rng.integers(50, 5000))
        out.append(
            SvJump(
                from_pos=f, to_pos=t,
                query_from=int(rng.integers(0, 500)),
                query_to=int(rng.integers(500, 1000)),
                from_forward=bool(rng.integers(0, 2)),
                to_forward=bool(rng.integers(0, 2)),
                num_supporting_nt=int(rng.integers(20, 200)),
                read_id=int(rng.integers(0, n // 2 + 1)),
                id=i,
                params=JumpParams(),
            )
        )
    return out


def _monolithic(jumps, min_reads):
    from ma_tpu.msv.jumps_batch import JumpBatch
    from ma_tpu.msv.sweep import _Cols

    jb = JumpBatch.from_jumps(jumps)
    cols = _Cols.from_batch(jb)
    calls = []
    for coarse in _sweep_fast(cols, np.arange(len(jb), dtype=np.int64)):
        for exact in _sweep_fast(cols, np.asarray(coarse.members, np.int64)):
            c = _finalize(cols, exact, min_reads)
            if c is not None:
                calls.append(c)
    calls.sort(key=lambda c: (c.from_pos, c.to_pos))
    return calls


def _key(c):
    return (c.from_pos, c.to_pos, c.from_forward, c.to_forward,
            c.supp_reads, c.supp_nt, tuple(sorted(c.supporting_jump_ids)))


def test_sections_equal_monolithic():
    rng = np.random.default_rng(42)
    jumps = _random_jumps(rng, 4000)  # > the 512 sectioning threshold
    a = sweep_jumps(jumps, min_reads=2)
    b = _monolithic(list(jumps), min_reads=2)
    assert [_key(c) for c in a] == [_key(c) for c in b]


def test_sections_scale():
    """50k jumps over 250 Mbp of coordinates cluster in seconds (the
    near-linear regime the sectioning buys; wall printed for BASELINE)."""
    import time

    rng = np.random.default_rng(7)
    jumps = _random_jumps(rng, 50_000, span=250_000_000)
    t0 = time.perf_counter()
    calls = sweep_jumps(jumps, min_reads=2)
    dt = time.perf_counter() - t0
    print(f"\n50k jumps over 250Mbp: {dt:.2f}s, {len(calls)} calls")
    assert dt < 60
    assert len(calls) > 100
