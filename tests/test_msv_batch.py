"""SoA jump enumeration + column math (msv/jumps_batch.py) vs the
per-object oracle (msv/jumps.py) — element-wise identical required."""
import numpy as np
import pytest

from ma_tpu.msv.jumps import JumpParams, SvJump, compute_jumps
from ma_tpu.msv.jumps_batch import JumpBatch, jumps_from_seed_csr


def _random_read_seeds(rng, qlen):
    n = int(rng.integers(0, 12))
    seeds = []
    for _ in range(n):
        l = int(rng.integers(18, 120))
        q = int(rng.integers(0, max(qlen - l, 1)))
        r = int(rng.integers(0, 10_000_000))
        fw = bool(rng.integers(0, 2))
        nt = int(rng.integers(25, 4000))
        seeds.append((q, l, r, fw, nt))
    # occasionally stack near-duplicates to exercise the >95%-overlap rule
    if n and rng.random() < 0.5:
        q, l, r, fw, nt = seeds[0]
        for _ in range(int(rng.integers(1, 4))):
            seeds.append((q + int(rng.integers(0, 3)), l, r + 7, not fw, nt))
    return sorted(set(seeds))


def _oracle(reads, params):
    out = []
    next_id = 0
    for rid, (qlen, seeds) in enumerate(reads):
        js = compute_jumps(seeds, qlen, read_id=rid, params=params)
        for j in js:
            j.id = next_id
            next_id += 1
        out.extend(js)
    return out


def _csr(reads):
    q, l, r, fw, nt = [], [], [], [], []
    off = [0]
    qlens = []
    for (qlen, seeds) in reads:
        for (a, b, c, d, e) in seeds:
            q.append(a), l.append(b), r.append(c), fw.append(d), nt.append(e)
        off.append(len(q))
        qlens.append(qlen)
    return (
        np.asarray(q, np.int64), np.asarray(l, np.int64),
        np.asarray(r, np.int64), np.asarray(fw, bool),
        np.asarray(nt, np.int64), np.asarray(off, np.int64),
        np.asarray(qlens, np.int64),
        np.arange(len(reads), dtype=np.int64),
    )


COLUMNS = [
    "from_pos", "to_pos", "query_from", "query_to", "from_forward",
    "to_forward", "num_supporting_nt", "read_id", "was_mirrored", "id",
]
DERIVED = [
    "size", "fuzziness", "seed_dir_fuzziness", "from_start",
    "from_start_same_strand", "from_size", "from_end", "to_start",
    "to_size", "to_end", "sweep_end", "insert_ratio",
]


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_batch_enumeration_matches_oracle(seed):
    rng = np.random.default_rng(seed)
    params = JumpParams()
    reads = []
    for _ in range(60):
        qlen = int(rng.integers(150, 3000))
        reads.append((qlen, _random_read_seeds(rng, qlen)))
    oracle = _oracle(reads, params)
    jb = jumps_from_seed_csr(*_csr(reads), params=params)
    assert len(jb) == len(oracle)
    for col in COLUMNS:
        got = np.asarray(getattr(jb, col))
        want = np.asarray([getattr(j, col) for j in oracle])
        assert np.array_equal(got, want), col
    for meth in DERIVED:
        got = np.asarray(getattr(jb, meth)())
        want = np.asarray([getattr(j, meth)() for j in oracle])
        assert np.array_equal(got, want), meth


def test_roundtrip_and_take():
    rng = np.random.default_rng(7)
    params = JumpParams()
    reads = [(1500, _random_read_seeds(rng, 1500)) for _ in range(20)]
    oracle = _oracle(reads, params)
    if not oracle:
        pytest.skip("no jumps generated")
    jb = JumpBatch.from_jumps(oracle, params)
    back = jb.to_jumps()
    assert [j.from_pos for j in back] == [j.from_pos for j in oracle]
    sub = jb.take(np.arange(0, len(jb), 2))
    assert len(sub) == (len(jb) + 1) // 2


def test_batch_sweep_matches_object_sweep():
    from ma_tpu.msv.sweep import sweep_jumps

    rng = np.random.default_rng(11)
    params = JumpParams()
    reads = []
    # clustered deletion pattern: several reads spanning the same breakpoint
    for rid in range(8):
        seeds = [
            (0, 60, 5000 + rid, True, 120),
            (60, 60, 5400 + rid, True, 120),
        ]
        reads.append((120, seeds))
    for _ in range(30):
        qlen = int(rng.integers(150, 2000))
        reads.append((qlen, _random_read_seeds(rng, qlen)))
    oracle = _oracle(reads, params)
    jb = jumps_from_seed_csr(*_csr(reads), params=params)
    want = sweep_jumps(oracle, min_reads=2)
    got = sweep_jumps(jb, min_reads=2)
    assert len(got) == len(want)
    for a, b in zip(got, want):
        assert (a.from_pos, a.to_pos, a.supp_reads, a.supp_nt) == (
            b.from_pos, b.to_pos, b.supp_reads, b.supp_nt
        )
        assert sorted(a.supporting_jump_ids) == sorted(b.supporting_jump_ids)
