"""MEM seeding vs brute force (reference: libs/ma/tests/mems.py)."""
import numpy as np
import pytest

from ma_tpu.containers.nucseq import NucSeq, decode_seq
from ma_tpu.containers.pack import Pack
from ma_tpu.index.fmd_index import FMDIndex
from ma_tpu.ops.mem_seeding import materialize_mem_seeds, mem_seeding
from ma_tpu.pipeline.aligner import Aligner


@pytest.fixture(scope="module")
def idx():
    rng = np.random.default_rng(71)
    genome = rng.integers(0, 4, size=4000).astype(np.uint8)
    pack = Pack.empty()
    pack.append("chrMEM", genome)
    return pack, FMDIndex.build(pack), genome


def brute_force_mems(genome, read, min_len):
    """All maximal exact matches (forward strand only, for checking)."""
    out = set()
    L, G = len(read), len(genome)
    for i in range(L):
        for g in range(G):
            if read[i] != genome[g]:
                continue
            # extendable left?
            if i > 0 and g > 0 and read[i - 1] == genome[g - 1]:
                continue
            k = 0
            while i + k < L and g + k < G and read[i + k] == genome[g + k]:
                k += 1
            if k >= min_len:
                out.add((i, k, g))
    return out


def test_mems_match_brute_force(idx):
    pack, fmd, genome = idx
    rng = np.random.default_rng(3)
    read = genome[1000:1080].copy()
    for j in (20, 45, 60):
        read[j] = (read[j] + 1) % 4
    min_len = 12
    segs = mem_seeding(fmd, read, min_seed_size=min_len - 1, max_ambiguity=1000)
    got = {
        (q, l, r)
        for (q, l, r, f, a) in materialize_mem_seeds(fmd, segs, 1000)
        if f
    }
    want = brute_force_mems(genome, read, min_len + 1)
    # every brute-force forward MEM longer than min must be found
    missing = {w for w in want if w not in got}
    assert not missing, missing


def test_aligner_mem_technique(idx):
    pack, fmd, genome = idx
    reads = []
    truth = []
    rng = np.random.default_rng(9)
    for i in range(6):
        p = int(rng.integers(0, 4000 - 120))
        reads.append(NucSeq.from_str(decode_seq(genome[p : p + 120]), name=f"m{i}"))
        truth.append(p)
    al = Aligner(pack, fmd)
    al.pset.set("Seeding Technique", "MEMs")
    res = al.align_batch(reads)
    for alns, p in zip(res, truth):
        assert alns
        assert alns[0].sam_position(pack) - 1 == p
