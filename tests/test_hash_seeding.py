"""Hash-map k-mer seeding + rectangle reseeding
(reference: hashMapSeeding.h, svJumpsFromSeeds.cpp reseed)."""
import numpy as np

from ma_tpu.containers.nucseq import encode_seq, revcomp_codes
from ma_tpu.containers.pack import Pack
from ma_tpu.ops.hash_seeding import (
    hash_map_seeding,
    kmer_size_for_rectangle,
    lump_diagonal,
    reseed_gaps,
    reseed_rectangle,
)


def test_hash_map_seeding_finds_shared_kmers():
    a = encode_seq("AAAACGTACGTTTTT")
    b = encode_seq("GGGACGTACGTGG")
    matches = hash_map_seeding(a, b, 5)
    # ACGTACGT shared (incl. the leading A): k=5 matches along one diagonal
    assert (3, 5, 3) in matches and (6, 5, 6) in matches
    lumped = lump_diagonal(matches)
    assert lumped == [(3, 8, 3)]  # merged to one run


def test_kmer_size_rule():
    assert kmer_size_for_rectangle(50, 50, 0.001) == 11
    assert kmer_size_for_rectangle(4, 4, 0.001) >= 3


def test_reseed_rectangle_both_strands():
    rng = np.random.default_rng(8)
    genome = rng.integers(0, 4, 500).astype(np.uint8)
    pack = Pack.empty()
    pack.append("r", genome)
    # forward match
    query = np.concatenate([rng.integers(0, 4, 10), genome[100:130],
                            rng.integers(0, 4, 10)]).astype(np.uint8)
    seeds = reseed_rectangle(query, pack, 0, len(query), 90, 140, max_size=60)
    fwd = [s for s in seeds if s[3]]
    assert any(s[0] <= 10 and abs(s[2] - (100 + s[0] - 10)) <= 0 for s in fwd)
    # reverse match
    query2 = np.concatenate([rng.integers(0, 4, 10),
                             revcomp_codes(genome[200:230]),
                             rng.integers(0, 4, 10)]).astype(np.uint8)
    seeds2 = reseed_rectangle(query2, pack, 0, len(query2), 190, 240, max_size=60)
    rev = [s for s in seeds2 if not s[3]]
    assert rev
    for (q, l, r, fw, _) in rev:
        for j in range(l):
            assert query2[q + j] == 3 - genome[r - j]


def test_reseed_gaps_recovers_deleted_anchor():
    rng = np.random.default_rng(9)
    genome = rng.integers(0, 4, 2000).astype(np.uint8)
    pack = Pack.empty()
    pack.append("g", genome)
    # read: [500..540) + [560..600): a 20bp deletion; pretend seeding only
    # found the flanks partially, with a gap around the breakpoint
    read = np.concatenate([genome[500:540], genome[560:600]])
    seeds = [(0, 30, 500, True, 80), (50, 30, 570, True, 80)]
    out = reseed_gaps(seeds, read, pack, max_size=60)
    # reseeding must add seeds inside the gap region (query [30,50))
    added = [s for s in out if s not in seeds]
    assert any(30 <= s[0] < 50 for s in added), added
