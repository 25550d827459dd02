"""SDUST low-complexity masking vs golden outputs of the reference's
vendored masker (libs/minimizerscpp/src/sdust.cpp built standalone with
-D_SDUST_MAIN; defaults T=20 W=64). Cases captured 2026-08-19."""
import numpy as np

from ma_tpu.ops.sdust import dust_mask_array, filter_seeds_by_dust, sdust

CODE = {c: i for i, c in enumerate("ACGTN")}


def enc(s):
    return np.array([CODE[c] for c in s], np.uint8)


# (sequence, reference sdust intervals). The (16, 44) end past the sequence
# length in the N-split case is reference behavior (finish is computed from
# the word count before the N reset) and is reproduced faithfully.
GOLDEN = [
    ("ACGTACGTACGTGGCA" + "A" * 50 + "GTCAGTCGGATCGATCGTAGCTAGCT", [(15, 66)]),
    ("GCGCGATT" + "AT" * 40 + "CCGGTTAACGGATC", [(7, 88)]),
    (
        "ATGCCTAGAAGTGTGTGATCGCATTGCTGCCAAGTATTCGATGCATCTGTTACCCAGAGGTGCTCCTC"
        "ACTACAGCCAGGTCATGGACTTCTTCTCAGGATATATTTGCGCTGCGGAAAACGGCTGATGGGGAGTC"
        "GACCTACCTTAATATCTCCGAGGTTGCCCTCACAAATGGCGATGTACGCCACACGGGCTACACT",
        [],
    ),
    ("AAAAAAAAAAAAAAANAAAAAAAAAAAAAAA", [(0, 15), (16, 44)]),
    ("CAG" * 30 + "GATCGTACGATCGATTACA", [(0, 90)]),
]


def test_sdust_golden():
    for seq, want in GOLDEN:
        assert sdust(enc(seq)) == want, seq


def test_sdust_disjoint_sorted():
    rng = np.random.default_rng(3)
    unit = rng.integers(0, 4, 3)
    codes = np.concatenate([rng.integers(0, 4, 100), np.tile(unit, 40),
                            rng.integers(0, 4, 100)])
    ivs = sdust(codes)
    assert ivs, "tandem repeat must be masked"
    for (s0, e0), (s1, e1) in zip(ivs, ivs[1:]):
        assert e0 < s1  # disjoint and sorted (adjacent ones are merged)


def test_seed_filter_half_overlap_rule():
    dust = [(10, 30)]
    # >50% inside dust -> dropped; <=50% -> kept (map.cpp:27-38)
    seeds = [(12, 10, "dropped"), (25, 10, "kept"), (40, 10, "kept")]
    out = filter_seeds_by_dust(seeds, dust)
    assert [s[2] for s in out] == ["kept", "kept"]


def test_mask_array():
    codes = enc("CAG" * 30 + "GATCGTACGATCGATTACA")
    m = dust_mask_array(codes)
    assert m[:90].all() and not m[95:].any()


def test_dust_parameter_wiring():
    """'Minimizers - SDUST Threshold' > 0 masks low-complexity query spans
    for SEEDING only (mm_dust_minier role): a read whose core is a
    homopolymer run loses the seeds inside that run, while the DP operands
    keep the real bases so unique flanks still place the read."""
    import numpy as np

    from ma_tpu.containers.nucseq import NucSeq, decode_seq
    from ma_tpu.containers.pack import Pack
    from ma_tpu.index.fmd_index import FMDIndex
    from ma_tpu.pipeline.aligner import Aligner

    rng = np.random.default_rng(5)
    genome = rng.integers(0, 4, size=40_000).astype(np.uint8)
    genome[20_000:20_120] = 0  # poly-A island
    pack = Pack.empty()
    pack.append("c", genome)
    fmd = FMDIndex.build(pack)

    p = 19_900
    read = NucSeq(genome[p : p + 300].copy(), name="r0")

    res = {}
    for thres in (0, 20):
        al = Aligner(pack, fmd)
        al.pset.set("Seeding Technique", "minimizers")
        al.pset.set("Minimizers - SDUST Threshold", thres)
        alns = al.align_batch([read])[0]
        assert alns, f"read lost at threshold {thres}"
        best = max(alns, key=lambda a: a.score())
        assert abs(best.begin_on_ref - p) <= 5
        res[thres] = best.score()
    # masking only removes seeds; the DP result stays equivalent here
    assert res[20] >= res[0] - 4
