"""MSV jump computation + sweep clustering
(reference: libs/msv/tests/jump_computation.py — simulate SVs, generate
reads, run the jump pipeline, verify the calls)."""
import numpy as np
import pytest

from ma_tpu.containers.nucseq import NucSeq, decode_seq, revcomp_codes
from ma_tpu.containers.pack import Pack
from ma_tpu.index.minimizer import MinimizerIndex
from ma_tpu.msv.jumps import (
    DUMMY_LOCATION,
    JumpParams,
    SvJump,
    compute_jumps,
    make_jump,
)
from ma_tpu.msv.pipeline import compute_sv_jumps, sweep_sv_jumps
from ma_tpu.msv.sweep import sweep_jumps


def test_make_jump_canonical_mirroring():
    # B before A on the reference -> mirrored so from <= to
    a = (0, 50, 1000, True, 100)
    b = (50, 50, 500, True, 100)
    j = make_jump(a, b, read_id=1)
    assert j.was_mirrored
    assert j.from_pos <= j.to_pos
    assert j.from_pos == 500
    assert j.to_pos == 1049


def test_compute_jumps_deletion_pattern():
    # two seeds with a reference gap: one jump across the deletion
    seeds = [(0, 60, 1000, True, 120), (60, 60, 1200, True, 120)]
    jumps = compute_jumps(seeds, 120, read_id=0,
                          params=JumpParams(do_dummy_jumps=False))
    assert len(jumps) == 1
    j = jumps[0]
    assert j.from_pos == 1059  # last base of seed A
    assert j.to_pos == 1200  # first base of seed B
    assert not j.does_switch_strand()
    assert j.ref_distance() == 141
    assert j.query_distance() == 0


def test_compute_jumps_dummy_edges():
    seeds = [(60, 60, 1000, True, 60)]
    jumps = compute_jumps(seeds, 240, read_id=0,
                          params=JumpParams(do_dummy_jumps=True))
    # seed starts at 60 >= min_dist_dummy 50 -> leading dummy;
    # ends at 120, 120 + 50 < 240 -> trailing dummy
    assert len(jumps) == 2
    assert all(j.is_dummy() for j in jumps)
    assert any(j.from_pos == DUMMY_LOCATION or j.to_pos == DUMMY_LOCATION
               for j in jumps)


def test_sweep_clusters_supporting_jumps():
    params = JumpParams(do_dummy_jumps=False)
    jumps = []
    # 5 reads supporting the same deletion breakpoint (1059 -> 1200);
    # the reads start at different donor offsets, the breakpoint is shared
    for rid in range(5):
        off = rid * 7
        seeds = [
            (0, 60 - off, 1000 + off, True, 120),
            (60 - off, 60 + off, 1200, True, 120),
        ]
        js = compute_jumps(seeds, 120, read_id=rid, params=params)
        jumps.extend(js)
    # noise jump from one read far away
    jumps.extend(
        compute_jumps([(0, 60, 5000, True, 120), (60, 60, 5400, True, 120)],
                      120, read_id=7, params=params)
    )
    calls = sweep_jumps(jumps, min_reads=2)
    assert len(calls) == 1  # noise has 1 read -> filtered
    c = calls[0]
    assert c.supp_reads == 5
    assert abs(c.from_pos - 1061) <= 10
    assert abs(c.to_pos - 1200) <= 10
    assert c.from_forward and c.to_forward


@pytest.fixture(scope="module")
def sv_genome():
    rng = np.random.default_rng(1001)
    L = 30000
    genome = rng.integers(0, 4, size=L).astype(np.uint8)
    pack = Pack.empty()
    pack.append("chrSV", genome)
    mmi = MinimizerIndex.build(pack, k=15, w=10)
    return pack, mmi, genome


def tile_reads(donor, read_len=500, stride=100):
    reads = []
    for i, p in enumerate(range(0, len(donor) - read_len + 1, stride)):
        reads.append(
            NucSeq.from_str(decode_seq(donor[p : p + read_len]), name=f"t{i}")
        )
    return reads


def test_end_to_end_deletion_call(sv_genome):
    pack, mmi, genome = sv_genome
    # donor: delete [10000, 10800)
    donor = np.concatenate([genome[:10000], genome[10800:]])
    reads = tile_reads(donor)
    jumps = compute_sv_jumps(reads, pack, mmi)
    calls = sweep_sv_jumps(jumps, min_reads=3)
    dels = [
        c for c in calls
        if c.from_forward and c.to_forward and abs(c.from_pos - 9999) < 30
        and abs(c.to_pos - 10800) < 30
    ]
    assert dels, [(c.from_pos, c.to_pos, c.supp_reads) for c in calls[:10]]
    assert dels[0].supp_reads >= 3


def test_end_to_end_inversion_call(sv_genome):
    pack, mmi, genome = sv_genome
    # donor: invert [20000, 21000)
    donor = np.concatenate(
        [genome[:20000], revcomp_codes(genome[20000:21000]), genome[21000:]]
    )
    reads = tile_reads(donor)
    jumps = compute_sv_jumps(reads, pack, mmi)
    calls = sweep_sv_jumps(jumps, min_reads=3)
    # inversion: forward->reverse entry edge near (19999, 20999)
    # + reverse->forward exit edge near (20000, 21000) (canonical forms)
    sw = [c for c in calls if c.from_forward != c.to_forward]
    assert sw, [(c.from_pos, c.to_pos, c.from_forward, c.to_forward)
                for c in calls[:10]]
    assert any(
        abs(c.from_pos - 19999) < 40 and abs(c.to_pos - 20999) < 40 for c in sw
    ) or any(
        abs(c.from_pos - 20000) < 40 and abs(c.to_pos - 21000) < 40 for c in sw
    ), [(c.from_pos, c.to_pos) for c in sw]


def test_seed_extension_sharpens_breakpoints(sv_genome):
    from ma_tpu.ops.extend_host import extend_seeds

    pack, mmi, genome = sv_genome
    donor = np.concatenate([genome[:10000], genome[10800:]])
    reads = tile_reads(donor)
    jumps = compute_sv_jumps(reads, pack, mmi)
    calls = sweep_sv_jumps(jumps, min_reads=3)
    dels = [
        c for c in calls
        if c.from_forward and c.to_forward and abs(c.from_pos - 9999) < 30
        and abs(c.to_pos - 10800) < 30
    ]
    assert dels
    # with extension the breakpoints are exact up to micro-homology (bases
    # past the breakpoint that happen to match both sides extend the seed;
    # the reference behaves identically)
    assert abs(dels[0].from_pos - 9999) <= 4, dels[0]
    assert abs(dels[0].to_pos - 10800) <= 4, dels[0]


def test_extend_seeds_exact():
    from ma_tpu.ops.extend_host import extend_seeds

    rng = np.random.default_rng(5)
    genome = rng.integers(0, 4, 2000).astype(np.uint8)
    pack = Pack.empty()
    pack.append("e", genome)
    read = genome[100:300].copy()
    # forward seed in the middle extends to the full read
    out = extend_seeds([(50, 20, 150, True, 0)], read, pack)
    assert out == [(0, 200, 100, True, 0)]
    # reverse seed: read = revcomp(genome[700:900])
    rread = revcomp_codes(genome[700:900])
    # seed covering rread[80:100] -> genome last coord = 899-80 = 819
    out = extend_seeds([(80, 20, 819, False, 0)], rread, pack)
    assert out == [(0, 200, 899, False, 0)]


def test_connector_pattern_filter(sv_genome):
    """Real junction survives; a fabricated call with no read support
    is dropped (connectorPatternFilter.h semantics)."""
    from ma_tpu.msv.connector import connector_pattern_filter
    from ma_tpu.msv.calls import SvCall

    pack, mmi, genome = sv_genome
    donor = np.concatenate([genome[:10000], genome[10800:]])
    reads = tile_reads(donor)
    jumps = compute_sv_jumps(reads, pack, mmi)
    calls = sweep_sv_jumps(jumps, min_reads=3)
    dels = [
        c for c in calls
        if c.from_forward and c.to_forward and abs(c.from_pos - 9999) < 30
        and abs(c.to_pos - 10800) < 30
    ]
    assert dels
    kept = connector_pattern_filter(dels, jumps, reads, pack)
    assert dels[0] in kept  # the real deletion junction connects via reads

    # artifact: same breakends but supported by jumps whose reads do NOT
    # span the junction (random sequence flanks)
    rng = np.random.default_rng(5)
    from ma_tpu.containers.nucseq import NucSeq as NS
    from ma_tpu.containers.nucseq import decode_seq as ds
    fake_reads = [NS.from_str(ds(rng.integers(0, 4, 400).astype(np.uint8)),
                              name=f"f{i}") for i in range(3)]
    from ma_tpu.msv.jumps import SvJump, JumpParams
    fake_jumps = [
        SvJump(9999, 10800, 100, 101, True, True, 50, read_id=i, id=1000 + i)
        for i in range(3)
    ]
    fake_call = SvCall(9999, 10800, 0, 0, True, True, supp_reads=3,
                       supporting_jump_ids=[1000, 1001, 1002])
    kept2 = connector_pattern_filter([fake_call], fake_jumps, fake_reads, pack)
    assert kept2 == []
