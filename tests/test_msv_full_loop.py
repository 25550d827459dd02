"""MSV full-loop golden test (reference: libs/msv/tests/jump_computation.py:
reconstruct a donor from ground-truth calls, generate perfect reads, run
the whole jump pipeline, verify the calls are re-discovered)."""
import numpy as np
import pytest

from ma_tpu.containers.nucseq import NucSeq, decode_seq
from ma_tpu.containers.pack import Pack
from ma_tpu.index.minimizer import MinimizerIndex
from ma_tpu.msv.calls import SvCall
from ma_tpu.msv.pipeline import compute_sv_jumps, sweep_sv_jumps
from ma_tpu.msv.reconstruct import reconstruct_sequenced_genome

pytestmark = pytest.mark.slow  # full device-stage compile


def test_jump_computation_full_loop():
    rng = np.random.default_rng(2024)
    L = 40000
    genome = rng.integers(0, 4, size=L).astype(np.uint8)
    pack = Pack.empty()
    pack.append("chrG", genome)
    mmi = MinimizerIndex.build(pack)

    # ground truth: a deletion and an insertion
    deletion = SvCall(7999, 8600, 0, 0, True, True)  # deletes [8000, 8600)
    ins_seq = rng.integers(0, 4, 120).astype(np.uint8)
    insertion = SvCall(20000, 20001, 0, 0, True, True,
                       inserted_sequence=ins_seq)
    end_call = SvCall(L - 1, L, 0, 0, True, True)
    donor_pack = reconstruct_sequenced_genome(
        [[deletion, insertion, end_call]], pack
    )
    donor = donor_pack.codes[: donor_pack.unpacked_size_forward_strand]
    # sanity: donor length = L - 600 + 120
    assert len(donor) == L - 600 + 120

    reads = [
        NucSeq.from_str(decode_seq(donor[p : p + 600]), name=f"g{p}")
        for p in range(0, len(donor) - 600 + 1, 120)
    ]
    jumps = compute_sv_jumps(reads, pack, mmi)
    calls = sweep_sv_jumps(jumps, min_reads=3)

    # the deletion call (micro-homology tolerance)
    dels = [
        c for c in calls
        if c.from_forward and c.to_forward
        and abs(c.from_pos - 7999) <= 5 and abs(c.to_pos - 8600) <= 5
    ]
    assert dels, [(c.from_pos, c.to_pos, c.supp_reads) for c in calls[:10]]

    # the insertion: breakends adjacent on the reference with query span
    inss = [
        c for c in calls
        if c.from_forward and c.to_forward
        and abs(c.from_pos - 20000) <= 5 and abs(c.to_pos - 20001) <= 5
    ]
    assert inss, [(c.from_pos, c.to_pos, c.supp_reads) for c in calls[:10]]


def test_inserted_sequence_recovery():
    """Recovered insertion sequence closes the lossless loop: calls +
    inserted sequences reconstruct the donor exactly."""
    from ma_tpu.msv.inserted import compute_inserted_sequences
    from ma_tpu.msv.calls import SvCall as C

    rng = np.random.default_rng(77)
    L = 30000
    genome = rng.integers(0, 4, size=L).astype(np.uint8)
    pack = Pack.empty()
    pack.append("chrI", genome)
    mmi = MinimizerIndex.build(pack)
    ins_seq = rng.integers(0, 4, 90).astype(np.uint8)
    donor = np.concatenate([genome[:15000], ins_seq, genome[15001:]])
    reads = [
        NucSeq.from_str(decode_seq(donor[p : p + 500]), name=f"i{p}")
        for p in range(0, len(donor) - 500 + 1, 100)
    ]
    jumps = compute_sv_jumps(reads, pack, mmi)
    calls = sweep_sv_jumps(jumps, min_reads=3)
    inss = [
        c for c in calls
        if c.from_forward and c.to_forward
        and abs(c.from_pos - 15000) <= 4 and abs(c.to_pos - 15001) <= 4
    ]
    assert inss, [(c.from_pos, c.to_pos) for c in calls[:8]]
    compute_inserted_sequences(inss, jumps, reads)
    call = inss[0]
    assert call.inserted_sequence is not None
    # length 90 inserted + micro-homology wobble absorbed by breakend shift
    # reconstruct with the recovered sequence: must equal the donor
    recon = reconstruct_sequenced_genome(
        [[C(call.from_pos, call.to_pos, 0, 0, True, True,
            inserted_sequence=call.inserted_sequence),
          C(L - 1, L, 0, 0, True, True)]], pack
    )
    got = recon.codes[: recon.unpacked_size_forward_strand]
    assert np.array_equal(got, donor)
