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
