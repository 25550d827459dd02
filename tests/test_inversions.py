"""Small-inversion rescue tests (reference: smallInversions.h, MA.md:137-143)."""
import numpy as np
import pytest

from ma_tpu.containers.alignment import Alignment, SEED, MATCH, MISMATCH
from ma_tpu.containers.nucseq import NucSeq, decode_seq, revcomp_codes
from ma_tpu.containers.pack import Pack
from ma_tpu.index.fmd_index import FMDIndex
from ma_tpu.pipeline.aligner import Aligner
from ma_tpu.pipeline.inversions import for_all_drop_pos

pytestmark = pytest.mark.slow  # full device-stage compile


def test_for_all_drop_pos_reports_window():
    a = Alignment(begin_on_ref=1000, begin_on_query=0)
    a.append(SEED, 50)
    # drop = mismatch*n - extend*n = 2n; n=60 -> 120 >= 100
    a.append(MISMATCH, 60)
    a.append(SEED, 50)
    wins = for_all_drop_pos(a, 2, 4, 4, 2, zdrop_inv=100)
    assert wins == [(50, 1050, 110, 1110)]


def test_no_window_on_clean_alignment():
    a = Alignment(begin_on_ref=0, begin_on_query=0)
    a.append(SEED, 50)
    a.append(MATCH, 40)
    a.append(SEED, 50)
    assert for_all_drop_pos(a, 2, 4, 4, 2, zdrop_inv=100) == []


def test_pipeline_detects_small_inversion():
    rng = np.random.default_rng(77)
    L = 16384
    genome = rng.integers(0, 4, size=L).astype(np.uint8)
    pack = Pack.empty()
    pack.append("chrI", genome)
    fmd = FMDIndex.build(pack)

    # read: 80bp forward + 60bp INVERTED + 80bp forward. Mutations every
    # ~12bp inside the inversion keep reverse-strand seeds below the minimal
    # seed length, so only the DP rescue can recover it.
    p = 4000
    part1 = genome[p : p + 80]
    inv = revcomp_codes(genome[p + 80 : p + 140])
    for j in (6, 18, 30, 42, 54):
        inv[j] = (inv[j] + 1) % 4
    part3 = genome[p + 140 : p + 220]
    codes = np.concatenate([part1, inv, part3])
    read = NucSeq.from_str(decode_seq(codes), name="invread")

    aligner = Aligner(pack, fmd)
    aligner.pset.set("Detect Small Inversions", True)
    res = aligner.align_batch([read])[0]
    assert res, "read did not align"
    supp = [a for a in res if a.supplementary]
    assert supp, "no supplementary inversion alignment emitted"
    # the inversion lies on the reverse strand covering [p+80, p+140)
    s = supp[0]
    assert bool(pack.is_reverse_strand(s.begin_on_ref))
    fwd_s = pack.unpacked_size_forward_plus_reverse - s.end_on_ref
    fwd_e = pack.unpacked_size_forward_plus_reverse - s.begin_on_ref
    assert fwd_s >= p + 60 and fwd_e <= p + 160
    assert s.mapping_quality == 0.0
