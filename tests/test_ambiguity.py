"""Call ambiguity sampling (reference: statisticSequenceAnalysis)."""
import numpy as np

from ma_tpu.containers.pack import Pack
from ma_tpu.msv.ambiguity import call_ambiguity, compute_call_ambiguity
from ma_tpu.msv.calls import SvCall


def test_unique_region_low_ambiguity():
    rng = np.random.default_rng(17)
    genome = rng.integers(0, 4, 5000).astype(np.uint8)
    pack = Pack.empty()
    pack.append("a", genome)
    call = SvCall(1000, 2000, 0, 0, True, True)
    amb = call_ambiguity(call, pack)
    assert amb <= 5  # random regions share almost nothing


def test_repeat_region_high_ambiguity():
    rng = np.random.default_rng(19)
    genome = rng.integers(0, 4, 5000).astype(np.uint8)
    genome[2000:2040] = genome[1000:1040]  # identical breakend contexts
    pack = Pack.empty()
    pack.append("a", genome)
    uniq = SvCall(500, 3500, 0, 0, True, True)
    rep = SvCall(1020, 2020, 0, 0, True, True)
    assert call_ambiguity(rep, pack, distance_max=20) > call_ambiguity(uniq, pack, distance_max=20)


def test_compute_sets_field_and_score():
    rng = np.random.default_rng(23)
    genome = rng.integers(0, 4, 3000).astype(np.uint8)
    pack = Pack.empty()
    pack.append("a", genome)
    calls = [SvCall(500, 1500, 0, 0, True, True, supp_nt=100)]
    compute_call_ambiguity(calls, pack)
    assert calls[0].reference_ambiguity >= 1
    assert calls[0].score() == 100 / calls[0].reference_ambiguity
