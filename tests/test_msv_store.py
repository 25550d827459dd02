"""Run-id keyed jump/call persistence (the sv_db role;
reference: libs/msv/inc/msv/container/sv_db/tables/*.h)."""
import numpy as np

from ma_tpu.msv.calls import SvCall
from ma_tpu.msv.jumps import JumpParams, compute_jumps
from ma_tpu.msv.store import SvStore


def test_jump_roundtrip(tmp_path):
    store = SvStore(str(tmp_path / "db"))
    rid = store.new_run("test-jumps", "unit test", kind="jumps")
    seeds = [(0, 60, 1000, True, 120), (60, 60, 1200, True, 120)]
    jumps = compute_jumps(seeds, 120, read_id=7,
                          params=JumpParams(do_dummy_jumps=False))
    store.insert_jumps(rid, jumps)
    back = store.load_jumps(rid)
    assert len(back) == len(jumps)
    for a, b in zip(jumps, back):
        assert (a.from_pos, a.to_pos, a.query_from, a.query_to,
                a.from_forward, a.to_forward, a.read_id) == (
            b.from_pos, b.to_pos, b.query_from, b.query_to,
            b.from_forward, b.to_forward, b.read_id)
        assert a.from_start() == b.from_start()


def test_call_roundtrip_and_rect_query(tmp_path):
    store = SvStore(str(tmp_path / "db"))
    rid = store.new_run("calls", kind="calls")
    calls = [
        SvCall(100, 200, 0, 0, True, True, supp_reads=3, supp_nt=40),
        SvCall(5000, 6000, 2, 2, True, False, supp_reads=5, supp_nt=99,
               inserted_sequence=np.array([0, 1, 2, 3], np.uint8)),
    ]
    store.insert_calls(rid, calls)
    back = store.load_calls(rid)
    assert len(back) == 2
    assert back[1].inserted_sequence is not None
    assert list(back[1].inserted_sequence) == [0, 1, 2, 3]
    # rectangle filter
    sel = store.load_calls(rid, from_range=(0, 1000))
    assert len(sel) == 1 and sel[0].from_pos == 100
    # runs registry survives reopening
    store2 = SvStore(str(tmp_path / "db"))
    assert store2.runs[str(rid)]["name"] == "calls"
    rid2 = store2.new_run("more")
    assert rid2 == rid + 1
