"""SQL layer (ma_tpu.db) + MSV SvDb schema tests — the db_general_test /
bulk_insert_speed / genome-reconstruction-over-DB roles."""
import os

import numpy as np
import pytest

from ma_tpu.containers.nucseq import NucSeq
from ma_tpu.db.pool import SQLDBConPool
from ma_tpu.db.sql_api import SQLDB, SQLTable, SQLTableWithAutoPriKey
from ma_tpu.msv.calls import SvCall
from ma_tpu.msv.jumps import SvJump
from ma_tpu.msv.sv_db import SvDb


def test_typed_table_roundtrip():
    with SQLDB() as db:
        t = SQLTableWithAutoPriKey(
            db, "t", [("name", str), ("x", int), ("w", float), ("blob", bytes)]
        )
        i1 = t.insert("a", 1, 0.5, b"\x00\x01")
        i2 = t.insert("b", 2, 1.5, b"")
        assert (i1, i2) == (1, 2)
        rows = t.select(order="id")
        assert rows[0] == (1, "a", 1, 0.5, b"\x00\x01")
        assert t.count("x >= ?", (2,)) == 1


def test_bulk_inserter_flushes():
    with SQLDB() as db:
        t = SQLTable(db, "b", [("x", int)])
        with t.bulk_inserter(buffer_rows=10) as bi:
            for i in range(1234):
                bi.insert(i)
        assert t.count() == 1234
        assert bi.inserted == 1234


def test_rectangle_index_matches_bruteforce():
    rng = np.random.default_rng(0)
    with SQLDB() as db:
        t = SQLTable(db, "r", [("x", int), ("w", int), ("y", int), ("h", int)])
        rects = rng.integers(0, 1000, (300, 4))
        with t.bulk_inserter() as bi:
            for (x, w, y, h) in rects:
                bi.insert(int(x), int(w % 50), int(y), int(h % 50))
        t.gen_rectangle_index("x", "w", "y", "h")
        for _ in range(20):
            qx, qy = (int(v) for v in rng.integers(0, 1000, 2))
            got = t.select_rectangle(qx, qx + 100, qy, qy + 100)
            brute = [
                r
                for r in t.select()
                if r[0] + (r[1] % 50) >= qx and r[0] < qx + 100
                and r[2] + (r[3] % 50) >= qy and r[2] < qy + 100
            ]
            assert sorted(got) == sorted(brute)


def test_pool_parallel_inserts(tmp_path):
    path = str(tmp_path / "pool.db")
    with SQLDB(path) as db:
        SQLTable(db, "p", [("worker", int), ("v", int)])
        db.commit()
    with SQLDBConPool(4, path) as pool:
        futs = [
            pool.enqueue(
                lambda con, i=i: con.do_pool_safe(
                    lambda d: [
                        d.execute("INSERT INTO p (worker, v) VALUES (?, ?)", (i, k))
                        for k in range(50)
                    ]
                    and d.commit()
                )
            )
            for i in range(16)
        ]
        for f in futs:
            f.result(timeout=30)
    with SQLDB(path) as db:
        assert db.scalar("SELECT COUNT(*) FROM p") == 16 * 50


def test_svdb_reads_roundtrip(tmp_path):
    with SvDb(str(tmp_path / "sv.db")) as sv:
        seq_id = sv.new_sequencer("seq0")
        reads = [
            NucSeq.from_str("ACGTNNACGTACGT", name="r0"),
            NucSeq.from_str("TTTT", name="r1"),
        ]
        ids = sv.insert_reads(seq_id, reads)
        assert ids == [1, 2]
        got = list(sv.fetch_reads(seq_id))
        assert [g.name for g in got] == ["r0", "r1"]
        assert str(got[0]) == "ACGTNNACGTACGT"
        assert got[0].id == 1
        pairs = sv.insert_paired_reads(seq_id, [(reads[0], reads[1])])
        assert len(pairs) == 1


def test_svdb_jumps_and_calls_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    with SvDb(str(tmp_path / "sv.db")) as sv:
        run = sv.new_run("test", "desc")
        jumps = [
            SvJump(
                from_pos=int(a), to_pos=int(b), query_from=10, query_to=30,
                from_forward=bool(a % 2), to_forward=True,
                num_supporting_nt=20, read_id=int(i),
            )
            for i, (a, b) in enumerate(rng.integers(0, 10000, (100, 2)))
        ]
        sv.insert_jumps(run, jumps)
        sv.create_jump_indices(run)
        back = sv.load_jumps(run)
        assert len(back) == 100
        assert back[0].from_pos == jumps[0].from_pos
        assert back[0].was_mirrored == jumps[0].was_mirrored
        # section fetch == brute filter on the sort interval
        sec = sv.jumps_in_section(run, 2000, 4000)
        brute = [
            j for j in jumps
            if min(j.from_pos, j.to_pos) < 4000 and max(j.from_pos, j.to_pos) >= 2000
        ]
        assert len(sec) == len(brute)

        calls = [
            SvCall(from_pos=100, to_pos=300, from_size=5, to_size=7,
                   supp_reads=3, supp_nt=60,
                   inserted_sequence=np.array([0, 1, 2, 3], np.uint8),
                   supporting_jump_ids=[1, 2, 3]),
            SvCall(from_pos=5000, to_pos=6000, supp_reads=1, supp_nt=9),
        ]
        ids = sv.insert_calls(run, calls)
        sv.create_call_indices(run)
        back = sv.load_calls(run)
        assert [c.id for c in back] == ids
        assert back[0].supporting_jump_ids == [1, 2, 3]
        assert back[0].inserted_sequence is not None
        np.testing.assert_array_equal(
            back[0].inserted_sequence, np.array([0, 1, 2, 3], np.uint8)
        )
        assert back[1].inserted_sequence is None
        hit = sv.calls_overlapping(run, 0, 200, 0, 400)
        assert [c.id for c in hit] == [ids[0]]
        assert sv.load_calls(run, from_range=(4000, 7000))[0].id == ids[1]


def test_svdb_restartable_runs(tmp_path):
    """Run-id model: state survives reopening the file (checkpoint/resume)."""
    path = str(tmp_path / "sv.db")
    with SvDb(path) as sv:
        run = sv.new_run("stage1")
        sv.insert_jumps(run, [
            SvJump(from_pos=1, to_pos=2, query_from=0, query_to=5,
                   from_forward=True, to_forward=True,
                   num_supporting_nt=5, read_id=0)
        ])
        sv.db.commit()
    with SvDb(path) as sv:
        assert len(sv.load_jumps(1)) == 1
        run2 = sv.new_run("stage2")
        assert run2 == 2
