"""Interactive SV viewer + execution-context manager tests."""
import pytest
import json
import os
import re

import numpy as np

from ma_tpu.msv.calls import SvCall
from ma_tpu.msv.jumps import SvJump
from ma_tpu.msv.html_view import render_interactive_html

pytestmark = pytest.mark.slow  # full device-stage compile


def test_viewer_embeds_data_and_stats(tmp_path):
    jumps = [
        SvJump(from_pos=100, to_pos=5000, query_from=5, query_to=50,
               from_forward=True, to_forward=True, num_supporting_nt=45,
               read_id=0)
    ]
    calls = [
        SvCall(from_pos=1000, to_pos=2000, from_size=5, to_size=5,
               supp_reads=4, supp_nt=200, from_forward=True, to_forward=False,
               inserted_sequence=np.array([0, 1, 2], np.uint8),
               supporting_jump_ids=[7], id=3)
    ]
    truth = [SvCall(from_pos=1010, to_pos=2010, id=0),
             SvCall(from_pos=9000, to_pos=9500, id=1)]
    out = str(tmp_path / "view.html")
    render_interactive_html(out, jumps, calls, genome_len=10000, truth=truth)
    page = open(out).read()
    m = re.search(r"const D = (\{.*?\});\n", page, re.S)
    data = json.loads(m.group(1))
    assert data["hi"] == 10000
    assert data["calls"][0]["ins"] == "ACG"
    assert data["calls"][0]["jumps"] == [7]
    assert data["jumps"][0]["read"] == 0
    # recall 1/2, precision 1/1
    assert "recall 1/2 = 50.0%" in page
    assert "precision 1/1 = 100.0%" in page
    # JS generated from the f-string must have no doubled-brace artifacts
    script = re.search(r"<script>(.*)</script>", page, re.S).group(1)
    depth = 0
    for ch in re.sub(r"`[^`]*`|'[^']*'|\"[^\"]*\"", "", script):
        depth += ch == "{"
        depth -= ch == "}"
    assert depth == 0
    assert "${{" not in script
    # table view row present
    assert "<td>3</td><td>1000</td><td>2000</td>" in page


def test_viewer_seed_dotplot_and_nucleotide_track(tmp_path):
    """VERDICT r4 #8 'Done' gate: for a full-loop-style deletion dataset the
    HTML embeds (a) the deletion call with its supporting jumps, (b) the
    seeds of a supporting read, (c) the +-context sequence around both
    breakends."""
    from ma_tpu.containers.nucseq import NucSeq, decode_seq
    from ma_tpu.index.minimizer import MinimizerIndex
    from ma_tpu.msv.pipeline import (
        compute_sv_jumps,
        seeds_for_reads,
        sweep_sv_jumps,
    )
    from ma_tpu.containers.pack import Pack

    rng = np.random.default_rng(2025)
    L = 30000
    genome = rng.integers(0, 4, size=L).astype(np.uint8)
    pack = Pack.empty()
    pack.append("chrG", genome)
    mmi = MinimizerIndex.build(pack)
    donor = np.concatenate([genome[:8000], genome[8600:]])  # 600bp deletion
    reads = [
        NucSeq.from_str(decode_seq(donor[p : p + 600]), name=f"g{p}")
        for p in range(0, len(donor) - 600 + 1, 120)
    ]
    jumps = compute_sv_jumps(reads, pack, mmi)
    calls = sweep_sv_jumps(jumps, min_reads=3)
    dels = [c for c in calls if abs(c.from_pos - 7999) <= 5
            and abs(c.to_pos - 8600) <= 5]
    assert dels, [(c.from_pos, c.to_pos) for c in calls[:10]]
    call = dels[0]
    assert call.supporting_jump_ids, "deletion call lost its jump linkage"
    jump_by_id = {j.id: j for j in jumps}
    supp_reads = sorted(
        {int(jump_by_id[i].read_id) for i in call.supporting_jump_ids}
    )
    rs = seeds_for_reads(reads, pack, mmi, supp_reads)
    assert rs and any(rs.values()), "no seeds for supporting reads"
    out = str(tmp_path / "del.html")
    render_interactive_html(
        out, jumps, calls, genome_len=L, read_seeds=rs, pack=pack
    )
    page = open(out).read()
    m = re.search(r"const D = (\{.*?\});\n", page, re.S)
    data = json.loads(m.group(1))
    # (a) the deletion call row with jump linkage
    crow = next(c for c in data["calls"]
                if abs(c["x"] - 7999) <= 5 and abs(c["y"] - 8600) <= 5)
    assert crow["jumps"], crow
    # (b) seeds of a supporting read are embedded for the dot-plot
    srid = str(supp_reads[0])
    assert data["rseeds"].get(srid), list(data["rseeds"])[:4]
    q0, l0, r0, fw0 = data["rseeds"][srid][0]
    assert l0 > 0 and 0 <= r0 < L
    # (c) nucleotide tracks around both breakends match the genome
    for key, pos in (("cf", crow["x"]), ("ct", crow["y"])):
        seq, hl, n, lo = crow[key]
        assert lo == max(pos - 40, 0) and seq[hl] == "ACGTN"[genome[pos]]
        expect = "".join("ACGTN"[b] for b in genome[lo : lo + len(seq)])
        assert seq == expect
    # the JS that renders them is present
    assert "rseeds" in page and "track(" in page


def test_execution_context_do_align(tmp_path):
    from ma_tpu.pipeline.execution_context import ExecutionContext

    rng = np.random.default_rng(5)
    g = "".join("ACGT"[c] for c in rng.integers(0, 4, 8000))
    fa = str(tmp_path / "g.fa")
    with open(fa, "w") as f:
        f.write(">c\n" + g + "\n")
    ec = ExecutionContext()
    ec.genome.make_index(fa, str(tmp_path), "g", log=lambda *a: None)
    ec.genome.load_genome(str(tmp_path / "g.json"))
    fq = str(tmp_path / "r.fq")
    with open(fq, "w") as f:
        for i in range(6):
            p = int(rng.integers(0, 8000 - 100))
            f.write(f"@r{i}_{p}\n{g[p:p+100]}\n+\n{'I'*100}\n")
    ec.reads.primary = [fq]
    ec.output.out_path = str(tmp_path / "out.sam")
    n = ec.do_align()
    assert n == 6
    recs = [l.split("\t") for l in open(ec.output.path()) if not l.startswith("@")]
    prim = [r for r in recs if not int(r[1]) & 0x900]
    assert len(prim) == 6
    for r in prim:
        truth = int(r[0].rsplit("_", 1)[1])
        assert abs(int(r[3]) - 1 - truth) <= 2


def test_output_manager_derives_sam_name(tmp_path):
    from ma_tpu.pipeline.execution_context import OutputManager, ReadsManager

    rm = ReadsManager()
    rm.primary = ["/data/sample.fastq.gz"]
    assert OutputManager(rm).path() == "/data/sample.sam"
    assert OutputManager(rm, "stdout").path() == "stdout"
