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
