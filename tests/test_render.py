"""SV render/export (reference: bokeh visualizer role)."""
from ma_tpu.msv.calls import SvCall
from ma_tpu.msv.jumps import JumpParams, compute_jumps
from ma_tpu.msv.render import calls_to_tsv, jumps_to_tsv, render_html


def test_exports(tmp_path):
    jumps = compute_jumps(
        [(0, 60, 1000, True, 120), (60, 60, 1400, True, 120)], 120, 0,
        params=JumpParams(do_dummy_jumps=True),
    )
    calls = [SvCall(1059, 1400, 3, 3, True, True, supp_reads=4, supp_nt=200)]
    jumps_to_tsv(jumps, str(tmp_path / "j.tsv"))
    calls_to_tsv(calls, str(tmp_path / "c.tsv"))
    render_html(str(tmp_path / "view.html"), jumps, calls, genome_len=2000)
    jt = (tmp_path / "j.tsv").read_text().splitlines()
    assert len(jt) == len(jumps) + 1
    ct = (tmp_path / "c.tsv").read_text().splitlines()
    assert ct[1].startswith("1059\t1400")
    htm = (tmp_path / "view.html").read_text()
    assert "<svg" in htm and "circle" in htm and "path" in htm
