"""Reflection-generated web GUI (ma_tpu/gui.py, the maGUI role):
the page renders every parameter, and a full index+align run driven
through HTTP form posts produces a valid SAM."""
import threading
import time
import urllib.parse
import urllib.request

import numpy as np
import pytest


@pytest.fixture()
def server():
    from http.server import ThreadingHTTPServer

    from ma_tpu import gui

    gui._state["mgr"] = None
    gui._state["log"] = []
    gui._state["busy"] = False
    srv = ThreadingHTTPServer(("127.0.0.1", 0), gui._Handler)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{port}"
    srv.shutdown()


def test_page_reflects_parameters(server):
    page = urllib.request.urlopen(server + "/").read().decode()
    from ma_tpu.config.parameters import ParameterSetManager

    pset = ParameterSetManager().selected
    for name in ("Seeding Technique", "Match Score", "Z Drop",
                 "Detect Small Inversions"):
        assert name in page, name
    # every category appears as a fieldset
    cats = {p.category for p in pset.by_name.values()}
    for c in cats:
        assert c in page, c
    # presets listed
    for preset in ("Default", "PacBio", "Nanopore"):
        assert preset in page


def test_index_and_align_through_gui(server, tmp_path):
    from ma_tpu.containers.nucseq import decode_seq

    rng = np.random.default_rng(12)
    genome = rng.integers(0, 4, size=30_000).astype(np.uint8)
    seq = decode_seq(genome)
    with open(tmp_path / "genome.fa", "w") as f:
        f.write(">g\n" + seq + "\n")
    with open(tmp_path / "reads.fq", "w") as f:
        for i in range(8):
            p = int(rng.integers(0, 30_000 - 150))
            f.write(f"@r{i}\n{seq[p:p+150]}\n+\n{'I'*150}\n")

    def post(form):
        data = urllib.parse.urlencode(form).encode()
        urllib.request.urlopen(server + "/run", data=data)

    def wait_done(timeout=240):
        from ma_tpu import gui

        t0 = time.time()
        while time.time() - t0 < timeout:
            with gui._lock:
                if not gui._state["busy"]:
                    return "\n".join(gui._state["log"])
            time.sleep(0.5)
        raise TimeoutError("\n".join(gui._state["log"]))

    post({
        "action": "index", "preset": "Default",
        "fasta": str(tmp_path / "genome.fa"),
        "outdir": str(tmp_path), "name": "gidx",
    })
    log = wait_done()
    assert "[done rc=0]" in log, log
    post({
        "action": "align", "preset": "Default",
        "index": str(tmp_path / "gidx"),
        "reads": str(tmp_path / "reads.fq"),
        "out": str(tmp_path / "out.sam"),
        "param:Seeding Technique": "minimizers",
    })
    log = wait_done()
    assert "[done rc=0]" in log, log
    recs = [l for l in open(tmp_path / "out.sam") if not l.startswith("@")]
    assert len(recs) >= 7
    # the edited parameter rode along as a CLI flag (reproducible runs)
    assert "--Seeding Technique minimizers" in log
