"""Multi-host reality check (SURVEY §2.9 comm backend): two REAL processes
join a jax.distributed cluster over localhost (CPU backend, 2 virtual
devices each), run a cross-process psum on the global mesh, align disjoint
FASTQ shards, and the SAM shards merge into one file."""
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # two subprocesses each compile the pipeline

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_align_and_merge(tmp_path):
    from ma_tpu.containers.nucseq import decode_seq, revcomp_codes
    from ma_tpu.containers.pack import Pack
    from ma_tpu.index.fmd_index import FMDIndex
    from ma_tpu.index.minimizer import MinimizerIndex

    rng = np.random.default_rng(21)
    G = 60_000
    genome = rng.integers(0, 4, G).astype(np.uint8)
    pack = Pack.empty()
    pack.append("chrM", genome)
    pack.store(str(tmp_path / "g"))
    FMDIndex.build(pack).store(str(tmp_path / "g"))
    MinimizerIndex.build(pack).store(str(tmp_path / "g"))

    names = []
    for shard in range(2):
        with open(tmp_path / f"reads{shard}.fq", "w") as f:
            for i in range(24):
                p = int(rng.integers(0, G - 120))
                codes = genome[p : p + 120].copy()
                if i % 2:
                    codes = revcomp_codes(codes)
                name = f"s{shard}_r{i}"
                names.append(name)
                f.write(f"@{name}\n{decode_seq(codes)}\n+\n{'I' * 120}\n")

    port = _free_port()
    coord = f"127.0.0.1:{port}"
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(REPO, "scripts", "multihost_worker.py"),
             coord, "2", str(pid), str(tmp_path)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env,
        )
        for pid in range(2)
    ]
    outs = [p.communicate(timeout=900)[0] for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, o[-3000:]
        assert "psum ok" in o

    from ma_tpu.parallel.multihost import merge_sam_shards

    shards = sorted(str(p) for p in tmp_path.glob("out.part*.sam"))
    assert len(shards) == 2, shards
    merged = tmp_path / "merged.sam"
    n = merge_sam_shards(shards, str(merged))
    assert n >= 40  # nearly all 48 reads align (some may clip/filter)
    lines = open(merged).read().splitlines()
    headers = [l for l in lines if l.startswith("@")]
    recs = [l for l in lines if not l.startswith("@")]
    assert len(headers) >= 2 and len(recs) == n
    got_names = {l.split("\t")[0] for l in recs}
    assert any(nm.startswith("s0_") for nm in got_names)
    assert any(nm.startswith("s1_") for nm in got_names)
