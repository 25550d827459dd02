"""Native C++ finish stage (plan + assemble) vs the Python reference path.

ma_tpu/native/finish.cpp ports pipeline/nw.py plan_set/_plan_dyn_prg/
assemble/_assemble_dual and the Alignment.append scoring (reference
semantics: needlemanWunsch.cpp execute_one:625-905, alignment.cpp:25-65);
outputs must be byte-identical SAM.

Each dataset comparison runs in its own subprocess: this sandbox's
PJRT/compile tooling serves cached XLA:CPU executables whose keys can
collide when many differently-shaped programs alternate in one process
("Execution supplied N buffers but compiled program expected M"),
which is unrelated to the code under test (verified clean under ASan).
"""
import os
import subprocess
import sys
import textwrap

import pytest

from ma_tpu.pipeline import finish_native

pytestmark = pytest.mark.skipif(
    not finish_native.available(), reason="native finish extension unavailable"
)

_RUNNER = textwrap.dedent(
    """
    import sys, os, io
    sys.path.insert(0, {repo!r})
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["MA_TPU_DP"] = "fused"
    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    from ma_tpu.containers.nucseq import NucSeq, decode_seq, revcomp_codes
    from ma_tpu.containers.pack import Pack
    from ma_tpu.index.fmd_index import FMDIndex
    from ma_tpu.pipeline.aligner import Aligner

    seed, n_reads, err, indel, G, contigs = {params}
    L = 150
    rng = np.random.default_rng(seed)
    pack = Pack.empty()
    genomes = []
    for c in range(contigs):
        g = rng.integers(0, 4, size=G).astype(np.uint8)
        pack.append(f"c{{c}}", g)
        genomes.append(g)
    fmd = FMDIndex.build(pack)
    reads = []
    for i in range(n_reads):
        g = genomes[i % contigs]
        p = int(rng.integers(0, G - 2 * L))
        out = []
        for c in g[p : p + L]:
            r = rng.random()
            if r < indel:
                if r < indel / 2:
                    continue
                out.append(int(rng.integers(0, 4)))
            out.append(int(c) if rng.random() > err else (int(c) + 1) % 4)
        arr = np.asarray(out[:L], np.uint8)
        if i % 2:
            arr = revcomp_codes(arr)
        reads.append(NucSeq.from_str(decode_seq(arr), name=f"n{{i}}_{{p}}"))

    def run(mode):
        os.environ["MA_TPU_FINISH"] = mode
        al = Aligner(pack, fmd)
        al.pset.set("Seeding Technique", "minimizers")
        buf = io.StringIO()
        al.align_to_sam(iter(reads), buf, batch_size=len(reads))
        return buf.getvalue()

    a = run("python")
    b = run("native")
    assert a == b, "SAM mismatch python vs native:\\n" + "\\n".join(
        f"P {{x}}\\nN {{y}}" for x, y in zip(a.splitlines(), b.splitlines())
        if x != y
    )[:4000]
    print("IDENTICAL", len(a.splitlines()))
    """
)

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _compare(params):
    code = _RUNNER.format(repo=_REPO, params=params)
    r = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=1200,
    )
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-3000:]
    assert "IDENTICAL" in r.stdout


def test_native_finish_sam_identical_snp():
    _compare((1, 48, 0.02, 0.0, 80_000, 1))


def test_native_finish_sam_identical_indel():
    _compare((2, 48, 0.05, 0.02, 80_000, 1))


def test_native_finish_multi_contig():
    _compare((7, 32, 0.02, 0.0, 30_000, 3))
