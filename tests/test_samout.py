"""Native SAM tail (mapping quality + record formatting, native/samout.cpp)
vs the Python writer path — byte-identical output required.

The Python path (pipeline/quality.py + io/sam.py) stays the oracle;
reference semantics: mappingQuality.cpp:11-135, alignment.h:593-843,
fileWriter.h:366-470. Subprocess isolation per comparison (see
test_finish_native.py for why).
"""
import os
import subprocess
import sys
import textwrap

import pytest

from ma_tpu.pipeline import finish_native

pytestmark = pytest.mark.skipif(
    not (finish_native.available() and finish_native.sam_available()),
    reason="native extensions unavailable",
)

_RUNNER = textwrap.dedent(
    """
    import sys, os, io
    sys.path.insert(0, {repo!r})
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["MA_TPU_DP"] = "fused"
    os.environ["MA_TPU_FINISH"] = "native"
    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    from ma_tpu.containers.nucseq import NucSeq, decode_seq, revcomp_codes
    from ma_tpu.containers.pack import Pack
    from ma_tpu.index.fmd_index import FMDIndex
    from ma_tpu.pipeline.aligner import Aligner

    seed, n_reads, G, contigs, psets, with_qual = {params}
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
            if r < 0.01:
                if r < 0.005:
                    continue
                out.append(int(rng.integers(0, 4)))
            out.append(int(c) if rng.random() > 0.02 else (int(c) + 1) % 4)
        arr = np.asarray(out[:L], np.uint8)
        if i % 2:
            arr = revcomp_codes(arr)
        qual = "".join(chr(33 + int(q)) for q in rng.integers(0, 40, len(arr))) \
            if with_qual else None
        reads.append(NucSeq(arr, name=f"n{{i}}_{{p}}", qual=qual))

    def run(sam_mode):
        os.environ["MA_TPU_SAM"] = sam_mode
        al = Aligner(pack, fmd)
        al.pset.set("Seeding Technique", "minimizers")
        for k, v in psets:
            al.pset.set(k, v)
        buf = io.StringIO()
        al.align_to_sam(iter(reads), buf, batch_size=max(16, len(reads) // 2))
        return buf.getvalue()

    a = run("python")
    b = run("native")
    assert a == b, "SAM mismatch python vs native tail:\\n" + "\\n".join(
        f"P {{x}}\\nN {{y}}" for x, y in zip(a.splitlines(), b.splitlines())
        if x != y
    )[:4000]
    assert a.count(chr(10)) > n_reads // 2
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


def test_samout_default():
    _compare((11, 48, 80_000, 1, [], False))


def test_samout_softclip_qual_multicontig():
    _compare((12, 40, 50_000, 3, [("Soft clip", True)], True))


def test_samout_secondaries_and_eqx():
    # low min score keeps secondaries; =/X cigars instead of M
    _compare(
        (13, 40, 60_000, 1,
         [("Minimal Alignment Score", 0),
          ("Use M in CIGAR", False),
          ("Maximal Number of Reported Alignments", 3)],
         True)
    )
