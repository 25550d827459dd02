"""Long-read alignment through the chunked z-drop extension path
(VERDICT r2 item #8; SURVEY hard part (d)).

Simulated PacBio-style reads (8 kb at 5% error in the CPU suite; the 25 kb configuration runs on the chip via MA_TPU_LONG_LEN, see scripts/long_read_bench.py) with indels, half reverse
strand. Long one-sided/dual extensions route through NWAligner._chunked_ext
(256-base chunks of the fused kernel, re-anchored through each chunk's
last row) instead of materializing a [P, M, N] direction tensor."""
import io

import numpy as np
import pytest

from ma_tpu.containers.nucseq import NucSeq, decode_seq, revcomp_codes
from ma_tpu.containers.pack import Pack
from ma_tpu.index.fmd_index import FMDIndex
from ma_tpu.pipeline.aligner import Aligner

pytestmark = pytest.mark.slow


def _sim_long(rng, genome, L, err):
    p = int(rng.integers(0, len(genome) - L - 200))
    out = []
    i = p
    while i < p + L:
        r = rng.random()
        if r < err / 3:  # insertion
            out.append(int(rng.integers(0, 4)))
            continue
        if r < 2 * err / 3:  # deletion
            i += 1
            continue
        c = int(genome[i])
        if r < err:
            c = (c + int(rng.integers(1, 4))) % 4
        out.append(c)
        i += 1
    return p, np.asarray(out, np.uint8)


def test_long_reads_align(monkeypatch):
    monkeypatch.setenv("MA_TPU_DP", "fused")
    rng = np.random.default_rng(2025)
    import os
    L = int(os.environ.get("MA_TPU_LONG_LEN", 8_000))
    G = 200_000
    genome = rng.integers(0, 4, size=G).astype(np.uint8)
    pack = Pack.empty()
    pack.append("chrL", genome)
    fmd = FMDIndex.build(pack)
    reads, truth = [], []
    for i in range(2):
        p, codes = _sim_long(rng, genome, L, 0.05)
        if i % 2:
            codes = revcomp_codes(codes)
        reads.append(NucSeq.from_str(decode_seq(codes), name=f"L{i}_{p}"))
        truth.append(p)

    al = Aligner(pack, fmd)
    al.pset.set("Seeding Technique", "minimizers")
    res = al.align_batch(reads)
    ok = 0
    for alns, p, read in zip(res, truth, reads):
        prim = [a for a in alns if not a.secondary and not a.supplementary]
        assert prim, f"no primary for read at {p}"
        a = prim[0]
        pos = a.sam_position(pack) - 1
        if abs(pos - p) <= 50:
            ok += 1
        # the alignment must cover the bulk of the read
        assert a.end_on_query - a.begin_on_query >= int(L * 0.8), (
            p, a.begin_on_query, a.end_on_query
        )
    assert ok >= len(reads) - 1, (ok, truth)


def test_chunked_ext_vs_monolithic():
    """A ~1.5 kb clean extension: the chunked path's cigar must match the
    monolithic rows-kernel extension (no chunk-boundary artifacts on
    indel-free alignments)."""
    from ma_tpu.ops.dp import DPParams
    from ma_tpu.ops.dp_rows import banded_align_rows, traceback_device_rows
    from ma_tpu.pipeline.nw import NWAligner

    rng = np.random.default_rng(9)
    G = 20_000
    genome = rng.integers(0, 4, size=G).astype(np.uint8)
    pack = Pack.empty()
    pack.append("c", genome)

    q = genome[5_000 : 6_500].copy()
    for j in np.nonzero(rng.random(len(q)) < 0.02)[0]:
        q[j] = (q[j] + 1) % 4

    import jax.numpy as jnp

    nw = NWAligner(pack, text_dev=jnp.asarray(
        np.concatenate([genome, revcomp_codes(genome)])),
        seqs_dev=jnp.asarray(q[None]))
    pi = nw._new_problem(None, None, band=512, is_global=False, q_off=0,
                         q_len=len(q), t_start=5_000, t_len=2_100)
    nw._chunked_ext([pi])
    p = nw._problems[pi]
    assert p.max_i == len(q) - 1, (p.max_i, p.max_j)
    # monolithic reference
    res = banded_align_rows(
        jnp.asarray(q[None], jnp.int32),
        jnp.asarray(genome[None, 5_000:7_100], jnp.int32),
        jnp.asarray([len(q)], jnp.int32), jnp.asarray([2_100], jnp.int32),
        jnp.asarray([512], jnp.int32), DPParams(), 200, False,
    )
    assert int(res.max_i[0]) == p.max_i and int(res.max_j[0]) == p.max_j
    # cigar consumes the same spans
    qc = sum(l for op, l in p.cigar if op != 2)
    tc = sum(l for op, l in p.cigar if op != 1)
    assert qc == p.max_i + 1 and tc == p.max_j + 1
