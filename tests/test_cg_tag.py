"""CG:B:I fallback for >65,535-op CIGARs (fileWriter.cpp:34-36,
fileWriter.h computeTag:327-355)."""
import io

import numpy as np

from ma_tpu.containers.alignment import Alignment, DELETION, INSERTION, MATCH, MISMATCH
from ma_tpu.containers.nucseq import NucSeq, decode_seq
from ma_tpu.containers.pack import Pack
from ma_tpu.io.sam import MAX_CIGAR_OPS, SamWriter


def _mk(pack_len=600_000):
    rng = np.random.default_rng(5)
    genome = rng.integers(0, 4, pack_len).astype(np.uint8)
    pack = Pack.empty()
    pack.append("c0", genome)
    return pack, genome


def _long_alignment(genome, n_pairs):
    """Alternating 1-mismatch/1-match ops: 2*n_pairs CIGAR entries."""
    aln = Alignment(begin_on_ref=0, begin_on_query=0)
    q = []
    for i in range(n_pairs):
        aln.append(MISMATCH, 1)
        q.append((int(genome[2 * i]) + 1) % 4)
        aln.append(MATCH, 1)
        q.append(int(genome[2 * i + 1]))
    aln.mapping_quality = 0.9
    return aln, np.array(q, np.uint8)


def test_cg_tag_emitted_for_long_cigar():
    pack, genome = _mk()
    n_pairs = MAX_CIGAR_OPS // 2 + 4
    aln, q = _long_alignment(genome, n_pairs)
    read = NucSeq.from_str(decode_seq(q), name="long")
    out = io.StringIO()
    w = SamWriter(out, pack, cg_tag=True, use_m_cigar=False)
    w.write([aln], read)
    rec = out.getvalue().splitlines()[-1]
    fields = rec.split("\t")
    assert fields[5] == f"{len(q)}S"  # CIGAR column collapsed
    cg = [f for f in fields if f.startswith("CG:B:I")]
    assert cg, "CG tag missing"
    vals = [int(v) for v in cg[0].split(",")[1:]]
    assert len(vals) == len(aln.data)
    # first op: 1X -> (1 << 4) | 8; second: 1= -> (1 << 4) | 7
    assert vals[0] == (1 << 4) | 8
    assert vals[1] == (1 << 4) | 7


def test_short_cigar_unchanged():
    pack, genome = _mk()
    aln, q = _long_alignment(genome, 30)
    read = NucSeq.from_str(decode_seq(q), name="short")
    out = io.StringIO()
    w = SamWriter(out, pack, cg_tag=True, use_m_cigar=False)
    w.write([aln], read)
    rec = out.getvalue().splitlines()[-1]
    fields = rec.split("\t")
    assert "S" not in fields[5]
    assert not any(f.startswith("CG:B:I") for f in fields)
