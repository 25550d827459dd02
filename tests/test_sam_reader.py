"""SAM reader + seed-set comparison harness (reference: sam_reader.h,
compare_alignments.h). Round-trips our own SAM output."""
import io

import numpy as np
import pytest

from ma_tpu.containers.nucseq import NucSeq, decode_seq, revcomp_codes
from ma_tpu.containers.pack import Pack
from ma_tpu.index.fmd_index import FMDIndex
from ma_tpu.io.sam_reader import (
    SeedSetComp,
    alignment_to_seeds,
    read_sam,
    records_by_name,
    seed_overlap_nt,
)
from ma_tpu.pipeline.aligner import Aligner

pytestmark = pytest.mark.slow  # full device-stage compile


def test_roundtrip_our_sam_to_seeds():
    rng = np.random.default_rng(61)
    genome = rng.integers(0, 4, 12000).astype(np.uint8)
    pack = Pack.empty()
    pack.append("chrR", genome)
    fmd = FMDIndex.build(pack)
    aligner = Aligner(pack, fmd)

    reads, truth = [], []
    for i in range(8):
        p = int(rng.integers(0, 12000 - 120))
        codes = genome[p : p + 120]
        if i % 2:
            codes = revcomp_codes(codes)
        reads.append(NucSeq.from_str(decode_seq(codes), name=f"s{i}"))
        truth.append((p, bool(i % 2)))
    buf = io.StringIO()
    aligner.align_to_sam(iter(reads), buf, batch_size=8)
    buf.seek(0)
    by_name = records_by_name(buf)
    comp = SeedSetComp()
    for i, (p, rev) in enumerate(truth):
        recs = [r for r in by_name[f"s{i}"] if not r.is_secondary]
        assert recs
        found = alignment_to_seeds(recs[0], pack)
        # ground truth: the full read as one seed
        if not rev:
            gt = [(0, 120, p, True)]
        else:
            gt = [(0, 120, p + 119, False)]
        comp.add(gt, found)
        # seeds must respect base-level identity
        read = reads[i].codes
        for (q, l, r, fw) in found:
            for j in range(0, l, 17):
                if fw:
                    assert read[q + j] == genome[r + j]
                else:
                    assert read[q + j] == 3 - genome[r - j]
    assert comp.recall == 1.0  # exact reads -> full recall


def test_seed_overlap_counts():
    a = [(0, 10, 100, True)]
    b = [(5, 10, 105, True)]
    assert seed_overlap_nt(a, b) == 5
    c = [(0, 10, 109, False)]
    assert seed_overlap_nt(a, c) == 0


def test_read_ksw(tmp_path):
    import numpy as np
    from ma_tpu.io.sam_reader import read_ksw

    pack = Pack.empty()
    pack.append("c1", np.zeros(100, np.uint8))
    pack.append("c2", np.ones(100, np.uint8))
    p = tmp_path / "x.ksw"
    p.write_text("@hdr\nc2\t11\t60\tread7\t0\t0\t0\t0\t0\t50M\n")
    recs = list(read_ksw(str(p), pack))
    assert recs == [("read7", 100 + 10, "50M")]
