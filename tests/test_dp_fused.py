"""Fused Pallas DP kernel (ops/dp_fused.py) vs the XLA rows reference path.

The fused kernel re-codes the banded_align_rows recurrence and walks the
direction bytes in-kernel, so cigars and scores must match the split
rows-sweep + traceback_device_rows pipeline exactly (reference semantics:
libs/kswcpp/inc/kswcpp_core.h)."""
import numpy as np
import pytest

import jax

from ma_tpu.ops.dp import DPParams, rle_ops
from ma_tpu.ops.dp_fused import banded_align_runs, MAX_RUNS
from ma_tpu.ops.dp_rows import banded_align_rows, traceback_device_rows


def _rows_reference(q, t, qlen, tlen, band, params, zdrop, is_global):
    res = banded_align_rows(q, t, qlen, tlen, band, params, zdrop, is_global)
    if is_global:
        si = np.asarray(qlen, np.int32) - 1
        sj = np.asarray(tlen, np.int32) - 1
    else:
        si, sj = res.max_i, res.max_j
    ops, n_ops, rem_i, rem_j = traceback_device_rows(res.dirs, si, sj)
    ops = np.asarray(ops)
    cigars = [
        rle_ops(ops[p], int(n_ops[p]), int(rem_i[p]), int(rem_j[p]))
        if (is_global or int(np.asarray(si)[p]) >= 0)
        else []
        for p in range(ops.shape[0])
    ]
    return cigars, np.asarray(res.score), np.asarray(res.max_i), np.asarray(
        res.max_j
    ), np.asarray(res.zdropped)


def _fused(q, t, qlen, tlen, band, M, N, params, zdrop, is_global):
    runs, meta = banded_align_runs(
        q, t, qlen, tlen, band, M=M, N=N, params=params, zdrop=zdrop,
        is_global=is_global, interpret=True,
    )
    runs = np.asarray(runs)
    meta = np.asarray(meta)
    cigars = []
    for p in range(runs.shape[0]):
        nr = int(meta[0][p])
        cig = [(int(runs[p, k]) & 3, int(runs[p, k]) >> 2)
               for k in range(nr - 1, -1, -1)]
        cigars.append(cig)
    return cigars, meta


def _random_problems(rng, P, M, N, long_gaps=False):
    q = rng.integers(0, 4, size=(P, M)).astype(np.uint8)
    t = np.full((P, N), 4, np.uint8)
    qlen = rng.integers(1, M + 1, size=P).astype(np.int32)
    tlen = rng.integers(1, N + 1, size=P).astype(np.int32)
    band = rng.integers(3, max(M, N), size=P).astype(np.int32)
    for p in range(P):
        m, n = qlen[p], tlen[p]
        # target = query with mutations so alignments are non-trivial
        seg = q[p, :m].copy()
        out = []
        i = 0
        while i < m and len(out) < n:
            r = rng.random()
            if r < 0.08:
                out.extend(rng.integers(0, 4, size=int(rng.integers(1, 6))))
            elif r < 0.16 and not long_gaps:
                i += int(rng.integers(1, 4))
                continue
            out.append(int(seg[i]) if rng.random() > 0.05 else int(rng.integers(0, 4)))
            i += 1
        arr = np.asarray(out[:n], np.uint8)
        t[p, : len(arr)] = arr
        tlen[p] = max(len(arr), 1)
    return q, t, qlen, tlen, band


@pytest.mark.parametrize("is_global", [True, False])
@pytest.mark.parametrize("shape", [(16, 64), (32, 128)])
def test_fused_matches_rows(is_global, shape):
    M, N = shape
    rng = np.random.default_rng(42)
    P = 16
    params = DPParams()
    q, t, qlen, tlen, band = _random_problems(rng, P, M, N)
    zdrop = -1 if is_global else 200
    ref_cig, ref_score, ref_mi, ref_mj, ref_zd = _rows_reference(
        q, t, qlen, tlen, band, params, zdrop, is_global
    )
    got_cig, meta = _fused(q, t, qlen, tlen, band, M, N, params, zdrop, is_global)
    assert not meta[5].any(), "run overflow on small problems"
    for p in range(P):
        assert int(meta[1][p]) == int(ref_score[p]), f"score p={p}"
        if not is_global:
            assert int(meta[2][p]) == int(ref_mi[p]), f"max_i p={p}"
            assert int(meta[3][p]) == int(ref_mj[p]), f"max_j p={p}"
        assert got_cig[p] == ref_cig[p], (
            f"p={p} qlen={qlen[p]} tlen={tlen[p]} band={band[p]}\n"
            f"got {got_cig[p]}\nref {ref_cig[p]}"
        )
        assert bool(meta[4][p]) == bool(ref_zd[p]), f"zdrop p={p}"


def test_fused_extension_empty_and_n():
    """Extension that aligns nothing (max at virtual cell) and N handling."""
    params = DPParams()
    q = np.full((8, 16), 4, np.uint8)  # all N: scores 0 everywhere
    t = np.full((8, 64), 0, np.uint8)
    qlen = np.full(8, 16, np.int32)
    tlen = np.full(8, 64, np.int32)
    band = np.full(8, 16, np.int32)
    got_cig, meta = _fused(q, t, qlen, tlen, band, 16, 64, params, 200, False)
    ref_cig, ref_score, ref_mi, ref_mj, _ = _rows_reference(
        q, t, qlen, tlen, band, params, 200, False
    )
    for p in range(8):
        assert int(meta[1][p]) == int(ref_score[p])
        assert int(meta[2][p]) == int(ref_mi[p])
        if int(meta[2][p]) >= 0:
            assert got_cig[p] == ref_cig[p]


def test_fused_end_to_end_sam_equal(monkeypatch):
    """Full pipeline with MA_TPU_DP=fused produces byte-identical SAM to the
    rows path (descriptor-mode integration through NWAligner)."""
    import io

    from ma_tpu.containers.nucseq import NucSeq, decode_seq, revcomp_codes
    from ma_tpu.containers.pack import Pack
    from ma_tpu.index.fmd_index import FMDIndex
    from ma_tpu.pipeline.aligner import Aligner

    rng = np.random.default_rng(99)
    G = 60_000
    genome = rng.integers(0, 4, size=G).astype(np.uint8)
    pack = Pack.empty()
    pack.append("g", genome)
    fmd = FMDIndex.build(pack)
    reads = []
    for i in range(24):
        p = int(rng.integers(0, G - 150))
        codes = genome[p : p + 150].copy()
        for j in np.nonzero(rng.random(150) < 0.02)[0]:
            codes[j] = (codes[j] + rng.integers(1, 4)) % 4
        if i % 2:
            codes = revcomp_codes(codes)
        reads.append(NucSeq.from_str(decode_seq(codes), name=f"r{i}"))

    def run(kernel):
        monkeypatch.setenv("MA_TPU_DP", kernel)
        al = Aligner(pack, fmd)
        al.pset.set("Seeding Technique", "minimizers")
        out = io.StringIO()
        al.align_to_sam(iter(reads), out, batch_size=24)
        return out.getvalue()

    assert run("fused") == run("rows")


def test_fused_long_deletion_runs():
    """Deletion-heavy targets exercise the in-row D-run consumption."""
    rng = np.random.default_rng(7)
    params = DPParams()
    M, N, P = 16, 128, 8
    q = rng.integers(0, 4, size=(P, M)).astype(np.uint8)
    t = np.full((P, N), 4, np.uint8)
    qlen = np.full(P, M, np.int32)
    tlen = np.zeros(P, np.int32)
    band = np.full(P, 128, np.int32)
    for p in range(P):
        # query split around a big deletion
        h = M // 2
        mid = rng.integers(0, 4, size=40).astype(np.uint8)
        arr = np.concatenate([q[p, :h], mid, q[p, h:]])
        t[p, : len(arr)] = arr
        tlen[p] = len(arr)
    ref_cig, ref_score, *_ = _rows_reference(
        q, t, qlen, tlen, band, params, -1, True
    )
    got_cig, meta = _fused(q, t, qlen, tlen, band, M, N, params, -1, True)
    for p in range(P):
        assert int(meta[1][p]) == int(ref_score[p])
        assert got_cig[p] == ref_cig[p]
