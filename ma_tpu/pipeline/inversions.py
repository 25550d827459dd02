"""Small-inversion rescue.

Re-design of the reference SmallInversions module
(reference: libs/ma/inc/ma/module/smallInversions.h:22-210):

* forAllDropPos: replay the alignment's run-length ops tracking a running
  score; between consecutive SEED runs record the window if the max z-drop
  within it reached Z Drop Inversions
* for each window: reverse-complement the reference window and re-align the
  query stretch with banded DP; if the score beats the harmonization
  minimum, emit a supplementary alignment on the opposite strand (MAPQ 0)

All inversion windows of a batch are collected first and solved in one
batched device DP call.
"""
from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np

import jax.numpy as jnp

from ma_tpu.containers.alignment import (
    Alignment,
    DELETION,
    INSERTION,
    MATCH,
    MISMATCH,
    SEED,
)
from ma_tpu.containers.nucseq import NucSeq, revcomp_codes
from ma_tpu.containers.pack import Pack
from ma_tpu.ops.dp import DPParams, banded_align, traceback_one


def for_all_drop_pos(
    aln: Alignment,
    match: int,
    mismatch: int,
    gap: int,
    extend: int,
    zdrop_inv: int,
) -> List[Tuple[int, int, int, int]]:
    """Z-drop window scan (smallInversions.h forAllDropPos:53-117).

    Returns [(start_q, start_r, end_q, end_r)] windows between seeds where
    the score dropped by >= zdrop_inv.
    """
    out: List[Tuple[int, int, int, int]] = []
    pos_q = aln.begin_on_query
    pos_r = aln.begin_on_ref
    start_q, start_r = pos_q, pos_r
    max_pos_q, max_pos_r = pos_q, pos_r
    max_score = -(2**62)
    curr = 0
    max_drop = 0
    for op, size in aln.data:
        if op == SEED:
            if max_drop >= zdrop_inv:
                out.append((start_q, start_r, pos_q, pos_r))
            start_q = pos_q + size
            start_r = pos_r + size
            max_drop = 0
            curr = 0
            max_score = -(2**62)
        if op in (SEED, MATCH):
            curr += match * size
            pos_q += size
            pos_r += size
        elif op == MISMATCH:
            curr -= mismatch * size
            pos_q += size
            pos_r += size
        elif op == INSERTION:
            curr -= gap + extend * size
            pos_q += size
        else:
            curr -= gap + extend * size
            pos_r += size
        if curr >= max_score:
            max_score = curr
            max_pos_q, max_pos_r = pos_q, pos_r
        else:
            diff = max(pos_q - max_pos_q, pos_r - max_pos_r)
            max_drop = max(max_drop, max_score - curr - diff * extend)
    return out


def small_inversions(
    alignments_per_read: Sequence[List[Alignment]],
    reads: Sequence[NucSeq],
    pack: Pack,
    params: DPParams = DPParams(),
    band: int = 512,
    zdrop_inv: int = 100,
    harm_score_min: int = 18,
    disable_heuristics: bool = False,
) -> None:
    """Append supplementary inversion alignments in place
    (SmallInversions::execute:179-210)."""
    windows = []  # (read_idx, parent, startQ, endQ, refRevStart, refRevEnd)
    for ri, alns in enumerate(alignments_per_read):
        for aln in alns:
            for (sq, sr, eq, er) in for_all_drop_pos(
                aln, params.match, params.mismatch, params.gap_open,
                params.gap_extend, zdrop_inv,
            ):
                if eq <= sq or er <= sr:
                    continue
                rev_s = int(pack.pos_to_reverse_strand(er))
                rev_e = int(pack.pos_to_reverse_strand(sr))
                if rev_e <= rev_s:
                    continue
                windows.append((ri, aln, sq, eq, rev_s, rev_e))
    if not windows:
        return

    M = max(w[3] - w[2] for w in windows)
    N = max(w[5] - w[4] for w in windows)
    P = len(windows)
    q = np.full((P, M), 4, np.uint8)
    t = np.full((P, N), 4, np.uint8)
    qlen = np.zeros(P, np.int32)
    tlen = np.zeros(P, np.int32)
    for k, (ri, _aln, sq, eq, rs, re_) in enumerate(windows):
        qseg = reads[ri].codes[sq:eq]
        tseg = pack.extract(rs, re_)
        q[k, : len(qseg)] = qseg
        t[k, : len(tseg)] = tseg
        qlen[k], tlen[k] = len(qseg), len(tseg)
    res = banded_align(
        jnp.asarray(q), jnp.asarray(t), jnp.asarray(qlen), jnp.asarray(tlen),
        jnp.full(P, band, jnp.int32), params, zdrop=-1, is_global=True,
    )
    dirs = np.asarray(res.dirs)

    for k, (ri, parent, sq, eq, rs, re_) in enumerate(windows):
        cigar = traceback_one(dirs[k], int(qlen[k]) - 1, int(tlen[k]) - 1)
        inv = Alignment(
            begin_on_ref=rs, begin_on_query=sq,
            match=params.match, mismatch=params.mismatch,
            gap=params.gap_open, extend=params.gap_extend,
        )
        qpos, rpos = 0, 0
        qseg, tseg = q[k], t[k]
        for op, ln in cigar:
            if op == 0:  # M
                for j in range(ln):
                    inv.append(
                        MATCH if qseg[qpos + j] == tseg[rpos + j] else MISMATCH, 1
                    )
                qpos += ln
                rpos += ln
            elif op == 1:
                inv.append(INSERTION, ln)
                qpos += ln
            else:
                inv.append(DELETION, ln)
                rpos += ln
        inv.make_local()
        if disable_heuristics or inv.score() > harm_score_min * params.match:
            inv.supplementary = True
            inv.secondary = False
            inv.stats = parent.stats
            inv.mapping_quality = 0.0
            alignments_per_read[ri].append(inv)
