"""Plane-sweep clustering of SV jumps into calls.

Re-design of the reference sweep modules
(reference: libs/msv/inc/msv/module/sweepSvJumps.h
CompleteBipartiteSubgraphSweep:82-270 — coarse active-cluster sweep over
jump rectangles, ExactCompleteBipartiteSubgraphSweep:274-480 — exact
re-sweep with per-read jump dedup and cluster-size re-estimation — and the
call filters :488-700; cluster join/reestimate semantics from
libs/msv/inc/msv/container/svJump.h SvCall:556-768).

The SQL fetch becomes an in-memory sorted jump list; the genome-section
work units (GenomeSectionFactory) are unnecessary since the sweep is a
single pass here — data parallelism can shard by strand-section instead.
"""
from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import numpy as np

from ma_tpu.msv.calls import SvCall
from ma_tpu.msv.jumps import SvJump


@dataclasses.dataclass
class _Cluster:
    x_start: int
    x_end: int
    y_start: int
    y_end: int
    from_forward: bool
    to_forward: bool
    dummy: bool
    jumps: List[SvJump]
    open_edges: int
    supp_nt: int
    mirrored: bool

    def join(self, other: "_Cluster") -> None:
        self.x_start = min(self.x_start, other.x_start)
        self.x_end = max(self.x_end, other.x_end)
        self.y_start = min(self.y_start, other.y_start)
        self.y_end = max(self.y_end, other.y_end)
        self.jumps.extend(other.jumps)
        self.open_edges += other.open_edges
        self.supp_nt += other.supp_nt


def _cluster_from_jump(j: SvJump) -> _Cluster:
    y_end = j.sweep_end() if not j.switch_strand_known() else j.to_end()
    # tail edges become squares (exact sweep, sweepSvJumps.h:339-341)
    return _Cluster(
        x_start=j.from_start(),
        x_end=j.from_end(),
        y_start=j.to_start(),
        y_end=y_end,
        from_forward=j.from_forward,
        to_forward=j.to_forward,
        dummy=j.is_dummy(),
        jumps=[j],
        open_edges=1,
        supp_nt=j.num_supporting_nt,
        mirrored=j.was_mirrored,
    )


def _sweep_fast(jumps: Sequence[SvJump]) -> List[_Cluster]:
    """Same semantics as _sweep_once with O(n log n) bookkeeping."""
    if not jumps:
        return []
    idx_of = {id(j): i for i, j in enumerate(jumps)}
    events = []
    for i, j in enumerate(jumps):
        events.append((j.from_start(), 0, i))
        events.append((j.from_end(), 1, i))
    events.sort(key=lambda t: (t[0], t[1]))
    owner: List[Optional[_Cluster]] = [None] * len(jumps)
    active: List[_Cluster] = []
    done: List[_Cluster] = []
    for (_, is_end, i) in events:
        j = jumps[i]
        if not is_end:
            c = _cluster_from_jump(j)
            owner[i] = c
            keep = []
            for a in active:
                if a.y_start <= c.y_end and c.y_start <= a.y_end:
                    c.join(a)
                    for jj in a.jumps:
                        owner[idx_of[id(jj)]] = c
                else:
                    keep.append(a)
            keep.append(c)
            active = keep
        else:
            c = owner[i]
            c.open_edges -= 1
            if c.open_edges == 0:
                active.remove(c)
                done.append(c)
    return done


def _reestimate(c: _Cluster) -> Tuple[int, int]:
    """reEstimateClusterSize (svJump.h:664-703): percentile breakpoint
    estimate from member jump endpoints."""
    horizontal, vertical = [], []
    for j in c.jumps:
        if not j.from_known():
            vertical.append(j.to_pos)
        elif not j.to_known():
            horizontal.append(j.from_pos)
        else:
            horizontal.append(j.from_pos)
            vertical.append(j.to_pos)
    horizontal.sort()
    vertical.sort()
    if c.dummy:
        ui, uj = len(horizontal), 0
        umin, umax = 1, 0
        while umin > umax and ui > 0 and uj < len(vertical):
            umin = horizontal[ui - 1]
            umax = vertical[uj]
            ui -= 1
            uj += 1
        if ui == 0 or uj == len(vertical):
            if ui == 0 and vertical:
                pos = vertical[int(len(vertical) * 0.05)]
            elif horizontal:
                pos = horizontal[int(len(horizontal) * 0.95)]
            else:
                pos = 0
        else:
            pos = (umin + umax) // 2
        return pos, pos
    x = horizontal[int(len(horizontal) * (0.95 if c.from_forward else 0.05))]
    y = vertical[int(len(vertical) * (0.05 if c.to_forward else 0.95))]
    return x, y


def _finalize(c: _Cluster, min_reads: int) -> Optional[SvCall]:
    # per-read dedup keeping the smallest query distance (exact sweep,
    # sweepSvJumps.h:389-409)
    best = {}
    for j in sorted(c.jumps, key=lambda j: j.query_distance()):
        if j.read_id not in best:
            best[j.read_id] = j
    jumps = list(best.values())
    if len(jumps) < min_reads:
        return None
    c.jumps = jumps
    x, y = _reestimate(c)
    return SvCall(
        from_pos=x,
        to_pos=y,
        from_size=0,
        to_size=0,
        from_forward=c.from_forward,
        to_forward=c.to_forward,
        supp_reads=len(jumps),
        supp_nt=sum(j.num_supporting_nt for j in jumps),
        supporting_jump_ids=[j.id for j in jumps],
        mirrored=c.mirrored and all(j.was_mirrored for j in jumps),
    )


def _independent_sections(jumps: Sequence[SvJump]) -> List[List[SvJump]]:
    """Partition jumps into x-independent groups with numpy.

    The sweep's active set empties exactly where the next from_start lies
    strictly beyond the running max from_end, so cutting there decomposes
    the clustering EXACTLY (the genome-section work units of
    sweepSvJumps.h GenomeSectionFactory:23-75, minus the overlap/dedup
    rules — these cuts cannot split a cluster). Partitioning is O(n log n)
    numpy; the per-object sweep then only ever sees small groups."""
    starts = np.fromiter((j.from_start() for j in jumps), np.int64, len(jumps))
    ends = np.fromiter((j.from_end() for j in jumps), np.int64, len(jumps))
    order = np.argsort(starts, kind="stable")
    s = starts[order]
    e = np.maximum.accumulate(ends[order])
    brk = np.flatnonzero(s[1:] > e[:-1]) + 1
    bounds = np.concatenate(([0], brk, [len(jumps)]))
    return [
        [jumps[k] for k in order[bounds[i] : bounds[i + 1]]]
        for i in range(len(bounds) - 1)
    ]


def sweep_jumps(jumps: Sequence[SvJump], min_reads: int = 2) -> List[SvCall]:
    """Full clustering: coarse sweep -> exact re-sweep per coarse cluster ->
    per-read dedup + breakpoint re-estimation -> min-support filter.

    Large inputs first decompose into x-independent sections (exact;
    see _independent_sections) so whole-genome jump sets cluster in
    near-linear time."""
    calls: List[SvCall] = []
    groups = (
        _independent_sections(jumps) if len(jumps) > 512 else [list(jumps)]
    )
    for group in groups:
        for coarse in _sweep_fast(group):
            for exact in _sweep_fast(coarse.jumps):
                call = _finalize(exact, min_reads)
                if call is not None:
                    calls.append(call)
    calls.sort(key=lambda c: (c.from_pos, c.to_pos))
    return calls


# ----------------------------------------------------------------- filters
def filter_low_support_short_calls(
    calls: List[SvCall], max_supp_nt: int = 10, max_call_size: int = 20
) -> List[SvCall]:
    """FilterLowSupportShortCalls (sweepSvJumps.h:488): diagonal noise —
    drop short calls with low supporting-nt."""
    out = []
    for c in calls:
        size = abs(c.to_pos - c.from_pos)
        if c.supp_nt / max(c.supp_reads, 1) <= max_supp_nt and size <= max_call_size:
            continue
        out.append(c)
    return out


def filter_fuzzy_calls(calls: List[SvCall], max_fuzziness: int = 50) -> List[SvCall]:
    """FilterFuzzyCalls (sweepSvJumps.h:528): drop calls whose rectangle is
    wider than the fuzziness cap."""
    return [
        c for c in calls if c.from_size <= max_fuzziness and c.to_size <= max_fuzziness
    ]


def filter_diagonal_line_calls(
    calls: List[SvCall], jumps_of=None, threshold: int = 300
) -> List[SvCall]:
    """FilterDiagonalLineCalls (sweepSvJumps.h:567-620): drop calls whose
    supporting jumps form a line along the main diagonal — their (y-x)
    variance is tiny relative to the (y+x) variance. jumps_of maps a call
    to its supporting SvJump list (falls back to keeping the call)."""

    def med_var(vals: List[int]) -> int:
        vals = sorted(vals)
        n = len(vals)
        med = vals[n // 2] if n % 2 == 1 else (vals[n // 2 - 1] + vals[n // 2]) // 2
        return sum((med - v) * (med - v) for v in vals) // n

    out = []
    for c in calls:
        jumps = jumps_of(c) if jumps_of is not None else None
        if not jumps:
            out.append(c)
            continue
        da = [j.to_pos - j.from_pos for j in jumps]
        db = [j.to_pos + j.from_pos for j in jumps]
        va = med_var(da)
        vb = max(med_var(db), 1)
        if va // vb < threshold or vb < 10:
            out.append(c)
    return out


def filter_low_score_calls(calls: List[SvCall], min_score: float = 2.0) -> List[SvCall]:
    """FilterLowScoreCalls (sweepSvJumps.h:668): score = supp_nt/ambiguity."""
    return [c for c in calls if c.score() >= min_score]
