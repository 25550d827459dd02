"""MSV pipeline drivers: reads -> jumps -> calls.

Re-design of the reference MSV python drivers
(reference: libs/msv/python/computeSvJumps.py:6-122 — per-thread graph
MMFilteredSeeding -> SeedLumping -> SoC -> SvJumpsFromExtractedSeeds ->
JumpInserter — and libs/msv/python/sweepSvJumps.py:7-160 — section sweep ->
call filters -> inserter).

Device: one jitted batch (minimizer seeding + lumping) per read bucket.
Host: jump enumeration per read and the plane-sweep clustering. The SQL
jump/call store becomes in-memory arrays with npz persistence keyed by run
ids (ma_tpu/msv/store.py role of sv_db)."""
from __future__ import annotations

import functools
from typing import List, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ma_tpu.containers.nucseq import NucSeq
from ma_tpu.containers.pack import Pack
from ma_tpu.index.minimizer import MinimizerIndex, minimizer_seeding
from ma_tpu.msv.calls import SvCall
from ma_tpu.msv.jumps import JumpParams, SvJump, compute_jumps
from ma_tpu.msv.sweep import (
    filter_fuzzy_calls,
    filter_low_support_short_calls,
    sweep_jumps,
)
from ma_tpu.ops.extend_host import extend_seeds
from ma_tpu.ops.filters import min_length, seed_lump
from ma_tpu.ops.hash_seeding import reseed_gaps
from ma_tpu.ops.soc import soc_collect


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3))
def _sv_seed_run(k, w, max_occ, min_seed_len, mmi, cst, rlf, sq, ln):
    # module-level jit: one compile per (k, w, occ, len, shapes) — defining
    # this inside sv_seed_stage created a fresh jit object per batch, which
    # recompiled the whole stage every 512 reads (~9.6 s/chunk on the
    # tunnel vs ~0.1 s steady state)
    seeds = minimizer_seeding(
        mmi, sq, ln, cst, rlf, k=k, w=w, max_occ=max_occ,
        max_seeds=2048, rectangular=False,
    )
    seeds = seed_lump(seeds)
    seeds = min_length(seeds, min_seed_len)
    return soc_collect(seeds, ln, cst, rectangular=False, max_socs=64)


def sv_seed_stage(mmi_dev, contig_starts, ref_len_forward, seqs, lens,
                  k: int = 15, w: int = 10, max_occ: int = 10000,
                  min_seed_len: int = 18):
    """Device stage: minimizer seeds -> lumping -> min length (the
    MMFilteredSeeding + SeedLumping part of computeSvJumps.py:52-86)."""
    from ma_tpu.pipeline.aligner import upload_codes_packed

    seqs_j = (
        upload_codes_packed(seqs, lens)
        if isinstance(seqs, np.ndarray)
        else jnp.asarray(seqs)
    )
    return _sv_seed_run(k, w, max_occ, min_seed_len, mmi_dev, contig_starts,
                        ref_len_forward, seqs_j,
                        jnp.asarray(lens, jnp.int32))


@jax.jit
def _soc_pack_csr(soc, min_nt):
    """Device-side CSR compaction of a SoCBatch for the host transfer.

    Only seeds covered by a selected SoC window (k < n_socs, score >=
    min_nt) are ever read by the enumeration front end (feasible_socs /
    native sv_enum walk window ranges) — so compact exactly those to a
    flat [3, B*S] CSR buffer (q<<1|fw, l, r), remap the window bounds to
    read-local compacted indices, and compact the windows themselves to a
    [2, B*K] CSR (start<<16|end, score). The raw [B, 2048] x5 download was
    ~1.3 s/chunk over the tunnel (512 reads); the populated prefixes are
    a few hundred KB. Requires S < 32768 (16-bit window bounds)."""
    sd = soc.seeds
    B, S = sd.q_start.shape
    K = soc.start.shape[1]
    iota_s = jax.lax.broadcasted_iota(jnp.int32, (B, S), 1)
    sel_k = (jnp.arange(K)[None, :] < soc.n_socs[:, None]) & (
        soc.score >= min_nt
    )
    st, en = soc.start, soc.end
    cov = (
        sel_k[:, :, None]
        & (st[:, :, None] <= iota_s[:, None, :])
        & (iota_s[:, None, :] < en[:, :, None])
    ).any(axis=1)
    keep = cov & sd.valid
    cum = jnp.cumsum(keep.astype(jnp.int32), axis=1)
    cum_ex = cum - keep.astype(jnp.int32)
    cnt = cum[:, -1]
    # window bounds -> read-local compacted ranks (exclusive-cumsum lookup
    # via one-hot sums: minor-axis gathers serialize on TPU)
    cum_pad = jnp.concatenate([cum_ex, cnt[:, None]], axis=1)  # [B, S+1]
    rng_p = jnp.arange(S + 1, dtype=jnp.int32)[None, None, :]
    new_st = jnp.where(rng_p == st[:, :, None], cum_pad[:, None, :], 0).sum(2)
    new_en = jnp.where(rng_p == en[:, :, None], cum_pad[:, None, :], 0).sum(2)
    # compact selected windows to the row front, then flat-CSR them
    wkey = jnp.where(
        sel_k, jnp.arange(K, dtype=jnp.int32)[None, :], jnp.int32(K)
    )
    wse = (new_st << 16) | new_en
    _, cwse, cwsc = jax.lax.sort(
        (wkey, wse, soc.score), num_keys=1, is_stable=True
    )
    wcnt = sel_k.sum(axis=1).astype(jnp.int32)
    wvalid = (jnp.arange(K)[None, :] < wcnt[:, None]).reshape(-1)
    wfk = jnp.where(wvalid, jnp.int32(0), jnp.int32(1))
    _, fwse, fwsc = jax.lax.sort(
        (wfk, cwse.reshape(-1), cwsc.reshape(-1)), num_keys=1, is_stable=True
    )
    wdata = jnp.stack([fwse, fwsc])
    # seed planes: per-read prefix compaction then flat CSR (same two-level
    # sort as the aligner's _harm_pack_core)
    p0 = (sd.q_start.astype(jnp.int32) << 1) | sd.on_forward.astype(jnp.int32)
    key = jnp.where(keep, iota_s, jnp.int32(S))
    _, c0, c1, c2 = jax.lax.sort(
        (key, p0, sd.length, sd.ref_start), num_keys=1, is_stable=True
    )
    N = B * S

    def _flat(width):
        def go(_):
            w = jnp.arange(width, dtype=jnp.int32)[None, :]
            vf = (w < cnt[:, None]).reshape(-1)
            fk2 = jnp.where(vf, jnp.int32(0), jnp.int32(1))
            _, s0, s1, s2 = jax.lax.sort(
                (
                    fk2,
                    c0[:, :width].reshape(-1),
                    c1[:, :width].reshape(-1),
                    c2[:, :width].reshape(-1),
                ),
                num_keys=1,
                is_stable=True,
            )
            out = jnp.stack([s0, s1, s2])
            if width * B < N:
                out = jnp.concatenate(
                    [out, jnp.zeros((3, N - width * B), jnp.int32)], axis=1
                )
            return out

        return go

    W = min(S, 128)
    data = jax.lax.cond(jnp.any(cnt > W), _flat(S), _flat(W), None)
    counts = jnp.stack([cnt, wcnt])
    return data, wdata, counts


@jax.jit
def _soc_used_hi(valid, end, n_socs):
    """Highest used seed slot across the batch (populated lanes + every
    in-range SoC window end) — the download slices to this, pow2-rounded."""
    slot = jnp.max(
        jnp.where(
            valid,
            jax.lax.broadcasted_iota(jnp.int32, valid.shape, 1) + 1,
            0,
        )
    )
    ci = jax.lax.broadcasted_iota(jnp.int32, end.shape, 1)
    ehi = jnp.max(jnp.where(ci < n_socs[:, None], end, 0))
    return jnp.maximum(slot, ehi)


class SocHost:
    """One-shot host copy of a SoCBatch — feasible_socs indexes numpy
    arrays instead of device slices (a per-read device slice costs a
    ~15 ms tunnel round trip; x10 fields x reads it dominated the whole
    SV pipeline). The seed columns are sliced to the populated pow2 prefix
    before download (typically 256-512 of 2048 slots) — the raw [B, 2048]
    x5 transfer was ~0.4 s/chunk on the tunnel."""

    __slots__ = ("q", "l", "r", "fw", "va", "starts", "ends", "scores",
                 "n_socs")

    def __init__(self, soc, min_nt: int = None):
        if min_nt is not None and int(soc.seeds.valid.shape[1]) < 32768:
            self._init_packed(soc, min_nt)
            return
        sd = soc.seeds
        S = int(sd.valid.shape[1])
        hi = int(_soc_used_hi(sd.valid, soc.end, soc.n_socs))
        Sh = 128
        while Sh < hi:
            Sh *= 2
        Sh = min(Sh, S)
        arrs = (
            sd.q_start[:, :Sh], sd.length[:, :Sh], sd.ref_start[:, :Sh],
            sd.on_forward[:, :Sh], sd.valid[:, :Sh],
            soc.start, soc.end, soc.score, soc.n_socs,
        )
        for a in arrs:
            try:
                a.copy_to_host_async()
            except Exception:
                pass
        (self.q, self.l, self.r, self.fw, self.va, self.starts, self.ends,
         self.scores, self.n_socs) = jax.device_get(arrs)

    def _init_packed(self, soc, min_nt: int):
        """Download the window-covered seeds as a packed CSR (see
        _soc_pack_csr) and rebuild the dense per-read arrays on the host —
        same observable layout, ~10x fewer tunnel bytes."""
        data, wdata, counts = _soc_pack_csr(soc, jnp.int32(min_nt))
        counts.copy_to_host_async()
        cn = np.asarray(counts)
        cnt, wcnt = cn[0].astype(np.int64), cn[1].astype(np.int64)
        total = int(cnt.sum())
        wtotal = int(wcnt.sum())

        def _pfx(arr, tot):
            cap = 4096
            while cap < tot:
                cap *= 2
            cap = min(cap, arr.shape[1])
            return np.asarray(arr[:, :cap])

        d = _pfx(data, total)
        wd = _pfx(wdata, wtotal)
        B = cnt.shape[0]
        mx = max(int(cnt.max()) if B else 0, 1)
        mask = np.arange(mx)[None, :] < cnt[:, None]
        self.q = np.zeros((B, mx), np.int32)
        self.l = np.zeros((B, mx), np.int32)
        self.r = np.zeros((B, mx), np.int32)
        self.fw = np.zeros((B, mx), bool)
        self.q[mask] = d[0, :total] >> 1
        self.fw[mask] = (d[0, :total] & 1).astype(bool)
        self.l[mask] = d[1, :total]
        self.r[mask] = d[2, :total]
        self.va = mask
        kx = max(int(wcnt.max()) if B else 0, 1)
        wmask = np.arange(kx)[None, :] < wcnt[:, None]
        self.starts = np.zeros((B, kx), np.int32)
        self.ends = np.zeros((B, kx), np.int32)
        self.scores = np.zeros((B, kx), np.int32)
        self.starts[wmask] = wd[0, :wtotal] >> 16
        self.ends[wmask] = wd[0, :wtotal] & 0xFFFF
        self.scores[wmask] = wd[1, :wtotal]
        self.n_socs = wcnt.astype(np.int32)


def feasible_socs(
    soc, b: int, min_nt: int, soc_height: int = 0
) -> List[List[tuple]]:
    """GetAllFeasibleSoCsAsSet (stripOfConsideration.h:234-285): every SoC
    with accumulated nt >= min_nt, split on query gaps > soc_height, gap
    pieces below min_nt dropped. Returns seed-tuple lists (nt = SoC score).

    `soc` may be a SoCBatch (device) or a SocHost snapshot."""
    if not isinstance(soc, SocHost):
        soc = SocHost(soc)
    q = soc.q[b]
    l = soc.l[b]
    r_ = soc.r[b]
    fw = soc.fw[b]
    va = soc.va[b]
    starts = soc.starts[b]
    ends = soc.ends[b]
    scores = soc.scores[b]
    n_socs = int(soc.n_socs[b])
    out: List[List[tuple]] = []
    for si in range(n_socs):
        nt = int(scores[si])
        if nt < min_nt:
            continue
        idx = [m for m in range(int(starts[si]), int(ends[si])) if va[m]]
        seeds = sorted(
            ((int(q[m]), int(l[m]), int(r_[m]), bool(fw[m]), nt) for m in idx),
            key=lambda t: t[0],
        )
        if not seeds:
            continue
        cur: List[tuple] = []
        cur_nt = 0
        max_q = seeds[0][0] + seeds[0][1]
        for sd_t in seeds:
            if sd_t[0] > max_q + soc_height:
                if cur_nt >= min_nt:
                    out.append(cur)
                cur, cur_nt = [], 0
            cur.append(sd_t)
            cur_nt += sd_t[1]
            max_q = max(max_q, sd_t[0] + sd_t[1])
        if cur_nt >= min_nt:
            out.append(cur)
    return out


def compute_sv_jumps_batch(
    reads: Sequence[NucSeq],
    pack: Pack,
    mmi: MinimizerIndex,
    params: JumpParams = JumpParams(),
    min_seed_len: int = 18,
    max_occ: int = 10000,
    min_nt_in_soc: int = 25,
    soc_height: int = 0,
    do_reseed: bool = True,
    batch: int = 512,
    keep_seeds: bool = False,
):
    """reads -> JumpBatch (compute_sv_jumps, computeSvJumps.py:6-122):
    device minimizer seeding + lumping + SoC, then the enumeration front
    end (feasible-SoC extraction, rectangle reseeding, maximal extension,
    per-read union) in ONE C++ call per batch (native/sv_enum.cpp; the
    Python modules below stay as the oracles — MA_TPU_SV_ENUM=python), then
    ONE vectorized jump enumeration over all reads' seed unions
    (msv/jumps_batch.py; per-object compute_jumps stays as the oracle)."""
    import os

    from ma_tpu.msv.jumps_batch import jumps_from_seed_csr
    from ma_tpu.native import sv_enum as sv_enum_native

    use_native = (
        os.environ.get("MA_TPU_SV_ENUM", "native") != "python"
        and sv_enum_native.available()
    )
    mmi_dev = mmi.to_device()
    cst = jnp.asarray(np.asarray(pack.starts, np.int32))
    rlf = pack.unpacked_size_forward_strand
    col_q: List[np.ndarray] = []
    col_l: List[np.ndarray] = []
    col_r: List[np.ndarray] = []
    col_fw: List[np.ndarray] = []
    col_nt: List[np.ndarray] = []
    read_off = [0]
    total = 0
    qlens: List[int] = []
    read_ids: List[int] = []
    import time as _time

    prof = os.environ.get("MA_TPU_SV_PROFILE")
    t_disp = t_soc = t_enum = 0.0

    def _dispatch(s):
        chunk = reads[s : s + batch]
        # pad a trailing partial chunk to the full batch shape: a fresh B
        # recompiles the whole seed stage (~30 s on the tunnel) for one
        # chunk. Padding rows are empty reads (len 0 -> no seeds -> no
        # windows -> zero counts).
        B = batch if len(reads) > batch else len(chunk)
        L = 32
        while L < max(len(r) for r in chunk):
            L *= 2
        seqs = np.full((B, L), 4, np.uint8)
        lens = np.zeros(B, np.int32)
        for i, r in enumerate(chunk):
            seqs[i, : len(r)] = r.codes
            lens[i] = len(r)
        dev = sv_seed_stage(mmi_dev, cst, rlf, seqs, lens, k=mmi.k, w=mmi.w,
                            max_occ=max_occ, min_seed_len=min_seed_len)
        return s, chunk, seqs, lens, dev

    starts = list(range(0, len(reads), batch))
    t0 = _time.perf_counter()
    pending = _dispatch(starts[0]) if starts else None
    t_first = _time.perf_counter() - t0
    for idx in range(len(starts)):
        s, chunk, seqs, lens, dev = pending
        # enqueue the NEXT chunk's device stage before syncing this one:
        # its compute overlaps this chunk's download + host enumeration
        t0 = _time.perf_counter()
        pending = _dispatch(starts[idx + 1]) if idx + 1 < len(starts) else None
        t1 = _time.perf_counter()
        soc = SocHost(dev, min_nt=min_nt_in_soc)
        t2 = _time.perf_counter()
        t_disp += t1 - t0
        t_soc += t2 - t1
        B = len(chunk)
        if use_native:
            oq, ol, orr, ofw, ont, cnt = sv_enum_native.enumerate_batch(
                soc, seqs, lens, pack, min_nt_in_soc, soc_height, do_reseed,
            )
            t_enum += _time.perf_counter() - t2
            col_q.append(oq)
            col_l.append(ol)
            col_r.append(orr)
            col_fw.append(ofw)
            col_nt.append(ont)
            for b in range(B):
                c = int(cnt[b])
                if c == 0:
                    continue
                total += c
                read_off.append(total)
                qlens.append(len(chunk[b]))
                read_ids.append(s + b)
            continue
        for b in range(B):
            # per-SoC reseeding, then jumps over the UNION of the feasible
            # SoCs' seeds (RecursiveReseedingSoCs reduces the SeedsSet back
            # to one flat Seeds before SvJumpsFromExtractedSeeds,
            # svJumpsFromSeeds.h:605-621,691)
            union: List[tuple] = []
            for soc_seeds in feasible_socs(soc, b, min_nt_in_soc, soc_height):
                seeds = soc_seeds
                if do_reseed:
                    seeds = reseed_gaps(seeds, chunk[b].codes, pack)
                # maximal extension sharpens breakpoints (SeedLumping
                # applies SeedExtender, seedFilters.h:265-290)
                seeds = extend_seeds(seeds, chunk[b].codes, pack)
                union.extend(seeds)
            if not union:
                continue
            union = sorted(set(union))
            arr = np.asarray(union, np.int64).reshape(-1, 5)
            col_q.append(arr[:, 0])
            col_l.append(arr[:, 1])
            col_r.append(arr[:, 2])
            col_fw.append(arr[:, 3].astype(bool))
            col_nt.append(arr[:, 4])
            total += len(union)
            read_off.append(total)
            qlens.append(len(chunk[b]))
            read_ids.append(s + b)
    t_tail0 = _time.perf_counter()
    cat = lambda xs, dt: (
        np.concatenate(xs) if xs else np.zeros(0, dt)
    )
    cq, cl, cr = cat(col_q, np.int64), cat(col_l, np.int64), cat(col_r, np.int64)
    cfw, cnt_ = cat(col_fw, bool), cat(col_nt, np.int64)
    jb = jumps_from_seed_csr(
        cq, cl, cr, cfw, cnt_,
        np.asarray(read_off, np.int64), np.asarray(qlens, np.int64),
        np.asarray(read_ids, np.int64), params=params,
    )
    if keep_seeds:
        # per-read seed unions for the viewer (seeds_for_reads)
        jb.read_seeds = {
            int(read_ids[i]): [
                (int(cq[m]), int(cl[m]), int(cr[m]), bool(cfw[m]), int(cnt_[m]))
                for m in range(read_off[i], read_off[i + 1])
            ]
            for i in range(len(read_ids))
        }
    if prof:
        import sys as _sys

        print(
            f"# sv phases: first_dispatch {t_first:.1f}s "
            f"dispatch {t_disp:.1f}s soc_download {t_soc:.1f}s "
            f"enumerate {t_enum:.1f}s "
            f"jumps_csr {_time.perf_counter() - t_tail0:.1f}s",
            file=_sys.stderr, flush=True,
        )
    return jb


def seeds_for_reads(
    reads: Sequence[NucSeq],
    pack: Pack,
    mmi: MinimizerIndex,
    read_ids: Sequence[int],
    min_seed_len: int = 18,
    max_occ: int = 10000,
    min_nt_in_soc: int = 25,
    soc_height: int = 0,
    do_reseed: bool = True,
    max_seeds_per_read: int = 200,
):
    """Per-read seed unions for the viewer's dot-plots (the bokeh
    renderer's seed-fetch role, sv_visualization/renderer/*): re-runs the
    enumeration front end on just `read_ids` and returns
    {read_id: [(q, l, r, fw), ...]} (longest `max_seeds_per_read` kept —
    the renderer_speedup.cpp decimation role)."""
    ids = [i for i in read_ids if 0 <= i < len(reads)]
    if not ids:
        return {}
    sel = [reads[i] for i in ids]
    jb = compute_sv_jumps_batch(
        sel, pack, mmi, min_seed_len=min_seed_len, max_occ=max_occ,
        min_nt_in_soc=min_nt_in_soc, soc_height=soc_height,
        do_reseed=do_reseed, keep_seeds=True,
    )
    out = {}
    for local_id, seeds in jb.read_seeds.items():
        if len(seeds) > max_seeds_per_read:
            seeds = sorted(seeds, key=lambda s: -s[1])[:max_seeds_per_read]
        out[ids[local_id]] = [(q, l, r, bool(fw)) for (q, l, r, fw, _) in seeds]
    return out


def compute_sv_jumps(
    reads: Sequence[NucSeq],
    pack: Pack,
    mmi: MinimizerIndex,
    **kw,
) -> List[SvJump]:
    """Object-list variant of compute_sv_jumps_batch (compat surface for
    the store/render/tests; identical jumps and ids)."""
    return compute_sv_jumps_batch(reads, pack, mmi, **kw).to_jumps()


def sweep_sv_jumps(
    jumps: Sequence[SvJump],
    min_reads: int = 2,
    max_supp_nt: int = 10,
    max_call_size: int = 20,
    max_fuzziness: int = 50,
) -> List[SvCall]:
    """jumps -> filtered calls (sweep_sv_jumps, sweepSvJumps.py:7-160)."""
    calls = sweep_jumps(jumps, min_reads=min_reads)
    calls = filter_low_support_short_calls(calls, max_supp_nt, max_call_size)
    calls = filter_fuzzy_calls(calls, max_fuzziness)
    return calls
