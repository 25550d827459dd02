"""Alignment assembly: chain harmonized seeds, fill gaps and extend ends
with batched device DP.

Host orchestration of the reference NeedlemanWunsch module
(reference: libs/ma/src/module/needlemanWunsch.cpp execute_one:625-905,
dynPrg:499-623, ksw:82-169, ksw_dual_ext:239-498):

* per harmonized seed set: reference window = seed span +- Padding, clamped
  to the owning contig/strand segment (execute_one:710-765)
* gaps <= Maximal Gap Size  -> banded global DP
  (band = max(minBand, |dt-dq|+10), ksw_simplified:60-79)
* larger gaps -> dual z-drop extension meeting in the middle (ksw_dual_ext)
* read ends -> one-sided z-drop extension (band 512), left end via
  reversed sequences (dynPrg:544-623)
* seeds appended as SEED runs with the overlap trimming rules
  (execute_one:805-855), then removeDangeling

All DP sub-problems across the whole read batch are collected first,
bucketed by padded shape, solved in a few batched device calls
(ma_tpu.ops.dp.banded_align), and traced back on host — the device does
the O(band x len) work, the host the O(path) CIGAR assembly.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

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
from ma_tpu.containers.pack import Pack
from ma_tpu.ops.dp import (DPParams, banded_align, banded_align_traceback, rle_ops, rle_ops_batch, OP_M, OP_I, OP_D)


def _next_pow2(n: int, lo: int = 8) -> int:
    v = lo
    while v < n:
        v *= 2
    return v


@dataclasses.dataclass
class DPProblem:
    q: Optional[np.ndarray]  # query segment codes (reversed for rev ext);
    t: Optional[np.ndarray]  # None in descriptor mode (device-resident)
    band: int
    is_global: bool
    # descriptor-mode coordinates (device-resident operands; see
    # ops/dp.py banded_align_traceback_desc)
    read_idx: int = -1
    q_off: int = 0
    q_len: int = 0
    q_rev: int = 0
    t_start: int = 0
    t_len: int = 0
    t_rev: int = 0
    # results (filled by _run_batches)
    cigar: Optional[List[Tuple[int, int]]] = None
    max_i: int = -1  # extension: last aligned query index (inclusive)
    max_j: int = -1


class NWConfig:
    def __init__(self, pset=None, glob=None):
        get = (lambda n: pset.get(n)) if pset is not None else (lambda n: None)
        self.padding = get("Padding") or 1000
        self.band_ext = get("Bandwidth for Extensions") or 512
        self.min_band_gap = get("Minimal Bandwidth in Gaps") or 20
        self.zdrop = get("Z Drop") or 200
        self.max_gap_area = get("Maximal Gap Size") or 20
        self.params = DPParams(
            match=get("Match Score") or 2,
            mismatch=get("Mismatch Penalty") or 4,
            gap_open=get("Gap penalty") or 4,
            gap_extend=get("Extend Penalty") or 2,
            gap_open2=get("Second Gap Penalty") or 24,
            gap_extend2=get("Second Extend Penalty") or 1,
        )
        self.sv_penalty = 100


def _contig_segment(pack: Pack, pos: int) -> Tuple[int, int]:
    """[lo, hi) of the strand-aware contig segment containing pos in [0,2L)
    (startOfSequenceWithIdOrReverse semantics)."""
    L = pack.unpacked_size_forward_strand
    c = int(pack.seq_id_for_position(pos))
    lo = int(pack.starts[c])
    hi = lo + int(pack.lengths[c])
    if pos >= L:
        lo, hi = 2 * L - hi, 2 * L - lo
    return lo, hi


class NWAligner:
    """Batched gap-filling / extension DP for harmonized seed sets."""

    def __init__(self, pack: Pack, config: NWConfig | None = None,
                 profiler=None, text_dev=None, seqs_dev=None,
                 text_host=None, seqs_np=None):
        self.pack = pack
        self.cfg = config or NWConfig()
        self._problems: List[DPProblem] = []
        self.profiler = profiler
        # descriptor mode: operands stay on device, only int32 descriptors
        # are uploaded (the per-problem window upload dominated DP wall time
        # through the ~25 MB/s tunnel)
        self.text_dev = text_dev
        self.seqs_dev = seqs_dev
        # host copies (when the caller has them): the redo fallback reads
        # operands from these instead of paying a tunnel round trip per
        # device slice
        self.text_host = text_host
        self.seqs_np = seqs_np
        self._read_idx = -1  # set by plan_set in descriptor mode
        self._launched = None  # dispatched device calls awaiting collect

    @property
    def desc_mode(self) -> bool:
        return self.text_dev is not None and self.seqs_dev is not None

    # ------------------------------------------------------------- planning
    def _new_problem(self, q, t, band, is_global, q_off=0, q_len=0, q_rev=0,
                     t_start=0, t_len=0, t_rev=0) -> int:
        if self.desc_mode:
            self._problems.append(
                DPProblem(q=None, t=None, band=int(band), is_global=is_global,
                          read_idx=self._read_idx, q_off=int(q_off),
                          q_len=int(q_len), q_rev=int(q_rev),
                          t_start=int(t_start), t_len=int(t_len),
                          t_rev=int(t_rev))
            )
        else:
            q = np.asarray(q, np.uint8)
            t = np.asarray(t, np.uint8)
            self._problems.append(
                DPProblem(q=q, t=t, band=int(band), is_global=is_global,
                          q_len=len(q), t_len=len(t))
            )
        return len(self._problems) - 1

    def _plan_dyn_prg(self, plan, query, ref, fq, tq, fr, tr, local_begin,
                      local_end, begin_ref=0):
        """dynPrg (needlemanWunsch.cpp:499-543): emit plan tokens."""
        cfg = self.cfg
        desc = self.desc_mode
        if tr <= fr and tq <= fq:
            return
        if tq <= fq:
            plan.append(("op", DELETION, tr - fr))
            return
        if tr <= fr:
            plan.append(("op", INSERTION, tq - fq))
            return
        if not local_begin and not local_end:
            if tq - fq > cfg.max_gap_area or tr - fr > cfg.max_gap_area:
                # dual z-drop extension (ksw_dual_ext). A banded extension
                # can never reach ref column > qlen + band (cells with
                # |i-j| > band are skipped), so clamp the ref windows — this
                # is exact, and it keeps the DP area (and the direction
                # matrix shipped to host) proportional to the query.
                cap = (tq - fq) + cfg.band_ext + 1
                trl = min(tr, fr + cap)
                pl = self._new_problem(
                    None if desc else query[fq:tq],
                    None if desc else ref[fr:trl], cfg.band_ext,
                    is_global=False, q_off=fq, q_len=tq - fq,
                    t_start=begin_ref + fr, t_len=trl - fr,
                )
                frr = max(fr, tr - cap)
                pr = self._new_problem(
                    None if desc else query[fq:tq][::-1],
                    None if desc else ref[frr:tr][::-1],
                    cfg.band_ext, is_global=False, q_off=fq, q_len=tq - fq,
                    q_rev=1, t_start=begin_ref + frr, t_len=tr - frr, t_rev=1,
                )
                plan.append(("dual", pl, pr, fq, tq, fr, tr))
            else:
                w = cfg.min_band_gap
                if abs((tr - fr) - (tq - fq)) + 10 > w:
                    w = abs((tr - fr) - (tq - fq)) + 10
                p = self._new_problem(
                    None if desc else query[fq:tq],
                    None if desc else ref[fr:tr], w, is_global=True,
                    q_off=fq, q_len=tq - fq,
                    t_start=begin_ref + fr, t_len=tr - fr,
                )
                plan.append(("global", p, fq, tq, fr, tr))
            return
        # one-sided extension; clamp the ref window to qlen + band (exact,
        # see the dual branch comment)
        rev = local_begin
        cap = (tq - fq) + cfg.band_ext + 1
        if rev:
            fr2 = max(fr, tr - cap)
            p = self._new_problem(
                None if desc else query[fq:tq][::-1],
                None if desc else ref[fr2:tr][::-1],
                cfg.band_ext, is_global=False, q_off=fq, q_len=tq - fq,
                q_rev=1, t_start=begin_ref + fr2, t_len=tr - fr2, t_rev=1,
            )
        else:
            tr2 = min(tr, fr + cap)
            p = self._new_problem(
                None if desc else query[fq:tq],
                None if desc else ref[fr:tr2],
                cfg.band_ext, is_global=False, q_off=fq, q_len=tq - fq,
                t_start=begin_ref + fr, t_len=tr2 - fr,
            )
        plan.append(("ext", p, rev, fq, tq, fr, tr))

    def plan_set(self, query: np.ndarray, seeds: Sequence[Tuple[int, int, int]],
                 read_idx: int = -1):
        """Plan one harmonized seed set -> (plan tokens, begin_ref) or None.

        seeds: [(q_start, length, ref_start_text)] non-empty, any order;
        sorted here by (ref, q) like harmonizeOne's output ordering.
        read_idx: row of this read in the device batch (descriptor mode).
        """
        cfg = self.cfg
        pack = self.pack
        self._read_idx = read_idx
        qlen = len(query)
        seeds = sorted((s for s in seeds if s[1] > 0), key=lambda s: (s[2], s[0]))
        if not seeds:
            return None
        begin_ref = min(s[2] for s in seeds)
        end_ref = max(s[2] + s[1] for s in seeds)
        if begin_ref >= end_ref or pack.bridging(begin_ref, end_ref + 1):
            return None
        # pad + clamp to contig segment (execute_one:710-765)
        old_lo, old_hi = _contig_segment(pack, begin_ref)
        begin_ref = max(begin_ref - cfg.padding, 0)
        end_ref = min(end_ref + cfg.padding, pack.unpacked_size_forward_plus_reverse - 1)
        begin_ref = max(begin_ref, old_lo)
        if end_ref > old_hi - 1:
            end_ref = old_hi - 1
        ref = pack.extract(begin_ref, end_ref)

        plan: List[tuple] = []
        front = seeds[0]
        # left end extension
        self._plan_dyn_prg(plan, query, ref, 0, front[0], 0, front[2] - begin_ref,
                           True, False, begin_ref=begin_ref)
        plan.append(("op", SEED, front[1]))
        last_q = front[0] + front[1]
        last_r = front[2] + front[1] - begin_ref
        for (sq, sl, sr) in seeds[1:]:
            if sl == 0:
                continue
            ov_q = last_q - sq if sq <= last_q else 0
            ov_r = last_r - (sr - begin_ref) if sr - begin_ref <= last_r else 0
            overlap = max(ov_q, ov_r)
            if sl > overlap:
                self._plan_dyn_prg(plan, query, ref, last_q, sq, last_r,
                                   sr - begin_ref, False, False,
                                   begin_ref=begin_ref)
                if ov_q > ov_r:
                    plan.append(("op", DELETION, ov_q - ov_r))
                if ov_r > ov_q:
                    plan.append(("op", INSERTION, ov_r - ov_q))
                plan.append(("op", SEED, sl - overlap))
                if sq + sl > last_q:
                    last_q = sq + sl
                if sr + sl - begin_ref > last_r:
                    last_r = sr + sl - begin_ref
        # right end extension (note the reference's endQuery-1 / endRef-1)
        self._plan_dyn_prg(plan, query, ref, last_q, qlen - 1, last_r,
                           end_ref - begin_ref - 1, False, True,
                           begin_ref=begin_ref)
        return plan, begin_ref, ref

    # fixed (M, N) bucket ladder: problems round up to one of these, so the
    # jitted DP program compiles for a handful of shapes ever (data-dependent
    # per-batch shapes caused a recompile per new shape = tens of seconds on
    # TPU, dwarfing the actual DP work). M and N are bucketed INDEPENDENTLY:
    # read-end extensions have tiny query overhangs against ~band-wide ref
    # windows (n ~ m + 513), and the row-sweep kernel's step count is M, so
    # coupling M to N (the old (256,1024) bucket) wasted a 16x lane width.
    # 768 covers the extension window n <= m + 513 for all m <= 255. Both
    # ladders are deliberately coarse (factor 4) so the full key set for a
    # read-length bucket shows up in the warmup batch — a key first seen
    # mid-run costs a fresh compile on the chip.
    N_LADDER = [64, 256, 768, 4096, 16384, 65536]
    M_LADDER = [16, 64, 256, 1024, 4096, 16384]

    @classmethod
    def _bucket_shape(cls, m: int, n: int):
        M = next((v for v in cls.M_LADDER if m <= v), _next_pow2(m))
        N = next((v for v in cls.N_LADDER if n <= v), _next_pow2(n))
        return (M, N)

    @staticmethod
    def _max_p(M: int, N: int) -> int:
        """Problems per device call: capped so the [P, M, N] direction
        tensor stays within ~1 GB of HBM. The cap may fall all the way to 1:
        a (16384, 65536) global problem is 1 GiB of direction bytes on its
        own, and flooring at 64 would pad it to 64 GiB (OOM)."""
        cap = 4096
        while cap > 1 and cap * M * N > 2**30:
            cap //= 2
        return cap

    # ------------------------------------------------------------ execution
    def run_batches(self):
        """Solve all planned DP problems with bucketed device calls."""
        self.dispatch_batches()
        self.collect_batches()

    def dispatch_batches(self):
        """Phase 1: launch every bucket's device program (async dispatch) —
        separated from collect_batches so the caller can enqueue the NEXT
        read batch's device stage behind these programs and overlap its own
        host work with both (the pipeline-parallel overlap the reference
        gets from its thread pool, module.h:268-396)."""
        self._run_phase(collect=False)

    def collect_batches(self):
        self._run_phase(collect=True)

    # fused-kernel bucket ladders: no [P, M, N] HBM tensor exists, so the
    # bucket count (each call pays a tunnel round trip) matters more than
    # padding. All short-query problems collapse into at most three shapes:
    # glob (32, 128), ext (64, 768) and ext/glob (256, 768); the row loop
    # runs to each BLOCK's max qlen so M padding is nearly free.
    M_LADDER_FUSED = [32, 64, 256]
    N_LADDER_FUSED = [128, 768]
    # problems per fused call: P > 4096 hits the same pathological XLA
    # compile as batch 8192 did for the device stage (BASELINE.md) — more
    # calls are fine because their downloads coalesce into one transfer
    MAX_P_FUSED = 4096

    @classmethod
    def _bucket_shape_fused(cls, m: int, n: int):
        if m <= 256 and n <= 768:
            M = next(v for v in cls.M_LADDER_FUSED if m <= v)
            N = next(v for v in cls.N_LADDER_FUSED if n <= v)
            if N == 768:
                M = max(M, 64)  # one (64,768) + one (256,768) shape only
            return (M, N)
        return cls._bucket_shape(m, n)

    def _run_phase(self, collect: bool):
        import jax as _jax

        cfg = self.cfg
        if collect:
            self._collect(self._launched)
            self._launched = None
            return
        import os as _os0

        on_accel0 = _jax.devices()[0].platform != "cpu"
        dp_kernel0 = _os0.environ.get("MA_TPU_DP") or (
            "fused" if on_accel0 else "rows"
        )
        fused_ok0 = self.desc_mode and dp_kernel0 == "fused"
        buckets: Dict[tuple, List[int]] = {}
        chunked: List[int] = []
        for i, p in enumerate(self._problems):
            m, n = max(p.q_len, 1), max(p.t_len, 1)
            if fused_ok0 and not p.is_global and m > 256:
                # long one-sided/dual extensions: chunked z-drop path
                chunked.append(i)
                continue
            M, N = (
                self._bucket_shape_fused(m, n) if fused_ok0
                else self._bucket_shape(m, n)
            )
            key = (M, N, p.is_global)
            buckets.setdefault(key, []).append(i)
        self._chunked_pending = chunked
        all_buckets = []
        for key, idxs in buckets.items():
            fused_b = fused_ok0 and key[0] <= 256
            MAX_P = self.MAX_P_FUSED if fused_b else self._max_p(key[0], key[1])
            # sort by query length: the fused kernel's row loop runs to the
            # BLOCK max qlen, so homogeneous blocks skip padding rows
            idxs.sort(key=lambda i: self._problems[i].q_len)
            for s in range(0, len(idxs), MAX_P):
                all_buckets.append((key, idxs[s : s + MAX_P]))
        # On accelerators ALWAYS pad the problem count to the bucket cap:
        # compiles on the tunneled chip cost tens of seconds, and a
        # problem-count-dependent P meant every new count was a fresh
        # (P, M, N) program mid-run — far more expensive than padded
        # execution. On CPU (tests) pad to the next power of two instead.
        on_accel = _jax.devices()[0].platform != "cpu"
        import os as _os

        from ma_tpu.ops.dp import (
            _dp_desc_runs_fused,
            _dp_tb_desc_runs,
            banded_align_traceback_packed,
            packed_runs_to_cigars,
            runs_to_cigars,
        )
        from ma_tpu.utils.profile import stage_timer

        # the fused Pallas kernel (forward + traceback on-chip) is the
        # default on accelerators; the XLA rows path remains the reference
        # implementation and the CPU default (MA_TPU_DP overrides)
        dp_kernel = _os.environ.get("MA_TPU_DP") or (
            "fused" if on_accel else "rows"
        )
        fused_ok = self.desc_mode and dp_kernel == "fused"

        # phase 1: dispatch every bucket's device program without waiting —
        # JAX async dispatch queues them back to back, so the ~25 ms
        # per-program latency of the tunneled chip is paid once, not per
        # bucket, and phase 2's downloads overlap later buckets' compute.
        launched = []
        with stage_timer(self.profiler, "dp dispatch"):
            for (M, N, is_global), idxs in all_buckets:
                # fused kernel: short/medium queries only — its in-VMEM run
                # buffer is sized for them; long reads use the split path
                use_fused = fused_ok and M <= 256
                if use_fused and on_accel:
                    # pad to a 4096 multiple: a handful of P variants ever
                    P = 4096 * (-(-len(idxs) // 4096))
                elif on_accel:
                    P = self._max_p(M, N)
                else:
                    P = _next_pow2(len(idxs), lo=8)
                if self.desc_mode:
                    desc = np.zeros((8, P), np.int32)
                    desc[2] = 1  # q_len
                    desc[5] = 1  # t_len
                    desc[7] = 1  # band
                    for k, i in enumerate(idxs):
                        p = self._problems[i]
                        desc[:, k] = (
                            p.read_idx, p.q_off, p.q_len, p.q_rev,
                            p.t_start, p.t_len, p.t_rev, p.band,
                        )
                    fn = _dp_desc_runs_fused if use_fused else _dp_tb_desc_runs
                    out = fn(
                        self.text_dev, self.seqs_dev,
                        jnp.asarray(desc, jnp.int32), M=M, N=N,
                        params=cfg.params,
                        zdrop=-1 if is_global else cfg.zdrop,
                        is_global=is_global,
                    )
                else:
                    qa = np.full((P, M), 4, np.uint8)
                    ta = np.full((P, N), 4, np.uint8)
                    qlen = np.ones(P, np.int32)
                    tlen = np.ones(P, np.int32)
                    band = np.ones(P, np.int32)
                    for k, i in enumerate(idxs):
                        p = self._problems[i]
                        qa[k, : len(p.q)] = p.q
                        ta[k, : len(p.t)] = p.t
                        qlen[k], tlen[k], band[k] = len(p.q), len(p.t), p.band
                    out = banded_align_traceback_packed(
                        qa, ta, qlen, tlen, band, params=cfg.params,
                        zdrop=-1 if is_global else cfg.zdrop,
                        is_global=is_global,
                    )
                launched.append(((M, N, is_global), idxs, out, use_fused))
        self._launched = launched

    def _collect(self, launched):
        """Phase 2: download run boundaries (tiny) instead of the [P, S]
        ops matrix; rows with > MAX_RUNS runs (rare) fall back.

        Long-extension problems routed to the chunked path run here (they
        are sequential rounds of device calls).

        All fused buckets' combined int16 outputs are concatenated ON
        DEVICE and fetched with ONE np.asarray — the tunnel costs ~15 ms
        of round-trip latency per transfer, so one coalesced download per
        read batch beats one per bucket."""
        import jax.numpy as _jnp

        from ma_tpu.ops.dp import (
            RUNS_HEAD,
            packed_runs_to_cigars,
            rle_ops,
            rle_ops_batch,
            runs_to_cigars,
        )
        from ma_tpu.utils.profile import stage_timer

        fused_list = [e for e in launched if e[3]]
        redo_items: List[tuple] = []  # (prob_idx, is_global) overflow redos
        comb_np = None
        comb_off = {}
        if fused_list:
            with stage_timer(self.profiler, "dp collect fused download"):
                import jax as _jax2

                # download only the pow2-rounded REAL problem prefix of
                # each bucket's comb (P is padded to 4096 multiples for
                # program reuse; the padding columns are dead weight on
                # the ~5-25 MB/s tunnel). Pow2 widths keep the slice
                # program count bounded.
                def _pfx(arr, k):
                    cap = 512
                    while cap < k:
                        cap *= 2
                    cap = min(cap, arr.shape[1])
                    return arr[:, :cap]

                sliced = [_pfx(e[2][0], len(e[1])) for e in fused_list]
                off = 0
                for e, s in zip(fused_list, sliced):
                    comb_off[id(e)] = (off, s.shape[1])
                    off += s.shape[1]
                # one device_get (an on-device concat would recompile per
                # bucket combination)
                parts = _jax2.device_get(sliced)
                comb_np = np.concatenate(
                    [np.asarray(p) for p in parts], axis=1
                )

        chunked = getattr(self, "_chunked_pending", None)
        if chunked:
            with stage_timer(self.profiler, "dp chunked long ext"):
                self._chunked_ext(chunked)
            self._chunked_pending = None

        for entry in launched:
            (M, N, is_global), idxs, out, use_fused = entry
            K = len(idxs)
            with stage_timer(
                self.profiler,
                f"dp collect {('glob' if is_global else 'ext')} {M}x{N}",
            ):
                if self.desc_mode and use_fused:
                    off, P = comb_off[id(entry)]
                    comb = comb_np[:, off : off + P].astype(np.int32)
                    meta = comb[:8]
                    n_runs = meta[0]
                    smax = int(n_runs[:K].max(initial=0))
                    if smax > RUNS_HEAD:
                        # some rows need more runs than the combined
                        # download carries — fetch the int32 rows, sliced
                        # to the pow2 run depth x real-problem prefix
                        # (the full [R, 4096] plane is ~1.5 MB of mostly
                        # padding on long-read batches)
                        sp = 16
                        while sp < smax:
                            sp *= 2
                        sp = min(sp, out[1].shape[0])
                        runs_t = np.asarray(out[1][:sp, :P])
                    else:
                        runs_t = comb[8 : 8 + max(1, smax)]
                    cigars = packed_runs_to_cigars(runs_t, n_runs[:K])
                    for k in range(K):
                        if cigars[k] is None or meta[5][k]:
                            # deferred to ONE bucketed rows-path call after
                            # all buckets land: per-problem redo paid a CPU
                            # compile + two tunnel slices each (~0.9 s;
                            # 12 redos were 10.7 s of a 16 s long-read
                            # batch)
                            redo_items.append((idxs[k], is_global))
                            cigars[k] = None
                elif self.desc_mode:
                    ops_d, meta_d, run_op_d, run_start_d, n_runs_d = out
                    meta = np.asarray(meta_d)
                    run_op = np.asarray(run_op_d[:K])
                    run_start = np.asarray(run_start_d[:K])
                    n_runs = np.asarray(n_runs_d[:K])
                    n_ops, rem_i, rem_j = meta[0], meta[1], meta[2]
                    cigars = runs_to_cigars(
                        run_op, run_start, n_ops[:K], n_runs,
                        rem_i[:K], rem_j[:K],
                    )
                    for k, cg in enumerate(cigars):
                        if cg is None:  # > MAX_RUNS runs: download the row
                            n = int(n_ops[k])
                            s128 = max(128, ((n + 127) // 128) * 128)
                            row = np.asarray(ops_d[k, : min(s128, ops_d.shape[1])])
                            cigars[k] = rle_ops(
                                row, n, int(rem_i[k]), int(rem_j[k])
                            )
                else:
                    ops_d, meta_d = out[0], out[1]
                    meta = np.asarray(meta_d)
                    n_ops, rem_i, rem_j = meta[0], meta[1], meta[2]
                    ops = np.asarray(ops_d)
                    cigars = rle_ops_batch(
                        ops[:K], n_ops[:K], rem_i[:K], rem_j[:K]
                    )
            if self.desc_mode and use_fused:
                max_i, max_j = meta[2], meta[3]
            else:
                max_i, max_j = meta[4], meta[5]
            for k, i in enumerate(idxs):
                p = self._problems[i]
                if is_global:
                    p.max_i, p.max_j = p.q_len - 1, p.t_len - 1
                    p.cigar = cigars[k]
                else:
                    p.max_i, p.max_j = int(max_i[k]), int(max_j[k])
                    p.cigar = cigars[k] if p.max_i >= 0 else []
        if redo_items:
            with stage_timer(self.profiler, "dp redo batched"):
                self._redo_batched(redo_items)

    def _redo_batched(self, items):
        """Overflow fallback, batched: all fused-kernel rows whose run
        buffer overflowed (cigar None / meta overflow bit) re-run through
        the XLA rows path on the host CPU device in a few bucketed calls.
        Operands come from the host copies when available. p.max_i/p.max_j
        keep the fused forward pass's values (set by the caller) — only the
        cigar is recomputed, exactly as the old per-problem redo ended up
        doing."""
        import jax as _jax

        from ma_tpu.ops.dp import banded_align_traceback_packed, rle_ops

        probs = []
        for prob_idx, is_global in items:
            p = self._problems[prob_idx]
            if p.q is not None:
                q, t = p.q, p.t
            else:
                if self.seqs_np is not None:
                    q = self.seqs_np[p.read_idx, p.q_off : p.q_off + p.q_len]
                else:
                    q = np.asarray(self.seqs_dev[p.read_idx])[
                        p.q_off : p.q_off + p.q_len
                    ]
                if p.q_rev:
                    q = q[::-1]
                if self.text_host is not None:
                    t = self.text_host[p.t_start : p.t_start + p.t_len]
                else:
                    t = np.asarray(
                        self.text_dev[p.t_start : p.t_start + p.t_len]
                    )
                if p.t_rev:
                    t = t[::-1]
            probs.append((p, q, t, is_global))
        groups: Dict[tuple, list] = {}
        for it in probs:
            p, q, t, g = it
            M = _next_pow2(max(len(q), 1), lo=64)
            N = _next_pow2(max(len(t), 1), lo=64)
            groups.setdefault((g, M, N), []).append(it)
        with _jax.default_device(_jax.devices("cpu")[0]):
            for (g, M, N), its in groups.items():
                P = _next_pow2(len(its), lo=1)
                qa = np.full((P, M), 4, np.uint8)
                ta = np.full((P, N), 4, np.uint8)
                qlen = np.ones(P, np.int32)
                tlen = np.ones(P, np.int32)
                band = np.ones(P, np.int32)
                for k, (p, q, t, _) in enumerate(its):
                    qa[k, : len(q)] = q
                    ta[k, : len(t)] = t
                    qlen[k], tlen[k], band[k] = len(q), len(t), p.band
                ops, meta = banded_align_traceback_packed(
                    qa, ta, qlen, tlen, band, params=self.cfg.params,
                    zdrop=-1 if g else self.cfg.zdrop, is_global=g,
                )
                meta = np.asarray(meta)
                ops = np.asarray(ops)
                for k, (p, q, t, _) in enumerate(its):
                    cg = rle_ops(
                        ops[k], int(meta[0][k]), int(meta[1][k]),
                        int(meta[2][k]),
                    )
                    p.cigar = cg if (g or p.max_i >= 0) else []

    # ------------------------------------------------- chunked long-read ext
    CHUNK_M = 256  # query bases per chunk (fused-kernel bucket)
    CHUNK_N = 768

    def _chunked_ext(self, idxs):
        """One-sided extensions with query overhangs beyond the fused
        buckets, solved as sequential 256-base chunks of the fused kernel
        (the chunked z-drop re-alignment of SURVEY hard part (d); role of
        the reference's single ksw_ext call, needlemanWunsch.cpp:82-169).

        Each round traces the chunk's path THROUGH its last row (the
        kernel's tb_last mode) and re-anchors the next chunk at that cell;
        the globally best cell over all chunks ends the extension, with
        one final ext-mode call on its chunk for the tail path. Divergence
        from a monolithic DP: score dips spanning a chunk's final row stop
        the extension even when < zdrop, and gaps crossing a chunk border
        pay the gap-open twice.
        """
        from ma_tpu.ops.dp import RUNS_HEAD, _dp_desc_runs_fused

        cfg = self.cfg
        CH, CN = self.CHUNK_M, self.CHUNK_N

        class St:
            __slots__ = ("pi", "q_done", "r_done", "cum", "chunks",
                         "best_total", "best_chunk", "best_cell", "stopped")

        states = []
        for pi in idxs:
            s = St()
            s.pi = pi
            s.q_done = 0
            s.r_done = 0
            s.cum = 0
            s.chunks = []  # [(runs, lr_arg, q_len_chunk)]
            s.best_total = 0
            s.best_chunk = -1  # -1 = extension start (align nothing)
            s.best_cell = (-1, -1)
            s.stopped = False
            states.append(s)

        def chunk_desc(s, q_chunk_len, t_chunk_len):
            p = self._problems[s.pi]
            if p.q_rev:
                q_off = p.q_off + p.q_len - s.q_done - q_chunk_len
            else:
                q_off = p.q_off + s.q_done
            if p.t_rev:
                t_start = p.t_start + p.t_len - s.r_done - t_chunk_len
            else:
                t_start = p.t_start + s.r_done
            return (p.read_idx, q_off, q_chunk_len, p.q_rev, t_start,
                    t_chunk_len, p.t_rev, cfg.band_ext)

        def run_round(active, tb_last_flag):
            P = 4096 if len(active) > 512 else max(
                8, 1 << int(np.ceil(np.log2(max(len(active), 2))))
            )
            desc = np.zeros((8, P), np.int32)
            desc[2] = 1
            desc[5] = 1
            desc[7] = 1
            lens = []
            for k, s in enumerate(active):
                p = self._problems[s.pi]
                qc = min(CH, p.q_len - s.q_done)
                tc = min(CN, p.t_len - s.r_done)
                desc[:, k] = chunk_desc(s, qc, tc)
                lens.append((qc, tc))
            tb = np.zeros(P, np.int32)
            tb[: len(active)] = tb_last_flag
            comb_d, runs_full_d = _dp_desc_runs_fused(
                self.text_dev, self.seqs_dev, jnp.asarray(desc), M=CH, N=CN,
                params=cfg.params, zdrop=cfg.zdrop, is_global=False,
                tb_last=jnp.asarray(tb),
            )
            comb = np.asarray(comb_d)[:, : len(active)].astype(np.int64)
            meta = comb[:8]
            smax = max(1, int(meta[0].max(initial=0)))
            if smax > RUNS_HEAD:
                runs = np.asarray(runs_full_d[:smax])[:, : len(active)]
            else:
                runs = comb[8 : 8 + smax]
            return meta, runs, lens

        active = [s for s in states if self._problems[s.pi].q_len > 0]
        rounds = 0
        while active and rounds < 512:
            rounds += 1
            meta, runs, lens = run_round(active, 1)
            nxt = []
            for k, s in enumerate(active):
                p = self._problems[s.pi]
                qc, tc = lens[k]
                n_runs = int(meta[0][k])
                chunk_runs = [
                    (int(runs[j, k]) & 3, int(runs[j, k]) >> 2)
                    for j in range(n_runs - 1, -1, -1)
                ]
                gmax, gi, gj = int(meta[1][k]), int(meta[2][k]), int(meta[3][k])
                lrmax, lrarg = int(meta[6][k]), int(meta[7][k])
                # global best across chunks (extension floor stays 0)
                if gi >= 0 and s.cum + gmax > s.best_total:
                    s.best_total = s.cum + gmax
                    s.best_chunk = len(s.chunks)
                    s.best_cell = (gi, gj)
                s.chunks.append((chunk_runs, lrarg, qc))
                through_ok = (
                    lrarg >= 0
                    and s.q_done + qc < p.q_len
                    and s.r_done + lrarg + 1 < p.t_len
                    and s.cum + lrmax >= s.best_total - cfg.zdrop
                )
                if through_ok:
                    s.q_done += qc
                    s.r_done += lrarg + 1
                    s.cum += lrmax
                    nxt.append(s)
                else:
                    s.stopped = True
            active = nxt

        # final pass: ext-mode traceback of each problem's best chunk
        finals = [s for s in states if s.best_chunk >= 0]
        # rebuild anchors for the best chunk of each problem
        for s in finals:
            s.q_done = sum(c[2] for c in s.chunks[: s.best_chunk])
            s.r_done = sum(c[1] + 1 for c in s.chunks[: s.best_chunk])
        if finals:
            meta, runs, lens = run_round(finals, 0)
        for k, s in enumerate(states):
            p = self._problems[s.pi]
            if s.best_chunk < 0:
                p.max_i, p.max_j = -1, -1
                p.cigar = []
                continue
        for k, s in enumerate(finals):
            p = self._problems[s.pi]
            n_runs = int(meta[0][k])
            tail = [
                (int(runs[j, k]) & 3, int(runs[j, k]) >> 2)
                for j in range(n_runs - 1, -1, -1)
            ]
            cigar: List[Tuple[int, int]] = []
            for (chunk_runs, _, _) in s.chunks[: s.best_chunk]:
                for op, ln in chunk_runs:
                    if cigar and cigar[-1][0] == op:
                        cigar[-1] = (op, cigar[-1][1] + ln)
                    else:
                        cigar.append((op, ln))
            for op, ln in tail:
                if cigar and cigar[-1][0] == op:
                    cigar[-1] = (op, cigar[-1][1] + ln)
                else:
                    cigar.append((op, ln))
            p.max_i = s.q_done + s.best_cell[0]
            p.max_j = s.r_done + s.best_cell[1]
            p.cigar = cigar

    def _redo_one(self, prob_idx: int, is_global: bool):
        """Rare fallback for fused-kernel run-buffer overflow: re-run one
        problem through the XLA rows path on the host CPU device (fast
        compile, no TPU program churn)."""
        import jax as _jax

        from ma_tpu.ops.dp import banded_align_traceback_packed, rle_ops

        p = self._problems[prob_idx]
        if p.q is not None:
            q, t = p.q, p.t
        else:
            q = np.asarray(self.seqs_dev[p.read_idx])[p.q_off : p.q_off + p.q_len]
            if p.q_rev:
                q = q[::-1]
            t = np.asarray(self.text_dev[p.t_start : p.t_start + p.t_len])
            if p.t_rev:
                t = t[::-1]
        with _jax.default_device(_jax.devices("cpu")[0]):
            ops, meta = banded_align_traceback_packed(
                q[None].astype(np.uint8), t[None].astype(np.uint8),
                np.asarray([len(q)], np.int32), np.asarray([len(t)], np.int32),
                np.asarray([p.band], np.int32), params=self.cfg.params,
                zdrop=-1 if is_global else self.cfg.zdrop,
                is_global=is_global,
            )
        p.max_i, p.max_j = int(meta[4][0]), int(meta[5][0])
        return rle_ops(np.asarray(ops)[0], int(meta[0][0]), int(meta[1][0]),
                       int(meta[2][0]))

    # ------------------------------------------------------------- assembly
    def _append_cigar(self, aln: Alignment, cigar, query, ref, qpos, rpos):
        for op, ln in cigar:
            if op == OP_M:
                qs = np.asarray(query[qpos : qpos + ln])
                ts = np.asarray(ref[rpos : rpos + ln])
                eq = (qs == ts) & (qs < 4)
                # run-length encode the match/mismatch pattern; one
                # vectorized append (Alignment.append_mm_runs) per M op
                change = np.flatnonzero(eq[1:] != eq[:-1]) + 1
                bounds = np.concatenate(([0], change, [ln]))
                aln.append_mm_runs(bool(eq[0]) if ln else True,
                                   np.diff(bounds))
                qpos += ln
                rpos += ln
            elif op == OP_I:
                aln.append(INSERTION, ln)
                qpos += ln
            else:
                aln.append(DELETION, ln)
                rpos += ln
        return qpos, rpos

    def assemble(self, plan, begin_ref: int, ref: np.ndarray, query: np.ndarray) -> Alignment:
        """Build the Alignment from plan tokens + solved problems."""
        cfg = self.cfg
        aln = Alignment(
            begin_on_ref=begin_ref, begin_on_query=0,
            match=cfg.params.match, mismatch=cfg.params.mismatch,
            gap=cfg.params.gap_open, extend=cfg.params.gap_extend,
            sv_penalty=cfg.sv_penalty,
        )
        started = False  # until the left extension anchors the start
        for tok in plan:
            kind = tok[0]
            if kind == "op":
                _, op, ln = tok
                aln.append(op, ln)
            elif kind == "global":
                _, pi, fq, tq, fr, tr = tok
                p = self._problems[pi]
                qpos, rpos = self._append_cigar(aln, p.cigar, query, ref, fq, fr)
                # ksw may stop short: pad remainder (needlemanWunsch.cpp:163-169)
                aln.append(DELETION, tq - qpos)  # note: reference swaps these
                aln.append(INSERTION, tr - rpos)  # names; lengths are 0 normally
            elif kind == "ext":
                _, pi, rev, fq, tq, fr, tr = tok
                p = self._problems[pi]
                if rev:
                    # reverse extension: cigar is for reversed segments;
                    # un-reverse and shift the alignment start
                    # (dynPrg:585-620 shiftOnRef/shiftOnQuery)
                    q0 = tq - p.max_i - 1
                    r0 = tr - p.max_j - 1
                    aln.begin_on_query = q0
                    aln.end_on_query = q0
                    aln.begin_on_ref = begin_ref + r0
                    aln.end_on_ref = begin_ref + r0
                    self._append_cigar(aln, list(reversed(p.cigar)), query, ref, q0, r0)
                    started = True
                else:
                    self._append_cigar(aln, p.cigar, query, ref, fq, fr)
            elif kind == "dual":
                self._assemble_dual(aln, tok, query, ref)
        aln.remove_dangeling()
        return aln

    def _assemble_dual(self, aln: Alignment, tok, query, ref):
        """Stitch dual extension results (ksw_dual_ext:239-498)."""
        _, pl, pr, fq, tq, fr, tr = tok
        L = self._problems[pl]
        R = self._problems[pr]
        q_center = (fq + L.max_i + (tq - R.max_i - 1)) // 2
        q_center = max(fq, min(tq, q_center))
        r_center = (fr + L.max_j + (tr - R.max_j - 1)) // 2
        r_center = max(fr, min(tr, r_center))

        qpos, rpos = fq, fr
        if rpos != r_center and qpos != q_center:
            for op, ln in L.cigar:
                if op == OP_M:
                    ln = min(ln, q_center - qpos, r_center - rpos)
                    self._append_cigar(aln, [(OP_M, ln)], query, ref, qpos, rpos)
                    qpos += ln
                    rpos += ln
                elif op == OP_I:
                    ln = min(ln, q_center - qpos)
                    aln.append(INSERTION, ln)
                    qpos += ln
                else:
                    ln = min(ln, r_center - rpos)
                    aln.append(DELETION, ln)
                    rpos += ln
                if rpos == r_center or qpos == q_center:
                    break
        # right side: skip cigar ops until past both centers
        r_start_q = tq - R.max_i - 1
        r_start_r = tr - R.max_j - 1
        rq, rr = r_start_q, r_start_r
        rc = [(op, ln) for op, ln in reversed(R.cigar)]  # forward order
        consumed: List[Tuple[int, int]] = []
        i = 0
        pending = None  # partially-unrolled op
        while i < len(rc):
            if rr >= r_center and rq >= q_center:
                break
            op, ln = rc[i]
            if op == OP_M:
                if rr + ln >= r_center and rq + ln >= q_center:
                    if rr < r_center and (rq >= q_center or r_center - rr > q_center - rq):
                        cut = r_center - rr
                    else:
                        cut = q_center - rq
                    pending = (op, ln - cut)
                    rq += cut
                    rr += cut
                    i += 1
                    break
                rq += ln
                rr += ln
            elif op == OP_I:
                if rq + ln > q_center and rr >= r_center:
                    cut = q_center - rq
                    pending = (op, ln - cut)
                    rq += cut
                    i += 1
                    break
                rq += ln
            else:
                if rr + ln > r_center and rq >= q_center:
                    cut = r_center - rr
                    pending = (op, ln - cut)
                    rr += cut
                    i += 1
                    break
                rr += ln
            i += 1
        # fill the middle hole with D then I (ksw_dual_ext middle fill)
        if rr > rpos:
            aln.append(DELETION, rr - rpos)
        if rq > qpos:
            aln.append(INSERTION, rq - qpos)
        # emit the partially unrolled op then the rest
        if pending is not None and pending[1] > 0:
            op, ln = pending
            if op == OP_M:
                self._append_cigar(aln, [(OP_M, ln)], query, ref, rq, rr)
                rq += ln
                rr += ln
            elif op == OP_I:
                aln.append(INSERTION, ln)
                rq += ln
            else:
                aln.append(DELETION, ln)
                rr += ln
        for op, ln in rc[i:]:
            if op == OP_M:
                self._append_cigar(aln, [(OP_M, ln)], query, ref, rq, rr)
                rq += ln
                rr += ln
            elif op == OP_I:
                aln.append(INSERTION, ln)
                rq += ln
            else:
                aln.append(DELETION, ln)
                rr += ln
