"""Full alignment pipeline orchestrator (the ExecutionContext/setUpCompGraph
equivalent).

The reference builds a per-thread pledge graph
(reference: libs/ma/src/util/export.cpp setUpCompGraph:72-128 —
FileReader -> BinarySeeding -> StripOfConsideration -> Harmonization ->
NeedlemanWunsch -> MappingQuality -> FileWriter) and replicates it N times
over a thread pool (libs/ms/inc/ms/module/module.h parallelGraph:386).

The TPU-native re-design replaces the graph-of-modules with a single
jit-compiled device stage over a fixed-shape read batch:

    seeding -> seed extraction -> SoC -> harmonization      (one XLA program)

followed by host-side DP orchestration (gap fill / extension problems are
re-batched and solved by the banded DP kernel in a few device calls), CIGAR
assembly, mapping quality, and SAM emission. Data parallelism is a sharded
batch axis over a `jax.sharding.Mesh` (ma_tpu/parallel/) instead of a
thread pool.
"""
from __future__ import annotations

import dataclasses
import functools
import os
from typing import IO, Iterable, List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ma_tpu.config.parameters import ParameterSet, ParameterSetManager
from ma_tpu.containers.alignment import Alignment
from ma_tpu.containers.nucseq import NucSeq
from ma_tpu.containers.pack import Pack
from ma_tpu.index.fmd_index import FMDIndex
from ma_tpu.io.sam import SamWriter
from ma_tpu.ops.extract import extract_seeds
from ma_tpu.ops.harmonize import HarmBatch, harmonization
from ma_tpu.ops.occ import FMDDev
from ma_tpu.ops.seeding import max_spanning_seeding, smem_seeding
from ma_tpu.ops.soc import SoCBatch, soc_collect
from ma_tpu.pipeline.nw import NWAligner, NWConfig
from ma_tpu.pipeline.quality import mapping_quality
from ma_tpu.utils.profile import AnalyzeRuntimes, stage_timer


def _next_pow2(n: int, lo: int = 32) -> int:
    v = lo
    while v < n:
        v *= 2
    return v


@dataclasses.dataclass(frozen=True)
class DeviceStageConfig:
    """Static (shape-determining) parameters of the jitted device stage.

    Capacities scale with the padded read length L of the batch bucket so
    short-read batches stay small while long reads get room.
    """

    seeding_technique: str
    mm_k: int
    mm_w: int
    max_segs: int
    max_seeds: int
    max_socs_collect: int
    max_socs_harm: int
    seeds_per_soc: int
    min_seed_len: int
    min_ambiguity: int
    max_ambiguity: int
    skip_ambiguous: bool
    rectangular: bool
    fixed_soc_width: int
    match: int
    extend: int
    gap: int
    min_socs: int
    do_heuristics: bool
    switch_qlen: int
    score_tolerance: float
    harm_score_min: int
    harm_score_min_rel: float
    score_diff_tolerance: float
    max_lookahead: int
    max_delta_dist: float
    min_delta_dist: int
    min_genome_size: int = 10_000_000
    n_cand: int = 8
    max_out_sets: int = 8

    @classmethod
    def from_params(
        cls, pset: ParameterSet, padded_len: int, cap_boost: int = 1
    ) -> "DeviceStageConfig":
        """`cap_boost` multiplies the per-read capacity knobs (seed slots,
        SoC window width, segment slots) for the overflow-rescue pass —
        reads the normal shapes truncated re-run through a roomier stage
        (the reference has no truncation at all: binarySeeding.h:544-547
        recursion is unbounded)."""
        g = pset.get
        L = padded_len
        cb = max(int(cap_boost), 1)
        max_socs = int(g("Maximal Number of SoCs"))
        return cls(
            seeding_technique=str(g("Seeding Technique")),
            mm_k=int(g("Minimizers - k")),
            mm_w=int(g("Minimizers - w")),
            max_segs=_next_pow2(max(64, cb * (L // 4))),
            # expected short-read seed count is ~2L/(w+1) minimizers x small
            # mean occurrence — L slots is already ~7x headroom at L=160
            # (the SeedBatch overflow flag marks the rare loss); every
            # downstream sort/gather in the device stage scales with this.
            # Very long reads cap at 8192 slots (~1.4x the expected 2L/11
            # minimizer count at 32 kb): uncapped, the 32k-slot device
            # stage OOM-kills the XLA compile helper
            max_seeds=min(_next_pow2(max(256, L) * cb), 8192 * cb),
            max_socs_collect=_next_pow2(max(32, max_socs), lo=32),
            # a strip on a short read usually holds ~2L/(w+1) seeds, but
            # multi-occurrence minimizers on tandem repeats push windows to
            # >32 at L=160 (ADVICE r3 measured 63); keep 64 minimum, and
            # _batch_overflow flags any read whose window still exceeds it
            seeds_per_soc=min(_next_pow2(max(64, L // 8) * cb, lo=64), 2048 * cb),
            min_seed_len=int(g("Minimal Seed Length")),
            min_ambiguity=int(g("Minimal Ambiguity")),
            max_ambiguity=int(g("Maximal Ambiguity")),
            skip_ambiguous=bool(g("Skip Ambiguous Seeds")),
            rectangular=bool(g("Rectangular SoC")),
            fixed_soc_width=int(g("Fixed SoC Width")),
            match=int(g("Match Score")),
            extend=int(g("Extend Penalty")),
            gap=int(g("Gap penalty")),
            min_socs=int(g("Minimal Number of SoCs")),
            do_heuristics=not bool(g("Disable All Heuristics")),
            switch_qlen=int(g("Harmonization Score Drop-off - Minimal Query Length")),
            score_tolerance=float(g("SoC Score Drop-off")),
            harm_score_min=int(g("Minimal Harmonization Score")),
            harm_score_min_rel=float(g("Relative Minimal Harmonization Score")),
            score_diff_tolerance=float(g("Harmonization Drop-off A - Score Difference")),
            max_lookahead=int(g("Harmonization Drop-off B - Lookahead")),
            max_delta_dist=float(g("Artifact Filter A - Maximal Delta Distance")),
            min_delta_dist=int(g("Artifact Filter B - Minimal Delta Distance")),
            min_genome_size=int(g("Minimum Genome Size for Heuristics")),
            # short reads carry few seeds/SoCs: fewer RANSAC candidate pairs
            # and a shallower harmonized-SoC stack keep the [B,K,2,P,3M]
            # guide-line tensor small without changing long-read behavior;
            # very long reads (PacBio/ONT) also drop to 4 candidates or the
            # guide-line tensor goes to GBs
            n_cand=4 if (L <= 256 or L >= 8192) else 8,
            # >= 8 kb drops back to 16 harmonized SoCs: the guide-line /
            # window-extract tensors scale with K x seeds_per_soc and the
            # unrolled program at K=30, M=4096 overwhelms the compiler
            max_socs_harm=min(
                max_socs,
                8 if L <= 256 else (16 if (L <= 1024 or L >= 8192) else max_socs),
            ),
        )


def _harm_pack_core(harm: HarmBatch, overflow=None, max_sets: int = 0):
    """Device-side CSR compaction of a HarmBatch for the host transfer.

    The tunnel moves ~30 MB/s, so the raw [B, G, M] seed planes (~26 MB per
    batch) were a hidden serial cost. Valid seeds of valid sets are
    compacted into one flat [3, B*G*M] buffer in (b, g, m) row-major order;
    the host downloads per-set counts (small) plus only the populated
    prefix (~0.5 MB) and reconstructs per-set slices from the counts.

    `max_sets` > 0 also folds the old compact_harm step in here: only the
    first max_sets VALID sets per read survive (same truncation the gather-
    based compact_harm applied), and the meta rows are emitted compacted to
    [B, max_sets]. Doing it in the pack's own sort is ~50 ms cheaper per
    4096-read batch than compact_harm's middle-axis take_along_axis gathers
    plus a 786k-update scatter (profiling/profile_stage_r5.py)."""
    B, G, M = harm.q_start.shape
    N = B * G * M
    GM = G * M
    set_ok = harm.set_valid
    if max_sets and max_sets < G:
        # rank valid sets per read; drop ranks >= max_sets (compact_harm's
        # truncation, previously applied after a reorder-to-front)
        rank = jnp.cumsum(set_ok.astype(jnp.int32), axis=1) - 1
        set_ok = set_ok & (rank < max_sets)
    G_out = min(max_sets, G) if max_sets else G
    seed_ok = harm.valid & set_ok[:, :, None]
    # compact each read's valid seeds to a row prefix with ONE minor-axis
    # sort (stability keeps the required (g, m) order) ...
    ok2 = seed_ok.reshape(B, GM)
    col = jnp.broadcast_to(jnp.arange(GM, dtype=jnp.int32)[None, :], (B, GM))
    key = jnp.where(ok2, col, jnp.int32(GM))
    # (q_start, length) both fit 16 bits (L <= 32k): ship them packed in one
    # int32 plane — one fewer sort operand here AND 1/3 fewer d2h bytes (the
    # tunnel is the pipeline's bottleneck; see plan_batch's unpack)
    ql = (harm.q_start.astype(jnp.int32) << 16) | harm.length.astype(jnp.int32)
    _, cql, cr = jax.lax.sort(
        (key, ql.reshape(B, GM), harm.ref_start.reshape(B, GM)),
        num_keys=1, is_stable=True,
    )
    cnt = ok2.sum(axis=1, dtype=jnp.int32)

    # ... then compact across reads with ONE flat stable sort by the valid
    # bit: it moves every valid prefix entry to the buffer front in (b, w)
    # order == global CSR order. A scatter here costs ~30 ms (TPU scatters
    # serialize on the update count); the flat sort is ~1 ms. The common
    # branch sorts only a fixed W-wide prefix per read; rows with more
    # than W valid seeds (rare: repetitive reads) take the full width.
    def _compact(width):
        def go(_):
            w = jnp.arange(width, dtype=jnp.int32)[None, :]
            validf = (w < cnt[:, None]).reshape(-1)
            fkey = jnp.where(validf, jnp.int32(0), jnp.int32(1))
            _, sql, sr = jax.lax.sort(
                (
                    fkey,
                    cql[:, :width].reshape(-1),
                    cr[:, :width].reshape(-1),
                ),
                num_keys=1,
                is_stable=True,
            )
            out = jnp.stack([sql, sr])
            if width * B < N:
                out = jnp.concatenate(
                    [out, jnp.zeros((2, N - width * B), jnp.int32)], axis=1
                )
            return out

        return go

    W = min(GM, 64)
    out = jax.lax.cond(jnp.any(cnt > W), _compact(GM), _compact(W), None)
    n_seeds = seed_ok.sum(axis=2, dtype=jnp.int32)
    if overflow is None:
        overflow = jnp.zeros((B,), bool)
    # ONE int32 word per set (the old 4 x int16 rows were 256 KB/batch over
    # a ~5 MB/s tunnel): bit0 = set_valid, bit1 = per-read capacity-overflow
    # flag (seed slots, minimizer lanes, or a SoC window wider than
    # seeds_per_soc — the host counts these so fixed-shape truncation is
    # observable, ADVICE r3), bits2-9 = soc_of (< 256), bits10+ = n_seeds
    mw = (
        set_ok.astype(jnp.int32)
        | (overflow.astype(jnp.int32)[:, None] << 1)
        | (harm.soc_of.astype(jnp.int32) << 2)
        | (n_seeds << 10)
    )
    if G_out < G:
        # compact the per-set meta words to [B, G_out] (valid sets first,
        # original order preserved) with one cheap [B, G] minor sort
        key2 = jnp.where(set_ok, jnp.int32(0), jnp.int32(1))
        _, mw = jax.lax.sort((key2, mw), num_keys=1, is_stable=True)
        mw = mw[:, :G_out]
    return out, mw.reshape(B * G_out)


# standalone jitted variant (used when a HarmBatch arrives without its
# packed form, e.g. from a custom device stage)
_harm_pack = jax.jit(_harm_pack_core)


@functools.partial(jax.jit, static_argnums=(2,))
def _unpack_codes_mask(pk, nm, L: int):
    """[B, L/4] 2-bit-packed bases + [B, L/8] N-bitmask -> [B, L] uint8
    codes (0-3, 4 = N). The tunnel moves ~30 MB/s: shipping reads packed
    cuts the per-batch h2d from L to 0.375*L bytes/read."""
    B = pk.shape[0]
    sh2 = (jnp.arange(4, dtype=jnp.uint8) * 2)[None, None, :]
    codes = ((pk[:, :, None] >> sh2) & 3).reshape(B, L)
    sh1 = jnp.arange(8, dtype=jnp.uint8)[None, None, :]
    nbit = ((nm[:, :, None] >> sh1) & 1).reshape(B, L)
    return jnp.where(nbit != 0, jnp.uint8(4), codes).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnums=(2,))
def _unpack_codes_nolens(pk, lens, L: int):
    """N-free fast path: padding (the only N source) is recovered from the
    read lengths on device, so the N-bitmask (L/8 bytes/read, all marking
    padding) never crosses the tunnel — 1/3 of the h2d bytes."""
    B = pk.shape[0]
    sh2 = (jnp.arange(4, dtype=jnp.uint8) * 2)[None, None, :]
    codes = ((pk[:, :, None] >> sh2) & 3).reshape(B, L)
    pad = jnp.arange(L, dtype=jnp.int32)[None, :] >= lens[:, None]
    return jnp.where(pad, jnp.uint8(4), codes).astype(jnp.uint8)


def upload_codes_packed(seqs: np.ndarray, lens: np.ndarray = None):
    """Host 2-bit pack + device unpack (shared by the aligner and the MSV
    seed stage); falls back to a raw upload for lengths that don't pack
    cleanly."""
    B, L = seqs.shape
    if L % 8:
        return jnp.asarray(seqs)
    base = (seqs & 3).astype(np.uint8)
    pk = (
        base[:, 0::4]
        | (base[:, 1::4] << 2)
        | (base[:, 2::4] << 4)
        | (base[:, 3::4] << 6)
    )
    isn = seqs >= 4
    if lens is not None:
        # reads almost never contain in-read Ns; when none do, the mask is
        # derivable from lens and stays on the host
        inread_n = isn & (np.arange(L)[None, :] < np.asarray(lens)[:, None])
        if not inread_n.any():
            return _unpack_codes_nolens(
                jnp.asarray(pk), jnp.asarray(lens, np.int32), L
            )
    nm = np.packbits(isn, axis=1, bitorder="little")
    return _unpack_codes_mask(jnp.asarray(pk), jnp.asarray(nm), L)



def _batch_overflow(cfg, soc):
    """Per-read overflow flag: any upstream fixed-shape overflow (seed
    slots / minimizer lanes, SoCBatch.overflow) OR a selected SoC window
    wider than seeds_per_soc — harmonization's window extract truncates
    such windows silently otherwise (ADVICE r3: repetitive reads)."""
    K = min(cfg.max_socs_harm, soc.start.shape[1])
    sel = jnp.arange(K)[None, :] < jnp.minimum(soc.n_socs, K)[:, None]
    wide = sel & ((soc.end[:, :K] - soc.start[:, :K]) > cfg.seeds_per_soc)
    return soc.overflow | wide.any(axis=1)

def _soc_min_score(cfg, lens, genome_text_len):
    """SoC give-up threshold fMinLen (stripOfConsideration.cpp:21-23):
    max(rel * qlen, harm_score_min) for large genomes, 0 otherwise."""
    rel = jnp.maximum(
        (cfg.harm_score_min_rel * lens.astype(jnp.float32)).astype(jnp.int32),
        jnp.int32(cfg.harm_score_min),
    )
    big = genome_text_len >= cfg.min_genome_size
    return jnp.where(big, rel, 0)


@functools.partial(jax.jit, static_argnums=(0,))
def device_stage_from_seeds(
    cfg: "DeviceStageConfig",
    contig_starts: jax.Array,
    ref_len_forward,
    seeds,  # SeedBatch (delta may be unset; recomputed here)
    lens: jax.Array,
) -> Tuple[HarmBatch, SoCBatch]:
    """SoC + harmonization from an externally built SeedBatch (host MEM
    seeding path; also the generic hook for custom seeders)."""
    from ma_tpu.ops.extract import compute_delta

    delta = compute_delta(
        seeds.q_start,
        seeds.length,
        seeds.ref_start,
        seeds.on_forward,
        lens[:, None],
        contig_starts,
        ref_len_forward,
        cfg.rectangular,
    )
    INT_MAX = jnp.int32(2**31 - 1)
    seeds = seeds._replace(delta=jnp.where(seeds.valid, delta, INT_MAX))
    soc = soc_collect(
        seeds,
        lens,
        contig_starts,
        match=cfg.match,
        extend=cfg.extend,
        gap=cfg.gap,
        fixed_width=cfg.fixed_soc_width,
        rectangular=cfg.rectangular,
        min_score=_soc_min_score(cfg, lens, 2 * ref_len_forward),
        max_socs=cfg.max_socs_collect,
    )
    harm = harmonization(
        soc,
        lens,
        text_len=2 * ref_len_forward,
        max_socs=cfg.max_socs_harm,
        min_socs=cfg.min_socs,
        seeds_per_soc=cfg.seeds_per_soc,
        do_heuristics=cfg.do_heuristics,
        switch_qlen=cfg.switch_qlen,
        score_tolerance=cfg.score_tolerance,
        harm_score_min=cfg.harm_score_min,
        harm_score_min_rel=cfg.harm_score_min_rel,
        score_diff_tolerance=cfg.score_diff_tolerance,
        max_lookahead=cfg.max_lookahead,
        max_delta_dist=cfg.max_delta_dist,
        min_delta_dist=cfg.min_delta_dist,
        n_cand=cfg.n_cand,
    )
    data, meta = _harm_pack_core(
        harm, _batch_overflow(cfg, soc), cfg.max_out_sets
    )
    return harm, soc, data, meta


@functools.partial(jax.jit, static_argnums=(0,))
def device_stage_mm(
    cfg: "DeviceStageConfig",
    mmi,  # MinimizerIndexDev
    contig_starts: jax.Array,
    ref_len_forward: int,
    seqs: jax.Array,
    lens: jax.Array,
) -> Tuple[HarmBatch, SoCBatch]:
    """Minimizer fast path: sketch + one batched sorted-array lookup replaces
    the sequential FM chain (the TPU-native throughput path; reference
    equivalent: MinimizerSeeding -> SeedLumping -> StripOfConsiderationSeeds,
    computeSvJumps.py:52-86 uses the same shape).
    """
    from ma_tpu.index.minimizer import minimizer_seeding
    from ma_tpu.ops.filters import min_length, seed_lump

    seeds = minimizer_seeding(
        mmi,
        seqs,
        lens,
        contig_starts,
        ref_len_forward,
        k=cfg.mm_k,
        w=cfg.mm_w,
        max_occ=cfg.max_ambiguity,
        max_seeds=cfg.max_seeds,
        rectangular=cfg.rectangular,
    )
    seeds = seed_lump(seeds)
    seeds = min_length(seeds, cfg.min_seed_len)
    soc = soc_collect(
        seeds,
        lens,
        contig_starts,
        match=cfg.match,
        extend=cfg.extend,
        gap=cfg.gap,
        fixed_width=cfg.fixed_soc_width,
        rectangular=cfg.rectangular,
        min_score=_soc_min_score(cfg, lens, 2 * ref_len_forward),
        max_socs=cfg.max_socs_collect,
    )
    harm = harmonization(
        soc,
        lens,
        text_len=2 * ref_len_forward,
        max_socs=cfg.max_socs_harm,
        min_socs=cfg.min_socs,
        seeds_per_soc=cfg.seeds_per_soc,
        do_heuristics=cfg.do_heuristics,
        switch_qlen=cfg.switch_qlen,
        score_tolerance=cfg.score_tolerance,
        harm_score_min=cfg.harm_score_min,
        harm_score_min_rel=cfg.harm_score_min_rel,
        score_diff_tolerance=cfg.score_diff_tolerance,
        max_lookahead=cfg.max_lookahead,
        max_delta_dist=cfg.max_delta_dist,
        min_delta_dist=cfg.min_delta_dist,
        n_cand=cfg.n_cand,
    )
    data, meta = _harm_pack_core(
        harm, _batch_overflow(cfg, soc), cfg.max_out_sets
    )
    return harm, soc, data, meta


@functools.partial(jax.jit, static_argnums=(0,))
def device_stage(
    cfg: DeviceStageConfig,
    fmd: FMDDev,
    contig_starts: jax.Array,
    seqs: jax.Array,  # int32/uint8 [B, L]
    lens: jax.Array,  # int32 [B]
) -> Tuple[HarmBatch, SoCBatch]:
    """The on-device portion of the pipeline: one XLA program per bucket
    shape. Returns harmonized seed sets + the SoC batch (for stats)."""
    seed_fn = smem_seeding if cfg.seeding_technique == "SMEMs" else max_spanning_seeding
    segs = seed_fn(
        fmd,
        seqs,
        lens,
        max_segs=cfg.max_segs,
        min_ambiguity=cfg.min_ambiguity,
        max_ambiguity=cfg.max_ambiguity,
    )
    seeds = extract_seeds(
        fmd,
        segs,
        lens,
        contig_starts,
        max_seeds=cfg.max_seeds,
        max_ambiguity=cfg.max_ambiguity,
        min_seed_len=cfg.min_seed_len,
        skip_ambiguous=cfg.skip_ambiguous,
        rectangular=cfg.rectangular,
    )
    soc = soc_collect(
        seeds,
        lens,
        contig_starts,
        match=cfg.match,
        extend=cfg.extend,
        gap=cfg.gap,
        fixed_width=cfg.fixed_soc_width,
        rectangular=cfg.rectangular,
        min_score=_soc_min_score(cfg, lens, fmd.n),
        max_socs=cfg.max_socs_collect,
    )
    harm = harmonization(
        soc,
        lens,
        text_len=fmd.n,
        max_socs=cfg.max_socs_harm,
        min_socs=cfg.min_socs,
        seeds_per_soc=cfg.seeds_per_soc,
        do_heuristics=cfg.do_heuristics,
        switch_qlen=cfg.switch_qlen,
        score_tolerance=cfg.score_tolerance,
        harm_score_min=cfg.harm_score_min,
        harm_score_min_rel=cfg.harm_score_min_rel,
        score_diff_tolerance=cfg.score_diff_tolerance,
        max_lookahead=cfg.max_lookahead,
        max_delta_dist=cfg.max_delta_dist,
        min_delta_dist=cfg.min_delta_dist,
        n_cand=cfg.n_cand,
    )
    data, meta = _harm_pack_core(
        harm, _batch_overflow(cfg, soc), cfg.max_out_sets
    )
    return harm, soc, data, meta


class Aligner:
    """One-stop single-end aligner over a Pack + FMDIndex."""

    def __init__(
        self,
        pack: Pack,
        fmd: FMDIndex,
        params: ParameterSetManager | ParameterSet | None = None,
        sharding=None,
        index_prefix: str | None = None,
    ):
        if params is None:
            params = ParameterSetManager()
        self.pset: ParameterSet = (
            params.selected if isinstance(params, ParameterSetManager) else params
        )
        self.pack = pack
        self.fmd_host = fmd
        self.dev = FMDDev.from_host(fmd)
        self.contig_starts = jnp.asarray(np.asarray(pack.starts, np.int32))
        self.sharding = sharding  # optional jax.sharding.NamedSharding for [B, L]
        self.nw_cfg = NWConfig(self.pset)
        self._mmi_dev = None
        self._index_prefix = index_prefix
        self.profiler: AnalyzeRuntimes | None = None
        self._text_dev = None
        # reads whose fixed-shape capacities truncated work this run (seed
        # slots, minimizer lanes, or SoC windows > seeds_per_soc) — the
        # overflow consumer ADVICE r3 asked for; surfaced by the CLI
        self.n_overflow_reads = 0
        # overflow rescue (VERDICT r4 #7): flagged reads re-align through a
        # cap_boost'ed device stage instead of keeping truncated results
        self.cap_boost = 1
        self.rescue_overflow = os.environ.get("MA_TPU_RESCUE", "1") == "1"
        self.n_rescued_reads = 0
        self._in_rescue = False

    @property
    def text_dev(self):
        """Folded genome codes [2L] uint8 on device (fwd || revcomp), so DP
        ref windows are sliced on device instead of shipped per problem
        through the ~25 MB/s tunnel (see ops/dp.py _dp_tb_desc)."""
        if self._text_dev is None:
            self._text_dev = jnp.asarray(self.text_host)
        return self._text_dev

    @property
    def text_host(self):
        """Host copy of the folded genome codes (used by the native finish
        stage's =/X splitting; identical bytes to text_dev)."""
        if getattr(self, "_text_host", None) is None:
            from ma_tpu.containers.nucseq import revcomp_codes

            codes = np.asarray(self.pack.codes, np.uint8)
            text = np.concatenate([codes, revcomp_codes(codes)])
            pad = (-len(text)) % 128  # misaligned transfers are ~100x slower
            if pad:
                text = np.concatenate([text, np.full(pad, 4, np.uint8)])
            self._text_host = text
        return self._text_host

    def _mem_seed_batch(self, seqs: np.ndarray, lens: np.ndarray, cfg):
        """Host MEM seeding -> SeedBatch (memExtension is an O(L^2) host
        comparison mode; see ma_tpu/ops/mem_seeding.py)."""
        from ma_tpu.ops.extract import SeedBatch
        from ma_tpu.ops.mem_seeding import materialize_mem_seeds, mem_seeding

        B = seqs.shape[0]
        S = cfg.max_seeds
        q = np.zeros((B, S), np.int32)
        l = np.zeros((B, S), np.int32)
        r = np.zeros((B, S), np.int32)
        fw = np.zeros((B, S), bool)
        amb = np.zeros((B, S), np.int32)
        valid = np.zeros((B, S), bool)
        n_seeds = np.zeros(B, np.int32)
        overflow = np.zeros(B, bool)
        for b in range(B):
            segs = mem_seeding(
                self.fmd_host, seqs[b, : lens[b]],
                min_seed_size=cfg.min_seed_len - 1,
                min_ambiguity=cfg.min_ambiguity,
                max_ambiguity=cfg.max_ambiguity,
            )
            tuples = materialize_mem_seeds(self.fmd_host, segs, cfg.max_ambiguity)
            if len(tuples) > S:
                overflow[b] = True
                tuples = tuples[:S]
            for m, (qs, ln, rs, f, a) in enumerate(tuples):
                q[b, m], l[b, m], r[b, m], fw[b, m], amb[b, m] = qs, ln, rs, f, a
                valid[b, m] = True
            n_seeds[b] = len(tuples)
        z = jnp.zeros((B, S), jnp.int32)
        return SeedBatch(
            q_start=jnp.asarray(q), length=jnp.asarray(l), ref_start=jnp.asarray(r),
            on_forward=jnp.asarray(fw), ambiguity=jnp.asarray(amb),
            delta=z, soc_nt=z, valid=jnp.asarray(valid),
            n_seeds=jnp.asarray(n_seeds), overflow=jnp.asarray(overflow),
        )

    def mmi_dev(self, cfg):
        """Lazily build (or reuse) the device minimizer index."""
        if self._mmi_dev is None:
            from ma_tpu.index.minimizer import MinimizerIndex

            mmi = None
            if self._index_prefix and MinimizerIndex.exists(self._index_prefix):
                stored = MinimizerIndex.load(self._index_prefix)
                if stored.k == cfg.mm_k and stored.w == cfg.mm_w:
                    mmi = stored
            if mmi is None:
                mmi = MinimizerIndex.build(self.pack, k=cfg.mm_k, w=cfg.mm_w)
            self._mmi_dev = mmi.to_device()
        return self._mmi_dev

    # ----------------------------------------------------------------- device
    DATA_HEAD_CAP = 8192  # packed-seed prefix shipped eagerly per batch

    def _upload_codes(self, seqs: np.ndarray, lens: np.ndarray = None):
        return upload_codes_packed(seqs, lens)

    def run_device_stage(self, seqs: np.ndarray, lens: np.ndarray):
        """Run the jitted device stage on a [B, L] batch of codes.

        Returns (harm, soc, packed_data, packed_meta, seqs_dev) — seqs_dev is
        the uploaded read batch, kept for descriptor-mode DP (ops/dp.py).
        The packed meta + a fixed-cap prefix of the packed data start their
        device->host copies immediately (copy_to_host_async), so the tunnel
        transfer overlaps the host work between dispatch and plan_batch."""
        cfg = DeviceStageConfig.from_params(
            self.pset, seqs.shape[1], cap_boost=self.cap_boost
        )
        seqs_j = self._upload_codes(seqs, lens)
        lens_j = jnp.asarray(lens, jnp.int32)
        if cfg.seeding_technique == "minimizers":
            seed_seqs_j = seqs_j
            thres = int(self.pset.get("Minimizers - SDUST Threshold"))
            if thres > 0:
                # SDUST query masking (role of mm_dust_minier,
                # libs/minimizerscpp/src/map.cpp:12-44): low-complexity
                # spans become N for SEEDING only — the DP still sees the
                # real bases (seqs_j). The reference ships with this off
                # (minimizer_index.h:73 sdust_thres = 0).
                from ma_tpu.ops.sdust import dust_mask_array

                seed_seqs = seqs.copy()
                for bi in range(len(seqs)):
                    Lr = int(lens[bi])
                    if Lr:
                        msk = dust_mask_array(seqs[bi, :Lr], T=thres)
                        seed_seqs[bi, :Lr][msk] = 4
                seed_seqs_j = self._upload_codes(seed_seqs, None)
            out = device_stage_mm(
                cfg, self.mmi_dev(cfg), self.contig_starts,
                self.pack.unpacked_size_forward_strand, seed_seqs_j, lens_j,
            )
        elif cfg.seeding_technique == "MEMs":
            out = device_stage_from_seeds(
                cfg, self.contig_starts,
                self.pack.unpacked_size_forward_strand,
                self._mem_seed_batch(seqs, lens, cfg), lens_j,
            )
        else:
            if self.sharding is not None:
                from jax.sharding import NamedSharding, PartitionSpec

                batch_axis = self.sharding.spec[0]
                seqs_j = jax.device_put(seqs_j, self.sharding)
                lens_j = jax.device_put(
                    lens_j,
                    NamedSharding(self.sharding.mesh, PartitionSpec(batch_axis)),
                )
            out = device_stage(cfg, self.dev, self.contig_starts, seqs_j, lens_j)
        harm, soc, data, meta = out
        data_head = data[:, : min(self.DATA_HEAD_CAP, data.shape[1])]
        for arr in (meta, data_head):
            try:
                arr.copy_to_host_async()
            except Exception:
                pass
        return (harm, soc, data, meta, data_head, seqs_j)

    # ------------------------------------------------------------------- host
    def align_batch(
        self, reads: Sequence[NucSeq], pad_to: int = 0
    ) -> List[List[Alignment]]:
        """Align a batch of reads (any lengths; padded to one bucket).
        `pad_to` pads the batch dim with empty rows (rescue passes use a
        fixed small batch so the boosted stage compiles once)."""
        if not reads:
            return []
        B = len(reads)
        if pad_to:
            while pad_to < B:
                pad_to *= 2
            B = pad_to
        L = _next_pow2(max(len(r) for r in reads))
        seqs = np.full((B, L), 4, np.uint8)
        lens = np.zeros(B, np.int32)
        for i, r in enumerate(reads):
            seqs[i, : len(r)] = r.codes
            lens[i] = len(r)
        with stage_timer(self.profiler, "device seed+soc+harmonize"):
            harm, soc, data, meta, data_head, seqs_dev = self.run_device_stage(
                seqs, lens
            )
            jax.block_until_ready(meta)
        return self.finish_batch(reads, harm, data, meta, seqs_dev, seqs, data_head)

    def plan_batch(
        self, reads: Sequence[NucSeq], harm: HarmBatch, data_d=None, meta_d=None,
        seqs_dev=None, seqs_np=None, data_head=None,
    ):
        """First host half: wait for the device stage's packed output, plan
        DP problems and DISPATCH them (async). Returns an opaque pending
        state for collect_batch. Splitting here lets the caller enqueue the
        next batch's device stage behind this batch's DP programs."""
        nw = NWAligner(
            self.pack, self.nw_cfg, profiler=self.profiler,
            text_dev=self.text_dev if seqs_dev is not None else None,
            seqs_dev=seqs_dev,
            text_host=self.text_host if seqs_dev is not None else None,
            seqs_np=seqs_np,
        )
        with stage_timer(self.profiler, "device stage wait"):
            if data_d is None:
                data_d, meta_d = _harm_pack(harm)
            # meta word: bit0 valid, bit1 overflow, bits2-9 soc_of,
            # bits10+ n_seeds (see _harm_pack_core)
            mw = np.asarray(meta_d).reshape(-1)
            B = harm.q_start.shape[0]
            G = mw.size // B
            mw = mw.reshape(B, G)
            hsv = (mw & 1).astype(bool)
            hsoc = ((mw >> 2) & 255).astype(np.int32)
            hn = (mw >> 10).astype(np.int32)
            oflags = ((mw[:, 0] >> 1) & 1).astype(bool)  # ADVICE r3 consumer
            nw.overflow_flags = oflags
            if not self._in_rescue:
                self.n_overflow_reads += int(oflags.sum())
            total = int(hn.sum())
            if data_head is not None and total <= data_head.shape[1]:
                # common case: the fixed-cap prefix whose d2h copy was
                # started at dispatch already holds every packed seed
                hqlr = np.asarray(data_head)
            else:
                # download only the populated prefix, rounded to a small
                # fixed set of widths (every distinct shape is a program)
                cap = 4096
                while cap < total:
                    cap *= 2
                cap = min(cap, data_d.shape[1])
                hqlr = np.asarray(data_d[:, :cap])
        # data row0 = q_start << 16 | length, row1 = ref_start
        hq, hl, hr = hqlr[0] >> 16, hqlr[0] & 0xFFFF, hqlr[1]
        if seqs_np is not None and nw.desc_mode and self._use_native_finish():
            out = self._plan_native(
                reads, nw, seqs_np, hq, hl, hr, hn, hsv, hsoc
            )
            if out is not None:
                return out
        offs = np.concatenate(([0], np.cumsum(hn.reshape(-1))))
        plans: List[Tuple[int, int, tuple]] = []
        t_plan = stage_timer(self.profiler, "host DP planning")
        t_plan.__enter__()
        for b in range(len(reads)):
            codes = reads[b].codes
            for gset in np.nonzero(hsv[b])[0]:
                s, e = offs[b * G + gset], offs[b * G + gset + 1]
                if s == e:
                    continue
                ss = [
                    (int(hq[m]), int(hl[m]), int(hr[m])) for m in range(s, e)
                ]
                out = nw.plan_set(codes, ss, read_idx=b)
                if out is not None:
                    plans.append((b, int(hsoc[b, gset]), out))
        t_plan.__exit__(None, None, None)
        nw.dispatch_batches()  # async; timed as "dp dispatch" internally
        return reads, nw, plans

    def _use_native_finish(self) -> bool:
        """Native C++ plan/assemble (pipeline/finish_native.py): default on
        accelerators with the fused DP kernel; MA_TPU_FINISH overrides
        (native|python)."""
        import os

        mode = os.environ.get("MA_TPU_FINISH", "auto")
        if mode == "python":
            return False
        on_accel = jax.devices()[0].platform != "cpu"
        dp_kernel = os.environ.get("MA_TPU_DP") or (
            "fused" if on_accel else "rows"
        )
        if dp_kernel != "fused":
            return False
        from ma_tpu.pipeline import finish_native

        if mode == "native":
            return finish_native.available()
        return on_accel and finish_native.available()

    def _plan_native(self, reads, nw, seqs_np, hq, hl, hr, hn, hsv, hsoc):
        """C++ planning + vectorized fused-DP dispatch. Returns the pending
        tuple, or None to fall back to the Python path (e.g. long reads
        whose problems exceed the fused buckets)."""
        from ma_tpu.ops.dp import _dp_desc_runs_fused
        from ma_tpu.pipeline import finish_native

        B, G = hn.shape
        flat_n = hn.reshape(-1)
        sel = np.flatnonzero(flat_n)  # candidate sets (hsv=False have n=0)
        t_plan = stage_timer(self.profiler, "host DP planning")
        t_plan.__enter__()
        set_off = np.zeros(len(sel) + 1, np.int64)
        np.cumsum(flat_n[sel], out=set_off[1:])
        set_read = (sel // G).astype(np.int32)
        set_soc = hsoc.reshape(-1)[sel].astype(np.int32)
        planned = finish_native.plan(
            self.pack, nw.cfg, reads,
            seqs_np, np.ascontiguousarray(hq, np.int32),
            np.ascontiguousarray(hl, np.int32),
            np.ascontiguousarray(hr, np.int32), set_off, set_read, set_soc,
        )
        t_plan.__exit__(None, None, None)
        if planned is None:
            return None
        desc, toks, sbr = planned
        n_prob = len(desc)
        if n_prob and (
            int(desc[:, 2].max(initial=0)) > 256
            or int(desc[:, 5].max(initial=0)) > 768
        ):
            return None  # long-read problems: Python path
        # ---- vectorized bucketing + dispatch (desc rows only, no objects)
        launched = []
        with stage_timer(self.profiler, "dp dispatch"):
            if n_prob:
                m = np.maximum(desc[:, 2], 1)
                n = np.maximum(desc[:, 5], 1)
                isg = desc[:, 8]
                Nb = np.where(n <= 128, 128, 768)
                Mb = np.select([m <= 32, m <= 64], [32, 64], 256)
                Mb = np.where((Nb == 768) & (Mb < 64), 64, Mb)
                key = Mb.astype(np.int64) * 10000 + Nb * 4 + isg * 2
                order = np.lexsort((m, key))
                skey = key[order]
                bounds = np.flatnonzero(
                    np.concatenate(([True], skey[1:] != skey[:-1]))
                )
                bounds = np.concatenate((bounds, [n_prob]))
                MAXP = NWAligner.MAX_P_FUSED
                on_accel = jax.devices()[0].platform != "cpu"
                for bi in range(len(bounds) - 1):
                    rows_all = order[bounds[bi] : bounds[bi + 1]]
                    Mv, Nv = int(Mb[rows_all[0]]), int(Nb[rows_all[0]])
                    is_glob = bool(isg[rows_all[0]])
                    for s in range(0, len(rows_all), MAXP):
                        rows = rows_all[s : s + MAXP]
                        P = MAXP if on_accel else max(64, 1 << int(
                            np.ceil(np.log2(len(rows)))
                        ))
                        d8 = np.zeros((8, P), np.int32)
                        d8[2] = 1
                        d8[5] = 1
                        d8[7] = 1
                        d8[:, : len(rows)] = desc[rows, :8].T
                        out = _dp_desc_runs_fused(
                            self.text_dev, nw.seqs_dev, jnp.asarray(d8),
                            M=Mv, N=Nv, params=nw.cfg.params,
                            zdrop=-1 if is_glob else nw.cfg.zdrop,
                            is_global=is_glob,
                        )
                        # download only the populated column prefix (pow2-
                        # padded: few distinct slice programs) and start the
                        # d2h copy NOW so it overlaps host work until collect
                        Kp = 256
                        while Kp < len(rows):
                            Kp *= 2
                        comb_s = out[0][:, : min(Kp, out[0].shape[1])]
                        try:
                            comb_s.copy_to_host_async()
                        except Exception:
                            pass
                        launched.append((rows, is_glob, out, comb_s))
        state = (reads, nw, desc, toks, sbr, set_read, set_soc, seqs_np,
                 launched)
        return ("native", state)

    def _assemble_native(self, state):
        """Shared native-collect front half: wait for DP runs, run the C++
        assembler. Returns (reads, nw, set_read, set_soc, seqs_np, out_op,
        out_len, out_off, out_meta)."""
        from ma_tpu.ops.dp import RUNS_HEAD
        from ma_tpu.pipeline import finish_native

        (reads, nw, desc, toks, sbr, set_read, set_soc, seqs_np,
         launched) = state
        n_prob = len(desc)
        prob_nr = np.zeros(n_prob, np.int64)
        fwd_ops: List[Optional[np.ndarray]] = [None] * len(launched)
        with stage_timer(self.profiler, "device banded DP + traceback"):
            # one device_get over every bucket's combined int16 output (a
            # per-batch on-device concat would recompile for each distinct
            # bucket combination); the copies were started at dispatch
            if launched:
                combs_np = jax.device_get(
                    [comb_s for (_, _, _, comb_s) in launched]
                )
                comb_np = np.concatenate(
                    [np.asarray(c) for c in combs_np], axis=1
                ).astype(np.int32)
            prob_meta = np.full((max(n_prob, 1), 2), -1, np.int64)
            runs_rows = []
            off = 0
            for li, (rows, is_glob, out, comb_s) in enumerate(launched):
                P = comb_s.shape[1]
                comb = comb_np[:, off : off + P]
                off += P
                K = len(rows)
                n_runs = comb[0, :K]
                over = comb[5, :K]
                smax = int(n_runs.max(initial=0))
                if smax > RUNS_HEAD:
                    runs_t = np.asarray(out[1][:smax])[:, :K]
                else:
                    runs_t = comb[8 : 8 + max(1, smax), :K]
                prob_nr[rows] = n_runs
                prob_meta[rows, 0] = comb[2, :K]
                prob_meta[rows, 1] = comb[3, :K]
                # forward-order runs [K, smax]
                jj = np.arange(max(1, smax))[None, :]
                idx = np.clip(n_runs[:, None] - 1 - jj, 0, max(smax - 1, 0))
                fwd = np.take_along_axis(runs_t.T, idx, axis=1)
                fwd = np.where(jj < n_runs[:, None], fwd, 0)
                fwd_ops[li] = fwd
                if over.any():
                    for k in np.flatnonzero(over):
                        cig = self._redo_native(nw, desc[rows[k]], is_glob)
                        arr = np.asarray(
                            [(o | (l << 2)) for (o, l) in cig], np.int64
                        )
                        pad = np.zeros(max(1, smax), np.int64)
                        if len(arr) > len(pad):
                            pad = np.zeros(len(arr), np.int64)
                            # widen this bucket's rows
                            wider = np.zeros((K, len(arr)), np.int64)
                            wider[:, : fwd.shape[1]] = fwd
                            fwd = wider
                            fwd_ops[li] = fwd
                        pad[: len(arr)] = arr
                        fwd[k] = pad
                        prob_nr[rows[k]] = len(arr)
            # global CSR over problems in row order
            tot = int(prob_nr.sum())
            prob_off = np.zeros(n_prob + 1, np.int64)
            np.cumsum(prob_nr, out=prob_off[1:])
            prob_runs = np.zeros((tot, 2), np.int32)
            for li, (rows, is_glob, out, _comb_s) in enumerate(launched):
                fwd = fwd_ops[li]
                if fwd is None:
                    continue
                nr = prob_nr[rows]
                mask = np.arange(fwd.shape[1])[None, :] < nr[:, None]
                vals = fwd[mask]
                dest = (prob_off[rows][:, None] + np.arange(fwd.shape[1])[None, :])[mask]
                prob_runs[dest, 0] = vals & 3
                prob_runs[dest, 1] = vals >> 2
        with stage_timer(self.profiler, "host CIGAR assembly"):
            out_op, out_len, out_off, out_meta = finish_native.assemble(
                toks, sbr, set_read, prob_runs, prob_off, prob_meta,
                self.text_host, seqs_np, nw.cfg.params, nw.cfg.sv_penalty,
            )
        return (reads, nw, set_read, set_soc, seqs_np, out_op, out_len,
                out_off, out_meta)

    def _collect_native(self, state) -> List[List[Alignment]]:
        from ma_tpu.pipeline import finish_native

        (reads, nw, set_read, set_soc, seqs_np, out_op, out_len, out_off,
         out_meta) = self._assemble_native(state)
        with stage_timer(self.profiler, "host CIGAR assembly"):
            per_read = finish_native.build_alignments(
                out_op, out_len, out_off, out_meta, set_read, set_soc, reads,
                nw.cfg.params, nw.cfg.sv_penalty,
            )
        return self._quality_phase(reads, per_read)

    def native_sam_enabled(self) -> bool:
        """True when the whole post-DP tail (mapping quality + SAM records)
        can run in C++ (native/samout.cpp): plain record path only —
        NGMLR tag emulation and SmallInversions need the object path.
        MA_TPU_SAM overrides (native|python)."""
        import os

        mode = os.environ.get("MA_TPU_SAM", "auto")
        if mode == "python":
            return False
        pset = self.pset
        if bool(pset.get("Emulate NGMLR's tag output")):
            return False
        if bool(pset.get("Detect Small Inversions")):
            return False
        from ma_tpu.pipeline import finish_native

        if not finish_native.sam_available():
            return False
        return True

    def _collect_native_sam(self, state, omit_sec: bool, omit_sup: bool):
        """Native-tail collect: returns ("sam", bytes, n_recs) on success,
        or ("objects", per-read alignments) when samout falls back."""
        from ma_tpu.pipeline import finish_native

        (reads, nw, set_read, set_soc, seqs_np, out_op, out_len, out_off,
         out_meta) = self._assemble_native(state)
        pset = self.pset
        with stage_timer(self.profiler, "host SAM write"):
            res = finish_native.emit_sam(
                out_op, out_len, out_off, out_meta, set_read, set_soc,
                reads, seqs_np, self.pack,
                match=int(pset.get("Match Score")),
                max_supplementary=int(pset.get("Number Supplementary Alignments")),
                max_overlap=float(pset.get("Maximal Supplementary Overlap")),
                report_n=int(pset.get("Maximal Number of Reported Alignments")),
                min_score=int(pset.get("Minimal Alignment Score")),
                soft_clip=bool(pset.get("Soft clip")),
                use_m=bool(pset.get("Use M in CIGAR")),
                omit_sec=omit_sec, omit_sup=omit_sup,
            )
        if res is not None:
            return ("sam", res[0], res[1])
        per_read = finish_native.build_alignments(
            out_op, out_len, out_off, out_meta, set_read, set_soc, reads,
            nw.cfg.params, nw.cfg.sv_penalty,
        )
        return ("objects", self._quality_phase(reads, per_read))

    def _redo_native(self, nw, desc_row, is_glob):
        """Run-buffer-overflow fallback for the native path (rare)."""
        from ma_tpu.pipeline.nw import DPProblem

        p = DPProblem(
            q=None, t=None, band=int(desc_row[7]), is_global=is_glob,
            read_idx=int(desc_row[0]), q_off=int(desc_row[1]),
            q_len=int(desc_row[2]), q_rev=int(desc_row[3]),
            t_start=int(desc_row[4]), t_len=int(desc_row[5]),
            t_rev=int(desc_row[6]),
        )
        nw._problems.append(p)
        return nw._redo_one(len(nw._problems) - 1, is_glob)

    def _maybe_rescue(self, reads, results, nw):
        """Overflow-rescue pass (VERDICT r4 #7): reads whose fixed-shape
        capacities truncated seeds/SoC windows re-align through a
        cap_boost'ed device stage; their capped results are replaced. The
        reference never truncates (binarySeeding.h:544-547)."""
        flags = getattr(nw, "overflow_flags", None)
        if (
            flags is None or self._in_rescue or not self.rescue_overflow
            or not flags.any()
        ):
            return results
        idx = [int(i) for i in np.flatnonzero(flags)
               if i < len(reads) and len(reads[i])]
        if not idx:
            return results
        self._in_rescue = True
        old = self.cap_boost
        self.cap_boost = max(4 * old, 4)
        try:
            res2 = self.align_batch([reads[i] for i in idx], pad_to=32)
            for k, i in enumerate(idx):
                results[i] = res2[k]
            self.n_rescued_reads += len(idx)
        finally:
            self.cap_boost = old
            self._in_rescue = False
        return results

    def collect_batch(self, pending) -> List[List[Alignment]]:
        """Second host half: wait for DP results, assemble alignments,
        mapping quality, small inversions."""
        if isinstance(pending, tuple) and len(pending) == 2 and pending[0] == "native":
            res = self._collect_native(pending[1])
            return self._maybe_rescue(pending[1][0], res, pending[1][1])
        reads, nw, plans = pending
        pset = self.pset
        with stage_timer(self.profiler, "device banded DP + traceback"):
            nw.collect_batches()
        per_read: List[List[Alignment]] = [[] for _ in reads]
        with stage_timer(self.profiler, "host CIGAR assembly"):
            for (b, strip, out) in plans:
                plan, begin_ref, ref = out
                aln = nw.assemble(plan, begin_ref, ref, reads[b].codes)
                aln.stats.index_of_strip = strip
                aln.stats.name = reads[b].name
                per_read[b].append(aln)
        return self._maybe_rescue(
            reads, self._quality_phase(reads, per_read), nw
        )

    def _quality_phase(self, reads, per_read) -> List[List[Alignment]]:
        """Mapping quality + small inversions (shared by both finish paths)."""
        pset = self.pset
        match = int(pset.get("Match Score"))
        max_supp = int(pset.get("Number Supplementary Alignments"))
        max_ov = float(pset.get("Maximal Supplementary Overlap"))
        report_n = int(pset.get("Maximal Number of Reported Alignments"))
        min_score = int(pset.get("Minimal Alignment Score"))
        result = []
        with stage_timer(self.profiler, "host mapping quality"):
            for b, alns in enumerate(per_read):
                result.append(
                    mapping_quality(
                        alns,
                        len(reads[b]),
                        match=match,
                        max_supplementary=max_supp,
                        max_overlap_supplementary=max_ov,
                        report_n=report_n,
                        min_score=min_score,
                    )
                )
        # SmallInversions runs AFTER MappingQuality (export.cpp:100-125) so
        # rescued inversions keep their forced MAPQ of 0
        if bool(pset.get("Detect Small Inversions")):
            from ma_tpu.pipeline.inversions import small_inversions

            small_inversions(
                result,
                reads,
                self.pack,
                params=self.nw_cfg.params,
                band=self.nw_cfg.band_ext,
                zdrop_inv=int(pset.get("Z Drop Inversions")),
                harm_score_min=int(pset.get("Minimal Harmonization Score")),
                disable_heuristics=bool(pset.get("Disable All Heuristics")),
            )
        return result

    def finish_batch(
        self, reads: Sequence[NucSeq], harm: HarmBatch, data_d=None, meta_d=None,
        seqs_dev=None, seqs_np=None, data_head=None,
    ) -> List[List[Alignment]]:
        """Host half: DP fill/extend + assembly + mapping quality."""
        return self.collect_batch(
            self.plan_batch(reads, harm, data_d, meta_d, seqs_dev, seqs_np,
                            data_head)
        )

    # --------------------------------------------------------------- frontend
    def align_to_sam(
        self,
        reads: Iterable[NucSeq],
        out: IO[str],
        batch_size: int = 256,
        cmd: str = "ma_tpu",
        progress=None,  # callable(n_done) -> bool; False cancels
    ) -> int:
        """Stream reads -> SAM records. Returns #reads processed.

        Reads are grouped into fixed-size batches bucketed by padded length
        (the FileReader/CyclicQueue role, minus threads: batching replaces
        the per-thread graph replicas)."""
        pset = self.pset
        writer = SamWriter(
            out,
            self.pack,
            cmd=cmd,
            soft_clip=bool(pset.get("Soft clip")),
            use_m_cigar=bool(pset.get("Use M in CIGAR")),
            ngmlr_tags=bool(pset.get("Emulate NGMLR's tag output")),
            cg_tag=bool(pset.get("Output long cigars in CG tag")),
        )
        n = 0
        buckets: dict = {}
        omit_sec = bool(pset.get("Omit Secondary Alignments"))
        omit_sup = bool(pset.get("Omit Supplementary Alignments"))

        def launch(bucket: List[NucSeq]):
            """Dispatch the device stage asynchronously (JAX async dispatch:
            the program runs while the host finishes the previous batch —
            the pipeline-parallel overlap the reference gets from threads)."""
            B = len(bucket)
            L = _next_pow2(max(len(r) for r in bucket))
            if L >= 8192:
                # one FIXED batch shape per long-read bucket: executing
                # differently-B'd instances of the >= 8 kb stage in one
                # process intermittently faults the tunneled backend with
                # a runtime InvalidArgument (reproduced: B=8 warmup then
                # B=32 batches fails; all-B=32 is clean). Padding rows are
                # empty reads (len 0 -> no seeds -> no output).
                B = max(B, max(32, batch_size * 512 // L))
            with stage_timer(self.profiler, "host batch prep"):
                seqs = np.full((B, L), 4, np.uint8)
                lens = np.zeros(B, np.int32)
                for i, r in enumerate(bucket):
                    seqs[i, : len(r)] = r.codes
                    lens[i] = len(r)
            with stage_timer(self.profiler, "device seed+soc+harmonize"):
                harm, _soc, data, meta, data_head, seqs_dev = (
                    self.run_device_stage(seqs, lens)
                )
            return bucket, harm, data, meta, data_head, seqs_dev, seqs

        def plan(pending):
            """Wait for the device stage, plan + DISPATCH this batch's DP."""
            bucket, harm, data, meta, data_head, seqs_dev, seqs = pending
            return bucket, self.plan_batch(
                bucket, harm, data, meta, seqs_dev, seqs, data_head
            )

        sam_native = self.native_sam_enabled()

        def collect(planned):
            nonlocal n
            bucket, state = planned
            oflags = None
            if isinstance(state, tuple) and len(state) == 2 and state[0] == "native":
                oflags = getattr(state[1][1], "overflow_flags", None)
            elif isinstance(state, tuple) and len(state) == 3:
                oflags = getattr(state[1], "overflow_flags", None)
            need_rescue = (
                self.rescue_overflow and not self._in_rescue
                and oflags is not None and bool(oflags.any())
            )
            if (
                sam_native
                and not need_rescue  # rescue needs Alignment objects
                and isinstance(state, tuple)
                and len(state) == 2
                and state[0] == "native"
            ):
                res = self._collect_native_sam(state[1], omit_sec, omit_sup)
                if res[0] == "sam":
                    with stage_timer(self.profiler, "host SAM write"):
                        writer.write_text(res[1].decode("ascii"))
                        n += len(bucket)
                    if progress is not None and progress(n) is False:
                        raise KeyboardInterrupt(
                            "alignment cancelled by progress callback"
                        )
                    return
                results = res[1]
            else:
                results = self.collect_batch(state)
            with stage_timer(self.profiler, "host SAM write"):
                for read, alns in zip(bucket, results):
                    if omit_sec:
                        alns = [a for a in alns if not a.secondary]
                    if omit_sup:
                        alns = [a for a in alns if not a.supplementary]
                    writer.write(alns, read)
                    n += 1
            if progress is not None and progress(n) is False:
                raise KeyboardInterrupt("alignment cancelled by progress callback")

        # 3-phase software pipeline, device-first: stage k+1 is ENQUEUED
        # before the blocking wait on stage k's outputs, so the device queue
        # is [stage k][stage k+1][DP k][stage k+2][DP k+1]... and the chip
        # works through stage k+1 while the host downloads batch k's meta
        # over the tunnel and plans its DP problems. (The old order —
        # plan(k) then launch(k+1) — left the chip idle for the whole
        # download+planning window: measured 228 ms/batch wall against
        # ~108 ms of device work at the 1 Mbp flagship config.)
        pending = None  # device stage in flight
        planned = None  # DP in flight
        def rotate(next_bucket):
            nonlocal pending, planned
            new_pending = launch(next_bucket) if next_bucket is not None else None
            new_planned = plan(pending) if pending is not None else None
            pending = new_pending
            if planned is not None:
                collect(planned)
            planned = new_planned

        def submit(bucket: List[NucSeq]):
            # Long-read buckets drain the pipeline around each batch: with
            # a >= 8 kb device stage in flight behind a chunked-extension
            # DP train, the tunneled backend intermittently faults the
            # queued program with a runtime InvalidArgument (reproduced on
            # continuous 20 kb batches; chunk-isolated batches are clean).
            # Serializing long batches costs only their stage/DP overlap.
            L = _next_pow2(max(len(r) for r in bucket))
            if L >= 8192:
                rotate(None)
                rotate(None)
                rotate(bucket)
                rotate(None)
                rotate(None)
            else:
                rotate(bucket)

        for read in reads:
            key = _next_pow2(max(len(read), 1))
            buckets.setdefault(key, []).append(read)
            # long reads flush in smaller batches: per-read device state
            # scales with L (seeds, SoC windows, harmonization planes)
            eff = batch_size if key <= 512 else max(32, batch_size * 512 // key)
            if len(buckets[key]) >= eff:
                submit(buckets.pop(key))
        for bucket in buckets.values():
            submit(bucket)
        rotate(None)
        rotate(None)
        return n
