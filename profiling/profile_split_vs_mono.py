"""Compare the monolithic device_stage_mm against a chained split-stage
variant on identical data (locating the round-3 0.38s vs 0.18s gap).

Usage: python profile_split_vs_mono.py [batch]
"""
import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import sys
import time

import numpy as np

import ma_tpu

ma_tpu.enable_compilation_cache()

import jax
import jax.numpy as jnp

from ma_tpu.containers.nucseq import revcomp_codes
from ma_tpu.containers.pack import Pack
from ma_tpu.index.minimizer import MinimizerIndex, minimizer_seeding
from ma_tpu.ops.filters import min_length, seed_lump
from ma_tpu.ops.soc import soc_collect
from ma_tpu.ops.harmonize import compact_harm, harmonization
from ma_tpu.pipeline.aligner import (
    DeviceStageConfig,
    _harm_pack_core,
    _soc_min_score,
    device_stage_mm,
)
from ma_tpu.config.parameters import ParameterSetManager

B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
L = 160
GENOME = 1_000_000

rng = np.random.default_rng(1234)
genome = rng.integers(0, 4, size=GENOME).astype(np.uint8)
pack = Pack.empty()
pack.append("bench", genome)
mmi = MinimizerIndex.build(pack)

seqs = np.zeros((B, L), np.uint8)
lens = np.full((B,), 150, np.int32)
for i in range(B):
    p = int(rng.integers(0, GENOME - 150))
    codes = genome[p : p + 150].copy()
    for j in np.nonzero(rng.random(150) < 0.01)[0]:
        codes[j] = (codes[j] + rng.integers(1, 4)) % 4
    if i % 2:
        codes = revcomp_codes(codes)
    seqs[i, :150] = codes

mgr = ParameterSetManager()
mgr.selected.set("Seeding Technique", "minimizers")
cfg = DeviceStageConfig.from_params(mgr.selected, L)
dev = mmi.to_device()
contig_starts = jnp.asarray(np.asarray(pack.starts, np.int32))
ref_len_forward = pack.unpacked_size_forward_strand

seqs_d = jnp.asarray(seqs)
lens_d = jnp.asarray(lens)


@jax.jit
def stage_a(seqs, lens):
    seeds = minimizer_seeding(
        dev, seqs, lens, contig_starts, ref_len_forward,
        k=cfg.mm_k, w=cfg.mm_w, max_occ=cfg.max_ambiguity,
        max_seeds=cfg.max_seeds, rectangular=cfg.rectangular,
    )
    seeds = min_length(seed_lump(seeds), cfg.min_seed_len)
    return seeds


@jax.jit
def stage_b(seeds, lens):
    soc = soc_collect(
        seeds, lens, contig_starts,
        match=cfg.match, extend=cfg.extend, gap=cfg.gap,
        fixed_width=cfg.fixed_soc_width, rectangular=cfg.rectangular,
        min_score=_soc_min_score(cfg, lens, 2 * ref_len_forward),
        max_socs=cfg.max_socs_collect,
    )
    return soc


@jax.jit
def stage_c(soc, lens):
    harm = harmonization(
        soc, lens, text_len=2 * ref_len_forward,
        max_socs=cfg.max_socs_harm, min_socs=cfg.min_socs,
        seeds_per_soc=cfg.seeds_per_soc, do_heuristics=cfg.do_heuristics,
        switch_qlen=cfg.switch_qlen, score_tolerance=cfg.score_tolerance,
        harm_score_min=cfg.harm_score_min,
        harm_score_min_rel=cfg.harm_score_min_rel,
        score_diff_tolerance=cfg.score_diff_tolerance,
        max_lookahead=cfg.max_lookahead, max_delta_dist=cfg.max_delta_dist,
        min_delta_dist=cfg.min_delta_dist, n_cand=cfg.n_cand,
    )
    ch = compact_harm(harm, cfg.max_out_sets)
    data, meta = _harm_pack_core(ch)
    return ch, data, meta


def run_split(seqs, lens):
    seeds = stage_a(seqs, lens)
    soc = stage_b(seeds, lens)
    return stage_c(soc, lens)


def run_mono(seqs, lens):
    return device_stage_mm(cfg, dev, contig_starts, ref_len_forward, seqs, lens)


for name, fn in (("split(3 progs)", run_split), ("monolithic", run_mono)):
    t0 = time.perf_counter()
    out = fn(seqs_d, lens_d)
    jax.block_until_ready(out)
    t_compile = time.perf_counter() - t0
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        out = fn(seqs_d, lens_d)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    print(f"{name:16s} compile+1st={t_compile:7.2f}s steady={min(ts)*1e3:8.1f} ms")
