"""Split the device stage into jitted sub-programs and time each on the
real chip, to locate where the 'device seed+soc+harmonize' time goes.

Usage: python profile_device_stage.py [batch] (default 4096)
"""
import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import os
import sys
import time

import numpy as np

import ma_tpu

ma_tpu.enable_compilation_cache()

import jax
import jax.numpy as jnp

from ma_tpu.containers.nucseq import decode_seq, revcomp_codes, NucSeq
from ma_tpu.containers.pack import Pack
from ma_tpu.index.minimizer import MinimizerIndex, minimizer_seeding
from ma_tpu.ops.filters import min_length, seed_lump
from ma_tpu.ops.soc import soc_collect
from ma_tpu.ops.harmonize import compact_harm, harmonization
from ma_tpu.pipeline.aligner import (
    DeviceStageConfig,
    _harm_pack_core,
    _soc_min_score,
)
from ma_tpu.config.parameters import ParameterSetManager

B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
L = 160  # padded read length bucket
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


def stage_seed(seqs, lens):
    seeds = minimizer_seeding(
        dev, seqs, lens, contig_starts, ref_len_forward,
        k=cfg.mm_k, w=cfg.mm_w, max_occ=cfg.max_ambiguity,
        max_seeds=cfg.max_seeds, rectangular=cfg.rectangular,
    )
    return seeds


def stage_lump(seeds):
    return min_length(seed_lump(seeds), cfg.min_seed_len)


def stage_soc(seeds, lens):
    return soc_collect(
        seeds, lens, contig_starts,
        match=cfg.match, extend=cfg.extend, gap=cfg.gap,
        fixed_width=cfg.fixed_soc_width, rectangular=cfg.rectangular,
        min_score=_soc_min_score(cfg, lens, 2 * ref_len_forward),
        max_socs=cfg.max_socs_collect,
    )


def stage_harm(soc, lens):
    return harmonization(
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


def stage_pack(harm):
    ch = compact_harm(harm, cfg.max_out_sets)
    return _harm_pack_core(ch)


stages = [
    ("seed(mm sketch+lookup)", jax.jit(stage_seed), (seqs_d, lens_d)),
    ("lump+minlen", jax.jit(stage_lump), None),
    ("soc_collect", jax.jit(stage_soc), None),
    ("harmonization", jax.jit(stage_harm), None),
    ("compact+pack", jax.jit(stage_pack), None),
]

prev = None
outs = {}
for name, fn, args in stages:
    if args is None:
        if name == "lump+minlen":
            args = (outs["seed(mm sketch+lookup)"],)
        elif name == "soc_collect":
            args = (outs["lump+minlen"], lens_d)
        elif name == "harmonization":
            args = (outs["soc_collect"], lens_d)
        else:
            args = (outs["harmonization"],)
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    t_compile = time.perf_counter() - t0
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    outs[name] = out
    print(f"{name:26s} compile+1st={t_compile:7.2f}s steady={min(ts)*1e3:8.1f} ms")
