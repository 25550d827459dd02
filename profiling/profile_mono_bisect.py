"""Bisect the monolithic device stage: cumulative jitted prefixes of the
seed -> lump -> SoC -> harmonize -> pack chain, each ended with a tiny
reduction (so nothing is dead-code-eliminated but transfers stay trivial).
The deltas between successive prefixes attribute the fused program's time.

Usage: python profile_mono_bisect.py [batch]
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


def upto_seed(seqs, lens):
    return minimizer_seeding(
        dev, seqs, lens, contig_starts, ref_len_forward,
        k=cfg.mm_k, w=cfg.mm_w, max_occ=cfg.max_ambiguity,
        max_seeds=cfg.max_seeds, rectangular=cfg.rectangular,
    )


def upto_lump(seqs, lens):
    return min_length(seed_lump(upto_seed(seqs, lens)), cfg.min_seed_len)


def upto_soc(seqs, lens):
    return soc_collect(
        upto_lump(seqs, lens), lens, contig_starts,
        match=cfg.match, extend=cfg.extend, gap=cfg.gap,
        fixed_width=cfg.fixed_soc_width, rectangular=cfg.rectangular,
        min_score=_soc_min_score(cfg, lens, 2 * ref_len_forward),
        max_socs=cfg.max_socs_collect,
    )


def upto_harm(seqs, lens):
    return harmonization(
        upto_soc(seqs, lens), lens, text_len=2 * ref_len_forward,
        max_socs=cfg.max_socs_harm, min_socs=cfg.min_socs,
        seeds_per_soc=cfg.seeds_per_soc, do_heuristics=cfg.do_heuristics,
        switch_qlen=cfg.switch_qlen, score_tolerance=cfg.score_tolerance,
        harm_score_min=cfg.harm_score_min,
        harm_score_min_rel=cfg.harm_score_min_rel,
        score_diff_tolerance=cfg.score_diff_tolerance,
        max_lookahead=cfg.max_lookahead, max_delta_dist=cfg.max_delta_dist,
        min_delta_dist=cfg.min_delta_dist, n_cand=cfg.n_cand,
    )


def upto_pack(seqs, lens):
    ch = compact_harm(upto_harm(seqs, lens), cfg.max_out_sets)
    return _harm_pack_core(ch)


def reduce_all(tree):
    return sum(jnp.sum(jnp.abs(x.astype(jnp.int32))) for x in jax.tree.leaves(tree))


variants = [
    ("sketch+lookup", upto_seed),
    ("+lump/minlen", upto_lump),
    ("+soc_collect", upto_soc),
    ("+harmonize", upto_harm),
    ("+compact/pack", upto_pack),
]

prev = 0.0
for name, fn in variants:
    f = jax.jit(lambda s, l, fn=fn: reduce_all(fn(s, l)))
    t0 = time.perf_counter()
    out = f(seqs_d, lens_d)
    jax.block_until_ready(out)
    t_compile = time.perf_counter() - t0
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(f(seqs_d, lens_d))
        ts.append(time.perf_counter() - t0)
    cur = min(ts) * 1e3
    print(f"{name:16s} compile={t_compile:7.1f}s cum={cur:7.1f} ms delta={cur - prev:7.1f} ms",
          flush=True)
    prev = cur
