"""Round-5 device-stage attribution at the exact bench shapes.

Times each sub-op of the fused device stage (B=4096, L=256 bucket of the
1 Mbp flagship config) with steady-state averaging: wall(N+1 calls) -
wall(1 call) over N, dodging per-call dispatch latency on the tunnel.

Usage: python profiling/profile_stage_r5.py [B] [reps]
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
from ma_tpu.ops.soc import soc_collect, _sort_seeds_by
from ma_tpu.ops.harmonize import compact_harm, harmonization
from ma_tpu.pipeline.aligner import (
    DeviceStageConfig,
    _harm_pack_core,
    _soc_min_score,
    _batch_overflow,
)
from ma_tpu.config.parameters import ParameterSetManager

B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 8
L = 256  # bench pads 150bp reads to the 256 bucket
GENOME = 1_000_000

rng = np.random.default_rng(1234)
genome = rng.integers(0, 4, size=GENOME).astype(np.uint8)
pack = Pack.empty()
pack.append("bench", genome)
mmi = MinimizerIndex.build(pack)

seqs = np.full((B, L), 4, np.uint8)
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
print(f"# shapes: max_seeds={cfg.max_seeds} socs_collect={cfg.max_socs_collect} "
      f"socs_harm={cfg.max_socs_harm} seeds_per_soc={cfg.seeds_per_soc} "
      f"n_cand={cfg.n_cand}", file=sys.stderr)
dev = mmi.to_device()
contig_starts = jnp.asarray(np.asarray(pack.starts, np.int32))
ref_len_forward = pack.unpacked_size_forward_strand

seqs_d = jnp.asarray(seqs)
lens_d = jnp.asarray(lens)


def timeit(name, fn, *args):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    out = jax.block_until_ready(fn(*args))
    t1 = time.perf_counter()
    for _ in range(REPS):
        out = jax.block_until_ready(fn(*args))
    t2 = time.perf_counter()
    steady = (t2 - t1) / REPS * 1e3
    print(f"{name:32s} 1st={1e3*(t1-t0):7.1f} ms steady={steady:7.2f} ms")
    return out


def f_seed(seqs, lens):
    return minimizer_seeding(
        dev, seqs, lens, contig_starts, ref_len_forward,
        k=cfg.mm_k, w=cfg.mm_w, max_occ=cfg.max_ambiguity,
        max_seeds=cfg.max_seeds, rectangular=cfg.rectangular,
    )


def f_lump(seeds):
    return seed_lump(seeds)


def f_minlen(seeds):
    return min_length(seeds, cfg.min_seed_len)


def f_socsort(seeds):
    return _sort_seeds_by(seeds, seeds.delta)


def f_soc(seeds, lens):
    return soc_collect(
        seeds, lens, contig_starts,
        match=cfg.match, extend=cfg.extend, gap=cfg.gap,
        fixed_width=cfg.fixed_soc_width, rectangular=cfg.rectangular,
        min_score=_soc_min_score(cfg, lens, 2 * ref_len_forward),
        max_socs=cfg.max_socs_collect,
    )


def f_harm(soc, lens):
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


def f_compact(harm):
    return compact_harm(harm, cfg.max_out_sets)


def f_pack(ch, soc):
    return _harm_pack_core(ch, _batch_overflow(cfg, soc))


seeds = timeit("minimizer_seeding", jax.jit(f_seed), seqs_d, lens_d)
lumped = timeit("seed_lump", jax.jit(f_lump), seeds)
filt = timeit("min_length", jax.jit(f_minlen), lumped)
timeit("soc: delta sort", jax.jit(f_socsort), filt)
soc = timeit("soc_collect (full)", jax.jit(f_soc), filt, lens_d)
harm = timeit("harmonization", jax.jit(f_harm), soc, lens_d)
ch = timeit("compact_harm", jax.jit(f_compact), harm)
timeit("harm_pack", jax.jit(f_pack), ch, soc)
