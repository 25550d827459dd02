"""Time harmonization/SoC sub-pieces on the real chip. Builds the same
inputs as profile_device_stage.py, then times each sub-function."""
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
from ma_tpu.ops import harmonize as H
from ma_tpu.pipeline.aligner import DeviceStageConfig, _soc_min_score
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
text_len = 2 * ref_len_forward

seqs_d = jnp.asarray(seqs)
lens_d = jnp.asarray(lens, jnp.int32)


@jax.jit
def front(seqs, lens):
    seeds = minimizer_seeding(
        dev, seqs, lens, contig_starts, ref_len_forward,
        k=cfg.mm_k, w=cfg.mm_w, max_occ=cfg.max_ambiguity,
        max_seeds=cfg.max_seeds, rectangular=cfg.rectangular,
    )
    seeds = min_length(seed_lump(seeds), cfg.min_seed_len)
    return soc_collect(
        seeds, lens, contig_starts,
        match=cfg.match, extend=cfg.extend, gap=cfg.gap,
        fixed_width=cfg.fixed_soc_width, rectangular=cfg.rectangular,
        min_score=_soc_min_score(cfg, lens, text_len),
        max_socs=cfg.max_socs_collect,
    )


soc = front(seqs_d, lens_d)
jax.block_until_ready(soc)

K = min(cfg.max_socs_harm, soc.start.shape[1])
M = cfg.seeds_per_soc


@jax.jit
def gather_windows(soc):
    sd = soc.seeds
    barr = jnp.arange(B)[:, None, None]
    offs = jnp.arange(M)[None, None, :]
    idx = soc.start[:, :K, None] + offs
    in_win = (idx < soc.end[:, :K, None]) & (
        jnp.arange(K)[None, :, None] < soc.n_socs[:, None, None]
    )
    idx_c = jnp.clip(idx, 0, sd.q_start.shape[1] - 1)
    g = lambda a: jnp.where(in_win, a[barr, idx_c], 0)
    q = g(sd.q_start)
    l = g(sd.length)
    ref = g(sd.ref_start)
    fw = g(sd.on_forward.astype(jnp.int32)).astype(bool)
    va = in_win & g(sd.valid.astype(jnp.int32)).astype(bool)
    ref_rev = text_len - ref - 1
    q2 = jnp.stack([q, q], axis=2)
    l2 = jnp.stack([l, l], axis=2)
    r2 = jnp.stack([ref, ref_rev], axis=2)
    va2 = jnp.stack([va & fw, va & ~fw], axis=2)
    return q2, l2, r2, va2


@jax.jit
def fit_only(q2, l2, r2, va2):
    return H._fit_guide_line(q2, l2, r2, va2, n_cand=cfg.n_cand)


@jax.jit
def sweep_only(q2, l2, r2, va2):
    angle, rstart, mad = H._fit_guide_line(q2, l2, r2, va2, n_cand=cfg.n_cand)
    dist = H._delta_distance(
        q2.astype(jnp.float32), r2.astype(jnp.float32), angle[..., None],
        rstart[..., None],
    )
    kept = va2 & (dist <= mad[..., None])
    seed_idx = jnp.broadcast_to(jnp.arange(M), q2.shape).astype(jnp.int32)
    surv1 = H._linesweep(q2, r2 + l2, dist, seed_idx, kept)
    surv2 = H._linesweep(r2, q2 + l2, dist, seed_idx, kept & surv1)
    return surv1, surv2


@jax.jit
def harm_sets_only(q2, l2, r2, va2):
    return H.harmonize_sets(q2, l2, r2, va2, n_cand=cfg.n_cand)


@jax.jit
def artifact_only(q2, l2, r2, va2):
    return H.artifact_filter(q2, l2, r2, va2, max_delta_dist=cfg.max_delta_dist,
                             min_delta_dist=cfg.min_delta_dist)


@jax.jit
def full_harm(soc, lens):
    return H.harmonization(
        soc, lens, text_len=text_len,
        max_socs=cfg.max_socs_harm, min_socs=cfg.min_socs,
        seeds_per_soc=cfg.seeds_per_soc, do_heuristics=cfg.do_heuristics,
        switch_qlen=cfg.switch_qlen, score_tolerance=cfg.score_tolerance,
        harm_score_min=cfg.harm_score_min,
        harm_score_min_rel=cfg.harm_score_min_rel,
        score_diff_tolerance=cfg.score_diff_tolerance,
        max_lookahead=cfg.max_lookahead, max_delta_dist=cfg.max_delta_dist,
        min_delta_dist=cfg.min_delta_dist, n_cand=cfg.n_cand,
    )


def _force(out):
    import numpy as _np
    leaves = jax.tree_util.tree_leaves(out)
    return _np.asarray(leaves[0].reshape(-1)[:1])


def bench(name, fn, *args):
    t0 = time.perf_counter()
    out = fn(*args)
    _force(out)  # block_until_ready returns early on axon; force a d2h
    tc = time.perf_counter() - t0
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        _force(out)
        ts.append(time.perf_counter() - t0)
    print(f"{name:24s} compile+1st={tc:7.2f}s steady={min(ts)*1e3:8.1f} ms",
          flush=True)
    return out


w = bench("gather_windows", gather_windows, soc)
q2, l2, r2, va2 = w
bench("fit_guide_line", fit_only, q2, l2, r2, va2)
bench("fit+2 linesweeps", sweep_only, q2, l2, r2, va2)
bench("harmonize_sets", harm_sets_only, q2, l2, r2, va2)
bench("artifact_filter", artifact_only, q2, l2, r2, va2)
bench("full harmonization", full_harm, soc, lens_d)
