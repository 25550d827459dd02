"""Ground-truth timing on the axon backend: jax.block_until_ready returns
early on this platform (measured: a [4096,512] sort 'blocks' in 0.08 ms but
takes 45 ms to a d2h readback), so every measurement here forces a small
device->host readback of the result. Also contrasts loop styles to find
which program features pay real latency.
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
from ma_tpu.ops import soc as SOC
from ma_tpu.ops import harmonize as H
from ma_tpu.pipeline.aligner import DeviceStageConfig, _soc_min_score, device_stage_mm
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


def first_leaf(out):
    leaves = jax.tree_util.tree_leaves(out)
    a = leaves[0]
    return np.asarray(a.reshape(-1)[:1])


def bench(name, fn, *args, reps=3):
    f = jax.jit(fn)
    _ = first_leaf(f(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = f(*args)
        _ = first_leaf(out)  # force completion via d2h
        ts.append(time.perf_counter() - t0)
    print(f"{name:38s} {min(ts)*1e3:8.1f} ms", flush=True)
    return f(*args)


x0 = jnp.asarray(rng.integers(0, 1 << 20, (B, 512)).astype(np.int32))
bench("sort [B,512]", lambda a: jnp.sort(a, axis=1), x0)
bench("noop add", lambda a: a + 1, x0)
bench(
    "fori 64 (static)",
    lambda a: jax.lax.fori_loop(0, 64, lambda i, c: jnp.maximum(c, c + 1), a),
    x0,
)


def while64(a):
    def cond(c):
        return c[0] < c[1]

    def body(c):
        return (c[0] + 1, c[1], jnp.maximum(c[2], c[2] + 1))

    return jax.lax.while_loop(cond, body, (jnp.int32(0), a[0, 0] * 0 + 64, a))[2]


bench("while 64 (data-dep)", while64, x0)


def scan64(a):
    return jax.lax.scan(lambda c, _: (jnp.maximum(c, c + 1), None), a, None, length=64)[0]


bench("scan 64", scan64, x0)

seeds = bench(
    "seed(mm)",
    lambda s, l: minimizer_seeding(
        dev, s, l, contig_starts, ref_len_forward, k=cfg.mm_k, w=cfg.mm_w,
        max_occ=cfg.max_ambiguity, max_seeds=cfg.max_seeds,
        rectangular=cfg.rectangular,
    ),
    seqs_d, lens_d,
)
seeds = bench("lump+minlen", lambda s: min_length(seed_lump(s), cfg.min_seed_len), seeds)
soc = bench(
    "soc_collect",
    lambda s, q: SOC.soc_collect(
        s, q, contig_starts, match=cfg.match, extend=cfg.extend, gap=cfg.gap,
        fixed_width=cfg.fixed_soc_width, rectangular=cfg.rectangular,
        min_score=_soc_min_score(cfg, q, text_len), max_socs=cfg.max_socs_collect,
    ),
    seeds, lens_d,
)
harm = bench(
    "harmonization",
    lambda s, q: H.harmonization(
        s, q, text_len=text_len, max_socs=cfg.max_socs_harm, min_socs=cfg.min_socs,
        seeds_per_soc=cfg.seeds_per_soc, do_heuristics=cfg.do_heuristics,
        switch_qlen=cfg.switch_qlen, score_tolerance=cfg.score_tolerance,
        harm_score_min=cfg.harm_score_min, harm_score_min_rel=cfg.harm_score_min_rel,
        score_diff_tolerance=cfg.score_diff_tolerance,
        max_lookahead=cfg.max_lookahead, max_delta_dist=cfg.max_delta_dist,
        min_delta_dist=cfg.min_delta_dist, n_cand=cfg.n_cand,
    ),
    soc, lens_d,
)
bench(
    "FULL device_stage_mm (one program)",
    lambda s, l: device_stage_mm(
        cfg, dev, contig_starts, ref_len_forward, s, l
    ),
    seqs_d, lens_d,
)

# ---------------- sub-phase dissection (all timings d2h-forced) -----------
from ma_tpu.index.minimizer import _sketch_arrays, bucketed_searchsorted

def ph_sketch(s, l):
    return _sketch_arrays(jnp.asarray(s, jnp.int32), cfg.mm_k, cfg.mm_w, jnp)

def ph_search(s, l):
    sel, h, strand, _ = _sketch_arrays(jnp.asarray(s, jnp.int32), cfg.mm_k, cfg.mm_w, jnp)
    return bucketed_searchsorted(dev, h)

bench("  seed: sketch", ph_sketch, seqs_d, lens_d)
bench("  seed: sketch+search", ph_search, seqs_d, lens_d)

from ma_tpu.ops.filters import _lump_delta, _repack

def ph_lump_sort(sd):
    ld = _lump_delta(sd)
    fwd = sd.on_forward.astype(jnp.int32)
    key_major = jnp.where(sd.valid, (1 - fwd), 2)
    order = jnp.lexsort((sd.q_start, ld, key_major), axis=-1)
    g = lambda a: jnp.take_along_axis(a, order, axis=1)
    return g(sd.q_start), g(sd.length), g(ld), g(sd.on_forward), g(sd.ambiguity), g(sd.valid)

bench("  lump: sort+6takes", ph_lump_sort, seeds)

import ma_tpu.ops.soc as SOC2

def ph_soc_sort(sd):
    order = jnp.argsort(sd.delta, axis=1, stable=True)
    return SOC2._permute_seeds(sd, order)

sd_sorted = bench("  soc: sort+permute", ph_soc_sort, seeds)

def ph_soc_pre(sd, qlen):
    B_, S = sd.delta.shape
    n = sd.n_seeds
    valid = sd.valid
    contig = jnp.searchsorted(contig_starts, sd.ref_start, side="right").astype(jnp.int32) - 1
    change = jnp.concatenate([jnp.ones((B_, 1), bool), contig[:, 1:] != contig[:, :-1]], axis=1)
    run_id = jnp.cumsum(change.astype(jnp.int32), axis=1)
    run_end = jax.vmap(lambda r: jnp.searchsorted(r, r, side="right"))(run_id).astype(jnp.int32)
    plen = jnp.cumsum(jnp.where(valid, sd.length, 0), axis=1)
    pamb = jnp.cumsum(jnp.where(valid, sd.ambiguity, 0), axis=1)
    width = ((cfg.match * qlen - cfg.gap) // cfg.extend).astype(jnp.int32)
    limit = sd.delta + width[:, None]
    j_raw = jax.vmap(lambda d, lim: jnp.searchsorted(d, lim, side="right"))(sd.delta, limit)
    win_end = jnp.minimum(jnp.minimum(j_raw.astype(jnp.int32), run_end), n[:, None])
    return win_end, plen, pamb

bench("  soc: precompute", ph_soc_pre, sd_sorted, lens_d)

def ph_soc_norect(sd, qlen):
    return SOC2.soc_collect(
        sd, qlen, contig_starts, match=cfg.match, extend=cfg.extend, gap=cfg.gap,
        fixed_width=cfg.fixed_soc_width, rectangular=False,
        min_score=_soc_min_score(cfg, qlen, text_len), max_socs=cfg.max_socs_collect,
    )

bench("  soc: full no-rect", ph_soc_norect, seeds, lens_d)
