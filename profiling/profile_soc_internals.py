"""Split soc_collect into sub-phases and time each on the real chip:
(a) delta sort + permute, (b) run/prefix/window precompute, (c) the nested
while-loop sweep, (d) rectangular re-collection + heap ranking.

Usage: python profiling/profile_soc_internals.py [batch]
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


@jax.jit
def front(seqs, lens):
    seeds = minimizer_seeding(
        dev, seqs, lens, contig_starts, ref_len_forward,
        k=cfg.mm_k, w=cfg.mm_w, max_occ=cfg.max_ambiguity,
        max_seeds=cfg.max_seeds, rectangular=cfg.rectangular,
    )
    return min_length(seed_lump(seeds), cfg.min_seed_len)


seeds = front(jnp.asarray(seqs), jnp.asarray(lens, jnp.int32))
jax.block_until_ready(seeds)
lens_d = jnp.asarray(lens, jnp.int32)
min_score = _soc_min_score(cfg, lens_d, text_len)
max_socs = cfg.max_socs_collect
print("n_seeds: mean", float(np.asarray(seeds.n_seeds).mean()),
      "max", int(np.asarray(seeds.n_seeds).max()))


@jax.jit
def phase_sort(seeds):
    order = jnp.argsort(seeds.delta, axis=1, stable=True)
    return SOC._permute_seeds(seeds, order)


@jax.jit
def phase_pre(sd, qlen, mscore):
    B_, S = sd.delta.shape
    n = sd.n_seeds
    valid = sd.valid
    contig = jnp.searchsorted(contig_starts, sd.ref_start, side="right").astype(jnp.int32) - 1
    key = contig
    change = jnp.concatenate([jnp.ones((B_, 1), bool), key[:, 1:] != key[:, :-1]], axis=1)
    run_id = jnp.cumsum(change.astype(jnp.int32), axis=1)
    run_end = jax.vmap(lambda r: jnp.searchsorted(r, r, side="right"))(run_id).astype(jnp.int32)
    plen = jnp.cumsum(jnp.where(valid, sd.length, 0), axis=1)
    pamb = jnp.cumsum(jnp.where(valid, sd.ambiguity, 0), axis=1)
    plen_ex = SOC._exclusive(plen)
    pamb_ex = SOC._exclusive(pamb)
    width = ((cfg.match * qlen - cfg.gap) // cfg.extend).astype(jnp.int32)
    limit = sd.delta + width[:, None]
    j_raw = jax.vmap(lambda d, lim: jnp.searchsorted(d, lim, side="right"))(sd.delta, limit)
    win_end = jnp.minimum(jnp.minimum(j_raw.astype(jnp.int32), run_end), n[:, None])
    b2 = jnp.arange(B_)[:, None]
    ridx = jnp.clip(win_end - 1, 0, S - 1)
    nonempty = win_end > jnp.arange(S)[None, :]
    pend_all = jnp.where(nonempty, plen[b2, ridx], plen_ex)
    aend_all = jnp.where(nonempty, pamb[b2, ridx], pamb_ex)
    sl_all = pend_all - plen_ex
    sa_all = aend_all - pamb_ex
    cand_all = jnp.stack(
        [sl_all, sa_all, win_end, plen_ex, pamb_ex, pend_all, aend_all], axis=-1
    ).transpose(1, 0, 2)
    return cand_all, n


@jax.jit
def phase_full(seeds, qlen, mscore):
    return SOC.soc_collect(
        seeds, qlen, contig_starts,
        match=cfg.match, extend=cfg.extend, gap=cfg.gap,
        fixed_width=cfg.fixed_soc_width, rectangular=cfg.rectangular,
        min_score=mscore, max_socs=max_socs,
    )


@jax.jit
def phase_norect(seeds, qlen, mscore):
    return SOC.soc_collect(
        seeds, qlen, contig_starts,
        match=cfg.match, extend=cfg.extend, gap=cfg.gap,
        fixed_width=cfg.fixed_soc_width, rectangular=False,
        min_score=mscore, max_socs=max_socs,
    )


def bench(name, fn, *args):
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    tc = time.perf_counter() - t0
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    print(f"{name:22s} compile+1st={tc:7.2f}s steady={min(ts)*1e3:8.1f} ms")
    return out


sd = bench("sort+permute", phase_sort, seeds)
out = bench("precompute", phase_pre, sd, lens_d, min_score)
bench("full soc_collect", phase_full, seeds, lens_d, min_score)
bench("soc (no rectangular)", phase_norect, seeds, lens_d, min_score)
