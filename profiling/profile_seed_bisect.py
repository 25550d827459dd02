"""Bisect minimizer_seeding internals on the chip: sketch, lane compaction,
hash search, slot allocation (merge_rank), final row gather.

Usage: python profile_seed_bisect.py [batch] [Mc_mult]
MA_TPU_MC_MULT (default 4) controls the compaction width multiplier.
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
from ma_tpu.index.minimizer import (
    MinimizerIndex,
    _sketch_arrays,
    bucketed_searchsorted,
    minimizer_seeding,
)

B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
L = 160
K, W = 15, 10
GENOME = 1_000_000

rng = np.random.default_rng(1234)
genome = rng.integers(0, 4, size=GENOME).astype(np.uint8)
pack = Pack.empty()
pack.append("bench", genome)
mmi = MinimizerIndex.build(pack)
dev = mmi.to_device()
contig_starts = jnp.asarray(np.asarray(pack.starts, np.int32))
ref_len_forward = pack.unpacked_size_forward_strand

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
seqs_d = jnp.asarray(seqs, jnp.int32)
lens_d = jnp.asarray(lens)

Mc = 128


def upto_sketch(seqs, lens):
    sel, h, strand, _ = _sketch_arrays(seqs, K, W, jnp)
    pos_ok = jnp.arange(L)[None, :] + K <= lens[:, None]
    return sel & pos_ok, h, strand


def upto_compact(seqs, lens):
    sel, h, strand_q = upto_sketch(seqs, lens)
    from ma_tpu.ops.sortops import sort_with_payloads as _swp

    qpos = jnp.broadcast_to(jnp.arange(L, dtype=jnp.int32)[None, :], (B, L))
    colkey = jnp.where(sel, qpos, jnp.int32(L))
    n_sel = sel.sum(axis=1, dtype=jnp.int32)
    _, (h, strand_q, qpos, sel) = _swp(
        [colkey], [h, jnp.asarray(strand_q, jnp.int32), qpos, sel]
    )
    h = h[:, :Mc]
    return (h, strand_q[:, :Mc], qpos[:, :Mc],
            sel[:, :Mc] & (jnp.arange(Mc)[None, :] < n_sel[:, None]))


def upto_search(seqs, lens):
    h, strand_q, qpos, sel = upto_compact(seqs, lens)
    lo, hi = bucketed_searchsorted(dev, h)
    return lo, hi, sel


def full(seqs, lens):
    return minimizer_seeding(
        dev, seqs, lens, contig_starts, ref_len_forward, k=K, w=W,
        max_occ=50, max_seeds=256,
    )


def reduce_all(tree):
    return sum(jnp.sum(jnp.abs(x.astype(jnp.int32))) for x in jax.tree.leaves(tree))


variants = [
    ("sketch", upto_sketch),
    ("+compact", upto_compact),
    ("+hash search", upto_search),
    ("full seeding", full),
]

prev = 0.0
for name, fn in variants:
    f = jax.jit(lambda s, l, fn=fn: reduce_all(fn(s, l)))
    t0 = time.perf_counter()
    jax.block_until_ready(f(seqs_d, lens_d))
    t_compile = time.perf_counter() - t0
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(f(seqs_d, lens_d))
        ts.append(time.perf_counter() - t0)
    cur = min(ts) * 1e3
    print(f"{name:14s} compile={t_compile:7.1f}s cum={cur:7.1f} ms delta={cur - prev:7.1f} ms",
          flush=True)
    prev = cur
print(f"index entries={len(mmi.hash_sorted)} unique={len(np.unique(mmi.hash_sorted))} "
      f"steps={dev.steps} shift={dev.shift}")
