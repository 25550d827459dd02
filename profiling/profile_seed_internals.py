"""Time the sub-steps of minimizer_seeding on the real chip: sketch,
bucketed hash lookup, merge_rank slot allocation, posst gather, delta.

Usage: python profiling/profile_seed_internals.py [batch]
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

from ma_tpu.containers.pack import Pack
from ma_tpu.index.minimizer import (
    MinimizerIndex,
    _sketch_arrays,
    bucketed_searchsorted,
)
from ma_tpu.ops.sortops import merge_rank

B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
L = 160
GENOME = 1_000_000
K, W = 15, 10
MAX_SEEDS = 512

rng = np.random.default_rng(1234)
genome = rng.integers(0, 4, size=GENOME).astype(np.uint8)
pack = Pack.empty()
pack.append("bench", genome)
mmi = MinimizerIndex.build(pack)
idx = mmi.to_device()

seqs_np = np.zeros((B, L), np.uint8)
for i in range(B):
    p = int(rng.integers(0, GENOME - 150))
    seqs_np[i, :150] = genome[p : p + 150]
seqs = jnp.asarray(seqs_np, jnp.int32)
lens = jnp.full((B,), 150, jnp.int32)


@jax.jit
def step_sketch(seqs, lens):
    sel, h, strand_q, _ = _sketch_arrays(seqs, K, W, jnp)
    pos_ok = jnp.arange(L)[None, :] + K <= lens[:, None]
    return sel & pos_ok, h, strand_q


@jax.jit
def step_lookup(sel, h):
    lo, hi = bucketed_searchsorted(idx, h)
    occ = jnp.where(sel, hi - lo, 0)
    return lo, jnp.where(occ > 50, 0, occ)


@jax.jit
def step_rank(lo, occ, strand_q):
    cum = jnp.cumsum(occ, axis=1)
    kk = jnp.arange(MAX_SEEDS, dtype=jnp.int32)[None, :]
    kk_b = jnp.broadcast_to(kk, (B, MAX_SEEDS))
    shift1 = lambda a: jnp.concatenate([a[:, 1:], a[:, -1:]], axis=1)
    strand_lane = jnp.asarray(strand_q, jnp.int32)
    rank, (cum_ex_at,), (lo_at, occ_at, strand_at) = merge_rank(
        cum, kk_b,
        carries=[cum],
        carries_any=[shift1(lo), shift1(occ), shift1(strand_lane)],
    )
    return rank, cum_ex_at, lo_at, occ_at, strand_at


@jax.jit
def step_hitgather(lo_at, rank, cum_ex_at):
    kk = jnp.arange(MAX_SEEDS, dtype=jnp.int32)[None, :]
    j = kk - cum_ex_at
    n_idx = idx.posst.shape[0]
    rows = jnp.clip(lo_at + j, 0, n_idx - 1)
    ps = idx.posst[rows]
    return ps >> 1, ps & 1


def bench(name, fn, *args):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    n = 5
    for _ in range(n):
        out = jax.block_until_ready(fn(*args))
    dt = (time.perf_counter() - t0) / n
    print(f"{name:<24} steady={dt*1e3:8.1f} ms")
    return out


sel, h, strand_q = bench("sketch", step_sketch, seqs, lens)
lo, occ = bench("lookup(searchsorted)", step_lookup, sel, h)
rank, cum_ex_at, lo_at, occ_at, strand_at = bench(
    "merge_rank slots", step_rank, lo, occ, strand_q
)
bench("posst gather", step_hitgather, lo_at, rank, cum_ex_at)
