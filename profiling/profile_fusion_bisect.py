"""Bisect the fit->sweep fusion pathology inside one jitted program."""
import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time

import numpy as np
import jax
import jax.numpy as jnp

import ma_tpu

ma_tpu.enable_compilation_cache()
from ma_tpu.ops import harmonize as H


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
    print(f"{name:48s} compile={tc:6.1f}s steady={min(ts)*1e3:8.2f} ms", flush=True)


rng = np.random.default_rng(0)
B, K, M = 4096, 8, 64
shape = (B, K, 2, M)
q = jnp.asarray(rng.integers(0, 150, shape), jnp.int32)
l = jnp.asarray(rng.integers(10, 30, shape), jnp.int32)
r = jnp.asarray(rng.integers(0, 2_000_000, shape), jnp.int32)
valid = jnp.asarray(rng.random(shape) < 0.3)
N_CAND = 4


@jax.jit
def stage_a(q, l, r, valid):
    angle, rstart, mad = H._fit_guide_line(q, l, r, valid, n_cand=N_CAND)
    dist = H._delta_distance(q.astype(jnp.float32), r.astype(jnp.float32),
                             angle[..., None], rstart[..., None])
    kept = valid & (dist <= mad[..., None])
    return dist, kept


@jax.jit
def fit_sweep1(q, l, r, valid):
    dist, kept = stage_a.__wrapped__(q, l, r, valid)
    seed_idx = jnp.broadcast_to(jnp.arange(M), q.shape).astype(jnp.int32)
    surv1 = H._linesweep(q, r + l, dist, seed_idx, kept)
    return surv1


@jax.jit
def fit_sweep1_barrier(q, l, r, valid):
    dist, kept = stage_a.__wrapped__(q, l, r, valid)
    dist, kept = jax.lax.optimization_barrier((dist, kept))
    seed_idx = jnp.broadcast_to(jnp.arange(M), q.shape).astype(jnp.int32)
    surv1 = H._linesweep(q, r + l, dist, seed_idx, kept)
    return surv1


@jax.jit
def fit_2sweeps_barrier(q, l, r, valid):
    dist, kept = stage_a.__wrapped__(q, l, r, valid)
    dist, kept = jax.lax.optimization_barrier((dist, kept))
    seed_idx = jnp.broadcast_to(jnp.arange(M), q.shape).astype(jnp.int32)
    surv1 = H._linesweep(q, r + l, dist, seed_idx, kept)
    k2 = jax.lax.optimization_barrier(kept & surv1)
    surv2 = H._linesweep(r, q + l, dist, seed_idx, k2)
    return surv1, surv2


dist, kept = bench("stage_a (fit+dist+kept)", stage_a, q, l, r, valid) or (None, None)
out = stage_a(q, l, r, valid)
dist, kept = out
seed_idx = jnp.broadcast_to(jnp.arange(M), q.shape).astype(jnp.int32)
sweep = jax.jit(lambda: None)

bench("fit+sweep1 (no barrier)", fit_sweep1, q, l, r, valid)
bench("fit+sweep1 (barrier)", fit_sweep1_barrier, q, l, r, valid)
bench("fit+2sweeps (barriers)", fit_2sweeps_barrier, q, l, r, valid)
