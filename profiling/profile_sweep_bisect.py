"""Bisect harmonize_sets on the real chip: time cumulative prefixes of the
pipeline to find where the composed program loses its time (every primitive
is <0.2 ms standalone per profile_micro.py, yet the composition costs
hundreds of ms)."""
import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import sys
import time

import numpy as np

import ma_tpu

ma_tpu.enable_compilation_cache()

import jax
import jax.numpy as jnp

from ma_tpu.ops import harmonize as H
from ma_tpu.ops.harmonize_pallas import linesweep_sorted_pallas

B, K, M = 4096, 8, 64
rng = np.random.default_rng(0)
q = jnp.asarray(rng.integers(0, 150, (B, K, 2, M)).astype(np.int32))
l = jnp.asarray(rng.integers(16, 40, (B, K, 2, M)).astype(np.int32))
r = jnp.asarray(rng.integers(0, 1 << 20, (B, K, 2, M)).astype(np.int32))
va = jnp.asarray(rng.random((B, K, 2, M)) < 0.4)
N_CAND = 4


def bench(name, fn, *args):
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        out = f(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    print(f"{name:40s} {min(ts)*1e3:8.1f} ms", flush=True)


def upto_fit(q, l, r, va):
    return H._fit_guide_line(q, l, r, va, n_cand=N_CAND)


def upto_kept(q, l, r, va):
    angle, rstart, mad = H._fit_guide_line(q, l, r, va, n_cand=N_CAND)
    dist = H._delta_distance(q.astype(jnp.float32), r.astype(jnp.float32),
                             angle[..., None], rstart[..., None])
    kept = va & (dist <= mad[..., None])
    return dist, kept


def upto_sort(q, l, r, va):
    dist, kept = upto_kept(q, l, r, va)
    starts, ends = q, r + l
    key_start = jnp.where(kept, starts, jnp.int32(2**30))
    ordr = jnp.lexsort((-ends, key_start), axis=-1)
    take = lambda a: jnp.take_along_axis(a, ordr, axis=-1)
    return take(ends), take(dist), take(kept), ordr


def upto_pallas1(q, l, r, va):
    s_end, s_dist, s_valid, ordr = upto_sort(q, l, r, va)
    R = B * K * 2
    surv = linesweep_sorted_pallas(
        s_end.reshape(R, M), s_dist.reshape(R, M), s_valid.reshape(R, M)
    )
    return surv, ordr


def upto_backmap1(q, l, r, va):
    surv, ordr = upto_pallas1(q, l, r, va)
    surv = surv.reshape(B, K, 2, M)
    out = ((ordr[..., :, None] == jnp.arange(M)[None, :]) & surv[..., :, None]).any(axis=-2)
    return out


def upto_sweep1(q, l, r, va):
    dist, kept = upto_kept(q, l, r, va)
    seed_idx = jnp.broadcast_to(jnp.arange(M), q.shape).astype(jnp.int32)
    return H._linesweep(q, r + l, dist, seed_idx, kept)


def full_sets(q, l, r, va):
    return H.harmonize_sets(q, l, r, va, n_cand=N_CAND)


def barrier_sweep1(q, l, r, va):
    dist, kept = upto_kept(q, l, r, va)
    dist, kept = jax.lax.optimization_barrier((dist, kept))
    seed_idx = jnp.broadcast_to(jnp.arange(M), q.shape).astype(jnp.int32)
    return H._linesweep(q, r + l, dist, seed_idx, kept)


bench("fit only", upto_fit, q, l, r, va)
bench("fit+dist+kept", upto_kept, q, l, r, va)
bench("+sort", upto_sort, q, l, r, va)
bench("+pallas sweep1", upto_pallas1, q, l, r, va)
bench("+backmap1", upto_backmap1, q, l, r, va)
bench("sweep1 via _linesweep", upto_sweep1, q, l, r, va)
bench("sweep1 w/ barrier", barrier_sweep1, q, l, r, va)
bench("full harmonize_sets", full_sets, q, l, r, va)


# --- probes: is the sort itself slow, or only when composed after fit?
dist0, kept0 = jax.jit(upto_kept)(q, l, r, va)
jax.block_until_ready((dist0, kept0))
ends0 = r + l


def sort_only(ends, dist, kept, starts):
    key_start = jnp.where(kept, starts, jnp.int32(2**30))
    ordr = jnp.lexsort((-ends, key_start), axis=-1)
    take = lambda a: jnp.take_along_axis(a, ordr, axis=-1)
    return take(ends), take(dist), take(kept), ordr


bench("sort_only (precomputed inputs)", sort_only, ends0, dist0, kept0, q)


def fit_sort_raw(q, l, r, va):
    dist, kept = upto_kept(q, l, r, va)
    # sort keys NOT derived from fit outputs; dist/kept still returned
    ordr = jnp.lexsort((-(r + l), q), axis=-1)
    return dist, kept, ordr


bench("fit + sort of raw keys", fit_sort_raw, q, l, r, va)


def fit_sort_derived_nodist(q, l, r, va):
    dist, kept = upto_kept(q, l, r, va)
    key_start = jnp.where(kept, q, jnp.int32(2**30))
    ordr = jnp.lexsort((-(r + l), key_start), axis=-1)
    return ordr


bench("fit + sort keys from kept (no takes)", fit_sort_derived_nodist, q, l, r, va)


def fit_sort_take_dist(q, l, r, va):
    dist, kept = upto_kept(q, l, r, va)
    ordr = jnp.lexsort((-(r + l), q), axis=-1)
    return jnp.take_along_axis(dist, ordr, axis=-1)


bench("fit + raw sort + take(dist)", fit_sort_take_dist, q, l, r, va)
