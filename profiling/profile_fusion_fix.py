"""Test candidate fixes for the fit->sweep fusion pathology."""
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


def linesweep_v2(starts, ends, dists, seed_idx, valid):
    """_linesweep with the barrier AFTER moveaxis (scan-major layout)."""
    M = starts.shape[-1]
    lead = starts.shape[:-1]
    key_start = jnp.where(valid, starts, jnp.int32(2**30))
    ordr = jnp.lexsort((-ends, key_start), axis=-1)
    take = lambda a: jnp.take_along_axis(a, ordr, axis=-1)
    elems = jax.lax.optimization_barrier((
        jnp.moveaxis(take(ends), -1, 0),
        jnp.moveaxis(take(dists), -1, 0),
        jnp.moveaxis(take(seed_idx), -1, 0),
        jnp.moveaxis(take(valid), -1, 0),
    ))

    st_end0 = jnp.full(lead + (M,), 2**30, jnp.int32)
    st_dist0 = jnp.zeros(lead + (M,), jnp.float32)
    st_seed0 = jnp.full(lead + (M,), -1, jnp.int32)
    sp0 = jnp.zeros(lead, jnp.int32)
    x0 = jnp.full(lead, -1, jnp.int32)
    pos_range = jnp.arange(M)

    def step(carry, elem):
        st_end, st_dist, st_seed, sp, x = carry
        e, d, si, va = elem
        ge_mask = (pos_range < sp[..., None]) & (st_end >= e[..., None])
        suffix_pos = jnp.where(ge_mask.any(axis=-1), jnp.argmax(ge_mask, axis=-1), sp)
        grow = e > x
        any_closer = (ge_mask & (st_dist <= d[..., None])).any(axis=-1)
        do_push = va & (grow | ~any_closer)
        put = jnp.where(grow, sp, suffix_pos)
        upd = va & do_push
        oh = jax.nn.one_hot(put, M, dtype=bool) & upd[..., None]
        st_end = jnp.where(oh, e[..., None], st_end)
        st_dist = jnp.where(oh, d[..., None], st_dist)
        st_seed = jnp.where(oh, si[..., None], st_seed)
        new_sp = jnp.where(upd, put + 1, sp)
        kill = (pos_range >= new_sp[..., None]) & (pos_range < sp[..., None])
        st_end = jnp.where(kill, 2**30, st_end)
        st_seed = jnp.where(kill, -1, st_seed)
        x = jnp.where(va, jnp.maximum(x, e), x)
        return (st_end, st_dist, st_seed, new_sp, x), None

    (st_end, st_dist, st_seed, sp, _), _ = jax.lax.scan(
        step, (st_end0, st_dist0, st_seed0, sp0, x0), elems
    )
    alive = (pos_range < sp[..., None]) & (st_seed >= 0)
    surv = (
        (st_seed[..., :, None] == pos_range[None, :]) & alive[..., :, None]
    ).any(axis=-2)
    return surv


@jax.jit
def fit_sweep_v2(q, l, r, valid):
    angle, rstart, mad = H._fit_guide_line(q, l, r, valid, n_cand=N_CAND)
    dist = H._delta_distance(q.astype(jnp.float32), r.astype(jnp.float32),
                             angle[..., None], rstart[..., None])
    kept = valid & (dist <= mad[..., None])
    seed_idx = jnp.broadcast_to(jnp.arange(M), q.shape).astype(jnp.int32)
    surv1 = linesweep_v2(q, r + l, dist, seed_idx, kept)
    surv2 = linesweep_v2(r, q + l, dist, seed_idx, kept & surv1)
    return surv1, surv2


bench("fit+2sweeps v2 (barrier after moveaxis)", fit_sweep_v2, q, l, r, valid)


# alternative: split programs
@jax.jit
def prog_fit(q, l, r, valid):
    angle, rstart, mad = H._fit_guide_line(q, l, r, valid, n_cand=N_CAND)
    dist = H._delta_distance(q.astype(jnp.float32), r.astype(jnp.float32),
                             angle[..., None], rstart[..., None])
    kept = valid & (dist <= mad[..., None])
    return dist, kept


@jax.jit
def prog_sweeps(q, l, r, dist, kept):
    seed_idx = jnp.broadcast_to(jnp.arange(M), q.shape).astype(jnp.int32)
    surv1 = H._linesweep(q, r + l, dist, seed_idx, kept)
    surv2 = H._linesweep(r, q + l, dist, seed_idx, kept & surv1)
    return surv1, surv2


def split(q, l, r, valid):
    dist, kept = prog_fit(q, l, r, valid)
    return prog_sweeps(q, l, r, dist, kept)


bench("fit | 2sweeps as separate programs", split, q, l, r, valid)
