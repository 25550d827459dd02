"""Ablate the _linesweep body to find the expensive op on the chip."""
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
    print(f"{name:44s} compile={tc:6.1f}s steady={min(ts)*1e3:8.2f} ms", flush=True)


rng = np.random.default_rng(0)
B, K, M = 4096, 8, 64
shape = (B, K, 2, M)
q = jnp.asarray(rng.integers(0, 150, shape), jnp.int32)
l = jnp.asarray(rng.integers(10, 30, shape), jnp.int32)
r = jnp.asarray(rng.integers(0, 2_000_000, shape), jnp.int32)
valid = jnp.asarray(rng.random(shape) < 0.3)
dist = jnp.asarray(rng.random(shape), jnp.float32)
sidx = jnp.broadcast_to(jnp.arange(M), shape).astype(jnp.int32)

sweep4 = jax.jit(lambda s, e, d, si, v: H._linesweep(s, e, d, si, v))
bench("linesweep [B,K,2,M]", sweep4, q, r + l, dist, sidx, valid)

resh = lambda a: a.reshape(-1, M)
sweep2 = jax.jit(
    lambda s, e, d, si, v: H._linesweep(
        s.reshape(-1, M), e.reshape(-1, M), d.reshape(-1, M),
        si.reshape(-1, M), v.reshape(-1, M)
    )
)
bench("linesweep reshaped [BK2,M]", sweep2, q, r + l, dist, sidx, valid)

# ablations on the 2-D shape
lead = (B * K * 2,)
s2, e2, d2 = q.reshape(-1, M), (r + l).reshape(-1, M), dist.reshape(-1, M)
si2, v2 = sidx.reshape(-1, M), valid.reshape(-1, M)


@jax.jit
def sort_only(s, e, d, si, v):
    key_start = jnp.where(v, s, jnp.int32(2**30))
    ordr = jnp.lexsort((-e, key_start), axis=-1)
    take = lambda a: jnp.take_along_axis(a, ordr, axis=-1)
    return take(e), take(d), take(si), take(v)


bench("  sort+take only", sort_only, s2, e2, d2, si2, v2)


def make_scan(body_kind):
    @jax.jit
    def run(s, e, d, si, v):
        st_end0 = jnp.full(lead + (M,), 2**30, jnp.int32)
        st_dist0 = jnp.zeros(lead + (M,), jnp.float32)
        st_seed0 = jnp.full(lead + (M,), -1, jnp.int32)
        sp0 = jnp.zeros(lead, jnp.int32)
        x0 = jnp.full(lead, -1, jnp.int32)
        pos_range = jnp.arange(M)

        def step(carry, elem):
            st_end, st_dist, st_seed, sp, x = carry
            ee, dd, sii, va = elem
            if body_kind == "masks":
                ge_mask = (pos_range < sp[..., None]) & (st_end >= ee[..., None])
                suffix_pos = jnp.where(ge_mask.any(axis=-1), jnp.argmax(ge_mask, axis=-1), sp)
                any_closer = (ge_mask & (st_dist <= dd[..., None])).any(axis=-1)
                sp = sp + (suffix_pos % 2) + any_closer.astype(jnp.int32)
            elif body_kind == "onehot":
                oh = jax.nn.one_hot(sp, M, dtype=bool)
                st_end = jnp.where(oh, ee[..., None], st_end)
                st_seed = jnp.where(oh, sii[..., None], st_seed)
                st_dist = jnp.where(oh, dd[..., None], st_dist)
                sp = sp + 1 - (va.astype(jnp.int32))
            elif body_kind == "full":
                ge_mask = (pos_range < sp[..., None]) & (st_end >= ee[..., None])
                suffix_pos = jnp.where(ge_mask.any(axis=-1), jnp.argmax(ge_mask, axis=-1), sp)
                grow = ee > x
                any_closer = (ge_mask & (st_dist <= dd[..., None])).any(axis=-1)
                do_push = va & (grow | ~any_closer)
                put = jnp.where(grow, sp, suffix_pos)
                upd = va & do_push
                oh = jax.nn.one_hot(put, M, dtype=bool) & upd[..., None]
                st_end = jnp.where(oh, ee[..., None], st_end)
                st_dist = jnp.where(oh, dd[..., None], st_dist)
                st_seed = jnp.where(oh, sii[..., None], st_seed)
                new_sp = jnp.where(upd, put + 1, sp)
                kill = (pos_range >= new_sp[..., None]) & (pos_range < sp[..., None])
                st_end = jnp.where(kill, 2**30, st_end)
                st_seed = jnp.where(kill, -1, st_seed)
                x = jnp.where(va, jnp.maximum(x, ee), x)
                sp = new_sp
            return (st_end, st_dist, st_seed, sp, x), None

        elems = (
            jnp.moveaxis(e, -1, 0), jnp.moveaxis(d, -1, 0),
            jnp.moveaxis(si, -1, 0), jnp.moveaxis(v, -1, 0),
        )
        carry, _ = jax.lax.scan(step, (st_end0, st_dist0, st_seed0, sp0, x0), elems)
        return carry

    return run


for kind in ("masks", "onehot", "full"):
    bench(f"  scan body={kind}", make_scan(kind), s2, e2, d2, si2, v2)

for kind in ("full",):
    # with unroll
    @jax.jit
    def run_unroll(s, e, d, si, v):
        st_end0 = jnp.full(lead + (M,), 2**30, jnp.int32)
        st_dist0 = jnp.zeros(lead + (M,), jnp.float32)
        st_seed0 = jnp.full(lead + (M,), -1, jnp.int32)
        sp0 = jnp.zeros(lead, jnp.int32)
        x0 = jnp.full(lead, -1, jnp.int32)
        pos_range = jnp.arange(M)

        def step(carry, elem):
            st_end, st_dist, st_seed, sp, x = carry
            ee, dd, sii, va = elem
            ge_mask = (pos_range < sp[..., None]) & (st_end >= ee[..., None])
            suffix_pos = jnp.where(ge_mask.any(axis=-1), jnp.argmax(ge_mask, axis=-1), sp)
            grow = ee > x
            any_closer = (ge_mask & (st_dist <= dd[..., None])).any(axis=-1)
            do_push = va & (grow | ~any_closer)
            put = jnp.where(grow, sp, suffix_pos)
            upd = va & do_push
            oh = jax.nn.one_hot(put, M, dtype=bool) & upd[..., None]
            st_end = jnp.where(oh, ee[..., None], st_end)
            st_dist = jnp.where(oh, dd[..., None], st_dist)
            st_seed = jnp.where(oh, sii[..., None], st_seed)
            new_sp = jnp.where(upd, put + 1, sp)
            kill = (pos_range >= new_sp[..., None]) & (pos_range < sp[..., None])
            st_end = jnp.where(kill, 2**30, st_end)
            st_seed = jnp.where(kill, -1, st_seed)
            x = jnp.where(va, jnp.maximum(x, ee), x)
            return (st_end, st_dist, st_seed, new_sp, x), None

        elems = (
            jnp.moveaxis(e, -1, 0), jnp.moveaxis(d, -1, 0),
            jnp.moveaxis(si, -1, 0), jnp.moveaxis(v, -1, 0),
        )
        carry, _ = jax.lax.scan(
            step, (st_end0, st_dist0, st_seed0, sp0, x0), elems, unroll=8
        )
        return carry

    bench("  scan body=full unroll=8", run_unroll, s2, e2, d2, si2, v2)
