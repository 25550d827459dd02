"""Micro-benchmarks of the primitive ops the device stage is built from,
on the real chip: sorts, gathers, scans, reductions at pipeline shapes.
These numbers decide which formulations are affordable.
"""
import sys
import time

import numpy as np

import ma_tpu

ma_tpu.enable_compilation_cache()

import jax
import jax.numpy as jnp

B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
S = 512
M = 64
K = 8

rng = np.random.default_rng(0)
a32 = jnp.asarray(rng.integers(0, 1 << 20, (B, S)).astype(np.int32))
b32 = jnp.asarray(rng.integers(0, 1 << 20, (B, S)).astype(np.int32))
c32 = jnp.asarray(rng.integers(0, 2, (B, S)).astype(np.int32))
idxBKM = jnp.asarray(rng.integers(0, S, (B, K, M)).astype(np.int32))
small = jnp.asarray(rng.integers(0, 1 << 20, (B, K, 2, M)).astype(np.int32))
table = jnp.asarray(rng.integers(0, 1 << 20, 2_000_000).astype(np.int32))
hits = jnp.asarray(rng.integers(0, 2_000_000, (B, S)).astype(np.int32))


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
    print(f"{name:44s} {min(ts)*1e3:8.2f} ms")


bench("argsort [B,S]", lambda x: jnp.argsort(x, axis=1), a32)
bench("sort1key [B,S]", lambda x: jnp.sort(x, axis=1), a32)
bench("lexsort3 [B,S]", lambda x, y, z: jnp.lexsort((x, y, z), axis=-1), a32, b32, c32)
bench(
    "sort+3payload [B,S]",
    lambda x, y, z, w: jax.lax.sort((x, y, z, w), num_keys=1),
    a32, b32, c32, a32,
)
bench(
    "take_along_axis x8 [B,S]",
    lambda x, o: tuple(jnp.take_along_axis(x + i, o, axis=1) for i in range(8)),
    a32, jnp.argsort(a32, axis=1),
)
bench(
    "gather [B,K,M] from [B,S] (2d)",
    lambda x, i: x[jnp.arange(B)[:, None, None], i],
    a32, idxBKM,
)
bench(
    "gather [B,K,M] from [B,S] (flat1d)",
    lambda x, i: x.reshape(-1)[(jnp.arange(B)[:, None, None] * S + i).reshape(-1)].reshape(B, K, M),
    a32, idxBKM,
)
bench("gather 1d table[hits] [B,S]", lambda t, h: t[h], table, hits)
bench(
    "searchsorted [B,S] into [B,S]",
    lambda x, q: jax.vmap(lambda r, v: jnp.searchsorted(r, v, side="right"))(x, q),
    jnp.sort(a32, axis=1), b32,
)
bench("cumsum [B,S]", lambda x: jnp.cumsum(x, axis=1), a32)
bench(
    "assoc_scan segmax [B,S]",
    lambda g, e: jax.lax.associative_scan(
        lambda a, b: (b[0], jnp.where(a[0] == b[0], jnp.maximum(a[1], b[1]), b[1])),
        (g, e), axis=1,
    ),
    c32, a32,
)
bench("elementwise x20 [B,S]", lambda x: sum(jnp.maximum(x + i, i) for i in range(20)), a32)
bench("reduce max axis1 [B,S]", lambda x: x.max(axis=1), a32)
bench("lexsort2 [B,K,2,M] small", lambda x: jnp.lexsort((-x, x + 1), axis=-1), small)
bench(
    "scan 64 steps tiny body [B,K,2] carry",
    lambda x: jax.lax.scan(
        lambda c, e: (jnp.maximum(c, e), None), x[..., 0], jnp.moveaxis(x, -1, 0)
    )[0],
    small,
)
bench(
    "scan 64 steps [B,K,2,M] carry",
    lambda x: jax.lax.scan(
        lambda c, e: (jnp.maximum(c, e[..., None]), None),
        x, jnp.moveaxis(x, -1, 0),
    )[0],
    small,
)


def _fori512(x):
    def body(i, c):
        col = jax.lax.dynamic_slice_in_dim(x, i % 64, 1, axis=3)[..., 0]
        return jnp.maximum(c, col)
    return jax.lax.fori_loop(0, 512, body, x[..., 0])


bench("fori 512 steps tiny body [B,K,2]", _fori512, small)


def _nested_while(x):
    def outer_cond(c):
        return c[0] < 512

    def outer_body(c):
        i, acc = c
        def inner_cond(s):
            return s[0] < 1
        def inner_body(s):
            j, a = s
            return (j + 1, jnp.maximum(a, a * 0 + i))
        _, acc = jax.lax.while_loop(inner_cond, inner_body, (0, acc))
        return (i + 1, acc)

    return jax.lax.while_loop(outer_cond, outer_body, (0, x[..., 0]))[1]


bench("nested while 512x1 tiny [B,K,2]", _nested_while, small)

import sys as _sys
_sys.path.insert(0, "/root/repo")
from ma_tpu.ops.harmonize_pallas import linesweep_sorted_pallas
R, M2 = 65536, 64
e_ = jnp.asarray(rng.integers(0, 500, (R, M2)).astype(np.int32))
d_ = jnp.asarray(rng.random((R, M2)).astype(np.float32))
v_ = jnp.asarray(rng.random((R, M2)) < 0.7)
bench("pallas linesweep kernel [65536,64]", linesweep_sorted_pallas, e_, d_, v_)
bench("lexsort2 [65536,64]", lambda x: jnp.lexsort((-x, x + 1), axis=-1), e_)
bench(
    "backmap [R,M,M] any-reduce",
    lambda o, s: ((o[..., :, None] == jnp.arange(M2)[None, :]) & s[..., :, None]).any(axis=-2),
    jnp.argsort(e_, axis=-1), v_,
)
