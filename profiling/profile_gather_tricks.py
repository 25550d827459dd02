"""Microbenchmarks for the gather/scatter alternatives considered for the
device stage (window extraction, pack compaction, table lookups).

Run on the real chip: python profiling/profile_gather_tricks.py
"""
import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time

import numpy as np

import ma_tpu

ma_tpu.enable_compilation_cache()

import jax
import jax.numpy as jnp

B, S, K, M = 4096, 512, 8, 64
TAB = 187_082

rng = np.random.default_rng(0)
planes = jnp.asarray(rng.integers(0, 1 << 30, size=(5, B, S)), jnp.int32)
starts = jnp.asarray(rng.integers(0, S - M, size=(B, K)), jnp.int32)
table = jnp.asarray(rng.integers(0, 1 << 30, size=(TAB,)), jnp.int32)
qidx = jnp.asarray(rng.integers(0, TAB, size=(B, 160)), jnp.int32)
qidx512 = jnp.asarray(rng.integers(0, TAB, size=(B, 512)), jnp.int32)

flat = rng.random((B * K * M,)) < 0.03
scat_idx = jnp.asarray(
    np.where(flat, np.cumsum(flat) - 1, B * K * M), jnp.int32
)
vals = jnp.asarray(rng.integers(0, 1 << 30, size=(3, B * K * M)), jnp.int32)


@jax.jit
def window_gather_flat(planes, starts):
    offs = jnp.arange(M)[None, None, :]
    idx = jnp.clip(starts[:, :, None] + offs, 0, S - 1)
    flat_idx = (jnp.arange(B)[:, None, None] * S + idx).reshape(-1)
    outs = [p.reshape(-1)[flat_idx].reshape(B, K, M) for p in planes]
    return jnp.stack(outs)


@jax.jit
def window_gather_barrel(planes, starts):
    # roll rows left by starts[b, k] using log2(S) masked static shifts,
    # shrinking the live width once the remaining shift bound allows
    outs = []
    for k in range(K):
        st = starts[:, k]
        cur = planes  # [5, B, W]
        width = S
        rem = S  # remaining max shift + 1
        for bit in reversed(range(int(np.log2(S)))):
            sh = 1 << bit
            if sh >= width:
                continue
            shifted = jnp.concatenate(
                [cur[..., sh:], jnp.zeros((5, B, sh), cur.dtype)], axis=-1
            )
            on = (st & sh) != 0
            cur = jnp.where(on[None, :, None], shifted, cur)
            rem = sh
            need = M + rem - 1
            if need < width:
                width = need
                cur = cur[..., :width]
        outs.append(cur[..., :M])
    return jnp.stack(outs, axis=2)  # [5, B, K, M]


@jax.jit
def table_gather_160(table, qidx):
    return table[qidx]


@jax.jit
def table_gather_512(table, qidx):
    return table[qidx]


@jax.jit
def scatter_pack(vals, scat_idx):
    out = jnp.zeros((3, B * K * M), jnp.int32)
    for k in range(3):
        out = out.at[k, scat_idx].set(vals[k], mode="drop")
    return out


@jax.jit
def sort_pack(vals, scat_idx):
    key = jnp.where(scat_idx < B * K * M, scat_idx, jnp.int32(2**30))
    _, a, b, c = jax.lax.sort(
        (key[None, :], vals[0:1], vals[1:2], vals[2:3]), num_keys=1,
        is_stable=True,
    )
    return jnp.concatenate([a, b, c])


def _force(out):
    leaves = jax.tree_util.tree_leaves(out)
    return np.asarray(leaves[0].reshape(-1)[:1])


def bench(name, fn, *args):
    t0 = time.perf_counter()
    out = fn(*args)
    _force(out)
    tc = time.perf_counter() - t0
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        out = fn(*args)
        _force(out)
        ts.append(time.perf_counter() - t0)
    print(f"{name:24s} compile+1st={tc:7.2f}s steady={min(ts)*1e3:8.2f} ms",
          flush=True)
    return out


a = bench("window gather (flat)", window_gather_flat, planes, starts)
b = bench("window gather (barrel)", window_gather_barrel, planes, starts)
print("  equal:", bool(jnp.all(a == b)))
bench("table gather [B,160]", table_gather_160, table, qidx)
bench("table gather [B,512]", table_gather_512, table, qidx512)
x = bench("pack scatter 2M", scatter_pack, vals, scat_idx)
y = bench("pack sort 2M", sort_pack, vals, scat_idx)
print("  equal:", bool(jnp.all(x[:, : int(flat.sum())] == y[:, : int(flat.sum())])))
