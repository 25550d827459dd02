"""Gather-free sorted-array primitives for TPU.

Minor-axis `take_along_axis` and row-wise `searchsorted` lower to serial
row gathers on TPU: measured ~25 ms per [4096, 512] gather and ~225 ms per
vmapped searchsorted (9 binary-search rounds) on a v5e — while a variadic
`lax.sort` costs ~1 ms per operand (profiling/profile_truth.py). Every hot
permutation/rank computation is therefore expressed through sorts:

* sort_with_payloads — one stable variadic sort instead of argsort+takes
* merge_rank        — searchsorted(sorted values, sorted queries) plus
                      forward-filled carried values, via two sorts of the
                      merged stream (the classic sort-merge rank trick)
* forward-fill      — "value of the last marked element at or before me",
                      via a cummax of (position << SHIFT | value) packing
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def _to_sortable(a: jax.Array) -> Tuple[jax.Array, object]:
    if a.dtype == jnp.bool_:
        return a.astype(jnp.int32), jnp.bool_
    return a, None


def sort_with_payloads(keys: Sequence[jax.Array], payloads: Sequence[jax.Array]):
    """Stable ascending sort along the last axis by `keys` (major first),
    carrying `payloads` through the sorting network. Bool arrays are cast
    to int32 for the sort and restored after."""
    ops = []
    restore = []
    for a in list(keys) + list(payloads):
        s, dt = _to_sortable(a)
        ops.append(s)
        restore.append(dt)
    out = jax.lax.sort(tuple(ops), num_keys=len(keys), is_stable=True)
    res = [
        o.astype(jnp.bool_) if dt is jnp.bool_ else o
        for o, dt in zip(out, restore)
    ]
    return res[: len(keys)], res[len(keys):]


def sel_minor(arr: jax.Array, idx: jax.Array) -> jax.Array:
    """arr[..., idx[..., k]] via one-hot mask + reduce (no minor-axis
    gather). arr [..., P], idx [..., K] -> [..., K]."""
    P = arr.shape[-1]
    mask = jnp.arange(P) == idx[..., None]
    return jnp.where(mask, arr[..., None, :], 0).sum(axis=-1).astype(arr.dtype)


def searchsorted_rows(
    values: jax.Array,  # [B, S] sorted per row
    queries: jax.Array,  # [B, Q] arbitrary order
    side: str = "right",
) -> jax.Array:
    """Row-wise searchsorted without binary-search gathers: sort the
    queries (carrying their slot), merge-rank, restore order."""
    B, Q = queries.shape
    qkey = queries if side == "right" else queries - 1
    slot = jnp.broadcast_to(jnp.arange(Q, dtype=jnp.int32), (B, Q))
    (sq,), (sslot,) = sort_with_payloads([qkey], [slot])
    rank, _, _ = merge_rank(values, sq)
    _, (back,) = sort_with_payloads([sslot], [rank])
    return back


def merge_rank(
    values: jax.Array,  # [B, S] sorted ascending per row
    queries: jax.Array,  # [B, Q] sorted ascending per row
    carries: Sequence[jax.Array] = (),  # [B, S] each, NON-DECREASING per row
    carries_any: Sequence[jax.Array] = (),  # [B, S], any values in [0, 2^31)
) -> Tuple[jax.Array, list, list]:
    """rank[b, m] = number of values[b, :] <= queries[b, m]
    (== searchsorted(values, queries, side='right')), plus for each carry
    array c the forward-filled value c[rank-1] (0 where rank == 0).

    Both inputs must be sorted. `carries` must be non-decreasing (a running
    max IS the fill); `carries_any` may hold arbitrary non-negative int32
    values (filled via a cummax of (merged-position << 31 | value) int64
    packing). Two variadic sorts of the [B, S+Q] merged stream, no gathers.
    """
    B, S = values.shape
    Q = queries.shape[1]
    val_m = jnp.concatenate([values, queries], axis=1)
    # tag: values first on ties (side='right' counts equal values)
    tag = jnp.concatenate(
        [jnp.zeros((B, S), jnp.int32), jnp.ones((B, Q), jnp.int32)], axis=1
    )
    mrank = jnp.concatenate(
        [jnp.zeros((B, S), jnp.int32),
         jnp.broadcast_to(jnp.arange(Q, dtype=jnp.int32), (B, Q))], axis=1
    )
    carry_ops = [
        jnp.concatenate([c, jnp.zeros((B, Q), c.dtype)], axis=1) for c in carries
    ]
    carry_any_ops = [
        jnp.concatenate([c.astype(jnp.int32), jnp.zeros((B, Q), jnp.int32)], axis=1)
        for c in carries_any
    ]
    (_, stag), payload = sort_with_payloads(
        [val_m, tag], [mrank] + carry_ops + carry_any_ops
    )
    smrank = payload[0]
    scarries = payload[1 : 1 + len(carries)]
    scarries_any = payload[1 + len(carries):]
    is_val = stag == 0
    # #values seen so far (inclusive) = rank for a query at this slot
    rank_here = jnp.cumsum(is_val.astype(jnp.int32), axis=1)
    filled = [
        jax.lax.cummax(jnp.where(is_val, c, jnp.zeros_like(c)), axis=1)
        for c in scarries
    ]
    # forward-fill of arbitrary values via cummax of (position << k | chunk):
    # int64 is unavailable (x64 disabled), so the 31-bit value is filled in
    # k-bit chunks where k = 30 - ceil(log2(S+Q)) (position must dominate
    # the packing; long-read rows reach S+Q ~ 100k, so k adapts).
    row_len = S + Q
    pos_bits = max(1, (row_len - 1).bit_length())
    k_bits = 30 - pos_bits
    assert k_bits >= 1, "merge_rank carries_any: row too long to pack"
    n_chunks = -(-31 // k_bits)
    mask_k = (1 << k_bits) - 1
    mpos = jnp.broadcast_to(jnp.arange(row_len, dtype=jnp.int32), (B, row_len))
    filled_any = []
    for c in scarries_any:
        c32 = c.astype(jnp.int32)

        def fill_chunk(chunk):
            packed = jnp.where(is_val, (mpos << k_bits) | chunk, -1)
            fp = jax.lax.cummax(packed, axis=1)
            return jnp.where(fp >= 0, fp & mask_k, 0)

        out32 = jnp.zeros_like(c32)
        for ci in range(n_chunks):
            chunk = (c32 >> (ci * k_bits)) & mask_k
            out32 = out32 | (fill_chunk(chunk) << (ci * k_bits))
        filled_any.append(out32)
    # deliver back in query order: sort by (tag, mrank) -> queries last, in order
    _, payload_back = sort_with_payloads(
        [stag, smrank], [rank_here] + filled + filled_any
    )
    rank = payload_back[0][:, S:]
    nf = len(filled)
    out_carries = [p[:, S:] for p in payload_back[1 : 1 + nf]]
    out_any = [p[:, S:] for p in payload_back[1 + nf:]]
    return rank, out_carries, out_any


def run_ends(change: jax.Array) -> jax.Array:
    """For rows partitioned into runs (change[b, i] = True iff i starts a
    new run), return run_end[b, i] = end (exclusive) of i's run. Reverse
    cummin of the next-run-start positions; no searchsorted."""
    B, S = change.shape
    idx = jnp.arange(S, dtype=jnp.int32)[None, :]
    nxt = jnp.concatenate([change[:, 1:], jnp.ones((B, 1), bool)], axis=1)
    rev = jnp.where(nxt, idx + 1, S + 1)[:, ::-1]
    ends = jax.lax.cummin(rev, axis=1)[:, ::-1]
    return jnp.minimum(ends, S).astype(jnp.int32)
