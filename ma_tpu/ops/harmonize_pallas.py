"""Pallas TPU kernel for the harmonization shadow line sweep.

The XLA `lax.scan` formulation of the sweep (ma_tpu/ops/harmonize.py
_linesweep; reference: harmonization.cpp linesweep:182-249) streams its
[rows, M] stack state through HBM on every one of the M sequential steps
— measured at ~550 ms per sweep for a 4096-read batch on a v5e. This
kernel keeps the whole stack in VMEM for a block of rows and runs the M
steps as a register/VMEM loop: same semantics, no HBM round-trips.

Layout: rows on the LANE axis, stack/element positions on sublanes, so the
per-step element row is a cheap major-dim slice and all stack ops are
[M, R_block] vector work.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = 2**30


def _sweep_kernel(end_ref, dist_ref, valid_ref, orig_ref, surv_ref, st_end,
                  st_dist, st_seed, misc, *, M: int):
    R = end_ref.shape[1]
    st_end[:] = jnp.full((M, R), BIG, jnp.int32)
    st_dist[:] = jnp.zeros((M, R), jnp.float32)
    st_seed[:] = jnp.full((M, R), -1, jnp.int32)
    # misc rows: 0 = sp, 1 = x (max end so far)
    misc[0, :] = jnp.zeros((R,), jnp.int32)
    misc[1, :] = jnp.full((R,), -1, jnp.int32)

    pos = jax.lax.broadcasted_iota(jnp.int32, (M, R), 0)

    def step(j, _):
        e = end_ref[j, :][None, :]  # [1, R]
        d = dist_ref[j, :][None, :]
        va = valid_ref[j, :][None, :] != 0
        sp = misc[0, :][None, :]
        x = misc[1, :][None, :]

        in_stack = pos < sp
        ge = in_stack & (st_end[:] >= e)
        any_ge = ge.any(axis=0, keepdims=True)
        suffix_pos = jnp.min(jnp.where(ge, pos, M), axis=0, keepdims=True)
        suffix_pos = jnp.where(any_ge, suffix_pos, sp)
        grow = e > x
        any_closer = (ge & (st_dist[:] <= d)).any(axis=0, keepdims=True)
        do_push = va & (grow | ~any_closer)
        put = jnp.where(grow, sp, suffix_pos)

        oh = (pos == put) & do_push
        st_end[:] = jnp.where(oh, e, st_end[:])
        st_dist[:] = jnp.where(oh, d, st_dist[:])
        st_seed[:] = jnp.where(oh, orig_ref[j, :][None, :], st_seed[:])
        new_sp = jnp.where(do_push, put + 1, sp)
        kill = (pos >= new_sp) & in_stack
        st_end[:] = jnp.where(kill, BIG, st_end[:])
        st_seed[:] = jnp.where(kill, -1, st_seed[:])
        misc[0, :] = new_sp[0]
        misc[1, :] = jnp.where(va, jnp.maximum(x, e), x)[0]
        return 0

    jax.lax.fori_loop(0, M, step, 0, unroll=False)

    # survivors, reported at ORIGINAL seed positions (st_seed holds the
    # original index each live slot was pushed from). A dynamic fori_loop,
    # NOT a Python loop: unrolled at M=2048 (long reads) the kernel grows
    # to >10k ops and OOM-kills the XLA compile helper.
    sp = misc[0, :][None, :]

    def mark(p, surv):
        row_seed = st_seed[pl.ds(p, 1)]  # [1, R]
        row_alive = (p < sp) & (row_seed >= 0)
        return jnp.where((pos == row_seed) & row_alive, 1, surv)

    surv = jax.lax.fori_loop(0, M, mark, jnp.zeros((M, R), jnp.int32),
                             unroll=False)
    surv_ref[:] = surv.astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("interpret",))
def linesweep_sorted_pallas(s_end, s_dist, s_valid, s_orig=None,
                            interpret: bool = False):
    """Survivor mask for PRESORTED shadow elements.

    s_end/s_dist/s_valid: [R, M] in (start asc, end desc) processing order.
    s_orig (optional int32 [R, M]): original position of each sorted element;
    when given, the returned mask is over ORIGINAL positions, else over the
    sorted positions. Returns surv [R, M] bool.
    """
    R, M = s_end.shape
    if s_orig is None:
        s_orig = jnp.broadcast_to(jnp.arange(M, dtype=jnp.int32), (R, M))
    # row-block size bounded by VMEM: 4 input blocks + 3 [M, RT] scratch
    # planes + survivors (~29 bytes/element) must fit the ~12 MB scoped
    # budget — long-read shapes run M up to 2048
    budget = 12 * 2**20
    per_lane = 29 * M + 64
    RT = 2048
    while RT > 128 and RT * per_lane > budget:
        RT //= 2
    if R < RT:
        RT = max(128, ((R + 127) // 128) * 128)
    Rp = ((R + RT - 1) // RT) * RT
    pad = Rp - R

    def prep(a, dt):
        a = jnp.asarray(a, dt)
        if pad:
            a = jnp.concatenate([a, jnp.zeros((pad, M), dt)], axis=0)
        return a.T  # [M, Rp]

    end_t = prep(s_end, jnp.int32)
    dist_t = prep(s_dist, jnp.float32)
    valid_t = prep(s_valid, jnp.int32)
    orig_t = prep(s_orig, jnp.int32)

    grid = (Rp // RT,)
    blk = lambda dt: pl.BlockSpec((M, RT), lambda g: (0, g), memory_space=pltpu.VMEM)
    surv_t = pl.pallas_call(
        functools.partial(_sweep_kernel, M=M),
        grid=grid,
        in_specs=[blk(jnp.int32), blk(jnp.float32), blk(jnp.int32), blk(jnp.int32)],
        out_specs=pl.BlockSpec((M, RT), lambda g: (0, g), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, Rp), jnp.uint8),
        scratch_shapes=[
            pltpu.VMEM((M, RT), jnp.int32),
            pltpu.VMEM((M, RT), jnp.float32),
            pltpu.VMEM((M, RT), jnp.int32),
            pltpu.VMEM((8, RT), jnp.int32),
        ],
        interpret=interpret,
    )(end_t, dist_t, valid_t, orig_t)
    return surv_t.T[:R].astype(bool)
