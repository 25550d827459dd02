"""Pallas TPU kernel for the SoC overlap-vacuum sweep.

The XLA formulation in ops/soc.py runs the reference's
push_back_no_overlap monotonic-stack sweep (soc.h:362-404) as a nested
lax.while_loop whose [B, K, 8] stack state round-trips HBM on every one
of up to S sequential candidate steps. Here the stack lives in VMEM for a
block of reads (reads on lanes, stack slots on sublanes), and the
candidate table streams in as [S, R] planes — the same lockstep
candidate-index walk, no HBM traffic per step.

Semantics are IDENTICAL to ops/soc.py's sweep (which remains the CPU/test
reference): candidates processed in delta order; overlapping strips
resolve by SoCOrder (length, tie -> higher-ambiguity-is-less); the lower
strip shrinks via carried prefix-sum values; strips below min_score drop.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _soc_sweep_kernel(cand_ref, misc_ref, stack_ref, sp_over_ref, *,
                      K: int, S: int):
    """cand_ref [7, S, R]: sl, sa, we, pexs, aexs, pend, aend per candidate.
    misc_ref [8, R]: 0 = n (valid candidate count), 1 = min_score.
    Outputs: stack_ref [8 * K, R] (planes: start, end, len, amb, pexs,
    pend, aexs, aend), sp_over_ref [8, R]: 0 = sp, 1 = overflow."""
    R = misc_ref.shape[1]
    kk = jax.lax.broadcasted_iota(jnp.int32, (K, R), 0)

    stack_ref[:] = jnp.zeros((8 * K, R), jnp.int32)
    sp_over_ref[:] = jnp.zeros((8, R), jnp.int32)

    n = misc_ref[0, :][None, :]
    min_score = misc_ref[1, :][None, :]
    n_max = jnp.max(misc_ref[0, :])

    def get_plane(p):
        return stack_ref[p * K : (p + 1) * K, :]

    def outer(i, _):
        col = cand_ref[:, i, :]  # [7, R]
        sl = col[0, :][None, :]
        sa = col[1, :][None, :]
        we = col[2, :][None, :]
        pexs = col[3, :][None, :]
        aexs = col[4, :][None, :]
        pend = col[5, :][None, :]
        aend = col[6, :][None, :]
        active = (i < n) & (sl >= min_score) & (sl > 0)

        def inner(c):
            it, _ = c
            sp = sp_over_ref[0, :][None, :]
            over = sp_over_ref[1, :][None, :]
            done = sp_over_ref[2, :][None, :] != 0
            c_start = sp_over_ref[3, :][None, :]
            c_len = sp_over_ref[4, :][None, :]
            c_amb = sp_over_ref[5, :][None, :]
            c_pexs = sp_over_ref[6, :][None, :]
            c_aexs = sp_over_ref[7, :][None, :]

            sp1 = jnp.maximum(sp - 1, 0)
            at_top = kk == sp1
            def top_of(p):
                return jnp.sum(jnp.where(at_top, get_plane(p), 0), axis=0,
                               keepdims=True)
            top_start, top_end = top_of(0), top_of(1)
            top_len, top_amb = top_of(2), top_of(3)
            top_pexs, top_pend = top_of(4), top_of(5)
            top_aexs, top_aend = top_of(6), top_of(7)

            act = ~done
            overlap = act & (sp > 0) & (top_end > c_start)
            # SoCOrder::operator< (soc.h:71-76); boolean algebra instead of
            # a bool-valued select (select_n on i1 does not lower in Mosaic)
            eq = top_len == c_len
            back_lower = (eq & (top_amb > c_amb)) | (~eq & (top_len < c_len))
            case_a = overlap & back_lower
            a_len = c_pexs - top_pexs
            a_amb = c_aexs - top_aexs
            drop_back = case_a & ((a_len < min_score) | (a_len <= 0))
            shrink_back = case_a & ~drop_back
            case_b = overlap & ~back_lower
            b_len = pend - top_pend
            b_amb = aend - top_aend
            drop_cand = case_b & ((b_len < min_score) | (b_len <= 0))
            keep_b = case_b & ~drop_cand

            # shrink the top strip in place to [top_start, c_start)
            sb = at_top & shrink_back
            new_top = (top_start, c_start, a_len, a_amb, top_pexs, c_pexs,
                       top_aexs, c_aexs)
            for p, v in enumerate(new_top):
                stack_ref[p * K : (p + 1) * K, :] = jnp.where(
                    sb, v, get_plane(p)
                )

            p_start = jnp.where(keep_b, top_end, c_start)
            p_len = jnp.where(keep_b, b_len, c_len)
            p_amb = jnp.where(keep_b, b_amb, c_amb)
            p_pexs = jnp.where(keep_b, top_pend, c_pexs)
            p_aexs = jnp.where(keep_b, top_aend, c_aexs)
            push_l = act & (~overlap | shrink_back | keep_b)
            can_push = push_l & (sp < K)
            at_slot = kk == jnp.minimum(sp, K - 1)
            ps = at_slot & can_push
            new_cand = (p_start, we, p_len, p_amb, p_pexs, pend, p_aexs, aend)
            for p, v in enumerate(new_cand):
                stack_ref[p * K : (p + 1) * K, :] = jnp.where(
                    ps, v, get_plane(p)
                )
            nsp = sp + can_push.astype(jnp.int32) - drop_back.astype(jnp.int32)
            nover = over | (push_l & ~can_push).astype(jnp.int32)
            ndone = done | (act & ~drop_back)
            sp_over_ref[0, :] = nsp[0]
            sp_over_ref[1, :] = nover[0]
            sp_over_ref[2, :] = ndone.astype(jnp.int32)[0]
            sp_over_ref[3, :] = p_start[0]
            sp_over_ref[4, :] = p_len[0]
            sp_over_ref[5, :] = p_amb[0]
            sp_over_ref[6, :] = p_pexs[0]
            sp_over_ref[7, :] = p_aexs[0]
            still = jnp.sum((~ndone).astype(jnp.int32)) > 0
            return it + 1, still

        # init the inner carry state: candidate values, done = ~active
        sp_over_ref[2, :] = (~active).astype(jnp.int32)[0]
        sp_over_ref[3, :] = jnp.broadcast_to(i, (1, R)).astype(jnp.int32)[0]
        sp_over_ref[4, :] = sl[0]
        sp_over_ref[5, :] = sa[0]
        sp_over_ref[6, :] = pexs[0]
        sp_over_ref[7, :] = aexs[0]
        jax.lax.while_loop(
            lambda c: c[1] & (c[0] < K + 2), inner,
            (jnp.int32(0), jnp.asarray(True)),
        )
        return 0

    jax.lax.fori_loop(0, n_max, outer, 0, unroll=False)


@functools.partial(jax.jit, static_argnames=("K", "interpret"))
def soc_sweep_pallas(cand_all, n, min_score, K: int, interpret: bool = False):
    """cand_all [S, B, 7] (the ops/soc.py candidate table), n [B] valid
    candidate counts, min_score [B]. Returns (stack [B, K, 8], sp [B],
    overflow [B]) identical to the XLA while_loop sweep."""
    S, B, _ = cand_all.shape
    interpret = interpret or jax.default_backend() == "cpu"
    # lane-block size: the [7, S, RT] candidate block + [8K, RT] stack must
    # fit VMEM (~12 MB budget); long-read/SV shapes run S up to 2048
    budget = 12 * 2**20
    per_lane = 4 * (7 * S + 8 * K + 24)
    RT = 512
    while RT > 128 and RT * per_lane > budget:
        RT //= 2
    if B < RT:
        RT = max(128, ((B + 127) // 128) * 128)
    Bp = ((B + RT - 1) // RT) * RT
    pad = Bp - B
    ct = jnp.transpose(cand_all, (2, 0, 1)).astype(jnp.int32)  # [7, S, B]
    if pad:
        ct = jnp.pad(ct, ((0, 0), (0, 0), (0, pad)))
    misc = jnp.zeros((8, Bp), jnp.int32)
    misc = misc.at[0, :B].set(jnp.asarray(n, jnp.int32))
    misc = misc.at[1, :B].set(
        jnp.broadcast_to(jnp.asarray(min_score, jnp.int32), (B,))
    )

    grid = (Bp // RT,)
    stack, sp_over = pl.pallas_call(
        functools.partial(_soc_sweep_kernel, K=K, S=S),
        grid=grid,
        in_specs=[
            pl.BlockSpec((7, S, RT), lambda g: (0, 0, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, RT), lambda g: (0, g), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((8 * K, RT), lambda g: (0, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, RT), lambda g: (0, g), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((8 * K, Bp), jnp.int32),
            jax.ShapeDtypeStruct((8, Bp), jnp.int32),
        ],
        interpret=interpret,
    )(ct, misc)
    # [8K, B] -> [B, K, 8]
    st = stack[:, :B].reshape(8, K, B).transpose(2, 1, 0)
    return st, sp_over[0, :B], sp_over[1, :B].astype(bool)
