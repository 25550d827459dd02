"""MSV pipeline drivers: reads -> jumps -> calls.

Re-design of the reference MSV python drivers
(reference: libs/msv/python/computeSvJumps.py:6-122 — per-thread graph
MMFilteredSeeding -> SeedLumping -> SoC -> SvJumpsFromExtractedSeeds ->
JumpInserter — and libs/msv/python/sweepSvJumps.py:7-160 — section sweep ->
call filters -> inserter).

Device: one jitted batch (minimizer seeding + lumping) per read bucket.
Host: jump enumeration per read and the plane-sweep clustering. The SQL
jump/call store becomes in-memory arrays with npz persistence keyed by run
ids (ma_tpu/msv/store.py role of sv_db)."""
from __future__ import annotations

import functools
from typing import List, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ma_tpu.containers.nucseq import NucSeq
from ma_tpu.containers.pack import Pack
from ma_tpu.index.minimizer import MinimizerIndex, minimizer_seeding
from ma_tpu.msv.calls import SvCall
from ma_tpu.msv.jumps import JumpParams, SvJump, compute_jumps
from ma_tpu.msv.sweep import (
    filter_fuzzy_calls,
    filter_low_support_short_calls,
    sweep_jumps,
)
from ma_tpu.ops.extend_host import extend_seeds
from ma_tpu.ops.filters import min_length, seed_lump


def sv_seed_stage(mmi_dev, contig_starts, ref_len_forward, seqs, lens,
                  k: int = 15, w: int = 10, max_occ: int = 10000,
                  min_seed_len: int = 18):
    """Device stage: minimizer seeds -> lumping -> min length (the
    MMFilteredSeeding + SeedLumping part of computeSvJumps.py:52-86)."""

    @functools.partial(jax.jit, static_argnums=(0, 1, 2, 3))
    def run(k, w, max_occ, min_seed_len, mmi, cst, rlf, sq, ln):
        seeds = minimizer_seeding(
            mmi, sq, ln, cst, rlf, k=k, w=w, max_occ=max_occ,
            max_seeds=2048, rectangular=False,
        )
        seeds = seed_lump(seeds)
        return min_length(seeds, min_seed_len)

    return run(k, w, max_occ, min_seed_len, mmi_dev, contig_starts,
               ref_len_forward, jnp.asarray(seqs), jnp.asarray(lens, jnp.int32))


def compute_sv_jumps(
    reads: Sequence[NucSeq],
    pack: Pack,
    mmi: MinimizerIndex,
    params: JumpParams = JumpParams(),
    min_seed_len: int = 18,
    max_occ: int = 10000,
    batch: int = 512,
) -> List[SvJump]:
    """reads -> SvJump list (compute_sv_jumps, computeSvJumps.py:6-122)."""
    mmi_dev = mmi.to_device()
    cst = jnp.asarray(np.asarray(pack.starts, np.int32))
    rlf = pack.unpacked_size_forward_strand
    jumps: List[SvJump] = []
    next_id = 0
    for s in range(0, len(reads), batch):
        chunk = reads[s : s + batch]
        B = len(chunk)
        L = 32
        while L < max(len(r) for r in chunk):
            L *= 2
        seqs = np.full((B, L), 4, np.uint8)
        lens = np.zeros(B, np.int32)
        for i, r in enumerate(chunk):
            seqs[i, : len(r)] = r.codes
            lens[i] = len(r)
        sb = sv_seed_stage(mmi_dev, cst, rlf, seqs, lens, k=mmi.k, w=mmi.w,
                           max_occ=max_occ, min_seed_len=min_seed_len)
        q = np.asarray(sb.q_start)
        l = np.asarray(sb.length)
        r_ = np.asarray(sb.ref_start)
        fw = np.asarray(sb.on_forward)
        va = np.asarray(sb.valid)
        for b in range(B):
            mm = np.nonzero(va[b])[0]
            nt = int(l[b, mm].sum())
            seeds = [
                (int(q[b, m]), int(l[b, m]), int(r_[b, m]), bool(fw[b, m]), nt)
                for m in mm
            ]
            # maximal extension sharpens breakpoints (SeedLumping applies
            # SeedExtender in the reference, seedFilters.h:265-290)
            seeds = extend_seeds(seeds, chunk[b].codes, pack)
            rj = compute_jumps(seeds, len(chunk[b]), read_id=s + b, params=params)
            for j in rj:
                j.id = next_id
                next_id += 1
            jumps.extend(rj)
    return jumps


def sweep_sv_jumps(
    jumps: Sequence[SvJump],
    min_reads: int = 2,
    max_supp_nt: int = 10,
    max_call_size: int = 20,
    max_fuzziness: int = 50,
) -> List[SvCall]:
    """jumps -> filtered calls (sweep_sv_jumps, sweepSvJumps.py:7-160)."""
    calls = sweep_jumps(jumps, min_reads=min_reads)
    calls = filter_low_support_short_calls(calls, max_supp_nt, max_call_size)
    calls = filter_fuzzy_calls(calls, max_fuzziness)
    return calls
