"""Minimizer index: host build + device-resident sorted-array lookup.

TPU re-design of the reference minimizer layer
(reference: libs/minimizerscpp/ — vendored minimap2 sketch.cpp/index.cpp —
wrapped by libs/ma/inc/ma/container/minimizer_index.h; hit->Seed conversion
semantics from minimizer_index.h seed_one:207-275).

Instead of minimap2's bucketed hash table, the index is a pair of sorted
arrays (hash, payload) — lookups are vectorized `searchsorted` over the
whole read batch, which maps a full read's seeding onto a handful of wide
gathers (no sequential FM-chain): this is the throughput seeding path on
TPU.

Sketch semantics follow minimap2: packed 2k-bit canonical k-mers (strand =
smaller of forward/revcomp packing, symmetric k-mers skipped), invertible
hash, window-of-w minimum with ties kept.
"""
from __future__ import annotations

import dataclasses
import os
from typing import NamedTuple, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ma_tpu.containers.pack import Pack
from ma_tpu.ops.extract import SeedBatch, compute_delta

UINT32 = np.uint32


def _hash_masked(key, mask, xp):
    """minimap2 hash64 (sketch.cpp): invertible mix on the masked domain."""
    key = xp.bitwise_and((~key) + (key << 21), mask)
    key = key ^ (key >> 24)
    key = xp.bitwise_and(key + (key << 3) + (key << 8), mask)
    key = key ^ (key >> 14)
    key = xp.bitwise_and(key + (key << 2) + (key << 4), mask)
    key = key ^ (key >> 28)
    key = xp.bitwise_and(key + (key << 31), mask)
    return key


def _sketch_arrays(codes, k: int, w: int, xp):
    """Shared sketch math for numpy (host build) and jnp (device query).

    codes: [..., L] int32 base codes (4/5 = N). Returns
    (minimizer_mask [..., L] bool over k-mer START positions,
     hash [..., L] uint32, strand [..., L] int32, valid_kmer [..., L] bool).
    Positions i > L-k are never selected.
    """
    L = codes.shape[-1]
    mask = UINT32((1 << (2 * k)) - 1)
    c = xp.asarray(codes).astype(UINT32)
    is_n = c >= 4
    c = xp.where(is_n, UINT32(0), c)

    def shift(arr, j, fill):
        """arr shifted left by j along the last axis (arr[..., i+j])."""
        if j == 0:
            return arr
        pad = xp.full(arr.shape[:-1] + (j,), fill, arr.dtype)
        return xp.concatenate([arr[..., j:], pad], axis=-1)

    kmer_f = xp.zeros(c.shape, UINT32)
    kmer_r = xp.zeros(c.shape, UINT32)
    any_n = xp.zeros(c.shape, bool)
    for j in range(k):
        cj = shift(c, j, UINT32(0))
        nj = shift(is_n, j, True)
        kmer_f = xp.bitwise_and((kmer_f << 2) | cj, mask)
        # reverse complement: base j of fwd k-mer lands at position k-1-j
        kmer_r = kmer_r | ((UINT32(3) ^ cj) << UINT32(2 * j))
        any_n = any_n | nj
    kmer_r = xp.bitwise_and(kmer_r, mask)
    valid = ~any_n
    strand = xp.where(kmer_r < kmer_f, 1, 0).astype(np.int32)
    canon = xp.where(kmer_r < kmer_f, kmer_r, kmer_f)
    sym = kmer_f == kmer_r
    valid = valid & ~sym
    h = _hash_masked(canon, mask, xp)
    big = UINT32(0xFFFFFFFF)
    h_key = xp.where(valid, h, big)

    # window minima: m[j] = min(h_key[j .. j+w)); i is a minimizer iff some
    # window covering i attains its minimum at i (ties kept, minimap2-style)
    m = h_key
    for j in range(1, w):
        m = xp.minimum(m, shift(h_key, j, big))
    sel = xp.zeros(c.shape, bool)
    for j in range(w):
        # window starting at i-j covers i
        if j == 0:
            mj = m
        else:
            pad = xp.full(c.shape[:-1] + (j,), big, UINT32)
            mj = xp.concatenate([pad, m[..., :-j]], axis=-1)
        sel = sel | (mj == h_key)
    sel = sel & valid
    # windows must fit: start positions limited to [0, L-k-w+1+w-1] = k-mer range
    idx = xp.arange(L)
    sel = sel & (idx <= L - k)
    return sel, h, strand, valid


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class MinimizerIndexDev:
    """Device arrays: minimizers sorted by hash, plus a top-bits bucket
    table that turns the O(log n)-gather searchsorted into one bucket read
    + a few in-bucket binary-search steps (gathers are the expensive op on
    TPU, so the step count matters more than the comparisons). shift/steps
    are static (pytree aux data) so the search step count unrolls."""

    hash_sorted: jax.Array  # uint32 [n]
    pos: jax.Array  # int32 [n] — global last-base position of the k-mer
    strand: jax.Array  # int32 [n] — 0 fwd, 1 rev (canonical orientation)
    bucket_lo: jax.Array  # int32 [2^bits + 1] — first row with hash>>shift >= t
    shift: int = 16
    steps: int = 8
    # unique-hash lookup tables (to_device builds them; the sharded path
    # leaves them None and uses the two-sided search): ONE binary search
    # over the deduplicated hashes replaces the left+right pair, and the
    # occurrence range comes from uoff — every search step saves a [B, L]
    # HBM gather, the dominant cost of the lookup on TPU
    hu: jax.Array | None = None  # uint32 [U] unique hashes
    uoff: jax.Array | None = None  # int32 [U+1] first row of each unique hash
    # packed (pos << 1 | strand) when the genome is small enough: halves
    # the final [B, max_seeds] row gathers
    posst: jax.Array | None = None
    # gather-packed companions (multi-column gathers cost the same as
    # single-column on TPU — profiling/profile_gather_tricks.py): one row
    # fetch delivers everything the step needs.
    blo2: jax.Array | None = None  # int32 [2^bits, 2] = (lo, hi) bucket rows
    vent: jax.Array | None = None  # int32 [U, 3] = (hash, uoff_i, uoff_{i+1})
    # CHD perfect hash (native/chd.cpp): EXACTLY two gathers per query —
    # displacement D[h & (m-1)], then one (hash, row_lo, row_hi) table row.
    # Replaces the whole binary search when present.
    chd_d: jax.Array | None = None  # int32 [m]
    chd_table: jax.Array | None = None  # int32 [T, 3]
    chd_tlog: int = 0
    chd_mlog: int = 0

    def tree_flatten(self):
        return (
            (self.hash_sorted, self.pos, self.strand, self.bucket_lo,
             self.hu, self.uoff, self.posst, self.blo2, self.vent,
             self.chd_d, self.chd_table),
            (self.shift, self.steps, self.chd_tlog, self.chd_mlog),
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        (hs, pos, strand, bucket_lo, hu, uoff, posst, blo2, vent,
         chd_d, chd_table) = children
        return cls(
            hash_sorted=hs, pos=pos, strand=strand, bucket_lo=bucket_lo,
            shift=aux[0], steps=aux[1], hu=hu, uoff=uoff, posst=posst,
            blo2=blo2, vent=vent, chd_d=chd_d, chd_table=chd_table,
            chd_tlog=aux[2], chd_mlog=aux[3],
        )


def build_bucket_table(hash_sorted: np.ndarray, target_bits: int = 24):
    """(bucket_lo, shift, steps) for a hash-sorted uint32 array.

    The table is oversized ~8x relative to the entry count so nearly every
    bucket holds <= 1 entry and the in-bucket binary search needs 1-2
    gather rounds instead of 5-8 (gathers are the dominant cost of the
    lookup on TPU; the int32 table costs 4 * 2^bits bytes of HBM)."""
    n = len(hash_sorted)
    bits = max(1, min(target_bits, max(int(np.ceil(np.log2(max(n, 2)))) + 4, 1)))
    shift = 32 - bits
    tops = (hash_sorted >> np.uint32(shift)).astype(np.int64)
    bucket_lo = np.searchsorted(tops, np.arange((1 << bits) + 1)).astype(np.int32)
    max_bucket = int(np.max(np.diff(bucket_lo))) if n else 0
    steps = max(1, int(np.ceil(np.log2(max_bucket + 1)))) if max_bucket else 1
    return bucket_lo, shift, steps


def bucketed_searchsorted(idx: "MinimizerIndexDev", h: jax.Array):
    """(lo, hi) occurrence ranges for hash values h (any shape)."""
    # empty index (e.g. every contig shorter than k+w): gathers over the
    # 0-row hu/vent tables are out-of-range errors — return empty ranges
    # before any gather (static Python check; ADVICE r3)
    if idx.chd_table is not None:
        n_unique = 1  # chd.build returns None for empty inputs
    elif idx.hu is not None:
        n_unique = idx.hu.shape[0]
    else:
        n_unique = idx.hash_sorted.shape[0] if idx.hash_sorted is not None else 0
    if n_unique == 0:
        z = jnp.zeros(jnp.shape(h), jnp.int32)
        return z, z
    if idx.chd_table is not None and os.environ.get("MA_TPU_MM_CHD", "1") == "1":
        # CHD perfect hash: two gathers total (native/chd.cpp builds it)
        from ma_tpu.native.chd import C1, C2

        b = (h & jnp.uint32((1 << idx.chd_mlog) - 1)).astype(jnp.int32)
        d = idx.chd_d[b].astype(jnp.uint32)
        slot = ((h ^ (d * jnp.uint32(C1))) * jnp.uint32(C2)) >> jnp.uint32(
            32 - idx.chd_tlog
        )
        row = idx.chd_table[slot.astype(jnp.int32)]
        found = jax.lax.bitcast_convert_type(row[..., 0], jnp.uint32) == h
        lo = jnp.where(found, row[..., 1], 0)
        hi = jnp.where(found, row[..., 2], 0)
        return lo, hi
    t = (h >> jnp.uint32(idx.shift)).astype(jnp.int32)
    if idx.vent is not None and os.environ.get("MA_TPU_MM_PACKED", "1") == "1":
        # fully gather-packed form: ONE row fetch per search step. blo2
        # delivers both bucket bounds at once; each vent row carries
        # (hash, row_lo, row_hi) so the verify + range read is one gather.
        bl = idx.blo2[t]
        l_lo, l_hi = bl[..., 0], bl[..., 1]
        hi = l_hi
        U = idx.vent.shape[0]
        as_u32 = lambda v: jax.lax.bitcast_convert_type(v, jnp.uint32)
        for _ in range(idx.steps):
            # search steps stay on the single-column hu array: a packed-row
            # probe fetches 3x the bytes per step for one useful word
            active = l_lo < l_hi
            mid = (l_lo + l_hi) >> 1
            v = idx.hu[jnp.clip(mid, 0, max(U - 1, 0))]
            go = active & (v < h)
            l_lo = jnp.where(go, mid + 1, l_lo)
            l_hi = jnp.where(active & ~go, mid, l_hi)
        i = jnp.clip(l_lo, 0, max(U - 1, 0))
        row = idx.vent[i]
        if U:
            found = (l_lo < hi) & (as_u32(row[..., 0]) == h)
        else:
            found = jnp.zeros_like(l_lo, bool)
        row_lo = jnp.where(found, row[..., 1], 0)
        row_hi = jnp.where(found, row[..., 2], 0)
        return row_lo, row_hi
    lo = idx.bucket_lo[t]
    hi = idx.bucket_lo[t + 1]
    if idx.hu is not None:
        # single-sided search over the unique hashes, then the occurrence
        # range from uoff (half the search gathers of the two-sided form)
        U = idx.hu.shape[0]
        l_lo, l_hi = lo, hi
        for _ in range(idx.steps):
            active = l_lo < l_hi
            mid = (l_lo + l_hi) >> 1
            v = idx.hu[jnp.clip(mid, 0, max(U - 1, 0))]
            go = active & (v < h)
            l_lo = jnp.where(go, mid + 1, l_lo)
            l_hi = jnp.where(active & ~go, mid, l_hi)
        i = jnp.clip(l_lo, 0, max(U - 1, 0))
        found = (l_lo < hi) & (idx.hu[i] == h) if U else jnp.zeros_like(l_lo, bool)
        row_lo = idx.uoff[i]
        row_hi = idx.uoff[jnp.minimum(i + 1, U)]
        row_lo = jnp.where(found, row_lo, 0)
        row_hi = jnp.where(found, row_hi, 0)
        return row_lo, row_hi
    n = idx.hash_sorted.shape[0]
    l_lo, l_hi = lo, hi  # bounds for the LEFT insertion point
    r_lo, r_hi = lo, hi  # bounds for the RIGHT insertion point
    for _ in range(idx.steps):
        active = l_lo < l_hi
        mid = (l_lo + l_hi) >> 1
        v = idx.hash_sorted[jnp.clip(mid, 0, max(n - 1, 0))]
        go = active & (v < h)
        l_lo = jnp.where(go, mid + 1, l_lo)
        l_hi = jnp.where(active & ~go, mid, l_hi)
        active2 = r_lo < r_hi
        mid2 = (r_lo + r_hi) >> 1
        v2 = idx.hash_sorted[jnp.clip(mid2, 0, max(n - 1, 0))]
        go2 = active2 & (v2 <= h)
        r_lo = jnp.where(go2, mid2 + 1, r_lo)
        r_hi = jnp.where(active2 & ~go2, mid2, r_hi)
    return l_lo, r_lo


@dataclasses.dataclass
class MinimizerIndex:
    k: int
    w: int
    hash_sorted: np.ndarray  # uint32 [n]
    pos: np.ndarray  # int32 [n]
    strand: np.ndarray  # int32 [n]
    # memoized device form: the CHD build + HBM upload of a genome-scale
    # index costs seconds over the tunnel — callers (MSV pipeline, repeated
    # CLI runs under --Serve) must not pay it per invocation
    _dev: tuple = dataclasses.field(  # (MA_TPU_MM_CHD value, device form)
        default=None, repr=False, compare=False
    )

    @classmethod
    def build(cls, pack: Pack, k: int = 15, w: int = 10) -> "MinimizerIndex":
        hs, ps, ss = [], [], []
        for ci in range(pack.num_contigs):
            codes = pack.contig_codes(ci).astype(np.int32)
            if len(codes) < k + w:
                continue
            sel, h, strand, _ = _sketch_arrays(codes, k, w, np)
            ii = np.flatnonzero(sel)
            hs.append(h[ii].astype(UINT32))
            ps.append((ii + k - 1 + int(pack.starts[ci])).astype(np.int32))
            ss.append(strand[ii].astype(np.int32))
        if hs:
            h = np.concatenate(hs)
            p = np.concatenate(ps)
            s = np.concatenate(ss)
        else:
            h = np.zeros(0, UINT32)
            p = np.zeros(0, np.int32)
            s = np.zeros(0, np.int32)
        order = np.argsort(h, kind="stable")
        return cls(k=k, w=w, hash_sorted=h[order], pos=p[order], strand=s[order])

    def to_device(self) -> MinimizerIndexDev:
        key = os.environ.get("MA_TPU_MM_CHD", "1")
        if self._dev is not None and self._dev[0] == key:
            return self._dev[1]
        dev = self._to_device_uncached()
        object.__setattr__(self, "_dev", (key, dev))
        return dev

    def _to_device_uncached(self) -> MinimizerIndexDev:
        # deduplicate: the device search runs over unique hashes, occurrence
        # ranges come from uoff (see MinimizerIndexDev docstring)
        n = len(self.hash_sorted)
        if n:
            new = np.empty(n, bool)
            new[0] = True
            np.not_equal(self.hash_sorted[1:], self.hash_sorted[:-1], out=new[1:])
            hu = self.hash_sorted[new]
            uoff = np.append(np.flatnonzero(new).astype(np.int32), np.int32(n))
        else:
            hu = np.zeros(0, UINT32)
            uoff = np.zeros(1, np.int32)
        bucket_lo, shift, steps = build_bucket_table(hu)
        posst = None
        if n == 0 or int(self.pos.max()) < (1 << 30):
            posst = jnp.asarray(
                (self.pos.astype(np.int64) << 1 | self.strand).astype(np.int32)
            )
        # CHD perfect hash: two-gather lookup (native/chd.cpp). When it
        # builds, the search-structure arrays below are dead weight — ship
        # only the CHD tables + occurrence rows to HBM.
        if os.environ.get("MA_TPU_MM_CHD", "1") == "1":
            from ma_tpu.native import chd as _chd

            built = _chd.build(hu, uoff) if (len(hu) and _chd.available()) else None
            if built is not None:
                D, tbl, tlog, mlog = built
                return MinimizerIndexDev(
                    hash_sorted=None,
                    pos=None if posst is not None else jnp.asarray(self.pos),
                    strand=None if posst is not None else jnp.asarray(self.strand),
                    bucket_lo=None,
                    shift=shift,
                    steps=steps,
                    hu=None,
                    uoff=None,
                    posst=posst,
                    blo2=None,
                    vent=None,
                    chd_d=jnp.asarray(D),
                    chd_table=jnp.asarray(tbl),
                    chd_tlog=tlog,
                    chd_mlog=mlog,
                )
        # gather-packed companions: bucket bounds as (lo, hi) rows and
        # (hash, row_lo, row_hi) per unique hash — one multi-column gather
        # each instead of 2-3 single-column ones (same cost per fetch on
        # TPU, profiling/profile_gather_tricks.py)
        blo2 = np.stack([bucket_lo[:-1], bucket_lo[1:]], axis=1).astype(np.int32)
        vent = np.empty((len(hu), 3), np.int32)
        vent[:, 0] = hu.view(np.int32)
        vent[:, 1] = uoff[:-1]
        vent[:, 2] = uoff[1:]
        # hash_sorted is unused by the unique-hash lookup, and pos/strand are
        # unused when posst packs both — don't ship dead copies to HBM
        return MinimizerIndexDev(
            hash_sorted=None,
            pos=None if posst is not None else jnp.asarray(self.pos),
            strand=None if posst is not None else jnp.asarray(self.strand),
            bucket_lo=jnp.asarray(bucket_lo),
            shift=shift,
            steps=steps,
            hu=jnp.asarray(hu),
            uoff=jnp.asarray(uoff),
            posst=posst,
            blo2=jnp.asarray(blo2),
            vent=jnp.asarray(vent),
        )

    # ------------------------------------------------------------------- I/O
    def store(self, prefix: str) -> None:
        np.savez_compressed(
            prefix + ".mmi.npz",
            k=np.int64(self.k),
            w=np.int64(self.w),
            hash_sorted=self.hash_sorted,
            pos=self.pos,
            strand=self.strand,
        )

    @classmethod
    def load(cls, prefix: str) -> "MinimizerIndex":
        z = np.load(prefix + ".mmi.npz")
        return cls(
            k=int(z["k"]), w=int(z["w"]), hash_sorted=z["hash_sorted"],
            pos=z["pos"], strand=z["strand"],
        )

    @staticmethod
    def exists(prefix: str) -> bool:
        import os

        return os.path.exists(prefix + ".mmi.npz")


def minimizer_seeding(
    idx: MinimizerIndexDev,
    seqs: jax.Array,  # [B, L] codes
    lens: jax.Array,  # [B]
    contig_starts: jax.Array,
    ref_len_forward,  # L scalar (pack.unpacked_size_forward_strand)
    k: int = 15,
    w: int = 10,
    max_occ: int = 50,
    max_seeds: int = 1024,
    rectangular: bool = True,
) -> SeedBatch:
    """Batched minimizer lookup -> SeedBatch (MinimizerSeeding::execute +
    seed_one hit conversion, minimizer_index.h:207-275)."""
    seqs = jnp.asarray(seqs, jnp.int32)
    B, L = seqs.shape
    lens = jnp.asarray(lens, jnp.int32)
    sel, h, strand_q, _ = _sketch_arrays(seqs, k, w, jnp)
    pos_ok = jnp.arange(L)[None, :] + k <= lens[:, None]
    sel = sel & pos_ok

    # Only ~2L/(w+1) of the L k-mer lanes are selected minimizers. Compact
    # them to a short [B, Mc] prefix (one cheap sort) BEFORE the hash
    # search so every search-step gather moves Mc lanes instead of L —
    # gather traffic is the dominant cost of the lookup on TPU.
    qpos = jnp.broadcast_to(jnp.arange(L, dtype=jnp.int32)[None, :], (B, L))
    exp = 2 * (L - k + 1) // (w + 1) + 1
    # ~2.4x the expected count at the default multiplier: every hash-search
    # gather moves Mc lanes, so the width is the lookup's cost knob; rows
    # that still overflow are flagged and keep a bit-reversed-spread subset
    mcx = int(os.environ.get("MA_TPU_MM_MCX", "2"))
    Mc = 32
    while Mc < min(mcx * exp, L):
        Mc *= 2
    if Mc < L:
        from ma_tpu.ops.sortops import sort_with_payloads as _swp

        n_sel = sel.sum(axis=1, dtype=jnp.int32)
        # rows with more selected minimizers than Mc lanes (low-complexity
        # reads where every k-mer ties) must truncate; ordering those rows
        # by BIT-REVERSED position keeps an evenly spread subset across the
        # whole read instead of dropping everything past position ~Mc
        # (ADVICE r3). Lane order is immaterial downstream (q_start rides
        # along; SoC re-sorts by delta), so only overflow rows switch keys.
        bits = max(1, int(L - 1).bit_length())
        rev = jnp.zeros_like(qpos)
        for b in range(bits):
            rev = (rev << 1) | ((qpos >> b) & 1)
        key_pos = jnp.where((n_sel > Mc)[:, None], rev, qpos)
        colkey = jnp.where(sel, key_pos, jnp.int32(1 << bits))
        _, (h, strand_q, qpos, sel) = _swp(
            [colkey], [h, jnp.asarray(strand_q, jnp.int32), qpos, sel]
        )
        h = h[:, :Mc]
        strand_q = strand_q[:, :Mc]
        qpos = qpos[:, :Mc]
        sel = sel[:, :Mc] & (jnp.arange(Mc)[None, :] < n_sel[:, None])

    lo, hi = bucketed_searchsorted(idx, h)
    occ = jnp.where(sel, hi - lo, 0)
    occ = jnp.where(occ > max_occ, 0, occ)  # hard occurrence cutoff

    # slot allocation: seed m of k-mer position i -> output row. A row-wise
    # searchsorted + per-slot gathers cost ~300 ms at this shape; both cum
    # and the slot iota are sorted, so ONE merge_rank delivers the owning
    # k-mer position of every slot plus all per-position values it needs
    # (ops/sortops.py; next-element values via a shifted carry).
    from ma_tpu.ops.sortops import merge_rank

    cum = jnp.cumsum(occ, axis=1)
    total = cum[:, -1]
    overflow = total > max_seeds
    if Mc < L:
        overflow = overflow | (n_sel > Mc)
    kk = jnp.arange(max_seeds, dtype=jnp.int32)[None, :]
    kk_b = jnp.broadcast_to(kk, (B, max_seeds))

    shift1 = lambda a: jnp.concatenate([a[:, 1:], a[:, -1:]], axis=1)
    strand_lane = jnp.asarray(strand_q, jnp.int32)
    rank, (cum_ex_at,), (lo_at, occ_at, strand_at, qpos_at) = merge_rank(
        cum, kk_b,
        carries=[cum],
        carries_any=[shift1(lo), shift1(occ), shift1(strand_lane), shift1(qpos)],
    )
    # rank-1 of a shifted carry is the value AT rank; rank==0 reads column 0
    first = rank == 0
    lo_at = jnp.where(first, lo[:, :1], lo_at)
    occ_at = jnp.where(first, occ[:, :1], occ_at)
    qstrand = jnp.where(first, strand_lane[:, :1], strand_at)
    pos_of = jnp.where(first, qpos[:, :1], qpos_at).astype(jnp.int32)
    j = kk - cum_ex_at
    valid = kk < total[:, None]

    n_idx = (idx.posst if idx.posst is not None else idx.pos).shape[0]
    rows = jnp.clip(lo_at + j, 0, max(n_idx - 1, 0))
    if n_idx == 0:  # empty index: no gatherable rows at all
        valid = valid & False
        rows = jnp.zeros_like(rows)
        rpos = jnp.zeros_like(rows)
        rstrand = jnp.zeros_like(rows)
    elif idx.posst is not None:
        ps = idx.posst[rows]
        rpos = ps >> 1  # global last-base position
        rstrand = ps & 1
    else:
        rpos = idx.pos[rows]
        rstrand = idx.strand[rows]
    same = rstrand == qstrand  # forward-strand match

    # Our SeedBatch convention keeps PLAIN read coordinates on both strands
    # (like the FMD extract path): for a reverse hit, read[q+j] matches
    # 3 - genome[ref_start - j], ref_start being the genome LAST base of the
    # k-mer (the mirrored-largest coordinate). The reference's seed_one
    # instead mirrors the query coordinate (minimizer_index.h:247-260) — its
    # consumers expect that; ours do not.
    q_start = pos_of
    ref_start = jnp.where(same, rpos - (k - 1), rpos)
    length = jnp.full((B, max_seeds), k, jnp.int32)

    delta = compute_delta(
        q_start, length, ref_start, same, lens[:, None], contig_starts,
        ref_len_forward, rectangular,
    )
    zero = jnp.zeros((B, max_seeds), jnp.int32)
    return SeedBatch(
        q_start=jnp.where(valid, q_start, zero),
        length=jnp.where(valid, length, zero),
        ref_start=jnp.where(valid, ref_start, zero),
        on_forward=same & valid,
        ambiguity=jnp.where(valid, occ_at, zero),
        delta=jnp.where(valid, delta, jnp.int32(2**31 - 1)),
        soc_nt=zero,
        valid=valid,
        n_seeds=jnp.minimum(total, max_seeds).astype(jnp.int32),
        overflow=overflow,
    )
