"""Device max-spanning seeding vs a host reference implementation.

The host implementation below is a direct transcription of the reference
control flow (binarySeeding.h maximallySpanningExtension + procesInterval)
running on the host FMDIndex; the device state machine must produce the
identical segment set.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from ma_tpu.containers.nucseq import revcomp_codes
from ma_tpu.index import FMDIndex
from ma_tpu.ops import occ as occ_ops
from ma_tpu.ops.seeding import max_spanning_seeding


def comp(c):
    return 3 - c if c < 4 else c


def host_max_spanning(fmd, q, min_amb=0, max_amb=100):
    """Host transcription of maximallySpanningExtension + procesInterval."""
    segs = []

    def extension(center):
        qc = int(q[center])
        if qc >= 4:
            return (center, center + 1)
        ik = fmd.init_interval(comp(qc))
        if ik[2] == 0:
            return (center, center + 1)
        end = center
        i = center + 1
        while i < len(q):
            ok = fmd.extend_backward(ik, comp(int(q[i])))
            if ok[2] <= 0:
                break
            if ok[2] <= min_amb and ik[2] <= max_amb:
                break
            end = i
            ik = ok
            i += 1
        ik = (ik[1], ik[0], ik[2])  # revComp
        start = center
        i = center - 1
        while i >= 0:
            ok = fmd.extend_backward(ik, int(q[i]))
            if ok[2] <= 0:
                break
            if ok[2] <= min_amb and ik[2] <= max_amb:
                break
            start = i
            ik = ok
            if i == 0:
                break
            i -= 1
        segs.append((start, end - start, ik[0], ik[1], ik[2]))
        st1, en1 = start, end
        ik = fmd.init_interval(qc)
        start = center
        i = center - 1
        while i >= 0:
            ok = fmd.extend_backward(ik, int(q[i]))
            if ok[2] <= 0:
                break
            if ok[2] <= min_amb and ik[2] <= max_amb:
                break
            start = i
            ik = ok
            if i == 0:
                break
            i -= 1
        ik = (ik[1], ik[0], ik[2])  # revComp
        end = center
        i = center + 1
        while i < len(q):
            ok = fmd.extend_backward(ik, comp(int(q[i])))
            if ok[2] <= 0:
                break
            if ok[2] <= min_amb and ik[2] <= max_amb:
                break
            end = i
            ik = ok
            i += 1
        if not (st1 == start and en1 == end):
            # segment 2 records ik.revComp()
            segs.append((start, end - start, ik[1], ik[0], ik[2]))
        return (min(st1, start), max(en1, end))

    stack = [(0, len(q))]
    while stack:
        s, e = stack.pop()
        while True:
            center = s + (e - s) // 2
            cs, ce = extension(center)
            if cs != 0 and s + 1 < cs:
                stack.append((s, cs))
            if e > ce + 1:
                s = ce
            else:
                break
    return segs


def make_index(seed, glen=600):
    rng = np.random.default_rng(seed)
    fwd = rng.integers(0, 4, size=glen).astype(np.uint8)
    text = np.concatenate([fwd, revcomp_codes(fwd)])
    fmd = FMDIndex.from_text(text)
    return fmd, occ_ops.FMDDev.from_host(fmd), fwd, rng


def sample_read(rng, fwd, rlen, mut_rate=0.05, revcomp=False):
    i = int(rng.integers(0, len(fwd) - rlen))
    r = fwd[i : i + rlen].copy()
    muts = rng.random(rlen) < mut_rate
    r[muts] = (r[muts] + rng.integers(1, 4, size=int(muts.sum()))) % 4
    if revcomp:
        r = revcomp_codes(r)
    return r


def segset(rows):
    return sorted(tuple(int(x) for x in row) for row in rows)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_device_matches_host_reference(seed):
    fmd, dev, fwd, rng = make_index(seed)
    B, L = 6, 64
    reads = [sample_read(rng, fwd, L, mut_rate=0.05, revcomp=(b % 2 == 1)) for b in range(B)]
    seqs = np.stack(reads)
    lens = np.full(B, L, np.int32)
    out = max_spanning_seeding(dev, jnp.asarray(seqs), jnp.asarray(lens), max_segs=64)
    assert not bool(np.asarray(out.overflow).any())
    for b in range(B):
        want = segset(host_max_spanning(fmd, reads[b]))
        n = int(out.n_segs[b])
        got = segset(
            zip(
                np.asarray(out.q_start[b][:n]),
                np.asarray(out.q_size[b][:n]),
                np.asarray(out.sai_start[b][:n]),
                np.asarray(out.sai_rc[b][:n]),
                np.asarray(out.sai_size[b][:n]),
            )
        )
        assert got == want, f"read {b}"


def test_read_with_ns_and_padding():
    fmd, dev, fwd, rng = make_index(7)
    L = 48
    r = sample_read(rng, fwd, L)
    r[10:14] = 4  # N block
    # read 2 shorter than padded length
    r2 = sample_read(rng, fwd, 32)
    seqs = np.full((2, L), 4, np.uint8)
    seqs[0, :] = r
    seqs[1, :32] = r2
    lens = np.array([L, 32], np.int32)
    out = max_spanning_seeding(dev, jnp.asarray(seqs.astype(np.int32)), jnp.asarray(lens))
    for b, read in enumerate([r, r2]):
        want = segset(host_max_spanning(fmd, read))
        n = int(out.n_segs[b])
        got = segset(
            zip(
                np.asarray(out.q_start[b][:n]),
                np.asarray(out.q_size[b][:n]),
                np.asarray(out.sai_start[b][:n]),
                np.asarray(out.sai_rc[b][:n]),
                np.asarray(out.sai_size[b][:n]),
            )
        )
        assert got == want


def test_empty_read():
    _, dev, _, _ = make_index(9)
    seqs = np.full((1, 16), 4, np.int32)
    out = max_spanning_seeding(dev, jnp.asarray(seqs), jnp.asarray(np.array([0], np.int32)))
    assert int(out.n_segs[0]) == 0
