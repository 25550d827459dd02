"""SMEM seeding: device state machine vs a host transcription of the
reference smemExtension + procesInterval (binarySeeding.h:261-452,544-547)."""
import numpy as np
import pytest

import jax.numpy as jnp

from ma_tpu.containers.pack import Pack
from ma_tpu.index.fmd_index import FMDIndex
from ma_tpu.ops.occ import FMDDev
from ma_tpu.ops.seeding import smem_seeding

pytestmark = pytest.mark.slow  # full device-stage compile


class HostFMD:
    """Host-side bidirectional search over FMDIndex (exact)."""

    def __init__(self, fmd: FMDIndex):
        self.fmd = fmd

    def init(self, c):
        return self.fmd.init_interval(c)

    def extend(self, ik, c):
        return self.fmd.extend_backward(ik, c)


def revcomp_ik(ik):
    s, rc, sz = ik
    return (rc, s, sz)


def host_smem_extension(h, q, center, min_amb, max_amb, out):
    """Transcription of smemExtension. Returns covered (start, end_excl)."""
    L = len(q)
    if q[center] >= 4:
        return (center, center + 1)
    comp = lambda c: 3 - c if c < 4 else c
    ik = h.init(comp(q[center]))
    if ik[2] == 0:
        return (center, center + 1)
    curr = []
    cov_s, cov_e = center, center  # inclusive end bookkeeping like the device
    for i in range(center + 1, L):
        ok = h.extend(ik, comp(q[i]))
        if ok[2] != ik[2]:
            curr.append((center, i - center - 1, revcomp_ik(ik)))
        if i == L - 1 and ok[2] != 0:
            curr.append((center, i - center, revcomp_ik(ok)))
        if ok[2] == 0:
            break
        if ok[2] <= min_amb and ik[2] <= max_amb:
            break
        ik = ok
        cov_e = i
    curr.reverse()
    prev = curr
    if center != 0 and prev:
        i = center - 1
        while True:
            nxt = []
            have_one = False
            for (qs, sz, sik) in prev:
                ok = h.extend(sik, q[i])
                if ok[2] <= min_amb and not have_one:
                    out.append((qs, sz, sik))
                    have_one = True
                elif ok[2] > min_amb or (ok[2] > 0 and sz >= max_amb):
                    nxt.append((i, sz + 1, ok))
            prev = nxt
            if not prev:
                break
            cov_s = i
            if i == 0:
                break
            i -= 1
        if prev:
            out.append(prev[0])
    elif prev:
        out.append(prev[0])
    return (cov_s, cov_e + 1)


def host_smem_seeding(h, q, min_amb=0, max_amb=100):
    out = []
    stack = [(0, len(q))]
    while stack:
        s, e = stack.pop()
        center = s + (e - s) // 2
        cov_s, cov_e = host_smem_extension(h, q, center, min_amb, max_amb, out)
        if cov_s != 0 and s + 1 < cov_s:
            stack.append((s, cov_s))
        if e > cov_e:
            stack.append((cov_e - 1, e))
    return out


@pytest.fixture(scope="module")
def index():
    rng = np.random.default_rng(55)
    genome = rng.integers(0, 4, size=6000).astype(np.uint8)
    pack = Pack.empty()
    pack.append("chrS", genome)
    fmd = FMDIndex.build(pack)
    return pack, fmd, genome


@pytest.mark.parametrize("seed,rlen", [(0, 60), (1, 100), (2, 100), (3, 200)])
def test_smem_matches_host(index, seed, rlen):
    pack, fmd, genome = index
    rng = np.random.default_rng(seed)
    B = 4
    seqs = np.full((B, 256), 4, np.uint8)
    lens = np.full(B, rlen, np.int32)
    reads = []
    for b in range(B):
        p = int(rng.integers(0, 6000 - rlen))
        codes = genome[p : p + rlen].copy()
        # a few mutations to force multiple SMEMs
        for j in rng.choice(rlen, size=3, replace=False):
            codes[j] = (codes[j] + 1) % 4
        seqs[b, :rlen] = codes
        reads.append(codes)

    segs = smem_seeding(FMDDev.from_host(fmd), jnp.asarray(seqs), jnp.asarray(lens))
    h = HostFMD(fmd)
    for b in range(B):
        want = host_smem_seeding(h, reads[b])
        got = [
            (
                int(segs.q_start[b, s]),
                int(segs.q_size[b, s]),
                (int(segs.sai_start[b, s]), int(segs.sai_rc[b, s]),
                 int(segs.sai_size[b, s])),
            )
            for s in range(int(segs.n_segs[b]))
        ]
        assert not bool(segs.overflow[b])
        assert sorted(got) == sorted(
            [(qs, sz, tuple(int(x) for x in ik)) for qs, sz, ik in want]
        ), f"read {b}"


def test_smem_exact_read_single_segment(index):
    pack, fmd, genome = index
    codes = genome[1000:1100]
    seqs = np.full((1, 128), 4, np.uint8)
    seqs[0, :100] = codes
    segs = smem_seeding(FMDDev.from_host(fmd), jnp.asarray(seqs),
                        jnp.asarray([100], np.int32))
    n = int(segs.n_segs[0])
    assert n >= 1
    # the full-length match must be among the segments
    full = [(int(segs.q_start[0, s]), int(segs.q_size[0, s])) for s in range(n)]
    assert (0, 99) in full
