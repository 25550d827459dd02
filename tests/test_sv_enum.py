"""Native MSV enumeration front end (native/sv_enum.cpp) vs the Python
oracles: identical per-read seed unions AND identical JumpBatch output on a
simulated-SV workload (VERDICT r4 item 4 — the oracle-equality gate for the
vectorized/native enumeration path)."""
import os

import numpy as np
import pytest

from ma_tpu.containers.nucseq import NucSeq
from ma_tpu.containers.pack import Pack
from ma_tpu.index.minimizer import MinimizerIndex
from ma_tpu.native import sv_enum as sv_enum_native

pytestmark = pytest.mark.skipif(
    not sv_enum_native.available(), reason="no C++ toolchain"
)


@pytest.fixture(scope="module")
def sv_problem():
    rng = np.random.default_rng(20260821)
    G = 120_000
    donorless = rng.integers(0, 4, size=G).astype(np.uint8)
    # implant a deletion, an inversion and an insertion into the donor
    ref = donorless.copy()
    donor = np.concatenate(
        [
            ref[:30_000],
            ref[30_500:60_000],  # 500bp deletion at 30k
            ref[60_000:60_300][::-1] ^ 3 & 3,  # 300bp inversion at 60k
            ref[60_300:90_000],
            rng.integers(0, 4, size=400).astype(np.uint8),  # 400bp insertion
            ref[90_000:],
        ]
    )
    donor = np.where(donor > 3, 0, donor).astype(np.uint8)
    pack = Pack.empty()
    pack.append("chrR", ref)
    mmi = MinimizerIndex.build(pack, k=15, w=10)
    reads = []
    for i in range(96):
        p = int(rng.integers(0, len(donor) - 1000))
        codes = donor[p : p + 1000].copy()
        for j in np.nonzero(rng.random(1000) < 0.002)[0]:
            codes[j] = (codes[j] + rng.integers(1, 4)) % 4
        reads.append(NucSeq(codes, name=f"sv{i}"))
    return pack, mmi, reads


def _jumps(reads, pack, mmi, mode):
    from ma_tpu.msv.pipeline import compute_sv_jumps_batch

    os.environ["MA_TPU_SV_ENUM"] = mode
    try:
        return compute_sv_jumps_batch(reads, pack, mmi, batch=64)
    finally:
        del os.environ["MA_TPU_SV_ENUM"]


def test_native_matches_python_jumps(sv_problem):
    pack, mmi, reads = sv_problem
    jb_py = _jumps(reads, pack, mmi, "python")
    jb_cc = _jumps(reads, pack, mmi, "native")
    assert len(jb_py) > 0, "fixture produced no jumps — not a real test"
    for f in ("from_pos", "to_pos", "query_from", "query_to", "from_forward",
              "to_forward", "num_supporting_nt", "read_id", "was_mirrored",
              "id"):
        a, b = getattr(jb_py, f), getattr(jb_cc, f)
        np.testing.assert_array_equal(a, b, err_msg=f)


def test_native_matches_python_unions(sv_problem):
    """Unit-level: the concatenated per-read unions equal the Python path's
    (feasible_socs -> reseed_gaps -> extend_seeds -> sorted set union)."""
    import jax.numpy as jnp

    from ma_tpu.msv.pipeline import SocHost, feasible_socs, sv_seed_stage
    from ma_tpu.ops.extend_host import extend_seeds
    from ma_tpu.ops.hash_seeding import reseed_gaps

    pack, mmi, reads = sv_problem
    chunk = reads[:32]
    L = 1024
    seqs = np.full((len(chunk), L), 4, np.uint8)
    lens = np.zeros(len(chunk), np.int32)
    for i, r in enumerate(chunk):
        seqs[i, : len(r)] = r.codes
        lens[i] = len(r)
    soc = SocHost(
        sv_seed_stage(
            mmi.to_device(), jnp.asarray(np.asarray(pack.starts, np.int32)),
            pack.unpacked_size_forward_strand, seqs, lens, k=mmi.k, w=mmi.w,
        )
    )
    oq, ol, orr, ofw, ont, cnt = sv_enum_native.enumerate_batch(
        soc, seqs, lens, pack, min_nt=25, soc_height=0, do_reseed=True
    )
    off = 0
    n_nonempty = 0
    for b in range(len(chunk)):
        union = []
        for piece in feasible_socs(soc, b, 25, 0):
            seeds = reseed_gaps(piece, chunk[b].codes, pack)
            seeds = extend_seeds(seeds, chunk[b].codes, pack)
            union.extend(seeds)
        union = sorted(set(union))
        c = int(cnt[b])
        assert c == len(union), (b, c, len(union))
        got = [
            (int(oq[off + i]), int(ol[off + i]), int(orr[off + i]),
             bool(ofw[off + i]), int(ont[off + i]))
            for i in range(c)
        ]
        assert got == union, f"read {b}"
        off += c
        n_nonempty += c > 0
    assert n_nonempty >= 16, "too few reads seeded — fixture too weak"
