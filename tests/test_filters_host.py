"""Host seed filters (reference: seedFilters.h)."""
import numpy as np

from ma_tpu.containers.pack import Pack
from ma_tpu.ops.filters_host import (
    filter_contig_border,
    filter_overlapping_seeds,
    filter_to_unique,
    max_extended_to_max_spanning,
    max_extended_to_smem,
    palindrome_filter,
)


def test_filter_contig_border():
    pack = Pack.empty()
    rng = np.random.default_rng(1)
    pack.append("c1", rng.integers(0, 4, 100000).astype(np.uint8))
    near = (0, 20, 100, True, 0)
    far = (0, 20, 50000, True, 0)
    assert filter_contig_border([near, far], pack) == [far]


def test_max_extended_to_smem_drops_enclosed():
    big = (0, 50, 100, True, 0)
    enclosed = (10, 20, 500, True, 0)
    extending = (30, 40, 900, True, 0)
    out = max_extended_to_smem([big, enclosed, extending])
    assert big in out and extending in out and enclosed not in out


def test_max_extended_to_max_spanning():
    long_seed = (0, 60, 100, True, 0)
    short_inside = (10, 20, 500, True, 0)
    tail = (55, 30, 900, True, 0)  # longest covering positions 60..84
    out = max_extended_to_max_spanning([long_seed, short_inside, tail])
    assert long_seed in out and tail in out and short_inside not in out


def test_filter_overlapping_seeds_fragments():
    a = (0, 50, 100, True, 0)
    b = (40, 50, 600, True, 0)  # overlaps a on query [40,50)
    out = filter_overlapping_seeds([a, b], min_nt_non_overlap=16)
    # a keeps [0,40), b keeps [50,90)
    assert (0, 40, 100, True, 0) in out
    assert (50, 40, 610, True, 0) in out


def test_filter_to_unique():
    rng = np.random.default_rng(2)
    ref = rng.integers(0, 4, 1000).astype(np.uint8)
    ref[500:530] = ref[100:130]  # duplicate region
    query = ref[95:140].copy()
    dup_seed = (5, 30, 100, True, 0)
    uniq_seed = (0, 45, 95, True, 0)
    out = filter_to_unique([dup_seed, uniq_seed], query, ref)
    assert dup_seed not in out
    assert uniq_seed in out


def test_palindrome_filter_drops_shorter_crossing():
    fwd = (10, 30, 1000, True, 0)
    # reverse seed crossing the same rotated region, shorter
    rev = (15, 20, 1025, False, 0)
    far = (60, 30, 5000, True, 0)
    kept, pal = palindrome_filter([fwd, rev, far])
    assert fwd in kept and far in kept
    assert rev in pal


def test_filter_seeds_by_area():
    from ma_tpu.ops.filters_host import filter_seeds_by_area

    inside = (0, 20, 100, True, 0)
    outside = (0, 20, 5000, True, 0)
    rev_inside = (0, 20, 115, False, 0)  # spans [96, 116)
    out = filter_seeds_by_area([inside, outside, rev_inside], 90, 30)
    assert inside in out and rev_inside in out and outside not in out


def test_nw_alignment_global():
    import numpy as np
    from ma_tpu.ops.dp import nw_alignment, OP_M, OP_D

    q = np.array([0, 1, 2, 3, 0, 1], np.uint8)
    t = np.array([0, 1, 2, 2, 3, 0, 1], np.uint8)
    score, cigar = nw_alignment(q, t)
    # one deletion somewhere, rest matches
    assert sum(l for (op, l) in cigar if op == OP_D) == 1
    assert sum(l for (op, l) in cigar if op == OP_M) == 6
    assert score == 6 * 2 - (4 + 2)


def test_pick_local_seed_set_trims_outliers():
    from ma_tpu.ops.filters_host import pick_local_seed_set

    # tight chain + a far outlier whose gap cost exceeds its contribution
    chain = [(0, 30, 1000, True, 0), (35, 30, 1035, True, 0),
             (70, 30, 1072, True, 0)]
    outlier = [(110, 10, 90000, True, 0)]
    out = pick_local_seed_set(chain + outlier)
    assert set(out) == set(chain)


def test_filter_overlapping_socs():
    from ma_tpu.ops.filters_host import filter_overlapping_socs

    # two SoCs overlapping on query [40, 60) with unique flanks -> both kept
    # but trimmed at the overlap center (50)
    a = [(0, 60, 1000, True, 0)]
    b = [(40, 60, 5000, True, 0)]
    out = filter_overlapping_socs([a, b])
    assert len(out) == 2
    ends = sorted(s[0] + s[1] for soc in out for s in soc)
    starts = sorted(s[0] for soc in out for s in soc)
    assert 50 in ends and 50 in starts  # cut at the center
    # an enclosed low-value SoC is dropped
    big = [(0, 100, 1000, True, 0)]
    small = [(30, 20, 9000, True, 0)]
    out2 = filter_overlapping_socs([big, small])
    assert len(out2) == 1 and out2[0][0][1] == 100
