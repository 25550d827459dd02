"""Exact full-record SAM parity vs the reference maCMD binary.

Tightens tests/test_sam_parity.py from placement-only to FULL-RECORD
comparison: FLAG, RNAME, POS, MAPQ, CIGAR of every primary record, plus
MAPQ distribution equality (VERDICT round-2 item #3; reference semantics:
mapping quality mappingQuality.cpp:11-135, MAPQ int conversion
fileWriter.cpp:96 ceil(f*254), tie-break orders seed.h:166-183,
soc.h:71-76, needlemanWunsch.h:131-134).

Measured residual diff classes on 1024 reads (round-4 root-cause analysis,
17/1024 = 1.7% differing):

  * pos/cigar (~1.0%) and mapq (~0.7%) both trace to ONE reference
    defect: kswcpp's exact-max reduction mis-attributes the max CELL
    within an antidiagonal (kswcpp_core.h calcMaxScore:190-249, the
    per-lane `tt[i]+i` / blend reduction). Verified directly (2026-08-21)
    by driving kswcpp_dispatch on read e171_100611's begin extension with
    the reference's own flags (EXTZ_ONLY|RIGHT|REV_CIGAR, w=512,
    zdrop=200): kswcpp returns max=26 at (q=21, t=15), while the exact DP
    has H(21,15)=4 and its true maxima sit at (18,18)/(21,21). The wrong
    cell yields a leading 6I run, Alignment::removeDangeling trims it,
    and maCMD emits 144M6H where the score-optimal extension (ours,
    147M3H, +6 score) reaches query position 3. The MAPQ-only diffs are
    the same defect on the runner-up chain: the reference's second seed
    set extends short (distinct s2 -> small nonzero MAPQ), ours extends
    both sets to the same optimum (s2 == s1 -> MAPQ 0).

  DECISION: not replicated. Emulating it would mean reproducing a
  SIMD-lane-layout-dependent misattribution inside a Pallas kernel; our
  extensions are score-optimal under the reference's own scoring. The
  ~98.3% of records where extension maxima are unambiguous are
  byte-identical on (FLAG, RNAME, POS, MAPQ, CIGAR); FLAG/RNAME never
  differ.
"""
import collections
import os
import subprocess

import numpy as np
import pytest

REF_BIN = os.environ.get("MA_REF_BIN", "/tmp/refbuild/maCMD")

pytestmark = pytest.mark.skipif(
    not os.path.exists(REF_BIN), reason="reference maCMD binary not built"
)

N_READS = 512


@pytest.fixture(scope="module")
def sams(tmp_path_factory):
    from ma_tpu.containers.nucseq import decode_seq

    d = tmp_path_factory.mktemp("samx")
    rng = np.random.default_rng(20260820)
    G = 150_000
    genome = rng.integers(0, 4, size=G).astype(np.uint8)
    seq = decode_seq(genome)
    with open(d / "genome.fa", "w") as f:
        f.write(">chrE\n")
        for i in range(0, G, 80):
            f.write(seq[i : i + 80] + "\n")
    comp = str.maketrans("ACGT", "TGCA")
    with open(d / "reads.fq", "w") as f:
        for i in range(N_READS):
            p = int(rng.integers(0, G - 150))
            s = list(seq[p : p + 150])
            for j in np.nonzero(rng.random(150) < 0.01)[0]:
                s[j] = "ACGT"[("ACGT".index(s[j]) + int(rng.integers(1, 4))) % 4]
            s = "".join(s)
            if i % 2:
                s = s.translate(comp)[::-1]
            f.write(f"@e{i}_{p}\n{s}\n+\n{'I' * 150}\n")
    subprocess.run(
        [REF_BIN, "--Create_Index", f"{d}/genome.fa,{d},refidx"],
        check=True, capture_output=True,
    )
    subprocess.run(
        [REF_BIN, "-x", f"{d}/refidx.json", "-i", f"{d}/reads.fq",
         "-o", f"{d}/ref.sam", "-t", "2"],
        check=True, capture_output=True,
    )
    import sys as _sys

    def _cli(args):
        """Own subprocess per CLI run: XLA:CPU segfaults compiling the
        device stage after ~200 other programs in one suite process (fine
        in isolation). jax_platforms is forced via jax.config INSIDE the
        child: this sandbox's sitecustomize re-pins JAX_PLATFORMS=axon at
        interpreter start, so the env var alone would grab the real TPU
        (and collide with anything else using the chip)."""
        cpu_cli = (
            "import jax; jax.config.update('jax_platforms', 'cpu'); "
            "import sys; from ma_tpu.cli import main; "
            "sys.exit(main(sys.argv[1:]))"
        )
        r = subprocess.run(
            [_sys.executable, "-c", cpu_cli, *args],
            capture_output=True, text=True,
        )
        assert r.returncode == 0, r.stderr[-2000:]

    _cli(["--Create_Index", f"{d}/genome.fa,{d},ouridx"])
    _cli(["-x", f"{d}/ouridx", "-i", f"{d}/reads.fq",
                 "-o", f"{d}/our.sam"])
    return d


def _records(path):
    prim = {}
    nsec = collections.Counter()
    for line in open(path):
        if line.startswith("@"):
            continue
        f = line.rstrip("\n").split("\t")
        flag = int(f[1])
        if flag & 0x900:
            nsec[f[0]] += 1
            continue
        prim[f[0]] = (flag, f[2], int(f[3]), int(f[4]), f[5], f[9])
    return prim, nsec


def test_full_record_identity(sams):
    d = sams
    ref, ref_sec = _records(d / "ref.sam")
    our, our_sec = _records(d / "our.sam")
    assert set(ref) == set(our), "primary record sets differ"
    classes = collections.Counter()
    exact = 0
    for n in ref:
        a, b = ref[n], our[n]
        if a == b:
            exact += 1
            continue
        for k, key in enumerate(("flag", "rname", "pos", "mapq", "cigar")):
            if a[k] != b[k]:
                classes[key] += 1
    frac = exact / len(ref)
    # residual classes documented in the module docstring; flag/rname must
    # never differ, pos/cigar/mapq only via the rank-1-SoC class
    assert classes["flag"] == 0, classes
    assert classes["rname"] == 0, classes
    assert frac >= 0.98, (frac, dict(classes))
    # secondary/supplementary record counts agree in aggregate
    assert abs(sum(ref_sec.values()) - sum(our_sec.values())) <= len(ref) * 0.02


def _sam_record_score(seq, cigar, pos, genome_seq,
                      match=2, mismatch=4, go1=4, ge1=2, go2=24, ge2=1):
    """Local-alignment score of a SAM record under the reference's default
    scoring (match 2, mismatch 4, 2-piece affine 4/2 + 24/1; kswcpp.h:44-129).
    Clips score 0; gap of length l costs min(go1+l*ge1, go2+l*ge2)."""
    s, qi, ti = 0, 0, pos - 1
    num = ""
    for c in cigar:
        if c.isdigit():
            num += c
            continue
        ln = int(num)
        num = ""
        if c in "M=X":
            for k in range(ln):
                s += match if seq[qi + k] == genome_seq[ti + k] else -mismatch
            qi += ln
            ti += ln
        elif c == "I":
            s -= min(go1 + ln * ge1, go2 + ln * ge2)
            qi += ln
        elif c == "D":
            s -= min(go1 + ln * ge1, go2 + ln * ge2)
            ti += ln
        elif c == "S":
            qi += ln
        # H: consumes nothing
    return s


def test_divergent_records_score_optimal(sams):
    """Mechanical check of the residual-divergence claim (VERDICT r4 #6):
    for EVERY primary record where our (pos, cigar) differs from the
    reference's, re-score both CIGARs under the reference's own scoring and
    assert ours >= theirs. This pins the docstring's root-cause analysis
    (kswcpp max-cell misattribution yields sub-optimal reference
    extensions) as a per-run invariant rather than prose."""
    d = sams
    ref, _ = _records(d / "ref.sam")
    our, _ = _records(d / "our.sam")
    genome_seq = ""
    for line in open(d / "genome.fa"):
        if not line.startswith(">"):
            genome_seq += line.strip()
    ref_wins = []
    n_divergent = 0
    for n in ref:
        (rflag, _, rpos, _, rcig, rseq) = ref[n]
        (oflag, _, opos, _, ocig, oseq) = our[n]
        if (rpos, rcig) == (opos, ocig):
            continue
        n_divergent += 1
        rs = _sam_record_score(rseq, rcig, rpos, genome_seq)
        os_ = _sam_record_score(oseq, ocig, opos, genome_seq)
        if os_ < rs:
            ref_wins.append((n, rs, os_, rpos, rcig, opos, ocig))
    assert not ref_wins, (
        f"{len(ref_wins)}/{n_divergent} divergent records where the "
        f"reference out-scores us: {ref_wins[:5]}"
    )


def test_mapq_distribution(sams):
    """MAPQ distributions must match closely: identical histogram over the
    0-254 range up to the documented residual classes."""
    d = sams
    ref, _ = _records(d / "ref.sam")
    our, _ = _records(d / "our.sam")
    rh = collections.Counter(v[3] for v in ref.values())
    oh = collections.Counter(v[3] for v in our.values())
    l1 = sum(abs(rh[k] - oh[k]) for k in set(rh) | set(oh))
    assert l1 <= len(ref) * 0.06, (l1, rh.most_common(8), oh.most_common(8))
    # exact per-read MAPQ equality for the overwhelming majority
    same = sum(1 for n in ref if ref[n][3] == our[n][3])
    assert same / len(ref) >= 0.97, same / len(ref)
