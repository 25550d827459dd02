"""SAM parity vs the reference maCMD binary (BASELINE.md target).

Runs both aligners on the same genome + reads and compares primary
placements and CIGARs. Skipped when the reference binary (built out of
tree, see BASELINE.md) is unavailable.
"""
import os
import subprocess

import numpy as np
import pytest

REF_BIN = os.environ.get("MA_REF_BIN", "/tmp/refbuild/maCMD")

pytestmark = pytest.mark.skipif(
    not os.path.exists(REF_BIN), reason="reference maCMD binary not built"
)


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    from ma_tpu.containers.nucseq import decode_seq
    d = tmp_path_factory.mktemp("parity")
    rng = np.random.default_rng(777)
    G = 100_000
    genome = rng.integers(0, 4, size=G).astype(np.uint8)
    seq = decode_seq(genome)
    fa = d / "genome.fa"
    with open(fa, "w") as f:
        f.write(">chrP\n")
        for i in range(0, G, 80):
            f.write(seq[i : i + 80] + "\n")
    comp = str.maketrans("ACGT", "TGCA")
    reads, truth = [], []
    with open(d / "reads.fq", "w") as f:
        for i in range(64):
            p = int(rng.integers(0, G - 150))
            s = seq[p : p + 150]
            sl = list(s)
            for j in np.nonzero(rng.random(150) < 0.01)[0]:
                sl[j] = "ACGT"[("ACGT".index(sl[j]) + 1) % 4]
            s = "".join(sl)
            if i % 2:
                s = s.translate(comp)[::-1]
            f.write(f"@p{i}\n{s}\n+\n{'I' * 150}\n")
            truth.append((p, bool(i % 2)))
    return d, truth


def parse_primaries(path):
    out = {}
    for line in open(path):
        if line.startswith("@"):
            continue
        f = line.rstrip("\n").split("\t")
        flag = int(f[1])
        if flag & 0x100 or flag & 0x800:
            continue
        out[f[0]] = (f[2], int(f[3]), flag & 0x10, f[5])
    return out


def test_primary_placement_parity(dataset):
    d, truth = dataset
    # reference
    subprocess.run(
        [REF_BIN, "--Create_Index", f"{d}/genome.fa,{d},refidx"],
        check=True, capture_output=True,
    )
    subprocess.run(
        [REF_BIN, "-x", f"{d}/refidx.json", "-i", f"{d}/reads.fq",
         "-o", f"{d}/ref.sam", "-t", "2"],
        check=True, capture_output=True,
    )
    # ours
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

    ref = parse_primaries(f"{d}/ref.sam")
    our = parse_primaries(f"{d}/our.sam")
    assert len(ref) >= 60 and len(our) >= 60

    same_pos = 0
    same_cigar = 0
    both = set(ref) & set(our)
    for name in both:
        if ref[name][:3] == our[name][:3]:
            same_pos += 1
            if ref[name][3] == our[name][3]:
                same_cigar += 1
    # primary placements must agree on (contig, pos, strand)
    assert same_pos >= len(both) - 2, (
        same_pos, len(both),
        {n: (ref[n], our[n]) for n in both if ref[n][:3] != our[n][:3]},
    )
    # CIGARs largely identical (tie-breaking in DP may differ at indels)
    assert same_cigar >= same_pos * 0.9, (same_cigar, same_pos)


def test_long_read_placement_parity(dataset, tmp_path):
    """PacBio-style config: 2kb reads at 5% error, preset PacBio
    (BASELINE.json config #3 analog)."""
    from ma_tpu.containers.nucseq import decode_seq
    d, _ = dataset
    rng = np.random.default_rng(555)
    # reuse the genome from the short-read fixture
    import subprocess
    comp = str.maketrans("ACGT", "TGCA")
    seq = "".join(
        l.strip() for l in open(f"{d}/genome.fa") if not l.startswith(">")
    )
    G = len(seq)
    with open(tmp_path / "long.fq", "w") as f:
        for i in range(12):
            p = int(rng.integers(0, G - 2000))
            s = list(seq[p : p + 2000])
            for j in np.nonzero(rng.random(2000) < 0.05)[0]:
                s[j] = "ACGT"[("ACGT".index(s[j]) + 1) % 4]
            s = "".join(s)
            if i % 2:
                s = s.translate(comp)[::-1]
            f.write(f"@L{i}\n{s}\n+\n{'I' * 2000}\n")
    subprocess.run(
        [REF_BIN, "-x", f"{d}/refidx.json", "-i", str(tmp_path / "long.fq"),
         "-o", str(tmp_path / "ref.sam"), "-p", "PacBio", "-t", "2"],
        check=True, capture_output=True,
    )
    # own subprocess: the long-read device stage is the largest program the
    # suite compiles, and XLA:CPU segfaults compiling it after ~200 other
    # programs in one process (deterministic at this suite position; fine
    # in isolation) — fresh interpreter sidesteps the compiler-state decay
    import sys as _sys

    _cpu_cli = (
        "import jax; jax.config.update('jax_platforms', 'cpu'); "
        "import sys; from ma_tpu.cli import main; "
        "sys.exit(main(sys.argv[1:]))"
    )
    r = subprocess.run(
        [_sys.executable, "-c", _cpu_cli, "-x", f"{d}/ouridx",
         "-i", str(tmp_path / "long.fq"), "-o", str(tmp_path / "our.sam"),
         "-p", "PacBio"],
        capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    ref = parse_primaries(tmp_path / "ref.sam")
    our = parse_primaries(tmp_path / "our.sam")
    both = set(ref) & set(our)
    assert len(both) >= 11
    agree = sum(
        1 for n in both
        if ref[n][0] == our[n][0] and ref[n][2] == our[n][2]
        and abs(ref[n][1] - our[n][1]) <= 25
    )
    assert agree >= len(both) - 1, {
        n: (ref[n], our[n]) for n in both
        if not (abs(ref[n][1] - our[n][1]) <= 25 and ref[n][2] == our[n][2])
    }
