"""CLI front-end tests (reference: cmdMa.cpp flag semantics)."""
import os

import numpy as np
import pytest

from ma_tpu.cli import main
from ma_tpu.containers.nucseq import decode_seq
from ma_tpu.containers.pack import Pack

pytestmark = pytest.mark.slow  # full device-stage compile


@pytest.fixture(scope="module")
def genome_fasta(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli")
    rng = np.random.default_rng(41)
    genome = rng.integers(0, 4, size=8192).astype(np.uint8)
    fa = d / "genome.fa"
    seq = decode_seq(genome)
    fa.write_text(">chrC desc here\n" + "\n".join(
        seq[i : i + 70] for i in range(0, len(seq), 70)
    ) + "\n")
    return d, fa, genome


def test_create_index_and_align(genome_fasta, capsys):
    d, fa, genome = genome_fasta
    assert main(["--Create_Index", f"{fa},{d},idx"]) == 0
    assert os.path.exists(d / "idx.json")
    assert os.path.exists(d / "idx.fmd.npz")
    pack = Pack.load(str(d / "idx"))
    assert pack.names == ["chrC"]

    # simulate reads
    rng = np.random.default_rng(43)
    reads_path = d / "reads.fq"
    truth = []
    with open(reads_path, "w") as f:
        for i in range(8):
            p = int(rng.integers(0, 8192 - 120))
            s = decode_seq(genome[p : p + 120])
            f.write(f"@r{i}\n{s}\n+\n{'I' * 120}\n")
            truth.append(p)
    out = d / "out.sam"
    rc = main(["-x", str(d / "idx"), "-i", str(reads_path), "-o", str(out)])
    assert rc == 0
    lines = out.read_text().splitlines()
    recs = {f[0]: f for f in (l.split("\t") for l in lines if not l.startswith("@"))}
    for i, p in enumerate(truth):
        assert int(recs[f"r{i}"][3]) - 1 == p


def test_parameter_flags(genome_fasta, capsys):
    d, fa, genome = genome_fasta
    # bad preset
    assert main(["-p", "nonexistent", "-x", "y", "-i", "z"]) == 1
    err = capsys.readouterr().err
    assert "can not be found" in err
    # missing index
    assert main(["-i", "reads.fq"]) == 1
    # unknown flag
    assert main(["-x", str(d / "idx"), "-i", "r.fq", "--No_Such_Flag", "1"]) == 1


def test_help_runs(capsys):
    assert main([]) == 0
    out = capsys.readouterr().out
    assert "presettings" in out.lower()
    assert "--Minimal_Seed_Length" in out.replace("Minimal_Seed_Length", "Minimal_Seed_Length") or "Seeding" in out


def test_paired_cli(genome_fasta):
    d, fa, genome = genome_fasta
    rng = np.random.default_rng(53)
    comp = {0: 3, 1: 2, 2: 1, 3: 0}
    truth = []
    with open(d / "r1.fq", "w") as f1, open(d / "r2.fq", "w") as f2:
        for i in range(6):
            insert = 300
            p = int(rng.integers(0, 8192 - insert))
            m1 = genome[p : p + 100]
            m2 = np.array([comp[c] for c in genome[p + insert - 100 : p + insert][::-1]])
            s1 = decode_seq(m1)
            s2 = decode_seq(m2.astype(np.uint8))
            f1.write(f"@q{i}/1\n{s1}\n+\n{'I'*100}\n")
            f2.write(f"@q{i}/2\n{s2}\n+\n{'I'*100}\n")
            truth.append(p)
    out = d / "paired.sam"
    rc = main(["-x", str(d / "idx"), "-i", str(d / "r1.fq"),
               "-m", str(d / "r2.fq"), "-o", str(out),
               "--Mean_Distance_of_Paired_Reads", "200",
               "--Standard_Deviation_of_Paired_Reads", "100"])
    assert rc == 0
    recs = [l.split("\t") for l in out.read_text().splitlines()
            if not l.startswith("@")]
    assert len(recs) == 12
    for f in recs:
        flag = int(f[1])
        assert flag & 0x1  # paired
        assert f[6] == "="  # mate on same contig


def test_sv_cli(genome_fasta):
    d, fa, genome = genome_fasta
    rng = np.random.default_rng(71)
    # donor with a 300bp deletion
    donor = np.concatenate([genome[:4000], genome[4300:]])
    with open(d / "sv_reads.fq", "w") as f:
        for i, p in enumerate(range(0, len(donor) - 400, 80)):
            s = decode_seq(donor[p : p + 400])
            f.write(f"@sv{i}\n{s}\n+\n{'I' * 400}\n")
    out = d / "calls.tsv"
    rc = main(["--Sv", "-x", str(d / "idx"), "-i", str(d / "sv_reads.fq"),
               "-o", str(out), "--Min_Reads_in_call", "3"])
    assert rc == 0
    lines = out.read_text().splitlines()
    assert lines[0].startswith("from_pos")
    rows = [l.split("\t") for l in lines[1:]]
    assert any(
        abs(int(r[0]) - 3999) < 10 and abs(int(r[1]) - 4300) < 10
        for r in rows
    ), rows[:5]
    assert (d / "calls.tsv.html").exists()
