"""Reference-vs-ma_tpu parity + throughput on realistic synthetic genomes
(BASELINE.json configs #1/#2 analogs; no network access on this host, so
E. coli K-12 / chr21 are replaced by simulated genomes with equivalent
repeat structure — ma_tpu/utils/simulate.py).

Usage:
  python scripts/parity_bench.py ecoli [n_reads]   # 4.6 Mbp, 150bp reads
  python scripts/parity_bench.py chr21 [n_reads]   # 40 Mbp, 150bp reads
  python scripts/parity_bench.py ecoli-long        # 8kb PacBio-like reads

Runs the reference maCMD (MA_REF_BIN, default /tmp/refbuild/maCMD) with
-t 1 and -t 2, then ma_tpu, and reports reads/s + SAM agreement.
"""
import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REF_BIN = os.environ.get("MA_REF_BIN", "/tmp/refbuild/maCMD")


def parse_primaries(path):
    out = {}
    for line in open(path):
        if line.startswith("@"):
            continue
        f = line.rstrip("\n").split("\t")
        flag = int(f[1])
        if flag & 0x900:
            continue
        out[f[0]] = (f[2], int(f[3]), flag & 0x10, f[5])
    return out


def main():
    config = sys.argv[1] if len(sys.argv) > 1 else "ecoli"
    from ma_tpu.utils.simulate import (
        chr21_like, ecoli_like, simulate_illumina, simulate_long_reads,
        write_fasta, write_fastq,
    )

    long_reads = config.endswith("-long")
    base = config.replace("-long", "")
    t0 = time.time()
    genome = ecoli_like() if base == "ecoli" else chr21_like()
    print(f"genome: {base} {len(genome)/1e6:.1f} Mbp (simulated in {time.time()-t0:.0f}s)",
          flush=True)
    if long_reads:
        n_default = 1024
        preset = "PacBio"
    else:
        n_default = 20480
        preset = None
    n_reads = int(sys.argv[2]) if len(sys.argv) > 2 else n_default

    d = tempfile.mkdtemp(prefix=f"parity_{config}_")
    write_fasta(f"{d}/g.fa", base, genome)
    if long_reads:
        reads, truth = simulate_long_reads(genome, n_reads, mean_len=8000, seed=3)
    else:
        reads, truth = simulate_illumina(genome, n_reads, seed=3)
    write_fastq(f"{d}/r.fq", reads)

    rows = []
    if os.path.exists(REF_BIN):
        t0 = time.time()
        subprocess.run([REF_BIN, "--Create_Index", f"{d}/g.fa,{d},ref"],
                       check=True, capture_output=True)
        t_idx = time.time() - t0
        for nt in (1, 2):
            cmd = [REF_BIN, "-x", f"{d}/ref.json", "-i", f"{d}/r.fq",
                   "-o", f"{d}/ref{nt}.sam", "-t", str(nt)]
            if preset:
                cmd += ["-p", preset]
            t0 = time.time()
            subprocess.run(cmd, check=True, capture_output=True)
            dt = time.time() - t0
            rows.append((f"reference maCMD -t {nt}", dt, n_reads / dt))
        print(f"reference index build: {t_idx:.1f}s", flush=True)
    else:
        print("reference binary missing; skipping baseline", flush=True)

    from ma_tpu.cli import main as cli_main

    t0 = time.time()
    assert cli_main(["--Create_Index", f"{d}/g.fa,{d},ours"]) == 0
    t_idx = time.time() - t0
    cmd = ["-x", f"{d}/ours", "-i", f"{d}/r.fq", "-o", f"{d}/our.sam"]
    if preset:
        cmd += ["-p", preset]
    t0 = time.time()
    assert cli_main(cmd) == 0
    dt = time.time() - t0
    rows.append(("ma_tpu (1 chip)", dt, n_reads / dt))
    print(f"ma_tpu index build: {t_idx:.1f}s", flush=True)

    print(f"\n{'system':28s} {'wall':>8s} {'reads/s':>10s}")
    for name, dt, rps in rows:
        print(f"{name:28s} {dt:8.1f}s {rps:10.0f}")

    # truth-based accuracy + reference agreement
    our = parse_primaries(f"{d}/our.sam")
    tol = 50 if long_reads else 8
    ok = sum(
        1 for i, (p, rev) in enumerate(truth)
        if f"r{i}" in our and abs(our[f"r{i}"][1] - 1 - p) <= tol
    )
    print(f"\nma_tpu truth agreement (±{tol}bp): {ok}/{n_reads} "
          f"({100.0*ok/n_reads:.2f}%)")
    if os.path.exists(f"{d}/ref2.sam"):
        ref = parse_primaries(f"{d}/ref2.sam")
        ok_ref = sum(
            1 for i, (p, rev) in enumerate(truth)
            if f"r{i}" in ref and abs(ref[f"r{i}"][1] - 1 - p) <= tol
        )
        print(f"reference truth agreement (±{tol}bp): {ok_ref}/{n_reads} "
              f"({100.0*ok_ref/n_reads:.2f}%)")
        both = set(ref) & set(our)
        same = sum(1 for n in both if ref[n][:3] == our[n][:3])
        cig = sum(1 for n in both if ref[n][:3] == our[n][:3] and ref[n][3] == our[n][3])
        print(f"primary (contig,pos,strand) agreement: {same}/{len(both)} "
              f"({100.0*same/max(len(both),1):.2f}%), identical CIGARs {cig}")
    print(f"\nworkdir: {d}")


if __name__ == "__main__":
    main()
