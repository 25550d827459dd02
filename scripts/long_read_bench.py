"""Long-read throughput + placement bench (BASELINE config #3 analog).

Simulates PacBio-style reads (default 20 kb at 5% mixed error) over a
random genome, aligns them through the chunked z-drop extension path on
the chip, and reports reads/s + bases/s. With MA_REF_BIN (or the default
/tmp/refbuild/maCMD) present, also runs the reference PacBio preset on the
same reads and reports placement agreement.

Usage: python scripts/long_read_bench.py [n_reads] [read_len] [genome_mbp]
Defaults: 200 reads, 20,000 bp, 10 Mbp.
"""
import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import os
import subprocess
import sys
import time

import numpy as np

import ma_tpu

ma_tpu.enable_compilation_cache()

from ma_tpu.containers.nucseq import NucSeq, decode_seq, revcomp_codes
from ma_tpu.containers.pack import Pack
from ma_tpu.index.fmd_index import FMDIndex
from ma_tpu.pipeline.aligner import Aligner
from ma_tpu.config.parameters import ParameterSetManager

N_READS = int(sys.argv[1]) if len(sys.argv) > 1 else 200
READ_LEN = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000
G = int((float(sys.argv[3]) if len(sys.argv) > 3 else 10.0) * 1_000_000)
REF_BIN = os.environ.get("MA_REF_BIN", "/tmp/refbuild/maCMD")

rng = np.random.default_rng(4242)
genome = rng.integers(0, 4, size=G).astype(np.uint8)
pack = Pack.empty()
pack.append("chrL", genome)
fmd = FMDIndex.build(pack)

def simulate(p, L):
    """PacBio-ish: 1% sub, 2% ins, 2% del."""
    out = []
    i = p
    while len(out) < L and i < G:
        r = rng.random()
        if r < 0.02:
            out.append(int(rng.integers(0, 4)))  # insertion
            continue
        if r < 0.04:
            i += 1  # deletion
            continue
        c = int(genome[i])
        if r < 0.05:
            c = (c + int(rng.integers(1, 4))) % 4
        out.append(c)
        i += 1
    return np.asarray(out[:L], np.uint8)

reads, truth = [], []
for i in range(N_READS):
    p = int(rng.integers(0, G - 2 * READ_LEN))
    codes = simulate(p, READ_LEN)
    if i % 2:
        codes = revcomp_codes(codes)
    reads.append(NucSeq(codes, name=f"L{i}_{p}"))
    truth.append(p)

mgr = ParameterSetManager()
mgr.set_selected("PacBio")
al = Aligner(pack, fmd, params=mgr)
al.pset.set("Seeding Technique", "minimizers")

# warmup on a few reads (compile the long bucket). batch_size=8192 shapes
# 20 kb buckets at B=128 rows (the measured sweet spot: 9.3 reads/s at
# B=32 -> 35.6 at B=128; B=256 OOMs the XLA compile helper). The warmup
# MUST use the same batch_size: two different B's of the >= 8 kb stage in
# one process trip the tunnel InvalidArgument fault (aligner.py submit).
BS = 8192
import io

buf = io.StringIO()
t0 = time.perf_counter()
al.align_to_sam(iter(reads[: min(8, N_READS)]), buf, batch_size=BS)
t_warm = time.perf_counter() - t0

walls = []
for _ in range(2):
    buf = io.StringIO()
    t0 = time.perf_counter()
    n = al.align_to_sam(iter(reads), buf, batch_size=BS)
    walls.append(time.perf_counter() - t0)
dt = min(walls)  # pass 1 still hits first-seen DP bucket shapes; pass 2
# is steady state (same protocol as bench.py's multi-pass median)
sam = buf.getvalue()

ok = 0
n_prim = 0
for line in sam.splitlines():
    if line.startswith("@"):
        continue
    f = line.split("\t")
    if int(f[1]) & 0x900:
        continue
    n_prim += 1
    i = int(f[0][1:].split("_")[0])
    if abs(int(f[3]) - 1 - truth[i]) <= 200:
        ok += 1
print(
    f"ma_tpu: {n} reads x {READ_LEN} bp in {dt:.1f}s (warmup {t_warm:.1f}s) "
    f"=> {n/dt:.1f} reads/s, {n*READ_LEN/dt/1e6:.2f} Mbases/s; "
    f"placement {ok}/{n_prim}",
    flush=True,
)

if os.path.exists(REF_BIN):
    import tempfile

    d = tempfile.mkdtemp()
    with open(f"{d}/genome.fa", "w") as f:
        f.write(">chrL\n")
        s = decode_seq(genome)
        for i in range(0, G, 80):
            f.write(s[i : i + 80] + "\n")
    with open(f"{d}/reads.fq", "w") as f:
        for r in reads:
            f.write(f"@{r.name}\n{decode_seq(r.codes)}\n+\n{'I' * len(r)}\n")
    subprocess.run([REF_BIN, "--Create_Index", f"{d}/genome.fa,{d},ri"],
                   check=True, capture_output=True)
    t0 = time.perf_counter()
    subprocess.run(
        [REF_BIN, "-x", f"{d}/ri.json", "-i", f"{d}/reads.fq",
         "-o", f"{d}/ref.sam", "-p", "PacBio", "-t", "2"],
        check=True, capture_output=True,
    )
    rdt = time.perf_counter() - t0
    rok = rn = 0
    for line in open(f"{d}/ref.sam"):
        if line.startswith("@"):
            continue
        f = line.split("\t")
        if int(f[1]) & 0x900:
            continue
        rn += 1
        i = int(f[0][1:].split("_")[0])
        if abs(int(f[3]) - 1 - truth[i]) <= 200:
            rok += 1
    print(
        f"maCMD -p PacBio -t 2: {rdt:.1f}s => {N_READS/rdt:.1f} reads/s; "
        f"placement {rok}/{rn}; ma_tpu/ref speedup {rdt/dt:.2f}x",
        flush=True,
    )
