"""MSV throughput benchmark: full --Sv pipeline on a simulated-SV genome.

Simulates a genome with implanted deletions/insertions/inversions, samples
long-ish reads across the breakpoints, and measures the complete jump
enumeration + sweep pipeline (VERDICT r3 item #6: record jumps/s + calls +
wall in BASELINE.md).

Usage: python scripts/sv_bench.py [genome_mbp] [n_reads] [read_len]
Defaults: 50 Mbp, 50,000 reads, 1000 bp.
"""
import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import sys
import time

import numpy as np

import ma_tpu

ma_tpu.enable_compilation_cache()

from ma_tpu.containers.nucseq import NucSeq
from ma_tpu.containers.pack import Pack
from ma_tpu.index.minimizer import MinimizerIndex
from ma_tpu.msv.pipeline import compute_sv_jumps_batch, sweep_sv_jumps

G_MBP = float(sys.argv[1]) if len(sys.argv) > 1 else 50.0
N_READS = int(sys.argv[2]) if len(sys.argv) > 2 else 50_000
READ_LEN = int(sys.argv[3]) if len(sys.argv) > 3 else 1000

G = int(G_MBP * 1_000_000)
rng = np.random.default_rng(20260821)

print(f"simulating {G_MBP:.0f} Mbp reference + SVs ...", flush=True)
ref = rng.integers(0, 4, size=G).astype(np.uint8)

# donor genome: implant SVs at spaced sites
svs = []  # (kind, ref_pos, size)
n_sv = max(20, G // 500_000)
sites = np.sort(rng.choice(np.arange(G // 10, G - G // 10), n_sv, replace=False))
parts = []
cur = 0
for p in sites:
    p = int(p)
    kind = rng.choice(["del", "ins", "inv"])
    size = int(rng.integers(100, 2000))
    parts.append(ref[cur:p])
    if kind == "del":
        cur = p + size
    elif kind == "ins":
        parts.append(rng.integers(0, 4, size=size).astype(np.uint8))
        cur = p
    else:  # inversion
        parts.append((3 - ref[p : p + size])[::-1])
        cur = p + size
    svs.append((kind, p, size))
parts.append(ref[cur:])
donor = np.concatenate(parts)
print(f"{len(svs)} SVs implanted; donor {len(donor)} bp", flush=True)

pack = Pack.empty()
pack.append("chrS", ref)
t0 = time.perf_counter()
mmi = MinimizerIndex.build(pack)
mmi.to_device()  # CHD build + HBM upload is index setup (the reference
# loads its .mmi before the pipeline too); memoized on the object
t_index = time.perf_counter() - t0

reads = []
for i in range(N_READS):
    p = int(rng.integers(0, len(donor) - READ_LEN))
    codes = donor[p : p + READ_LEN].copy()
    err = rng.random(READ_LEN) < 0.002
    codes[err] = (codes[err] + rng.integers(1, 4, err.sum())) % 4
    if i % 2:
        codes = (3 - codes)[::-1]
    reads.append(NucSeq(codes.astype(np.uint8), name=f"r{i}"))

print(f"index {t_index:.1f}s; warming up (device-stage compile) ...",
      flush=True)
t0 = time.perf_counter()
compute_sv_jumps_batch(reads[:512], pack, mmi)  # compile warmup (the
# persistent XLA cache is unreliable on the tunnel backend; bench.py warms
# the aligner stage the same way)
t_warm = time.perf_counter() - t0
print(f"warmup {t_warm:.1f}s; running jump pipeline on {N_READS} reads ...",
      flush=True)
t0 = time.perf_counter()
jb = compute_sv_jumps_batch(reads, pack, mmi)
t_jumps = time.perf_counter() - t0
t0 = time.perf_counter()
calls = sweep_sv_jumps(jb)
t_sweep = time.perf_counter() - t0

n_hit = 0
call_pts = np.asarray([(c.from_pos, c.to_pos) for c in calls], np.int64) \
    if calls else np.zeros((0, 2), np.int64)
for (kind, p, size) in svs:
    if len(call_pts) and (np.abs(call_pts - p) < 1000).any():
        n_hit += 1

total = t_jumps + t_sweep
print(
    f"jumps={len(jb)} calls={len(calls)} sv_recall~{n_hit}/{len(svs)}\n"
    f"enumeration(+seeding) {t_jumps:.1f}s, sweep {t_sweep:.2f}s, total "
    f"{total:.1f}s\n"
    f"=> {len(jb)/max(total,1e-9):,.0f} jumps/s end-to-end, "
    f"{len(jb)/max(t_sweep,1e-9):,.0f} jumps/s sweep-only, "
    f"{N_READS/max(total,1e-9):,.0f} reads/s",
    flush=True,
)
