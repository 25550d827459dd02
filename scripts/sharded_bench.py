"""Sharded-index realism check at chr21 scale (VERDICT r3 item #8).

Builds a 46 Mbp minimizer + FMD index, shards both over an 8-device mesh
(virtual CPU devices — the driver's multi-chip dry-run environment),
verifies sharded seeding against the replicated path on real read
batches, and reports the numbers that matter for the GRCh38 multi-chip
plan: per-shard bytes and the per-batch collective volume (all_gather
payloads for the minimizer path, psum rounds for FMD occ).

Usage: python scripts/sharded_bench.py [genome_mbp] [n_reads]
"""
import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")
from jax.sharding import Mesh

from ma_tpu.containers.nucseq import revcomp_codes
from ma_tpu.containers.pack import Pack
from ma_tpu.index.fmd_index import FMDIndex
from ma_tpu.index.minimizer import MinimizerIndex, minimizer_seeding
from ma_tpu.parallel.sharded_index import (
    SHARD_AXIS,
    shard_minimizer_index,
    sharded_minimizer_seeding,
)
from ma_tpu.parallel.sharded_fmd import shard_fmd_index, sharded_fmd_seeding
from ma_tpu.ops.occ import FMDDev
from ma_tpu.ops.seeding import smem_seeding

G = int((float(sys.argv[1]) if len(sys.argv) > 1 else 46.0) * 1e6)
N_READS = int(sys.argv[2]) if len(sys.argv) > 2 else 32
N_SHARDS = 8

rng = np.random.default_rng(11)
genome = rng.integers(0, 4, size=G).astype(np.uint8)
pack = Pack.empty()
pack.append("chr21ish", genome)
print(f"building {G/1e6:.0f} Mbp indexes ...", flush=True)
t0 = time.time()
mmi = MinimizerIndex.build(pack)
t_mmi = time.time() - t0
t0 = time.time()
fmd = FMDIndex.build(pack)
t_fmd = time.time() - t0
print(f"minimizer {t_mmi:.0f}s ({len(mmi.hash_sorted):,} entries), "
      f"FMD {t_fmd:.0f}s", flush=True)

L = 160
seqs = np.full((N_READS, L), 4, np.uint8)
lens = np.full(N_READS, 150, np.int32)
for i in range(N_READS):
    p = int(rng.integers(0, G - 150))
    codes = genome[p : p + 150].copy()
    for j in np.nonzero(rng.random(150) < 0.01)[0]:
        codes[j] = (codes[j] + rng.integers(1, 4)) % 4
    if i % 2:
        codes = revcomp_codes(codes)
    seqs[i, :150] = codes

mesh = Mesh(np.array(jax.devices()[:N_SHARDS]), (SHARD_AXIS,))
cst = pack.starts.astype(np.int32)
rlf = pack.unpacked_size_forward_strand


def seed_set(sb):
    v = np.asarray(sb.valid)
    rows = v.nonzero()
    return set(
        zip(rows[0].tolist(),
            np.asarray(sb.q_start)[v].tolist(),
            np.asarray(sb.length)[v].tolist(),
            np.asarray(sb.ref_start)[v].tolist(),
            np.asarray(sb.on_forward)[v].tolist())
    )


# ---------------- minimizer: replicated vs hash-range-sharded ------------
t0 = time.time()
shards = shard_minimizer_index(mmi, N_SHARDS)
t_shard = time.time() - t0
shard_leaves = [np.asarray(x) for x in jax.tree.leaves(shards)
                if hasattr(x, "nbytes")]
per_shard_mb = sum(x.nbytes for x in shard_leaves) / N_SHARDS / 1e6
rep_mb = sum(a.nbytes for a in (mmi.hash_sorted, mmi.pos, mmi.strand)) / 1e6

t0 = time.time()
sb_sh = sharded_minimizer_seeding(mesh, shards, seqs.astype(np.int32), lens,
                                  cst, rlf)
jax.block_until_ready(sb_sh.valid)
t_sharded = time.time() - t0
os.environ["MA_TPU_MM_CHD"] = "0"  # replicated comparison on same layout
sb_rep = minimizer_seeding(
    mmi.to_device(), jnp.asarray(seqs, jnp.int32), jnp.asarray(lens),
    jnp.asarray(cst), rlf, max_seeds=2048,
)
same = seed_set(sb_sh) == seed_set(sb_rep)
print(
    f"minimizer sharded == replicated: {same} "
    f"({len(seed_set(sb_rep)):,} seeds, sharded wall {t_sharded:.1f}s "
    f"incl. CPU-mesh compile)", flush=True,
)
assert same, "sharded minimizer seeding diverged"

# all_gather payload: each shard ships its per-shard hit rows for the batch
M_per = 256  # max_seeds_per_shard default
ag_mb = N_SHARDS * N_READS * M_per * 5 * 4 / 1e6
print(
    f"minimizer shards: {per_shard_mb:.1f} MB/shard (replicated "
    f"{rep_mb:.1f} MB; shard build {t_shard:.1f}s); per-{N_READS}-read "
    f"batch all_gather ~{ag_mb:.1f} MB mesh-wide ({ag_mb/N_SHARDS:.2f} "
    f"MB/device) -> at B=4096 that is ~{ag_mb*4096/N_READS/N_SHARDS:.0f} "
    f"MB/device/batch over ICI", flush=True,
)

# ---------------- FMD: row-sharded occ/SA (owner-computes + psum) --------
t0 = time.time()
fmd_shards = shard_fmd_index(fmd, N_SHARDS)
fmd_leaves = [np.asarray(x) for x in jax.tree.leaves(fmd_shards)
              if hasattr(x, "nbytes")]
fmd_per_shard_mb = sum(x.nbytes for x in fmd_leaves) / N_SHARDS / 1e6
n16 = min(N_READS, 16)
got = sharded_fmd_seeding(
    mesh, fmd_shards, seqs[:n16].astype(np.int32), lens[:n16], cst,
    technique="SMEMs",
)
jax.block_until_ready(got.valid)
t_fmd_sh = time.time() - t0
from ma_tpu.ops.extract import extract_seeds

dev_fmd = FMDDev.from_host(fmd)
segs = smem_seeding(dev_fmd, jnp.asarray(seqs[:n16], jnp.int32),
                    jnp.asarray(lens[:n16]))
want = extract_seeds(dev_fmd, segs, jnp.asarray(lens[:n16]),
                     jnp.asarray(cst))
same_fmd = seed_set(got) == seed_set(want)
assert same_fmd, "sharded FMD seeding diverged"
print(
    f"FMD sharded == replicated: {same_fmd}; {fmd_per_shard_mb:.1f} "
    f"MB/shard; wall {t_fmd_sh:.1f}s incl. shard build + compile",
    flush=True,
)
# psum volume: each backward-extension round reduces a [B, 8] int32 row
# across the mesh; ~L rounds per batch
psum_mb = 150 * n16 * 8 * 4 * N_SHARDS / 1e6
print(
    f"FMD per-{n16}-read batch psum traffic ~{psum_mb:.2f} MB over ~150 "
    f"latency-bound rounds — the reason the minimizer path is the "
    f"scale-out seeding path (SURVEY §2.9)", flush=True,
)
print("SHARDED BENCH OK")
