"""Multi-host execution helpers.

The reference's only cross-process fabric is a SQL server + files
(SURVEY.md §2.9). The TPU-native replacement: `jax.distributed` over DCN
for process coordination, with read batches data-parallel per host (each
host reads its own FASTQ shard) and per-host results written to sharded
SAM files — no central data plane. Index arrays are replicated per host
(or hash-range sharded across the global mesh, see sharded_index.py).

Exercised end-to-end by tests/test_multihost.py: two local processes over
`jax.distributed` (CPU backend, localhost coordinator) initialize, run a
cross-process psum over the global mesh, align disjoint FASTQ shards, and
the shards merge back into one SAM (scripts/multihost_worker.py).
"""
from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np

import jax
from jax.sharding import Mesh

from ma_tpu.parallel.mesh import READS_AXIS


def init_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """jax.distributed.initialize with env-var fallbacks
    (COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID)."""
    if coordinator_address is None:
        coordinator_address = os.environ.get("COORDINATOR_ADDRESS")
    if num_processes is None and "NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["NUM_PROCESSES"])
    if process_id is None and "PROCESS_ID" in os.environ:
        process_id = int(os.environ["PROCESS_ID"])  # NB: 0 is a valid id
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def global_mesh() -> Mesh:
    """1-D mesh over every chip of every host (reads axis)."""
    return Mesh(np.array(jax.devices()), (READS_AXIS,))


def shard_paths(paths: Sequence[str]) -> list:
    """Round-robin input files over processes (each host aligns its own
    shard of the read set; the CyclicQueue role across hosts)."""
    pid = jax.process_index()
    n = jax.process_count()
    return [p for i, p in enumerate(paths) if i % n == pid]


def output_path_for_process(base: str) -> str:
    """Per-host SAM shard name (OutputManager role across hosts)."""
    if jax.process_count() == 1:
        return base
    root, ext = os.path.splitext(base)
    return f"{root}.part{jax.process_index():04d}{ext}"


def merge_sam_shards(shard_paths: Sequence[str], out_path: str) -> int:
    """Concatenate per-process SAM shards into one file: the header is taken
    from the first shard (all shards were written against the same Pack, so
    headers are identical); records append in shard order. Returns the
    number of alignment records written."""
    n = 0
    with open(out_path, "w") as out:
        for i, p in enumerate(sorted(shard_paths)):
            with open(p) as f:
                for line in f:
                    if line.startswith("@"):
                        if i == 0:
                            out.write(line)
                        continue
                    out.write(line)
                    n += 1
    return n
