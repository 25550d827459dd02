"""Multi-host execution helpers.

The reference's only cross-process fabric is a SQL server + files
(SURVEY.md §2.9). The TPU-native replacement: `jax.distributed` over DCN
for process coordination, with read batches data-parallel per host (each
host reads its own FASTQ shard) and per-host results written to sharded
SAM files — no central data plane. Index arrays are replicated per host
(or hash-range sharded across the global mesh, see sharded_index.py).

This module cannot be exercised in a single-host environment; the sharding
semantics it relies on are covered by the 8-virtual-device tests.
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
    jax.distributed.initialize(
        coordinator_address=coordinator_address
        or os.environ.get("COORDINATOR_ADDRESS"),
        num_processes=num_processes
        or (int(os.environ["NUM_PROCESSES"]) if "NUM_PROCESSES" in os.environ else None),
        process_id=process_id
        or (int(os.environ["PROCESS_ID"]) if "PROCESS_ID" in os.environ else None),
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
