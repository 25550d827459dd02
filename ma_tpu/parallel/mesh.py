"""Device-mesh data parallelism.

The reference scales by replicating its pledge graph once per CPU thread
over a shared work queue (reference: libs/ms/inc/ms/module/module.h
parallelGraph:386, simultaneousGet:268). The TPU-native equivalent is a
`jax.sharding.Mesh`: the read-batch axis is sharded across devices
("reads" axis = data parallelism; each device runs the identical XLA
program on its shard of the batch), while the FMD index arrays are
replicated (small genomes) — index sharding for GRCh38-scale occ tables
rides the same mesh with an extra "index" axis (SURVEY.md §7 step 8).

XLA inserts no collectives in the pure data-parallel path: seeding, SoC,
and harmonization are per-read independent, so the mesh scales at ~100%
efficiency minus host IO.
"""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec


READS_AXIS = "reads"


def make_mesh(devices: Optional[Sequence] = None, n: Optional[int] = None) -> Mesh:
    """1-D mesh over the read-batch axis. `n` limits the device count."""
    if devices is None:
        devices = jax.devices()
    if n is not None:
        devices = devices[:n]
    return Mesh(np.array(devices), (READS_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for [B, L] read-code arrays: B split over the mesh."""
    return NamedSharding(mesh, PartitionSpec(READS_AXIS, None))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, PartitionSpec())


def pad_batch_to_mesh(seqs: np.ndarray, lens: np.ndarray, mesh: Mesh):
    """Pad B up to a multiple of the mesh size (empty reads align to nothing)."""
    n = mesh.devices.size
    B = seqs.shape[0]
    rem = (-B) % n
    if rem:
        seqs = np.concatenate([seqs, np.full((rem, seqs.shape[1]), 4, seqs.dtype)])
        lens = np.concatenate([lens, np.zeros(rem, lens.dtype)])
    return seqs, lens, B
