"""Sharded minimizer-index lookup over the 8-device CPU mesh
(ma_tpu/parallel/sharded_index.py; conftest provides 8 virtual devices)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from ma_tpu.containers.pack import Pack
from ma_tpu.index.minimizer import MinimizerIndex, minimizer_seeding
from ma_tpu.parallel.sharded_index import (
    SHARD_AXIS,
    shard_minimizer_index,
    sharded_minimizer_seeding,
)


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(123)
    genome = rng.integers(0, 4, size=30000).astype(np.uint8)
    pack = Pack.empty()
    pack.append("chrSh", genome)
    mmi = MinimizerIndex.build(pack, k=15, w=10)
    return pack, mmi, genome


def seeds_set(sb, b):
    out = set()
    for s in range(sb.q_start.shape[1]):
        if bool(sb.valid[b, s]):
            out.add(
                (int(sb.q_start[b, s]), int(sb.length[b, s]),
                 int(sb.ref_start[b, s]), bool(sb.on_forward[b, s]))
            )
    return out


def test_sharded_equals_unsharded(setup):
    pack, mmi, genome = setup
    n_dev = len(jax.devices())
    assert n_dev == 8
    mesh = Mesh(np.array(jax.devices()), (SHARD_AXIS,))
    shards = shard_minimizer_index(mmi, n_dev)

    B = 4
    seqs = np.full((B, 256), 4, np.int32)
    lens = np.full(B, 200, np.int32)
    rng = np.random.default_rng(5)
    for b in range(B):
        p = int(rng.integers(0, 30000 - 200))
        seqs[b, :200] = genome[p : p + 200]

    sharded = sharded_minimizer_seeding(
        mesh, shards, seqs, lens, pack.starts.astype(np.int32),
        pack.unpacked_size_forward_strand,
    )
    plain = minimizer_seeding(
        mmi.to_device(), jnp.asarray(seqs), jnp.asarray(lens),
        jnp.asarray(pack.starts.astype(np.int32)),
        pack.unpacked_size_forward_strand, k=15, w=10, max_occ=50,
        max_seeds=1024,
    )
    for b in range(B):
        assert seeds_set(sharded, b) == seeds_set(plain, b), f"read {b}"


def test_multihost_helpers_single_process():
    from ma_tpu.parallel.multihost import (
        global_mesh,
        output_path_for_process,
        shard_paths,
    )

    mesh = global_mesh()
    assert mesh.devices.size == len(jax.devices())
    assert shard_paths(["a.fq", "b.fq"]) == ["a.fq", "b.fq"]
    assert output_path_for_process("out.sam") == "out.sam"
