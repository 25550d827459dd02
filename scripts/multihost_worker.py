"""Worker process for the 2-process multi-host exercise
(tests/test_multihost.py). Each process:

1. joins the jax.distributed cluster (localhost coordinator, CPU backend),
2. psums a per-process value over the GLOBAL mesh (proves the DCN
   collective path works across processes),
3. takes its shard of the FASTQ list (shard_paths), aligns it, and writes
   a per-process SAM shard (output_path_for_process).

Usage: multihost_worker.py <coord_addr> <n_procs> <pid> <workdir>
"""
import os
import sys

import re

os.environ["JAX_PLATFORMS"] = "cpu"
flags = re.sub(
    r"--xla_force_host_platform_device_count=\d+", "",
    os.environ.get("XLA_FLAGS", ""),
)
os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=2"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    coord, n_procs, pid, workdir = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
    from ma_tpu.parallel.multihost import (
        global_mesh, init_multihost, output_path_for_process, shard_paths,
    )

    init_multihost(coordinator_address=coord, num_processes=n_procs, process_id=pid)
    assert jax.process_count() == n_procs, jax.process_count()
    mesh = global_mesh()
    n_global = len(jax.devices())
    assert n_global == 2 * n_procs, n_global  # 2 virtual CPU devices per proc

    # --- cross-process collective: psum of per-process contribution
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec
    from ma_tpu.parallel.mesh import READS_AXIS

    local = jnp.full((len(jax.local_devices()), 1), pid + 1, jnp.int32)
    arr = jax.make_array_from_process_local_data(
        NamedSharding(mesh, PartitionSpec(READS_AXIS)), np.asarray(local),
        (n_global, 1),
    )
    total = jax.jit(
        lambda x: jnp.sum(x),
        out_shardings=NamedSharding(mesh, PartitionSpec()),
    )(arr)
    want = sum(2 * (p + 1) for p in range(n_procs))
    got = int(jax.device_get(total))
    assert got == want, (got, want)

    # --- align this process's FASTQ shard
    from ma_tpu.containers.pack import Pack
    from ma_tpu.index.fmd_index import FMDIndex
    from ma_tpu.pipeline.aligner import Aligner
    from ma_tpu.io.fasta import read_reads

    pack = Pack.load(os.path.join(workdir, "g"))
    fmd = FMDIndex.load(os.path.join(workdir, "g"))
    fastqs = sorted(
        os.path.join(workdir, f) for f in os.listdir(workdir) if f.endswith(".fq")
    )
    mine = shard_paths(fastqs)
    aligner = Aligner(pack, fmd)
    aligner.pset.set("Seeding Technique", "minimizers")
    out_path = output_path_for_process(os.path.join(workdir, "out.sam"))
    reads = [r for p in mine for r in read_reads(p)]
    with open(out_path, "w") as out:
        n = aligner.align_to_sam(iter(reads), out, batch_size=64)
    print(f"proc {pid}: psum ok ({got}), aligned {n} reads -> {out_path}", flush=True)


if __name__ == "__main__":
    main()
