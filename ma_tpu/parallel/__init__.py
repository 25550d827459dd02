from ma_tpu.parallel.mesh import (
    READS_AXIS,
    batch_sharding,
    make_mesh,
    pad_batch_to_mesh,
    replicated,
)

__all__ = [
    "READS_AXIS",
    "batch_sharding",
    "make_mesh",
    "pad_batch_to_mesh",
    "replicated",
]
