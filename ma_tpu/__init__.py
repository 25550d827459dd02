"""ma_tpu — a TPU-native read-alignment (MA) and structural-variant-calling (MSV) engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of ITBE-Lab/ma
(reference surveyed in /root/repo/SURVEY.md):

* FMD-index (bi-directional BWT) seeding — batched backward search on device
  (reference: libs/ma/inc/ma/container/fMIndex.h, libs/ma/inc/ma/module/binarySeeding.h)
* Strip of Consideration seed coupling + harmonization
  (reference: libs/ma/inc/ma/module/stripOfConsideration.h, harmonization.h)
* Banded 2-piece affine-gap Smith-Waterman with z-drop as a Pallas wavefront kernel
  (reference: libs/kswcpp/)
* SAM emission, mapping quality, paired reads
  (reference: libs/ma/inc/ma/module/fileWriter.h, mappingQuality.h, pairedReads.h)
* MSV: SV jumps from seeds + plane-sweep clustering
  (reference: libs/msv/)

Parallelism: data-parallel read batches over a `jax.sharding.Mesh`, with the
FM-index occ table replicated or sharded across devices (see ma_tpu/parallel/).
"""

__version__ = "0.1.0"

# Persistent XLA compilation cache: the jitted pipeline programs are large
# (minutes of compile on TPU); caching them across processes makes every
# run after the first start instantly. Keyed per platform (a CPU AOT
# artifact must not be replayed on a machine with different features).
def enable_compilation_cache() -> None:
    import os

    try:
        import jax

        platform = jax.devices()[0].platform
        path = os.environ.get(
            "MA_TPU_XLA_CACHE",
            os.path.join(
                os.path.expanduser("~"), ".cache", "ma_tpu_xla", platform
            ),
        )
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass
