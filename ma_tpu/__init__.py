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
