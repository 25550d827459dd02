"""Benchmark: single-chip alignment throughput (reads/s) on the flagship
short-read config (BASELINE.json config #1 analog: random E. coli-scale
genome + simulated 150bp reads, full pipeline seed -> SoC -> harmonize ->
DP -> SAM fields).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline is measured against the reference maCMD running the same
workload on this host's CPU cores (see BASELINE.md). Until that number is
recorded in BASELINE_REF_READS_PER_S, vs_baseline is reported as 0.0.

Env knobs: MA_TPU_BENCH_GENOME (bp, default 1_000_000),
MA_TPU_BENCH_READS (default 2048), MA_TPU_BENCH_LEN (default 150).
"""
import json
import os
import sys
import time

import numpy as np

# Reference maCMD reads/s on the same genome/reads (1 Mbp random genome,
# 150bp 1%-error reads) on this host's 2 CPU cores, measured 2026-08-17:
# 20480 reads / 0.723 s (-t 2) = 28,327 reads/s. See BASELINE.md.
BASELINE_REF_READS_PER_S = 28327.0


def main():
    genome_len = int(os.environ.get("MA_TPU_BENCH_GENOME", 1_000_000))
    n_reads = int(os.environ.get("MA_TPU_BENCH_READS", 16384))
    read_len = int(os.environ.get("MA_TPU_BENCH_LEN", 150))
    batch = int(os.environ.get("MA_TPU_BENCH_BATCH", 4096))

    import ma_tpu

    ma_tpu.enable_compilation_cache()
    from ma_tpu.containers.nucseq import NucSeq, decode_seq, revcomp_codes
    from ma_tpu.containers.pack import Pack
    from ma_tpu.index.fmd_index import FMDIndex
    from ma_tpu.pipeline.aligner import Aligner

    rng = np.random.default_rng(1234)
    genome = rng.integers(0, 4, size=genome_len).astype(np.uint8)
    pack = Pack.empty()
    pack.append("bench", genome)
    t0 = time.perf_counter()
    fmd = FMDIndex.build(pack)
    t_index = time.perf_counter() - t0

    reads = []
    for i in range(n_reads):
        p = int(rng.integers(0, genome_len - read_len))
        codes = genome[p : p + read_len].copy()
        for j in np.nonzero(rng.random(read_len) < 0.01)[0]:
            codes[j] = (codes[j] + rng.integers(1, 4)) % 4
        if i % 2:
            codes = revcomp_codes(codes)
        reads.append(NucSeq.from_str(decode_seq(codes), name=f"r{i}"))

    aligner = Aligner(pack, fmd)
    tech = os.environ.get("MA_TPU_BENCH_TECH", "minimizers")
    aligner.pset.set("Seeding Technique", tech)
    if os.environ.get("MA_TPU_PROFILE"):
        from ma_tpu.utils.profile import AnalyzeRuntimes

        aligner.profiler = AnalyzeRuntimes()

    # warmup: compile the device stage on the bucket shape
    warm = reads[: min(batch, n_reads)]
    t0 = time.perf_counter()
    res = aligner.align_batch(warm)
    t_warm = time.perf_counter() - t0
    n_aligned = sum(1 for r in res if r)

    # engaged-path report (VERDICT r4 #1): make the bench self-describing so
    # a regression can be attributed to a disengaged fast path vs noise
    import jax

    from ma_tpu.native import chd as _chd

    mmi_dev = getattr(aligner, "_mmi_dev", None)
    engaged = {
        "seeding": tech,
        "chd_lookup": bool(
            tech == "minimizers"
            and mmi_dev is not None
            and getattr(mmi_dev, "chd_table", None) is not None
            and os.environ.get("MA_TPU_MM_CHD", "1") == "1"
        ),
        "chd_native": _chd.available(),
        "native_finish": bool(aligner._use_native_finish()),
        "native_sam": bool(aligner.native_sam_enabled()),
        "dp_kernel": os.environ.get("MA_TPU_DP", "fused"),
        "platform": jax.devices()[0].platform,
    }
    if aligner.profiler is not None:
        # drop warmup/compile time so the table reflects steady state
        from ma_tpu.utils.profile import AnalyzeRuntimes as _AR

        aligner.profiler = _AR()

    # measurement: median of >=3 full passes (VERDICT r4 #1 — a single
    # ~1.6 s window against a noisy tunnel produced 40% run-to-run swings)
    n_passes = int(os.environ.get("MA_TPU_BENCH_PASSES", 3))
    walls = []
    with open(os.devnull, "w") as devnull:
        for _ in range(n_passes):
            t0 = time.perf_counter()
            total = aligner.align_to_sam(iter(reads), devnull, batch_size=batch)
            walls.append(time.perf_counter() - t0)
    dt = sorted(walls)[len(walls) // 2]
    rps = total / dt

    vs = rps / BASELINE_REF_READS_PER_S if BASELINE_REF_READS_PER_S > 0 else 0.0
    print(
        json.dumps(
            {
                "metric": "reads_per_s_150bp_1chip",
                "value": round(rps, 2),
                "unit": "reads/s",
                "vs_baseline": round(vs, 3),
            }
        )
    )
    print(
        f"# genome={genome_len}bp index_build={t_index:.1f}s warmup={t_warm:.1f}s "
        f"aligned_warm={n_aligned}/{len(warm)} total={total} "
        f"walls={['%.2f' % w for w in walls]}s median={dt:.2f}s",
        file=sys.stderr,
    )
    print(f"# engaged: {json.dumps(engaged)}", file=sys.stderr)
    if aligner.profiler is not None:
        aligner.profiler.analyze(out=sys.stderr)


if __name__ == "__main__":
    main()
