"""DP kernel speed-of-light check: GCUPS for the banded extension kernel
(BASELINE.md target "DP kernel GCUPS/chip"; VERDICT r2 item #4).

Measures both the XLA anti-diagonal scan (the round-1 kernel) and the
fused Pallas kernel (ops/dp_fused.py: forward + in-kernel traceback,
CIGAR runs out) on the same workload. Run standalone on a chip."""
import time

import numpy as np
import jax
import jax.numpy as jnp

import ma_tpu

ma_tpu.enable_compilation_cache()
from ma_tpu.ops.dp import DPParams, banded_align
from ma_tpu.ops.dp_fused import banded_align_runs


def _mutate(rng, t, q, qlen):
    # target = query + mutations so tracebacks are realistic
    for p in range(q.shape[0]):
        seg = q[p, : qlen].copy()
        idx = rng.random(qlen) < 0.05
        seg[idx] = (seg[idx] + 1) % 4
        t[p, : qlen] = seg
    return t


def main():
    rng = np.random.default_rng(0)
    P, M, N = 512, 256, 1024
    q = rng.integers(0, 4, (P, M)).astype(np.uint8)
    t = _mutate(rng, rng.integers(0, 4, (P, N)).astype(np.uint8), q, M)
    qd, td = jnp.asarray(q), jnp.asarray(t)
    qlen = jnp.full(P, M, jnp.int32)
    # realistic span: target ~ query + slack (tlen=N put the global end
    # cell outside the band and every score at -inf)
    tlen = jnp.full(P, M + 64, jnp.int32)
    band = jnp.full(P, 512, jnp.int32)
    cells = P * M * N
    reps = 5

    def bench(fn, label):
        out = fn()
        jax.block_until_ready(out)
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn()
            # materialize on host: block_until_ready alone under-reports on
            # the tunneled backend (measured 0.1 ms for a 50 ms kernel)
            for leaf in jax.tree.leaves(out):
                np.asarray(leaf)
            ts.append(time.perf_counter() - t0)
        dt = min(ts)
        print(f"{label}: wall={dt*1e3:7.1f} ms -> {cells/dt/1e9:7.1f} GCUPS",
              flush=True)
        return cells / dt / 1e9

    print(f"platform={jax.devices()[0].platform} P={P} M={M} N={N}")
    g_scan = bench(
        lambda: banded_align(qd, td, qlen, tlen, band, DPParams(), -1, True),
        "xla anti-diagonal scan (score+dirs) ",
    )
    g_fused = bench(
        lambda: banded_align_runs(
            qd, td, qlen, tlen, band, M=M, N=N, params=DPParams(), zdrop=-1,
            is_global=True,
        ),
        "fused pallas fwd+traceback (runs out)",
    )
    print(f"fused/scan speedup: {g_fused / g_scan:.1f}x")


if __name__ == "__main__":
    main()
