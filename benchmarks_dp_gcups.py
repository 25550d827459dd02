"""DP kernel speed-of-light check: GCUPS for the banded extension kernel
(BASELINE.md target "DP kernel GCUPS/chip"; VERDICT r4 item #2).

Two numbers per kernel (round-5 finding: a single tunneled call carries
~55 ms of dispatch/transfer latency that is NOT kernel time — the r4
artifact's "2.7 GCUPS" was mostly tunnel):

* single-call wall (latency-inclusive, what one isolated call costs);
* steady-state kernel throughput from back-to-back async dispatches:
  (wall(R calls) - wall(1 call)) / (R - 1) — the marginal cost of one
  more kernel on a busy queue, which is what the pipeline actually pays
  (its DP calls are dispatched asynchronously behind the device stage).

Run standalone on a chip."""
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
    reps = 9

    def bench(fn, label):
        out = fn()
        jax.block_until_ready(out)

        def timed(r):
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                for _k in range(r):
                    out = fn()
                for leaf in jax.tree.leaves(out):
                    np.asarray(leaf)
                ts.append(time.perf_counter() - t0)
            return min(ts)

        t1 = timed(1)
        tr = timed(reps)
        k = (tr - t1) / (reps - 1)
        print(
            f"{label}: single-call {t1*1e3:7.1f} ms "
            f"({cells/t1/1e9:5.1f} GCUPS) | steady-state {k*1e3:7.1f} ms "
            f"= {cells/k/1e9:5.1f} GCUPS",
            flush=True,
        )
        return cells / k / 1e9

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
    print(f"fused/scan steady-state speedup: {g_fused / g_scan:.1f}x")


if __name__ == "__main__":
    main()
