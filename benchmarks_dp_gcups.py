"""DP kernel speed-of-light check: GCUPS for the banded extension kernel
(BASELINE.md target "DP kernel GCUPS/chip"). Run standalone on a chip."""
import time

import numpy as np
import jax
import jax.numpy as jnp

import ma_tpu

ma_tpu.enable_compilation_cache()
from ma_tpu.ops.dp import DPParams, banded_align


def main():
    rng = np.random.default_rng(0)
    P, M, N = 512, 256, 1024
    q = jnp.asarray(rng.integers(0, 4, (P, M)), jnp.uint8)
    t = jnp.asarray(rng.integers(0, 4, (P, N)), jnp.uint8)
    qlen = jnp.full(P, M, jnp.int32)
    tlen = jnp.full(P, N, jnp.int32)
    band = jnp.full(P, 512, jnp.int32)

    res = banded_align(q, t, qlen, tlen, band, DPParams(), zdrop=-1,
                       is_global=True)
    jax.block_until_ready(res)
    t0 = time.perf_counter()
    reps = 5
    for _ in range(reps):
        res = banded_align(q, t, qlen, tlen, band, DPParams(), zdrop=-1,
                           is_global=True)
        jax.block_until_ready(res)
    dt = (time.perf_counter() - t0) / reps
    cells = P * M * N
    print(f"platform={jax.devices()[0].platform} P={P} M={M} N={N} "
          f"wall={dt*1e3:.1f} ms -> {cells/dt/1e9:.1f} GCUPS")


if __name__ == "__main__":
    main()
