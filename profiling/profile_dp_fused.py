"""Time the fused DP call's pieces on the real chip: operand gather vs
kernel vs download, at the hot bucket shapes.

Usage: python profiling/profile_dp_fused.py
"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import ma_tpu
ma_tpu.enable_compilation_cache()
import jax
import jax.numpy as jnp
from ma_tpu.ops.dp import DPParams, _desc_operands, _dp_desc_runs_fused
from ma_tpu.ops.dp_fused import banded_align_runs
import functools

rng = np.random.default_rng(0)
T = 2_000_128
text = jnp.asarray(rng.integers(0, 4, size=T).astype(np.uint8))
B, L = 4096, 256
seqs = jnp.asarray(rng.integers(0, 4, size=(B, L)).astype(np.uint8))

def timeit(f, n=8):
    f()  # compile
    jax.block_until_ready(f())
    t0 = time.perf_counter()
    for _ in range(n):
        r = f()
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n

for (M, N, m_typ) in [(16, 768, 12), (64, 768, 40), (256, 768, 150), (16, 64, 12)]:
    P = 4096
    desc = np.zeros((8, P), np.int32)
    desc[0] = rng.integers(0, B, size=P)        # read idx
    desc[1] = 0                                  # q_off
    desc[2] = rng.integers(max(1, m_typ//2), m_typ+1, size=P)  # q_len
    desc[3] = rng.integers(0, 2, size=P)         # q_rev
    desc[4] = rng.integers(0, T - N - 1, size=P) # t_start
    desc[5] = np.minimum(desc[2] + 513, N)       # t_len
    desc[6] = 0
    desc[7] = 512                                # band
    desc_d = jnp.asarray(desc)

    ops_fn = jax.jit(functools.partial(_desc_operands, M=M, N=N))
    t_ops = timeit(lambda: ops_fn(text, seqs, desc_d))
    full = lambda: _dp_desc_runs_fused(text, seqs, desc_d, M=M, N=N,
                                        params=DPParams(), zdrop=200,
                                        is_global=False)
    t_full = timeit(full)
    # download cost
    r, meta = full(); jax.block_until_ready(meta)
    t0 = time.perf_counter()
    for _ in range(4):
        mm = np.asarray(meta); rr = np.asarray(r[:8])
    t_dl = (time.perf_counter() - t0) / 4
    print(f"({M:4d},{N:4d}) m~{m_typ:4d}: operands {t_ops*1e3:7.2f} ms  "
          f"full {t_full*1e3:7.2f} ms  download {t_dl*1e3:7.2f} ms", flush=True)
