"""Measure per-step overhead of lax.scan/while_loop on the (tunneled) chip
as a function of carry size and unroll factor."""
import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time

import numpy as np
import jax
import jax.numpy as jnp

import ma_tpu

ma_tpu.enable_compilation_cache()


def bench(name, fn, *args):
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    tc = time.perf_counter() - t0
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    print(f"{name:40s} compile={tc:6.1f}s steady={min(ts)*1e3:8.2f} ms", flush=True)


for shape, steps in [((4096, 8, 2, 64), 64), ((65536, 64), 64), ((4096, 512), 128)]:
    x = jnp.asarray(np.random.rand(*shape).astype(np.float32))

    for unroll in (1, 4, 16):
        @jax.jit
        def run(x, _steps=steps, _unroll=unroll):
            def step(c, _):
                # ~6 elementwise ops on the carry, like a sweep body
                c = c * 1.000001 + 0.5
                c = jnp.maximum(c, c * 0.999)
                c = c - jnp.minimum(c, 0.1)
                return c, None

            c, _ = jax.lax.scan(step, x, None, length=_steps, unroll=_unroll)
            return c

        bench(f"scan {shape} steps={steps} unroll={unroll}", run, x)

    @jax.jit
    def runw(x, _steps=steps):
        def cond(c):
            return c[1] < _steps

        def body(c):
            y, i = c
            y = y * 1.000001 + 0.5
            y = jnp.maximum(y, y * 0.999)
            y = y - jnp.minimum(y, 0.1)
            return (y, i + 1)

        return jax.lax.while_loop(cond, body, (x, jnp.int32(0)))[0]

    bench(f"while {shape} steps={steps}", runw, x)
