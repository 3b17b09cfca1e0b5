#!/usr/bin/env python
"""Probe raw VPU op costs inside one Mosaic kernel: u32 mul vs add vs
f32 mul, and the cost of jnp.where selects. Each variant runs N ops in a
fori_loop body over a (16, S, 128) block; chained executes give real
latency."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B = int(os.environ.get("B", 32768))
SUB = B // 128
ITERS = 64
OPS = 16  # ops per loop iteration


def mk(op):
    def kern(x_ref, o_ref):
        a = x_ref[:].reshape(16, SUB, 128)

        def body(i, a):
            for j in range(OPS):
                a = op(a, j)
            return a

        a = jax.lax.fori_loop(0, ITERS, body, a)
        o_ref[:] = a.reshape(16, B)

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((16, B), jnp.uint32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)

    return run


def mkf(op):
    def kern(x_ref, o_ref):
        a = x_ref[:].reshape(16, SUB, 128)

        def body(i, a):
            for j in range(OPS):
                a = op(a, j)
            return a

        a = jax.lax.fori_loop(0, ITERS, body, a)
        o_ref[:] = a.reshape(16, B)

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((16, B), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)

    return run


def bench(name, run, x, reps=8):
    cur = run(x)
    np.asarray(cur)
    t0 = time.perf_counter()
    for _ in range(reps):
        cur = run(cur)
    np.asarray(cur)
    dt = (time.perf_counter() - t0) / reps
    nops = ITERS * OPS * B * 16  # per-limb-element ops
    print(f"{name:22s} t={dt*1e3:8.3f} ms  {dt/nops*1e12:8.3f} ps/elem-op", flush=True)


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(1, 1 << 15, size=(16, B), dtype=np.uint32))

    bench("u32 mul", mk(lambda a, j: a * (a + np.uint32(j + 1))), x)
    bench("u32 add", mk(lambda a, j: a + (a ^ np.uint32(j + 1))), x)
    bench("u32 shift+and", mk(lambda a, j: ((a >> 3) & np.uint32(0xFFFF)) + a), x)
    bench("u32 mul16 (masked)", mk(lambda a, j: (a & 0xFFFF) * ((a >> 7) & 0xFFFF)), x)
    xf = jnp.asarray(rng.random(size=(16, B), dtype=np.float32))
    bench("f32 mul", mkf(lambda a, j: a * (a + np.float32(j + 1))), xf)
    bench("f32 fma-ish", mkf(lambda a, j: a * np.float32(1.00001) + a), xf)
    bench(
        "select(where)",
        mk(lambda a, j: jnp.where((a & 1) == 0, a + np.uint32(j), a)),
        x,
    )


if __name__ == "__main__":
    main()
