#!/usr/bin/env python
"""Measure VPU utilization of the stacked-form point kernels vs sublane
packing.

Hypothesis: ops on (16, 4, 128)-shaped stacked elements half-fill the
(8, 128) vregs (second-minor dim 4 pads to 8), so the same point-add
loop on (16, 8, 128) tiles (TILE=1024) should run ~2x faster per lane.

Runs a fused loop of incomplete mixed adds (the fixed-base kernel's hot
op) at _SUB in {4, 8, 16} and prints ns/lane/add for each, chained to
defeat async dispatch (CLAUDE.md measurement rules).
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bppp_tpu.ops import pallas_field as pf

REPS = int(os.environ.get("PROBE_REPS", "3"))
ADDS = 256  # adds per kernel call


def make_kernel(sub):
    tile = sub * 128

    def kern(px, py, pz, qx, qy, ox, oy, oz):
        X = px[:].reshape(16, sub, 128)
        Y = py[:].reshape(16, sub, 128)
        Z = pz[:].reshape(16, sub, 128)
        QX = qx[:].reshape(16, sub, 128)
        QY = qy[:].reshape(16, sub, 128)

        def body(i, st):
            return pf.pt_add_mixed_inc(*st, QX, QY)

        X, Y, Z = jax.lax.fori_loop(0, ADDS, body, (X, Y, Z))
        ox[:] = X.reshape(16, tile)
        oy[:] = Y.reshape(16, tile)
        oz[:] = Z.reshape(16, tile)

    spec = pl.BlockSpec((16, tile), lambda i: (0, i), memory_space=pltpu.VMEM)
    out = lambda B: jax.ShapeDtypeStruct((16, B), jnp.uint32)

    @jax.jit
    def run(px, py, pz, qx, qy):
        B = px.shape[1]
        return pl.pallas_call(
            kern,
            grid=(B // tile,),
            in_specs=[spec] * 5,
            out_specs=[spec] * 3,
            out_shape=[out(B)] * 3,
        )(px, py, pz, qx, qy)

    return run


def main():
    B = 4096
    rng = np.random.default_rng(0)
    mk = lambda: jnp.asarray(rng.integers(0, 1 << 16, (16, B)), jnp.uint32)
    px, py, pz, qx, qy = mk(), mk(), mk(), mk(), mk()
    for sub in (4, 8, 16):
        run = make_kernel(sub)
        o = run(px, py, pz, qx, qy)
        jax.block_until_ready(o)
        t0 = time.perf_counter()
        x, y, z = px, py, pz
        for _ in range(REPS):  # chain: output feeds input
            x, y, z = run(x, y, z, qx, qy)
        jax.block_until_ready((x, y, z))
        dt = time.perf_counter() - t0
        ns_lane = dt / REPS / ADDS / B * 1e9
        print(f"_SUB={sub:2d} TILE={sub*128:5d}: {ns_lane:7.2f} ns/lane/add "
              f"({dt/REPS*1e3:.2f} ms per {ADDS}-add call, B={B})")


if __name__ == "__main__":
    main()
