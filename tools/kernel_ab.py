#!/usr/bin/env python
"""Device-time A/B of kernel-body variants via jax.profiler.

Wall-clock timings through the tunnel are untrustworthy in BOTH
directions (2026-08-18: ~240 ms per round-trip on single calls, and
chained-call wall times came out 4x above VPU peak — readiness
signalling does not reflect device completion). This measures the
per-op DEVICE time of a fused 256-iteration mixed-add loop kernel — the
fixed-base MSM's hot op — under:

  * sublane packing _SUB in {4, 8, 16}      (python tools/kernel_ab.py sub)
  * colsum strategy seq | tree | mx         (python tools/kernel_ab.py colsum)

Each configuration compiles its own kernel; one profiled call per
config; prints ms per 256-add call and ns/lane/add of device time.
"""

import functools
import glob
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

ADDS = 256
B = int(os.environ.get("PROBE_B", "4096"))


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

    @jax.jit
    def run(px, py, pz, qx, qy):
        out = jax.ShapeDtypeStruct((16, B), jnp.uint32)
        return pl.pallas_call(
            kern,
            grid=(B // tile,),
            in_specs=[spec] * 5,
            out_specs=[spec] * 3,
            out_shape=[out] * 3,
        )(px, py, pz, qx, qy)

    return run


def device_ms(run, args):
    """One warm call, then one profiled call; returns device ms of the
    top op (the loop kernel)."""
    o = run(*args)
    jax.block_until_ready(o)
    tdir = "/tmp/jax_ab_trace"
    os.system(f"rm -rf {tdir}")
    with jax.profiler.trace(tdir):
        o = run(*args)
        jax.block_until_ready(o)
        np.asarray(o[0])  # force a real device->host readback
    best = 0.0
    for path in glob.glob(f"{tdir}/**/*.xplane.pb", recursive=True):
        pd = jax.profiler.ProfileData.from_file(path)
        for plane in pd.planes:
            if "TPU" not in plane.name:
                continue
            for line in plane.lines:
                if line.name != "XLA Ops":
                    continue
                for ev in line.events:
                    best = max(best, ev.duration_ns)
    return best / 1e6


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "sub"
    rng = np.random.default_rng(0)
    mk = lambda: jnp.asarray(rng.integers(0, 1 << 16, (16, B)), jnp.uint32)
    args = (mk(), mk(), mk(), mk(), mk())

    if which == "sub":
        for sub in (4, 8, 16):
            run = make_kernel(sub)
            ms = device_ms(run, args)
            print(
                f"_SUB={sub:2d}: {ms:8.2f} ms device per {ADDS}-add call "
                f"(B={B}) = {ms*1e6/ADDS/B:6.2f} ns/lane/add"
            )
            jax.clear_caches()
    elif which == "colsum":
        sub = int(os.environ.get("BPPP_SUB", "4"))
        for mode in ("seq", "tree", "mx"):
            pf._COLSUM = mode
            run = make_kernel(sub)
            ms = device_ms(run, args)
            print(
                f"colsum={mode:4s}: {ms:8.2f} ms device per {ADDS}-add call "
                f"(B={B}, _SUB={sub}) = {ms*1e6/ADDS/B:6.2f} ns/lane/add"
            )
            jax.clear_caches()
    else:
        raise SystemExit(f"unknown mode {which}")


if __name__ == "__main__":
    main()
