#!/usr/bin/env python
"""Bisect the fixed-base MSM on the TPU: check select_planes output
exactness against host recomputation, then plane_accum against the
oracle."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from bppp_tpu.oracle import curve as oc
from bppp_tpu.oracle import field as of
from bppp_tpu.ops import curve as dc
from bppp_tpu.ops import field as f
from bppp_tpu.ops import pallas_fixed_base as fb
from bppp_tpu.utils.rng import SeededRng


def main():
    F, B = 49, 512
    rng = SeededRng("debug fixed")
    base = [oc.GENERATOR.mul(rng.scalar()) for _ in range(F)]
    pts = dc.from_int_points(base)
    tables = jax.jit(fb.build_tables)(pts)
    tx_np = np.asarray(tables[0])  # (64, 16, 16, F) f32
    print("tables built", tx_np.shape, flush=True)

    # host-check a few table entries against the oracle
    for (w, d, i) in [(0, 1, 0), (0, 3, 5), (13, 15, 48), (63, 7, 20)]:
        want = base[i].mul(d * (16**w))
        wx, wy = want.to_affine()
        got = sum(int(tx_np[i, w, d, l]) << (16 * l) for l in range(16))
        assert got == wx, f"table mismatch at w={w} d={d} i={i}"
    print("table entries ok", flush=True)

    ks = [[rng.scalar() for _ in range(B)] for _ in range(F)]
    scal = jnp.stack([jnp.asarray(f.ints_to_limbs(k)) for k in ks], axis=1)

    qx, qy = jax.jit(fb.select_planes)(tables[0], tables[1], scal)
    qx_np = np.asarray(qx).reshape(64, 16, F, B)
    bad = 0
    for (w, i, p) in [(0, 0, 0), (5, 3, 100), (33, 48, 511), (63, 20, 7),
                      (17, 11, 300), (40, 40, 40)]:
        d = (ks[i][p] >> (4 * w)) & 15
        want = tx_np[i, w, d, :].astype(np.uint32)
        got = qx_np[w, :, i, p]
        if not np.array_equal(want, got):
            bad += 1
            print(f"SELECT MISMATCH w={w} i={i} p={p} d={d}")
            print("  want", want[:6], "got", got[:6])
    print("select check done, bad =", bad, flush=True)

    out = fb.msm_fixed_sum(tables, scal)
    ox = np.asarray(out.x)
    oy = np.asarray(out.y)
    oz = np.asarray(out.z)
    bad = 0
    for p in [0, 100, 511, 7]:
        got = oc.Point(
            sum(int(ox[l, p]) << (16 * l) for l in range(16)),
            sum(int(oy[l, p]) << (16 * l) for l in range(16)),
            sum(int(oz[l, p]) << (16 * l) for l in range(16)),
        )
        want = oc.IDENTITY
        for i in range(len(base)):
            want = want.add(base[i].mul(ks[i][p]))
        if not got.eq(want):
            bad += 1
            print(f"ACCUM MISMATCH i={i} p={p}")
    print("accum check done, bad =", bad, flush=True)


if __name__ == "__main__":
    main()
