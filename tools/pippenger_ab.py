#!/usr/bin/env python
"""Device-time A/B: bucketed Pippenger vs the per-lane ladder + tree
reduction at large L (VERDICT r4 missing #5).

This is the large-L / few-proofs regime (one big MSM over L dynamic
points, small batch) where the shared-window small-MSM kernel's VMEM
tables no longer fit (ops/pallas_msm.py caps at D=6) — the replacement
site for the reference's naive per-term loop (util.rs:46-60) at large L.
Random scalar bits / generator multiples; both paths are branchless so
point values don't affect timing. Prints profiler DEVICE time (wall
clock through the tunnel is untrustworthy — BENCHMARKS.md).

    python tools/pippenger_ab.py            # L in {64, 256}, B=8
    PIP_L=128 PIP_B=8 python tools/pippenger_ab.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from fb_ab import device_ms  # interval-merged profiler device-time sum

from bppp_tpu.ops import curve as dc
from bppp_tpu.ops import field as f
from bppp_tpu.ops.pippenger import msm_pippenger, _pick_c


def _case(L: int, B: int, seed: int = 7):
    rng = np.random.default_rng(seed)
    # random points: affine-ish Jacobian triples from generator multiples
    # are unnecessary for timing — use random residue limbs (branchless
    # add/dbl bodies do identical work on any bit pattern)
    coords = [
        jnp.asarray(rng.integers(0, 1 << 16, (16, L, B)), jnp.uint32)
        for _ in range(3)
    ]
    pts = dc.PointJ(*coords)
    ks = jnp.asarray(rng.integers(0, 1 << 16, (16, L, B)), jnp.uint32)
    return pts, ks


def ladder_tree(pts, ks):
    """The pre-Pippenger path: one 334-op ladder per (point x lane), then
    a log-tree reduction of the L partials."""
    per = dc.pt_scalar_mul(pts, ks)
    return dc._tree_sum_axis1(per)


def main():
    B = int(os.environ.get("PIP_B", "8"))
    Ls = (
        [int(os.environ["PIP_L"])]
        if os.environ.get("PIP_L")
        else [64, 256]
    )
    for L in Ls:
        pts, ks = _case(L, B)
        pip = jax.jit(lambda p, k: msm_pippenger(p, k))
        lad = jax.jit(ladder_tree)
        pip_ms, _ = device_ms(lambda p, k: [pip(p, k)], pts, ks)
        lad_ms, _ = device_ms(lambda p, k: [lad(p, k)], pts, ks)
        print(
            f"L={L:4d} B={B}: pippenger(c={_pick_c(L)}) {pip_ms:8.2f} ms | "
            f"ladder+tree {lad_ms:8.2f} ms | speedup {lad_ms / pip_ms:5.2f}x",
            flush=True,
        )


if __name__ == "__main__":
    main()
