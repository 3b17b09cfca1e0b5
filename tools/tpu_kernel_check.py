#!/usr/bin/env python
"""Run the oracle-pinned kernel checks on the REAL TPU backend (the
pytest versions run in interpret mode on CPU)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np
import jax.numpy as jnp

from bppp_tpu.oracle import curve as oc
from bppp_tpu.oracle import field as of
from bppp_tpu.oracle import keccak as ok
from bppp_tpu.ops import field as f
from bppp_tpu.ops import pallas_keccak as pk
from bppp_tpu.ops import pallas_msm as pm

TILE = pm.TILE
rng = np.random.default_rng(77)


def _rand_wide(bound, n):
    vals = []
    for _ in range(n):
        v = 0
        for _ in range(4):
            v = (v << 64) | int(rng.integers(0, 2**63))
        vals.append(v % bound)
    return vals


def _flat_points(pts):
    xs = jnp.asarray(f.ints_to_limbs([p.x for p in pts]))
    ys = jnp.asarray(f.ints_to_limbs([p.y for p in pts]))
    zs = jnp.asarray(f.ints_to_limbs([p.z for p in pts]))
    return xs, ys, zs


def main():
    pts = [oc.GENERATOR.mul(k | 1) for k in _rand_wide(of.N, TILE)]
    pts[0] = oc.IDENTITY
    ks = _rand_wide(of.N, TILE)
    ks[1] = 0
    ks[2] = 1
    ks[3] = of.N - 1
    px, py, pz = _flat_points(pts)
    karr = jnp.asarray(f.ints_to_limbs(ks))
    ox, oy, oz = pm.scalar_mul_flat(px, py, pz, karr)
    oxn, oyn, ozn = np.asarray(ox), np.asarray(oy), np.asarray(oz)
    bad = 0
    for i in [0, 1, 2, 3, 7, 100, 511]:
        got = oc.Point(
            sum(int(oxn[l, i]) << (16 * l) for l in range(16)),
            sum(int(oyn[l, i]) << (16 * l) for l in range(16)),
            sum(int(ozn[l, i]) << (16 * l) for l in range(16)),
        )
        if not got.eq(pts[i].mul(ks[i])):
            bad += 1
            print(f"LADDER MISMATCH lane {i}")
    print("ladder check done, bad =", bad, flush=True)

    xs = [v | 1 for v in _rand_wide(of.P, TILE)]
    xs[0] = 0
    out = pm.pow_const_flat(jnp.asarray(f.ints_to_limbs(xs)), of.P - 2, "p")
    outn = np.asarray(out)
    bad = 0
    for i in [0, 1, 5, 511]:
        got = sum(int(outn[l, i]) << (16 * l) for l in range(16))
        want = 0 if xs[i] == 0 else of.fp_inv(xs[i])
        if got != want:
            bad += 1
            print(f"POW MISMATCH lane {i}")
    print("pow check done, bad =", bad, flush=True)

    states = rng.integers(0, 256, size=(200, TILE), dtype=np.uint32)
    kout = np.asarray(pk.f1600_flat(jnp.asarray(states)))
    bad = 0
    for lane in [0, 17, 511]:
        want = ok.f1600_bytes(bytes(int(b) for b in states[:, lane]))
        got = bytes(int(b) for b in kout[:, lane])
        if got != want:
            bad += 1
            print(f"KECCAK MISMATCH lane {lane}")
    print("keccak check done, bad =", bad, flush=True)


if __name__ == "__main__":
    main()
