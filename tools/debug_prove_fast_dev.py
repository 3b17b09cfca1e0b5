#!/usr/bin/env python
"""Bisect the device _prove_fast mismatch: SZ=4 (K=1) instance, eager CPU.
Compares device X/R/transcript-challenge against the host oracle prover."""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

jax.config.update("jax_platforms", "cpu")

from bppp_tpu.oracle import curve as oc
from bppp_tpu.oracle.field import N, fn_inv, fn_mul
from bppp_tpu.oracle.merlin import Transcript as HostTranscript
from bppp_tpu.oracle.wnla import WNLA
from bppp_tpu.ops import curve as dc
from bppp_tpu.ops import field as f
from bppp_tpu.protocol import convert as cv
from bppp_tpu.protocol import vectors as sv
from bppp_tpu.protocol.wnla import WNLADevice
from bppp_tpu.transcript.device import Transcript as DevTranscript
from bppp_tpu.utils.rng import SeededRng

SZ = 4
B = 2
LABEL = b"wnla test"

rng = SeededRng("device wnla")
g = oc.GENERATOR.mul(rng.scalar())
g_vec = [oc.GENERATOR.mul(rng.scalar()) for _ in range(SZ)]
h_vec = [oc.GENERATOR.mul(rng.scalar()) for _ in range(SZ)]

lanes = []
for b in range(B):
    c = rng.scalars(SZ)
    rho = rng.scalar()
    l = rng.scalars(SZ)
    n = rng.scalars(SZ)
    wnla = WNLA(g=g, g_vec=g_vec, h_vec=h_vec, c=c, rho=rho, mu=fn_mul(rho, rho))
    com = wnla.commit(l, n)
    proof = wnla.prove(com, HostTranscript(LABEL), l, n)
    lanes.append(dict(c=c, rho=rho, l=l, n=n, wnla=wnla, com=com, proof=proof))

dev = dict(
    g=cv.point_batched(g, B),
    g_vec=cv.points_batched(g_vec, B),
    h_vec=cv.points_batched(h_vec, B),
    c=cv.scalar_cols([ln["c"] for ln in lanes]),
    rho=f.ints_to_limbs([ln["rho"] for ln in lanes]),
    mu=f.ints_to_limbs([fn_mul(ln["rho"], ln["rho"]) for ln in lanes]),
    l=cv.scalar_cols([ln["l"] for ln in lanes]),
    n=cv.scalar_cols([ln["n"] for ln in lanes]),
    com=dc.from_int_points([ln["com"] for ln in lanes]),
)

w = WNLADevice(dev["g"], dev["g_vec"], dev["h_vec"], dev["c"],
               np.asarray(dev["rho"]), np.asarray(dev["mu"]))
t = DevTranscript(LABEL, batch=(B,))
proof = w.prove(dev["com"], t, dev["l"], dev["n"])

for b, ln in enumerate(lanes):
    got = cv.wnla_dev_to_oracle(jax.tree_util.tree_map(np.asarray, proof), b)
    want = ln["proof"]
    rx = [p.to_bytes() for p in got.r] == [p.to_bytes() for p in want.r]
    xx = [p.to_bytes() for p in got.x] == [p.to_bytes() for p in want.x]
    print(f"lane {b}: r {'OK' if rx else 'MISMATCH'} x {'OK' if xx else 'MISMATCH'}"
          f" l {'OK' if got.l == want.l else 'MISMATCH'}"
          f" n {'OK' if got.n == want.n else 'MISMATCH'}")
