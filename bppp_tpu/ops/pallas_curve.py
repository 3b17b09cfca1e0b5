"""Pallas TPU kernels for the hot curve ops (fused Jacobian add/double).

Kernels keep whole point operations in VMEM on stacked (16, S, 128) limb
arrays (see ops/pallas_field.py — the stacked form keeps Mosaic binaries
~10x smaller than unrolled limb rows, which matters because the
runtime's per-call cost scales with total executable size). Semantics
are identical to ops/curve.py pt_add/pt_double (complete, branch-free);
dispatch happens there based on backend.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import pallas_field as pf

# Lane-tile geometry. Stacked element ops run on (16, _SUB, 128) arrays;
# Mosaic tiles the trailing (S, 128) dims into (8, 128) int vregs, so
# _SUB=4 half-fills every vreg's sublanes. Measured (tools/kernel_ab.py
# sub, device time via jax.profiler, 2026-08-18 v5e): _SUB=8 is 2.0x
# faster than 4 (6.45 vs 12.91 ns/lane per incomplete mixed add) and
# beats 16 (7.75) — so 8 is the default. Kernels require B % TILE == 0:
# _SUB=8 needs batch a multiple of 1024. NOTE: the jax.export AOT cache
# keys on SOURCE, not env — benches must fold BPPP_SUB into their names.
_SUB = int(os.environ.get("BPPP_SUB", "8"))
TILE = _SUB * 128

# CPU-validation escape hatch: run every pallas_call in interpret mode so
# kernel semantics are testable without a TPU (tests/test_pallas_kernels.py).
# Read at TRACE time (call sites), not import time, so tests can flip it.
def INTERPRET() -> bool:
    return os.environ.get("BPPP_PALLAS_INTERPRET", "0") == "1"


def _ld(ref):
    return ref[:].reshape(16, _SUB, 128)


def _st(ref, v):
    ref[:] = v.reshape(16, TILE)


def _pt_add_kernel(px, py, pz, qx, qy, qz, ox, oy, oz):
    X3, Y3, Z3 = pf.pt_add(_ld(px), _ld(py), _ld(pz), _ld(qx), _ld(qy), _ld(qz))
    _st(ox, X3)
    _st(oy, Y3)
    _st(oz, Z3)


def _pt_double_kernel(px, py, pz, ox, oy, oz):
    X3, Y3, Z3 = pf.pt_dbl(_ld(px), _ld(py), _ld(pz))
    _st(ox, X3)
    _st(oy, Y3)
    _st(oz, Z3)


def _spec():
    return pl.BlockSpec((16, TILE), lambda i: (0, i), memory_space=pltpu.VMEM)


@jax.jit
def pt_add_flat(px, py, pz, qx, qy, qz):
    """Fused complete add on flat (16, B) coords, B % TILE == 0."""
    B = px.shape[1]
    out = jax.ShapeDtypeStruct((16, B), jnp.uint32)
    return pl.pallas_call(
        _pt_add_kernel,
        grid=(B // TILE,),
        in_specs=[_spec()] * 6,
        out_specs=[_spec()] * 3,
        out_shape=[out] * 3,
        interpret=INTERPRET(),
    )(px, py, pz, qx, qy, qz)


@jax.jit
def pt_double_flat(px, py, pz):
    B = px.shape[1]
    out = jax.ShapeDtypeStruct((16, B), jnp.uint32)
    return pl.pallas_call(
        _pt_double_kernel,
        grid=(B // TILE,),
        in_specs=[_spec()] * 3,
        out_specs=[_spec()] * 3,
        out_shape=[out] * 3,
        interpret=INTERPRET(),
    )(px, py, pz)
