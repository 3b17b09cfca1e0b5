"""Whole-loop Pallas kernels: fused ladders and point reductions.

Two measured pathologies drive this design (see CLAUDE.md):
  1. per-launch/scan-iteration overhead dominates composed programs ->
     entire loops live inside one pallas_call (fori_loop bodies);
  2. the runtime's per-call cost scales with total executable size ->
     kernel bodies use the compact stacked-form field ops
     (ops/pallas_field.py) and callers bucket shapes so kernel instances
     dedupe.

Kernels:
  * pow_const_flat  -- full fixed-window exponentiation (fp_inv/fp_sqrt/
                       fn_inv) in one call
  * scalar_mul_flat -- full [k]P double-and-add ladder, in-VMEM table
  * tree_sum        -- reduction over a points axis in one call
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import pallas_curve as pc
from . import pallas_field as pf
from .pallas_curve import INTERPRET, TILE, _SUB, _ld, _spec, _st


def _ent_iota(shape):
    return jax.lax.broadcasted_iota(jnp.int32, shape, 0)


def _tab_set(tab, d, v):
    """tab (E, 16, S, 128); write stacked element v at entry index d."""
    return jnp.where(_ent_iota(tab.shape) == d, v[None], tab)


def _tab_select(tab, d):
    """d: scalar or (S,128) digit -> stacked element via masked adds
    (no u32 reductions, no value dynamic-slicing in Mosaic)."""
    acc = jnp.zeros_like(tab[0])
    for ent in range(tab.shape[0]):
        m = d == ent
        acc = acc + jnp.where(m, tab[ent], 0)
    return acc


# -- fused pow ladder (fp_inv / fp_sqrt / fn_inv) ---------------------------

def _pow_kernel(mul, digits_ref, x_ref, o_ref):
    """Fixed-window pow with ONE loop whose body holds exactly TWO mul
    sites (the squaring and the table/operand multiply). Steps 0..13
    build tab[2..15] = x^2..x^15 (the running product doubles as the
    table chain); steps 14.. walk the exponent digits MSB-first. The
    per-call runtime cost scales with Mosaic code size, so op-site count
    — not op count — is what this kernel minimizes."""
    x = _ld(x_ref)
    one = jnp.pad(
        jnp.ones((1,) + x.shape[1:], jnp.uint32), [(0, 15), (0, 0), (0, 0)]
    )

    tab0 = jnp.zeros((16,) + x.shape, jnp.uint32)
    tab0 = _tab_set(tab0, 0, one)
    tab0 = _tab_set(tab0, 1, x)
    ndig = digits_ref.shape[0]

    def body(i, carry):
        tab, acc = carry
        is_tab = i < 14
        # accumulator restarts at 1 for the digit walk (1^16 * tab[d0]
        # == tab[d0], so digit 0 needs no special case)
        acc = jnp.where(i == 14, one, acc)

        def sstep(_, a):
            return jnp.where(is_tab, a, mul(a, a))

        acc = jax.lax.fori_loop(0, 4, sstep, acc)
        w = jnp.maximum(i - 14, 0)
        o2 = jnp.where(is_tab, x, _tab_select(tab, digits_ref[w, 0]))
        nxt = mul(acc, o2)
        ent = jnp.where(is_tab, i + 2, 16)  # 16 = out of range: no write
        return _tab_set(tab, ent, nxt), nxt

    _, acc = jax.lax.fori_loop(0, 14 + ndig, body, (tab0, x))
    _st(o_ref, acc)


_POW_CACHE: dict = {}


def pow_const_flat(x_flat, e: int, kind: str):
    """x^e on flat (16, B) limbs (B % TILE == 0), one pallas call."""
    key = (e, kind)
    if key not in _POW_CACHE:
        mul = pf.mul_p if kind == "p" else pf.mul_n
        ndig = max(1, (e.bit_length() + 3) // 4)
        digits = np.asarray(
            [[(e >> (4 * (ndig - 1 - i))) & 15] for i in range(ndig)],
            dtype=np.int32,
        )
        body = functools.partial(_pow_kernel, mul)

        @jax.jit
        def run(x_flat):
            B = x_flat.shape[1]
            return pl.pallas_call(
                body,
                grid=(B // TILE,),
                in_specs=[
                    pl.BlockSpec(
                        (ndig, 1), lambda i: (0, 0), memory_space=pltpu.SMEM
                    ),
                    _spec(),
                ],
                out_specs=_spec(),
                out_shape=jax.ShapeDtypeStruct((16, B), jnp.uint32),
                interpret=pc.INTERPRET(),
            )(jnp.asarray(digits), x_flat)

        _POW_CACHE[key] = run
    return _POW_CACHE[key](x_flat)


# -- fused [k]P ladder --------------------------------------------------------

def _ladder_kernel(px, py, pz, k_ref, ox, oy, oz, dig_ref):
    """Full [k]P fixed-window ladder with ONE loop whose body holds
    exactly one pt_add site and one pt_dbl site. Steps 0..13 build
    tab[2..15] = [2]P..[15]P (the running point doubles as the table
    chain); steps 14..77 are the 64 digit windows (4 masked doubles +
    one table add). Op-SITE count, not op count, sets the Mosaic binary
    size, and per-call runtime cost scales with total code size."""
    X, Y, Z = _ld(px), _ld(py), _ld(pz)
    k = _ld(k_ref)
    zero = jnp.zeros_like(X)
    one = jnp.pad(
        jnp.ones((1,) + X.shape[1:], jnp.uint32), [(0, 15), (0, 0), (0, 0)]
    )

    tabx = _tab_set(jnp.zeros((16,) + X.shape, jnp.uint32), 1, X)
    taby = _tab_set(
        _tab_set(jnp.zeros((16,) + X.shape, jnp.uint32), 0, one), 1, Y
    )
    tabz = _tab_set(jnp.zeros((16,) + X.shape, jnp.uint32), 1, Z)

    # digit planes, MSB-first, staged through VMEM scratch (refs allow
    # dynamic leading-dim reads; values do not)
    dig_ref[:] = jnp.stack(
        [(k[w // 4] >> (4 * (w % 4))) & 15 for w in range(63, -1, -1)], axis=0
    )

    def body(i, carry):
        sx, sy, sz, tx, ty, tz = carry
        is_tab = i < 14
        # accumulator restarts at identity for the first window step
        first = i == 14
        sx = jnp.where(first, zero, sx)
        sy = jnp.where(first, one, sy)
        sz = jnp.where(first, zero, sz)

        def dstep(_, st):
            nx, ny, nz = pf.pt_dbl(*st)
            return (
                jnp.where(is_tab, st[0], nx),
                jnp.where(is_tab, st[1], ny),
                jnp.where(is_tab, st[2], nz),
            )

        sx, sy, sz = jax.lax.fori_loop(0, 4, dstep, (sx, sy, sz))
        w = jnp.maximum(i - 14, 0)
        d = dig_ref[w]
        qx = jnp.where(is_tab, X, _tab_select(tx, d))
        qy = jnp.where(is_tab, Y, _tab_select(ty, d))
        qz = jnp.where(is_tab, Z, _tab_select(tz, d))
        nx, ny, nz = pf.pt_add(sx, sy, sz, qx, qy, qz)
        ent = jnp.where(is_tab, i + 2, 16)  # 16 = out of range: no write
        return (
            nx, ny, nz,
            _tab_set(tx, ent, nx),
            _tab_set(ty, ent, ny),
            _tab_set(tz, ent, nz),
        )

    sx, sy, sz, _, _, _ = jax.lax.fori_loop(
        0, 78, body, (X, Y, Z, tabx, taby, tabz)
    )
    _st(ox, sx)
    _st(oy, sy)
    _st(oz, sz)


@jax.jit
def scalar_mul_flat(px, py, pz, k):
    """[k]P lane-wise on flat (16, B) coords/limbs -- the entire
    256-double ladder in ONE pallas call."""
    B = px.shape[1]
    out = jax.ShapeDtypeStruct((16, B), jnp.uint32)
    return pl.pallas_call(
        _ladder_kernel,
        grid=(B // TILE,),
        in_specs=[_spec()] * 4,
        out_specs=[_spec()] * 3,
        out_shape=[out] * 3,
        scratch_shapes=[pltpu.VMEM((64, _SUB, 128), jnp.uint32)],
        interpret=INTERPRET(),
    )(px, py, pz, k)


# -- fused reduction over a points axis ---------------------------------------

def _tree_kernel(L: int, px, py, pz, ox, oy, oz):
    """Blocks hold L contiguous T-lane chunks; sequential fori accumulate
    (work equals a tree -- L-1 complete adds -- without L launches)."""
    T = px.shape[1] // L

    def chunk(i):
        return (
            px[:, pl.ds(i * T, T)].reshape(16, _SUB, 128),
            py[:, pl.ds(i * T, T)].reshape(16, _SUB, 128),
            pz[:, pl.ds(i * T, T)].reshape(16, _SUB, 128),
        )

    c0 = chunk(0)

    def body(i, carry):
        bx, by, bz = chunk(i)
        return pf.pt_add(*carry, bx, by, bz)

    ax, ay, az = jax.lax.fori_loop(1, L, body, c0)
    _st(ox, ax)
    _st(oy, ay)
    _st(oz, az)


def tree_sum_flat(px, py, pz, L: int):
    B = px.shape[1] // L
    body = functools.partial(_tree_kernel, L)
    spec_in = pl.BlockSpec((16, L * TILE), lambda i: (0, i), memory_space=pltpu.VMEM)
    out = jax.ShapeDtypeStruct((16, B), jnp.uint32)
    return pl.pallas_call(
        body,
        grid=(B // TILE,),
        in_specs=[spec_in] * 3,
        out_specs=[_spec()] * 3,
        out_shape=[out] * 3,
        interpret=INTERPRET(),
    )(px, py, pz)


def tree_sum(points_xyz, L: int):
    """(16, L, B) coords -> 3x (16, B): rearrange so each lane tile holds
    its L point-chunks contiguously, one fused reduction call."""
    px, py, pz = points_xyz
    B = px.shape[2]
    nt = B // TILE

    def re(a):
        return (
            a.reshape(16, L, nt, TILE)
            .transpose(0, 2, 1, 3)
            .reshape(16, nt * L * TILE)
        )

    return tree_sum_flat(re(px), re(py), re(pz), L)


# Lane floors for shape bucketing (see curve._pallas_bucket). Measured
# on the batch-512 verifier: aggressive floors (32768/8192) made padded
# compute cost MORE than the deduped kernel instances saved (548/s vs
# 1607/s), so floors are off; po2 bucketing alone handles near-miss
# shapes. Revisit with grid-carried loops (smaller per-instance code).
LADDER_LANE_FLOOR = 0
POW_LANE_FLOOR = 0
