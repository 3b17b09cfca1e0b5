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

# Small-MSM lane-tile geometry. The three in-VMEM point tables are the
# scoped-vmem budget (16 MB/kernel): tables cost D * 16 ents * 16 limbs
# * 3 coords * tile * 4 B = 3.07 MB per point at tile=1024. Two
# operating points, chosen by the CALLER (curve._msm_small):
#   * FULL tile (TILE), D <= 3  — tables 9.4 MB, _SUB=8 vreg packing
#     (6.45 ns/lane/add); larger L runs ceil(L/3) chunked calls combined
#     with complete adds. This is the fast path (profile r3: the D=4..5
#     half-tile calls were the verifier's dominant 30 ms).
#   * HALF tile (MS_TILE), D <= 6 — tables 7.9 MB at _SUB=4 packing
#     (12.9 ns/lane/add); kept for batches that only tile at MS_TILE.
_MS_SUB = max(_SUB // 2, 2)
MS_TILE = _MS_SUB * 128
FT_DMAX = 3  # max points per full-tile kernel call (VMEM budget)


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


# -- small shared-window MSM (dynamic points) ---------------------------------

def _row_at(a3, r):
    """Masked dynamic row select of a 3-D VALUE's leading dim. Values do
    not allow dynamic leading-dim indexing in Mosaic, and reading a 1-D
    row then reshaping is an unsupported 1-D->2-D shape cast (the bug
    that broke the round-2 bench: tpu.reshape (512) -> (4x128)). Unrolled
    masked adds keep everything 2-D (the _tab_select pattern)."""
    acc = jnp.zeros(a3.shape[1:], a3.dtype)
    for i in range(a3.shape[0]):
        acc = acc + jnp.where(r == i, a3[i], 0)
    return acc


def _dig_at(kk, wi, sub):
    """kk: (16, sub*128) scalar limbs; wi: dynamic 4-bit digit index (LSB
    order) -> (sub, 128) window digits. The limb axis is selected
    with masked adds (a dynamic single-row VMEM read would need a
    provably 8-aligned sublane offset, and a 1-D intermediate would need
    an unsupported 1-D->2-D shape cast) — trivial VPU work next to the
    point add it feeds. The (16, T) -> (16, sub, 128) split happens
    FIRST so every value stays >= 2-D (pallas_curve._ld class, known to
    lower)."""
    row = wi // 4
    sh = (4 * (wi % 4)).astype(jnp.uint32)
    dig3 = (kk.reshape(16, sub, 128) >> sh) & jnp.uint32(15)
    return _row_at(dig3, row)


def _msm_small_kernel(SUB, px, py, pz, k_ref, ox, oy, oz, tabx, taby, tabz):
    """sum_i [k_i] P_i over a SMALL static D of per-proof points, one
    kernel: in-VMEM 4-bit tables per point, one shared MSB-first window
    walk (4 doubles + D table adds per window). Replaces D*B-lane
    ladders (334 ops/lane) with 256 + 78*D ops on B lanes. Loops over D
    are fori with dynamic scratch indexing so the binary holds ONE
    table-build add, ONE walk add, and ONE double site. SUB = sublane
    count of the lane tile (tile = SUB * 128)."""
    D = px.shape[0]
    T = SUB * 128
    zero3 = jnp.zeros((16, SUB, 128), jnp.uint32)
    one3 = jnp.pad(
        jnp.ones((1, SUB, 128), jnp.uint32), [(0, 15), (0, 0), (0, 0)]
    )

    def ld_pt(i):
        return (
            px[i].reshape(16, SUB, 128),
            py[i].reshape(16, SUB, 128),
            pz[i].reshape(16, SUB, 128),
        )

    # tables: tab[i*16 + d] = [d] P_i. Entry 2 is a genuine doubling
    # (P + P) and gets pt_dbl explicitly; entries 3..15 use the
    # INCOMPLETE add — [k]P + P with 2 <= k <= 14 cannot collide on a
    # prime-order curve (identity lanes stay masked).
    def tab_i(i, _):
        X, Y, Z = ld_pt(i)
        dx, dy, dz = pf.pt_dbl(X, Y, Z)
        p_id = pf.is_zero(Z)
        dx = pf.select(p_id, X, dx)
        dy = pf.select(p_id, Y, dy)
        dz = pf.select(p_id, Z, dz)
        tabx[pl.ds(i * 16, 1)] = zero3.reshape(1, 16, T)
        taby[pl.ds(i * 16, 1)] = one3.reshape(1, 16, T)
        tabz[pl.ds(i * 16, 1)] = zero3.reshape(1, 16, T)
        tabx[pl.ds(i * 16 + 1, 1)] = X.reshape(1, 16, T)
        taby[pl.ds(i * 16 + 1, 1)] = Y.reshape(1, 16, T)
        tabz[pl.ds(i * 16 + 1, 1)] = Z.reshape(1, 16, T)
        tabx[pl.ds(i * 16 + 2, 1)] = dx.reshape(1, 16, T)
        taby[pl.ds(i * 16 + 2, 1)] = dy.reshape(1, 16, T)
        tabz[pl.ds(i * 16 + 2, 1)] = dz.reshape(1, 16, T)

        def ent_body(d, _):
            cx = tabx[i * 16 + d - 1].reshape(16, SUB, 128)
            cy = taby[i * 16 + d - 1].reshape(16, SUB, 128)
            cz = tabz[i * 16 + d - 1].reshape(16, SUB, 128)
            nx, ny, nz = pf.pt_add_inc(cx, cy, cz, X, Y, Z)
            tabx[pl.ds(i * 16 + d, 1)] = nx.reshape(1, 16, T)
            taby[pl.ds(i * 16 + d, 1)] = ny.reshape(1, 16, T)
            tabz[pl.ds(i * 16 + d, 1)] = nz.reshape(1, 16, T)
            return 0

        jax.lax.fori_loop(3, 16, ent_body, 0)
        return 0

    jax.lax.fori_loop(0, D, tab_i, 0)

    # window walk
    def walk(w, acc):
        sx, sy, sz = acc

        def dstep(_, st):
            return pf.pt_dbl(*st)

        sx, sy, sz = jax.lax.fori_loop(0, 4, dstep, (sx, sy, sz))

        def add_i(i, st):
            sx, sy, sz = st
            d = _dig_at(k_ref[i], 63 - w, SUB)  # MSB-first walk
            ents_x = tabx[pl.ds(i * 16, 16)].reshape(16, 16, SUB, 128)
            ents_y = taby[pl.ds(i * 16, 16)].reshape(16, 16, SUB, 128)
            ents_z = tabz[pl.ds(i * 16, 16)].reshape(16, 16, SUB, 128)
            qx = _tab_select(ents_x, d)
            qy = _tab_select(ents_y, d)
            qz = _tab_select(ents_z, d)
            # incomplete: acc == ±[d]P_i needs a scalar relation across
            # Fiat-Shamir challenges (cryptographically unreachable)
            return pf.pt_add_inc(sx, sy, sz, qx, qy, qz)

        return jax.lax.fori_loop(0, D, add_i, (sx, sy, sz))

    sx, sy, sz = jax.lax.fori_loop(0, 64, walk, (zero3, one3, zero3))
    ox[:] = sx.reshape(16, T)
    oy[:] = sy.reshape(16, T)
    oz[:] = sz.reshape(16, T)


@functools.lru_cache(maxsize=None)
def _small_prog(tile):
    sub = tile // 128
    body = functools.partial(_msm_small_kernel, sub)

    @jax.jit
    def run(px, py, pz, k):
        D, _, B = px.shape
        spec_in = pl.BlockSpec(
            (D, 16, tile), lambda t: (0, 0, t), memory_space=pltpu.VMEM
        )
        spec_out = pl.BlockSpec(
            (16, tile), lambda t: (0, t), memory_space=pltpu.VMEM
        )
        out = jax.ShapeDtypeStruct((16, B), jnp.uint32)
        return pl.pallas_call(
            body,
            grid=(B // tile,),
            in_specs=[spec_in] * 4,
            out_specs=[spec_out] * 3,
            out_shape=[out] * 3,
            scratch_shapes=[
                pltpu.VMEM((D * 16, 16, tile), jnp.uint32),
                pltpu.VMEM((D * 16, 16, tile), jnp.uint32),
                pltpu.VMEM((D * 16, 16, tile), jnp.uint32),
            ],
            interpret=INTERPRET(),
        )(px, py, pz, k)

    return run


def msm_small_flat(px, py, pz, k, tile=None):
    """(D, 16, B) coords/scalars -> 3x (16, B): reduced small MSM.
    tile: lane-tile size (default MS_TILE; TILE for D <= FT_DMAX)."""
    return _small_prog(tile or MS_TILE)(px, py, pz, k)


# -- GLV shared-window MSM (dynamic points, halved window walk) ---------------

def _msm_small_glv_kernel(
    W, SUB, px, py, pz, k_ref, sg_ref, ox, oy, oz, tabx, taby, tabz
):
    """GLV variant of _msm_small_kernel: D points but 2D scalar HALVES
    of <= 4W bits each (W = glv.GLV_WINDOWS = 33), so the shared walk
    does 4W=132 doubles instead of 256. Scalar half j = 2i+1 multiplies
    phi(P_i) = (beta*x, y); its window table is beta * (x-entries of
    P_i's table), applied on the fly after selection — the VMEM tables
    do NOT grow. Negative halves negate the selected entry's y per lane
    (sg_ref). Incomplete adds stay sound: an accumulator/entry collision
    would need a known small-coefficient lambda-relation, i.e. a DLOG
    break (identity lanes are masked as before)."""
    D = px.shape[0]
    D2 = 2 * D
    T = SUB * 128
    zero3 = jnp.zeros((16, SUB, 128), jnp.uint32)
    one3 = jnp.pad(
        jnp.ones((1, SUB, 128), jnp.uint32), [(0, 15), (0, 0), (0, 0)]
    )
    beta3 = pf._scalar_col([int(x) for x in _GLV_BETA16], (SUB, 128))

    def ld_pt(i):
        return (
            px[i].reshape(16, SUB, 128),
            py[i].reshape(16, SUB, 128),
            pz[i].reshape(16, SUB, 128),
        )

    # tables: tab[i*16 + d] = [d] P_i (same build as _msm_small_kernel)
    def tab_i(i, _):
        X, Y, Z = ld_pt(i)
        dx, dy, dz = pf.pt_dbl(X, Y, Z)
        p_id = pf.is_zero(Z)
        dx = pf.select(p_id, X, dx)
        dy = pf.select(p_id, Y, dy)
        dz = pf.select(p_id, Z, dz)
        tabx[pl.ds(i * 16, 1)] = zero3.reshape(1, 16, T)
        taby[pl.ds(i * 16, 1)] = one3.reshape(1, 16, T)
        tabz[pl.ds(i * 16, 1)] = zero3.reshape(1, 16, T)
        tabx[pl.ds(i * 16 + 1, 1)] = X.reshape(1, 16, T)
        taby[pl.ds(i * 16 + 1, 1)] = Y.reshape(1, 16, T)
        tabz[pl.ds(i * 16 + 1, 1)] = Z.reshape(1, 16, T)
        tabx[pl.ds(i * 16 + 2, 1)] = dx.reshape(1, 16, T)
        taby[pl.ds(i * 16 + 2, 1)] = dy.reshape(1, 16, T)
        tabz[pl.ds(i * 16 + 2, 1)] = dz.reshape(1, 16, T)

        def ent_body(d, _):
            cx = tabx[i * 16 + d - 1].reshape(16, SUB, 128)
            cy = taby[i * 16 + d - 1].reshape(16, SUB, 128)
            cz = tabz[i * 16 + d - 1].reshape(16, SUB, 128)
            nx, ny, nz = pf.pt_add_inc(cx, cy, cz, X, Y, Z)
            tabx[pl.ds(i * 16 + d, 1)] = nx.reshape(1, 16, T)
            taby[pl.ds(i * 16 + d, 1)] = ny.reshape(1, 16, T)
            tabz[pl.ds(i * 16 + d, 1)] = nz.reshape(1, 16, T)
            return 0

        jax.lax.fori_loop(3, 16, ent_body, 0)
        return 0

    jax.lax.fori_loop(0, D, tab_i, 0)

    # negate masks, split to (D2, SUB, 128) up front (a per-row 1-D
    # read would need an unsupported 1-D->2-D cast); loop constant.
    sg3 = sg_ref[:].reshape(D2, SUB, 128)

    # window walk: 4 doubles + 2D masked adds per window
    def walk(w, acc):
        sx, sy, sz = acc

        def dstep(_, st):
            return pf.pt_dbl(*st)

        sx, sy, sz = jax.lax.fori_loop(0, 4, dstep, (sx, sy, sz))

        def add_j(j, st):
            sx, sy, sz = st
            i = j // 2
            is_phi = (j % 2) == 1
            d = _dig_at(k_ref[j], W - 1 - w, SUB)  # MSB-first walk
            ents_x = tabx[pl.ds(i * 16, 16)].reshape(16, 16, SUB, 128)
            ents_y = taby[pl.ds(i * 16, 16)].reshape(16, 16, SUB, 128)
            ents_z = tabz[pl.ds(i * 16, 16)].reshape(16, 16, SUB, 128)
            qx = _tab_select(ents_x, d)
            qy = _tab_select(ents_y, d)
            qz = _tab_select(ents_z, d)
            qx = jnp.where(is_phi, pf.mul_p(qx, beta3), qx)
            neg = _row_at(sg3, j) != 0
            qy = pf.select(neg, pf.sub_p(jnp.zeros_like(qy), qy), qy)
            return pf.pt_add_inc(sx, sy, sz, qx, qy, qz)

        return jax.lax.fori_loop(0, D2, add_j, (sx, sy, sz))

    sx, sy, sz = jax.lax.fori_loop(0, W, walk, (zero3, one3, zero3))
    ox[:] = sx.reshape(16, T)
    oy[:] = sy.reshape(16, T)
    oz[:] = sz.reshape(16, T)


_GLV_BETA16 = None  # set below (avoids importing glv before jax config)


def _glv_windows():
    from . import glv

    global _GLV_BETA16
    if _GLV_BETA16 is None:
        _GLV_BETA16 = np.asarray(glv._BETA_LIMBS, np.uint32).reshape(-1)
    return glv.GLV_WINDOWS


@functools.lru_cache(maxsize=None)
def _glv_prog(tile):
    W = _glv_windows()
    sub = tile // 128
    body = functools.partial(_msm_small_glv_kernel, W, sub)

    @jax.jit
    def run(px, py, pz, k, sg):
        D, _, B = px.shape
        D2 = 2 * D
        spec_pt = pl.BlockSpec(
            (D, 16, tile), lambda t: (0, 0, t), memory_space=pltpu.VMEM
        )
        spec_k = pl.BlockSpec(
            (D2, 16, tile), lambda t: (0, 0, t), memory_space=pltpu.VMEM
        )
        spec_sg = pl.BlockSpec(
            (D2, tile), lambda t: (0, t), memory_space=pltpu.VMEM
        )
        spec_out = pl.BlockSpec(
            (16, tile), lambda t: (0, t), memory_space=pltpu.VMEM
        )
        out = jax.ShapeDtypeStruct((16, B), jnp.uint32)
        return pl.pallas_call(
            body,
            grid=(B // tile,),
            in_specs=[spec_pt] * 3 + [spec_k, spec_sg],
            out_specs=[spec_out] * 3,
            out_shape=[out] * 3,
            scratch_shapes=[
                pltpu.VMEM((D * 16, 16, tile), jnp.uint32),
                pltpu.VMEM((D * 16, 16, tile), jnp.uint32),
                pltpu.VMEM((D * 16, 16, tile), jnp.uint32),
            ],
            interpret=INTERPRET(),
        )(px, py, pz, k, sg)

    return run


def msm_small_glv_flat(px, py, pz, k, sg, tile=None):
    """(D,16,B) coords, (2D,16,B) GLV magnitude halves, (2D,B) uint32
    negate masks -> 3x (16,B): reduced MSM with a 132-double walk.
    tile: lane-tile size (default MS_TILE; TILE for the D <= FT_DMAX
    full-tile fast path — see the geometry note at the top)."""
    return _glv_prog(tile or MS_TILE)(px, py, pz, k, sg)


# -- GLV + signed-window (wNAF) shared-window MSM ------------------------------

def _tab_select1(tab, d):
    """Like _tab_select but entry e holds element e+1 and d == 0 selects
    the all-zero element ((0,0,0) has z = 0, which every masked add
    treats as the identity) — the identity row never hits VMEM."""
    acc = jnp.zeros_like(tab[0])
    for ent in range(tab.shape[0]):
        m = d == (ent + 1)
        acc = acc + jnp.where(m, tab[ent], 0)
    return acc


def _msm_small_wnaf_kernel(
    W, SUB, px, py, pz, dig_ref, ox, oy, oz, tabx, taby, tabz
):
    """Signed-window variant of _msm_small_glv_kernel: digits are
    recoded on the graph side to [-7, 8] (glv.wnaf_digits), so each
    point's in-VMEM table holds EIGHT magnitude entries ([1..8]P;
    magnitude 0 selects an all-zero q whose z = 0 is the add's identity
    mask) instead of 16 — half the scoped VMEM (D=5 points fit one
    FULL-tile call where the unsigned kernel capped at 3) and 8
    selection-mask adds per lookup instead of 16. The per-point stride
    of 8 is ALSO the Mosaic alignment contract: dynamic multi-row
    VMEM reads/writes must sit at provably 8-aligned offsets (the first
    cut used 9-entry tables — interpret mode passed, hardware returned
    garbage on every lane; same trap class as the r1 GLV digit
    scratch). The digit planes arrive PRE-PACKED (mag | sign << 4, sign
    already XORed with the GLV half sign) as a (W*D2, nb, SUB, 128)
    input — in-kernel extraction would need the sequential recode
    carry. Negative digits negate the selected entry's y per lane; phi
    halves (odd j) multiply the selected x by beta on the fly.
    Incomplete adds stay sound by the same DLOG argument as the
    unsigned kernel."""
    D = px.shape[0]
    D2 = 2 * D
    T = SUB * 128
    zero3 = jnp.zeros((16, SUB, 128), jnp.uint32)
    one3 = jnp.pad(
        jnp.ones((1, SUB, 128), jnp.uint32), [(0, 15), (0, 0), (0, 0)]
    )
    beta3 = pf._scalar_col([int(x) for x in _GLV_BETA16], (SUB, 128))

    def ld_pt(i):
        return (
            px[i].reshape(16, SUB, 128),
            py[i].reshape(16, SUB, 128),
            pz[i].reshape(16, SUB, 128),
        )

    # tables: tab[i*8 + d - 1] = [d] P_i, d = 1..8 (entry for 2 is a
    # genuine double; 3..8 incomplete adds — [k]P + P, 2 <= k <= 7,
    # cannot collide on a prime-order curve)
    def tab_i(i, _):
        X, Y, Z = ld_pt(i)
        dx, dy, dz = pf.pt_dbl(X, Y, Z)
        p_id = pf.is_zero(Z)
        dx = pf.select(p_id, X, dx)
        dy = pf.select(p_id, Y, dy)
        dz = pf.select(p_id, Z, dz)
        tabx[pl.ds(i * 8, 1)] = X.reshape(1, 16, T)
        taby[pl.ds(i * 8, 1)] = Y.reshape(1, 16, T)
        tabz[pl.ds(i * 8, 1)] = Z.reshape(1, 16, T)
        tabx[pl.ds(i * 8 + 1, 1)] = dx.reshape(1, 16, T)
        taby[pl.ds(i * 8 + 1, 1)] = dy.reshape(1, 16, T)
        tabz[pl.ds(i * 8 + 1, 1)] = dz.reshape(1, 16, T)

        def ent_body(d, _):
            cx = tabx[i * 8 + d - 2].reshape(16, SUB, 128)
            cy = taby[i * 8 + d - 2].reshape(16, SUB, 128)
            cz = tabz[i * 8 + d - 2].reshape(16, SUB, 128)
            nx, ny, nz = pf.pt_add_inc(cx, cy, cz, X, Y, Z)
            tabx[pl.ds(i * 8 + d - 1, 1)] = nx.reshape(1, 16, T)
            taby[pl.ds(i * 8 + d - 1, 1)] = ny.reshape(1, 16, T)
            tabz[pl.ds(i * 8 + d - 1, 1)] = nz.reshape(1, 16, T)
            return 0

        jax.lax.fori_loop(3, 9, ent_body, 0)
        return 0

    jax.lax.fori_loop(0, D, tab_i, 0)

    # window walk: 4 doubles + 2D masked adds per window
    def walk(w, acc):
        sx, sy, sz = acc

        def dstep(_, st):
            return pf.pt_dbl(*st)

        sx, sy, sz = jax.lax.fori_loop(0, 4, dstep, (sx, sy, sz))

        def add_j(j, st):
            sx, sy, sz = st
            i = j // 2
            is_phi = (j % 2) == 1
            # MSB-first walk over LSB-first planes (glv.wnaf_digits
            # emits window 0 first); (SUB, 128) packed digit
            plane = dig_ref[(W - 1 - w) * D2 + j, 0]
            mag = plane & jnp.uint32(15)
            neg = (plane >> 4) != 0
            ents_x = tabx[pl.ds(i * 8, 8)].reshape(8, 16, SUB, 128)
            ents_y = taby[pl.ds(i * 8, 8)].reshape(8, 16, SUB, 128)
            ents_z = tabz[pl.ds(i * 8, 8)].reshape(8, 16, SUB, 128)
            qx = _tab_select1(ents_x, mag)
            qy = _tab_select1(ents_y, mag)
            qz = _tab_select1(ents_z, mag)
            qx = jnp.where(is_phi, pf.mul_p(qx, beta3), qx)
            qy = pf.select(neg, pf.sub_p(jnp.zeros_like(qy), qy), qy)
            return pf.pt_add_inc(sx, sy, sz, qx, qy, qz)

        return jax.lax.fori_loop(0, D2, add_j, (sx, sy, sz))

    sx, sy, sz = jax.lax.fori_loop(0, W, walk, (zero3, one3, zero3))
    ox[:] = sx.reshape(16, T)
    oy[:] = sy.reshape(16, T)
    oz[:] = sz.reshape(16, T)


# wNAF full-tile point cap: tables are 3 coords x 8 ents x 16 limbs x
# tile x 4 B = 1.57 MB/point at tile=1024; D=5 -> 7.9 MB tables
# + 1.35 MB digit planes + 1.2 MB point inputs, inside the 16 MB scoped
# budget with headroom (check this arithmetic BEFORE growing D or TILE).
FT_DMAX_WNAF = 5


@functools.lru_cache(maxsize=None)
def _wnaf_prog(tile):
    W = _glv_windows()
    sub = tile // 128
    body = functools.partial(_msm_small_wnaf_kernel, W, sub)

    @jax.jit
    def run(px, py, pz, dig):
        D, _, B = px.shape
        D2 = 2 * D
        nb = B // tile
        spec_pt = pl.BlockSpec(
            (D, 16, tile), lambda t: (0, 0, t), memory_space=pltpu.VMEM
        )
        spec_dig = pl.BlockSpec(
            (W * D2, 1, sub, 128), lambda t: (0, t, 0, 0),
            memory_space=pltpu.VMEM,
        )
        spec_out = pl.BlockSpec(
            (16, tile), lambda t: (0, t), memory_space=pltpu.VMEM
        )
        out = jax.ShapeDtypeStruct((16, B), jnp.uint32)
        return pl.pallas_call(
            body,
            grid=(nb,),
            in_specs=[spec_pt] * 3 + [spec_dig],
            out_specs=[spec_out] * 3,
            out_shape=[out] * 3,
            scratch_shapes=[
                pltpu.VMEM((D * 8, 16, tile), jnp.uint32),
                pltpu.VMEM((D * 8, 16, tile), jnp.uint32),
                pltpu.VMEM((D * 8, 16, tile), jnp.uint32),
            ],
            interpret=INTERPRET(),
        )(px, py, pz, dig.reshape(W * D2, nb, sub, 128))

    return run


def msm_small_wnaf_flat(px, py, pz, dig, tile=None):
    """(D,16,B) coords, (W*2D, B) packed signed-digit planes
    (glv.wnaf_digits order: plane index = w*2D + j, halves interleaved
    k1,k2 per point) -> 3x (16,B). tile: lane-tile size (default
    MS_TILE; TILE for D <= FT_DMAX_WNAF)."""
    return _wnaf_prog(tile or MS_TILE)(px, py, pz, dig)


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
        # incomplete: chunks are multiples of distinct generators (or
        # identity padding, which stays masked); a collision needs a
        # DLOG relation between generators
        return pf.pt_add_inc(*carry, bx, by, bz)

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
