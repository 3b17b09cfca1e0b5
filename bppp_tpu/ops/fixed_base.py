"""Fixed-base windowed MSM: precomputed generator tables + MXU selection
+ a grid-carried Pallas accumulate kernel.

The verifier's dominant cost was the generic per-lane scalar-mul ladder
over the FIXED generator vectors (g, h_vec, g_vec): 334 point ops per
lane, ~256 of them doubles (measured 181 ms for the 51-point MSM at
batch 512 — half the whole verify). For fixed bases the doubles and
in-kernel table builds disappear:

  * setup (once per generator set): affine tables
    T[w][d] = [d * 16^w] G_i for the 64 4-bit windows, d = 1..15
    (build_tables — plain JAX, one batched inversion for affine form).
  * per verify: per-lane window digits select entries via an EXACT
    one-hot f32 einsum on the MXU (limbs < 2^16 are exact in f32), so
    no per-lane gather and no masked-select statements in the kernel.
  * kernel (plane_accum): grid (lane_tiles, 64 windows); each step does
    ONE complete mixed add (affine q, z=1) into a VMEM scratch
    accumulator — 64 adds/lane total, no doubles, one add body.

Replaces the reference's naive per-term MSM (util.rs:46-60) on the
verify hot path; the commitment-chain points (C_S, X_k, ...) are still
handled by the generic ladder (they are per-proof data).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import pallas_field as pf
from .pallas_curve import INTERPRET, TILE, _SUB

N_WINDOWS = 64
N_ENT = 16


def build_tables(points):
    """points: PointJ coords (16, F) — unbatched fixed generators.
    -> (tx, ty): uint32 (64, 16, 16, F) window tables (window, entry,
    limb, point), entry 0 = (0, 0) (identity sentinel; the kernel's
    mixed add treats all-zero affine coords as the identity)."""
    from . import curve as dc

    F = points.x.shape[1]

    def w_step(carry, _):
        base = carry  # PointJ (16, F) = [16^w] G_i
        ents = [base]
        cur = base
        for _ in range(14):
            cur = dc._pt_add_jnp(cur, base)
            ents.append(cur)
        # [16] base = double([8] base)
        nxt = dc._pt_double_jnp(ents[7])
        stack = dc.PointJ(
            *(jnp.stack([c[i] for c in ents], axis=1) for i in range(3))
        )  # (16, 15, F)
        return nxt, stack

    _, ents = jax.lax.scan(w_step, points, None, length=N_WINDOWS)
    # ents coords: (64, 16, 15, F) -> affine in ONE batched inversion
    flat = dc.PointJ(*(c.transpose(1, 0, 2, 3).reshape(16, -1) for c in ents))
    ax, ay, is_id = dc.to_affine(flat)
    ax = ax.reshape(16, N_WINDOWS, 15, F)
    ay = ay.reshape(16, N_WINDOWS, 15, F)
    zero = jnp.zeros((16, N_WINDOWS, 1, F), jnp.uint32)
    tx = jnp.concatenate([zero, ax], axis=2)  # entry 0 = identity sentinel
    ty = jnp.concatenate([zero, ay], axis=2)
    # -> (F, 64, 16ent, 16limb): the kernel streams one (f, w) table
    # block into SMEM per grid step and splats entries as scalars (the
    # last two block dims equal the array dims, as Mosaic requires)
    tx = tx.transpose(3, 1, 2, 0)
    ty = ty.transpose(3, 1, 2, 0)
    return tx, ty


def _digits(scalars):
    """(16, F, B) limbs -> (64, F, B) window digits (LSB window first)."""
    rows = []
    for w in range(N_WINDOWS):
        rows.append((scalars[w // 4] >> (4 * (w % 4))) & 15)
    return jnp.stack(rows, axis=0)


def _fixed_msm_kernel(tabx_ref, taby_ref, dig_ref, ox, oy, oz, ax, ay, az):
    """Grid (F, B/TILE, 64 windows). Each step selects this window's
    table entry per lane (entries are SMEM scalars — every lane in a
    tile shares one generator — splatted under the digit masks) and does
    ONE complete mixed add into the scratch accumulator. No doubles, no
    materialized selection planes: the one-hot-einsum selection this
    replaces spent ~73 ms/call in XLA slice/pad/reshape glue."""
    w = pl.program_id(2)

    @pl.when(w == 0)
    def _():
        ax[:] = jnp.zeros((16, TILE), jnp.uint32)
        ay[:] = jnp.pad(jnp.ones((1, TILE), jnp.uint32), [(0, 15), (0, 0)])
        az[:] = jnp.zeros((16, TILE), jnp.uint32)

    d = dig_ref[0, 0, 0]  # (SUB, 128) digits of this (f, b, w)
    masks = [d == e for e in range(1, N_ENT)]

    rows_x = []
    rows_y = []
    for l in range(16):
        rx = jnp.zeros((_SUB, 128), jnp.uint32)
        ry = jnp.zeros((_SUB, 128), jnp.uint32)
        for e in range(1, N_ENT):
            rx = rx + jnp.where(masks[e - 1], tabx_ref[0, 0, e, l], 0)
            ry = ry + jnp.where(masks[e - 1], taby_ref[0, 0, e, l], 0)
        rows_x.append(rx)
        rows_y.append(ry)
    qx = jnp.stack(rows_x, axis=0)  # d == 0 -> all-zero = identity
    qy = jnp.stack(rows_y, axis=0)

    X = ax[:].reshape(16, _SUB, 128)
    Y = ay[:].reshape(16, _SUB, 128)
    Z = az[:].reshape(16, _SUB, 128)
    nX, nY, nZ = pf.pt_add_mixed(X, Y, Z, qx, qy)
    ax[:] = nX.reshape(16, TILE)
    ay[:] = nY.reshape(16, TILE)
    az[:] = nZ.reshape(16, TILE)
    ox[:] = ax[:]
    oy[:] = ay[:]
    oz[:] = az[:]


@jax.jit
def fixed_msm_flat(tx, ty, dig):
    """tx/ty: (F, 64, 16, 16) u32 tables; dig: (64, F, nb, SUB, 128)
    window digits -> 3x (16, F*B) Jacobian [k_i]G_i per (i, b) lane."""
    F = tx.shape[0]
    nb = dig.shape[2]
    B = nb * TILE
    tab_spec = pl.BlockSpec(
        (1, 1, N_ENT, 16),
        lambda f, b, w: (f, w, 0, 0),
        memory_space=pltpu.SMEM,
    )
    dig_spec = pl.BlockSpec(
        (1, 1, 1, _SUB, 128),
        lambda f, b, w: (w, f, b, 0, 0),
        memory_space=pltpu.VMEM,
    )
    out_spec = pl.BlockSpec(
        (16, TILE), lambda f, b, w: (0, f * nb + b), memory_space=pltpu.VMEM
    )
    out = jax.ShapeDtypeStruct((16, F * B), jnp.uint32)
    return pl.pallas_call(
        _fixed_msm_kernel,
        grid=(F, nb, N_WINDOWS),
        in_specs=[tab_spec, tab_spec, dig_spec],
        out_specs=[out_spec] * 3,
        out_shape=[out] * 3,
        scratch_shapes=[pltpu.VMEM((16, TILE), jnp.uint32)] * 3,
        interpret=INTERPRET(),
    )(tx, ty, dig)


def msm_mixed(tables, fixed_points, fixed_scalars, dyn_points, dyn_scalars):
    """MSM over fixed generators (via tables) + a few per-proof dynamic
    points (via the generic ladder), one tree reduction. Falls back to
    the shared-window path when tables are absent (CPU) or shapes don't
    tile. fixed_scalars: (16, F, *b) in TABLE order; fixed_points only
    feed the fallback."""
    from . import curve as dc

    if tables is not None and dc._pallas_enabled():
        fixed = msm_fixed(tables, fixed_scalars)
        if fixed is not None:
            # dynamic points ride the shared-window small-MSM kernel
            dyn_sum = dc.msm(dyn_points, dyn_scalars)
            return dc.pt_add(dc.pt_sum(fixed, axis=1), dyn_sum)
    pts = dc.PointJ(
        *(
            jnp.concatenate([a, b], axis=1)
            for a, b in zip(fixed_points, dyn_points)
        )
    )
    scs = jnp.concatenate([fixed_scalars, dyn_scalars], axis=1)
    return dc.msm_straus(pts, scs)


def msm_fixed(tables, scalars):
    """tables: (tx, ty) from build_tables, F fixed points; scalars:
    (16, F, B) F_n limbs. -> PointJ coords (16, F, B): per-lane
    [s_i] G_i (caller reduces the F axis, e.g. curve.pt_sum).
    Returns None if shapes don't tile (caller falls back)."""
    from .curve import PointJ

    tx, ty = tables
    F = tx.shape[0]
    if scalars.ndim != 3 or scalars.shape[1] != F:
        return None
    B = scalars.shape[-1]
    if B % TILE != 0:
        return None  # per-generator lane tiles need B to tile
    nb = B // TILE
    dig = _digits(scalars).reshape(N_WINDOWS, F, nb, _SUB, 128)
    sx, sy, sz = fixed_msm_flat(tx, ty, dig)
    return PointJ(
        sx.reshape(16, F, B), sy.reshape(16, F, B), sz.reshape(16, F, B)
    )
