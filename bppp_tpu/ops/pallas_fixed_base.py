"""Fixed-base windowed MSM: precomputed generator tables + MXU selection
+ a grid-carried Pallas accumulate kernel.

The verifier's dominant cost was the generic per-lane scalar-mul ladder
over the FIXED generator vectors (g, h_vec, g_vec): 334 point ops per
lane, ~256 of them doubles. For fixed bases the doubles and in-kernel
table builds disappear, and 8-bit windows halve the add count again:

  * setup (once per generator set): affine tables
    T[w][d] = [d * 256^w] G_i for the 32 8-bit windows, d = 1..255,
    stored as f32 (16-bit limbs are exact in f32) pre-transposed for the
    MXU (build_tables — plain JAX, one batched inversion for affine).
  * per verify: per-lane window digits select entries with an in-kernel
    one-hot f32 matmul on the MXU — (16, 256) @ (256, TILE) per coord —
    ~6 statements instead of the 480 masked-select statements the 4-bit
    SMEM-splat selection needed.
  * kernel (_fixed_msm_kernel): grid (F, lane_tiles, 32 windows); each
    step does ONE INCOMPLETE mixed add (affine q, z=1; identity lanes
    masked, collisions cryptographically unreachable — see
    pallas_field.pt_add_mixed_inc) into a VMEM scratch accumulator —
    32 adds/lane total, no doubles, no dbl-branch in the add body.

Replaces the reference's naive per-term MSM (util.rs:46-60) on the
verify hot path; the commitment-chain points (C_S, X_k, ...) are still
handled by the shared-window small-MSM kernel (they are per-proof data).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import pallas_field as pf
from .pallas_curve import INTERPRET, TILE, _SUB

N_WINDOWS = 32
N_ENT = 256


def build_tables(points):
    """points: PointJ coords (16, F) — unbatched fixed generators.
    -> (tx, ty): float32 (F, 32, 16, 256) window tables (point, window,
    limb, entry), entry 0 = (0, 0) (identity sentinel; the kernel's
    mixed add treats all-zero affine coords as the identity). The limb
    axis leads the entry axis so the kernel's selection is a plain
    (16, 256) @ (256, TILE) matmul."""
    from . import curve as dc

    F = points.x.shape[1]

    def w_step(base, _):
        # base: PointJ (16, F) = [256^w] G_i; entries [2]..[255]*base
        def ent_body(cur, _):
            nxt = dc._pt_add_jnp(cur, base)
            return nxt, nxt

        _, rest = jax.lax.scan(ent_body, base, None, length=N_ENT - 2)
        # rest coords: (254, 16, F); entry d = rest[d-2] for d >= 2
        ents = dc.PointJ(
            *(
                jnp.concatenate([b[None], r], axis=0)
                for b, r in zip(base, rest)
            )
        )  # (255, 16, F)
        # [256^{w+1}] = double of entry 128 (= rest[126])
        nxt_base = dc._pt_double_jnp(dc.PointJ(*(r[126] for r in rest)))
        return nxt_base, ents

    _, ents = jax.lax.scan(w_step, points, None, length=N_WINDOWS)
    # ents coords: (32, 255, 16, F) -> affine in ONE batched inversion
    flat = dc.PointJ(*(c.transpose(2, 0, 1, 3).reshape(16, -1) for c in ents))
    ax, ay, _ = dc.to_affine(flat)
    ax = ax.reshape(16, N_WINDOWS, N_ENT - 1, F)
    ay = ay.reshape(16, N_WINDOWS, N_ENT - 1, F)
    zero = jnp.zeros((16, N_WINDOWS, 1, F), jnp.uint32)
    tx = jnp.concatenate([zero, ax], axis=2)  # entry 0 = identity sentinel
    ty = jnp.concatenate([zero, ay], axis=2)
    # -> (F, 32, 16 limb, 256 ent) f32: one (f, w) block streams to VMEM
    # per grid step as the selection matmul's LHS
    tx = tx.transpose(3, 1, 0, 2).astype(jnp.float32)
    ty = ty.transpose(3, 1, 0, 2).astype(jnp.float32)
    return tx, ty


def _digits(scalars):
    """(16, F, B) limbs -> (32, F, B) window bytes (LSB window first)."""
    rows = []
    for w in range(N_WINDOWS):
        rows.append((scalars[w // 2] >> (8 * (w % 2))) & 255)
    return jnp.stack(rows, axis=0)


def _fixed_msm_kernel(tabx_ref, taby_ref, dig_ref, ox, oy, oz, ax, ay, az):
    """Grid (F, B/TILE, 32 windows). Each step selects this window's
    table entry per lane with a one-hot f32 matmul on the MXU (digit 0
    selects the all-zero identity sentinel) and does ONE incomplete
    mixed add into the scratch accumulator."""
    w = pl.program_id(2)

    @pl.when(w == 0)
    def _():
        ax[:] = jnp.zeros((16, TILE), jnp.uint32)
        ay[:] = jnp.pad(jnp.ones((1, TILE), jnp.uint32), [(0, 15), (0, 0)])
        az[:] = jnp.zeros((16, TILE), jnp.uint32)

    d = dig_ref[0, 0, 0]  # (1, TILE) digits of this (f, b, w)
    oh = (
        jax.lax.broadcasted_iota(jnp.uint32, (N_ENT, TILE), 0) == d
    ).astype(jnp.float32)
    qx = jax.lax.dot_general(
        tabx_ref[0, 0], oh, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(jnp.uint32).reshape(16, _SUB, 128)
    qy = jax.lax.dot_general(
        taby_ref[0, 0], oh, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(jnp.uint32).reshape(16, _SUB, 128)

    X = ax[:].reshape(16, _SUB, 128)
    Y = ay[:].reshape(16, _SUB, 128)
    Z = az[:].reshape(16, _SUB, 128)
    nX, nY, nZ = pf.pt_add_mixed_inc(X, Y, Z, qx, qy)
    ax[:] = nX.reshape(16, TILE)
    ay[:] = nY.reshape(16, TILE)
    az[:] = nZ.reshape(16, TILE)

    @pl.when(w == N_WINDOWS - 1)
    def _():
        ox[:] = ax[:]
        oy[:] = ay[:]
        oz[:] = az[:]


@jax.jit
def fixed_msm_flat(tx, ty, dig):
    """tx/ty: (F, 32, 16, 256) f32 tables; dig: (32, F, nb, 1, TILE)
    window digits -> 3x (16, F*B) Jacobian [k_i]G_i per (i, b) lane."""
    F = tx.shape[0]
    nb = dig.shape[2]
    B = nb * TILE
    tab_spec = pl.BlockSpec(
        (1, 1, 16, N_ENT),
        lambda f, b, w: (f, w, 0, 0),
        memory_space=pltpu.VMEM,
    )
    dig_spec = pl.BlockSpec(
        (1, 1, 1, 1, TILE),
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
    dig = _digits(scalars).reshape(N_WINDOWS, F, nb, 1, TILE)
    sx, sy, sz = fixed_msm_flat(tx, ty, dig)
    return PointJ(
        sx.reshape(16, F, B), sy.reshape(16, F, B), sz.reshape(16, F, B)
    )
