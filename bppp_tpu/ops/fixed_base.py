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
    -> (tx, ty): float32 (64, 16, 16, F) window tables, entry 0 = (0, 0)
    (identity sentinel; the kernel's mixed add treats all-zero affine
    coords as the identity)."""
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
    # -> (64, 16ent, 16limb, F) float32 for the MXU selection einsum
    tx = tx.transpose(1, 2, 0, 3).astype(jnp.float32)
    ty = ty.transpose(1, 2, 0, 3).astype(jnp.float32)
    return tx, ty


def _digits(scalars):
    """(16, F, B) limbs -> (64, F, B) window digits (LSB window first)."""
    rows = []
    for w in range(N_WINDOWS):
        rows.append((scalars[w // 4] >> (4 * (w % 4))) & 15)
    return jnp.stack(rows, axis=0)


def select_planes(tx, ty, scalars):
    """MXU one-hot selection: -> (qx, qy) uint32 (64, 16, F*B) — the
    affine point plane added per window. Exact: table limbs < 2^16 and
    one-hot rows have a single 1, so every f32 dot is a single exact
    16-bit value."""
    F = tx.shape[-1]
    B = scalars.shape[-1]
    d = _digits(scalars)  # (64, F, B)
    oh = (d[..., None] == jnp.arange(N_ENT, dtype=jnp.uint32)).astype(jnp.float32)
    # Precision.HIGHEST: TPU f32 matmuls default to one bf16 MXU pass
    # (8-bit mantissa) which would truncate 16-bit limbs; the multi-pass
    # f32 scheme is exact for limb values < 2^16 x a one-hot operand.
    qx = jnp.einsum(
        "welf,wfbe->wlfb", tx, oh, precision=jax.lax.Precision.HIGHEST
    )
    qy = jnp.einsum(
        "welf,wfbe->wlfb", ty, oh, precision=jax.lax.Precision.HIGHEST
    )
    return (
        qx.astype(jnp.uint32).reshape(N_WINDOWS, 16, F * B),
        qy.astype(jnp.uint32).reshape(N_WINDOWS, 16, F * B),
    )


def _plane_accum_kernel(qx_ref, qy_ref, ox, oy, oz, ax, ay, az):
    w = pl.program_id(1)

    @pl.when(w == 0)
    def _():
        ax[:] = jnp.zeros((16, TILE), jnp.uint32)
        ay[:] = jnp.pad(jnp.ones((1, TILE), jnp.uint32), [(0, 15), (0, 0)])
        az[:] = jnp.zeros((16, TILE), jnp.uint32)

    X = ax[:].reshape(16, _SUB, 128)
    Y = ay[:].reshape(16, _SUB, 128)
    Z = az[:].reshape(16, _SUB, 128)
    qx = qx_ref[:].reshape(16, _SUB, 128)
    qy = qy_ref[:].reshape(16, _SUB, 128)
    nX, nY, nZ = pf.pt_add_mixed(X, Y, Z, qx, qy)
    ax[:] = nX.reshape(16, TILE)
    ay[:] = nY.reshape(16, TILE)
    az[:] = nZ.reshape(16, TILE)
    ox[:] = ax[:]
    oy[:] = ay[:]
    oz[:] = az[:]


@jax.jit
def plane_accum_flat(qx, qy):
    """qx/qy: (64, 16, L) affine planes -> 3x (16, L) Jacobian sums
    (64 complete mixed adds per lane, one kernel body)."""
    L = qx.shape[2]
    spec_in = pl.BlockSpec((1, 16, TILE), lambda t, w: (w, 0, t))
    spec_out = pl.BlockSpec((16, TILE), lambda t, w: (0, t))
    out = jax.ShapeDtypeStruct((16, L), jnp.uint32)
    return pl.pallas_call(
        _plane_accum_kernel,
        grid=(L // TILE, N_WINDOWS),
        in_specs=[spec_in, spec_in],
        out_specs=[spec_out] * 3,
        out_shape=[out] * 3,
        scratch_shapes=[pltpu.VMEM((16, TILE), jnp.uint32)] * 3,
        interpret=INTERPRET(),
    )(qx, qy)


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
            dyn = dc.pt_scalar_mul(
                dyn_points, jnp.broadcast_to(dyn_scalars, dyn_points.x.shape)
            )
            allp = dc.PointJ(
                *(
                    jnp.concatenate([a, b], axis=1)
                    for a, b in zip(fixed, dyn)
                )
            )
            return dc.pt_sum(allp, axis=1)
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
    F = tx.shape[-1]
    if scalars.ndim != 3 or scalars.shape[1] != F:
        return None
    B = scalars.shape[-1]
    if (F * B) % TILE != 0:
        return None
    qx, qy = select_planes(tx, ty, scalars)
    sx, sy, sz = plane_accum_flat(qx, qy)
    return PointJ(
        sx.reshape(16, F, B), sy.reshape(16, F, B), sz.reshape(16, F, B)
    )
