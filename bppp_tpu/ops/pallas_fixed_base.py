"""Fixed-base windowed MSM: precomputed generator tables + MXU selection
+ a grid-carried Pallas accumulate kernel.

The verifier's dominant cost was the generic per-lane scalar-mul ladder
over the FIXED generator vectors (g, h_vec, g_vec): 334 point ops per
lane, ~256 of them doubles. For fixed bases the doubles and in-kernel
table builds disappear, and w-bit windows cut the add count to 256/w:

  * setup (once per generator set): affine tables
    T[w][d] = [d * 2^(w*W)] G_i for the 256/W W-bit windows, d = 1..2^W-1,
    stored as f32 (16-bit limbs are exact in f32) pre-transposed for the
    MXU (build_tables — plain JAX, one batched inversion for affine).
  * per verify: per-lane window digits select entries with an in-kernel
    one-hot f32 matmul on the MXU. The x and y tables are stacked along
    the limb axis at call time so ONE (32, N_ENT) @ (N_ENT, TILE) matmul
    selects both affine coordinates (half the matmul launches and 2x the
    MXU row utilization of separate x/y selections).
  * kernel (_fixed_msm_kernel): grid (lane_tiles, F); each step does ONE
    INCOMPLETE mixed add per window (affine q, z=1; identity lanes
    masked, collisions cryptographically unreachable — see
    pallas_field.pt_add_mixed_inc) into a VMEM scratch accumulator —
    no doubles, no dbl-branch in the add body.

Window width is env-tunable for hardware A/B: BPPP_FBW in
{2, 4, 8, 10, 11} (default 10 — picked by device-time A/B, r5
2026-08-20, tools/fb_ab.py at F=49 and F=25, B=1024:
W=8 10.68/5.46 ms, W=10 **9.42/4.85 ms**, W=11 9.53/4.87 ms).
Wider windows trade fewer mixed adds (ceil(256/W) per generator) for
wider one-hot selections (2^W): per-add cost rises 6.65 -> 7.29 ->
7.93 ns/lane across W=8/10/11 (selection is NOT free at NE >= 1024),
so the add-count saving flattens out and W=11's bf16 tables buy
nothing over W=10. Non-16-divisible widths extract digits across limb
boundaries on the graph side (_digits). At W=11 the tables and the
one-hot are bf16 to fit the 16 MB scoped-VMEM budget (table block
6.3 MB + one-hot 4 MB); bf16 is exact here because the byte-split rows
and the one-hot are integers < 2^8 (bench.py folds the knob into its
AOT program names).

Replaces the reference's naive per-term MSM (util.rs:46-60) on the
verify hot path; the commitment-chain points (C_S, X_k, ...) are still
handled by the shared-window small-MSM kernel (they are per-proof data).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import pallas_field as pf
from .pallas_curve import INTERPRET, TILE, _SUB

W_BITS = int(os.environ.get("BPPP_FBW", "10"))
assert W_BITS in (2, 4, 8, 10, 11), "BPPP_FBW: one-hot must fit VMEM"
N_WINDOWS = -(-256 // W_BITS)  # ceil
N_ENT = 1 << W_BITS
# bf16 tables + one-hot at W=11 (see module docstring): exact for
# integers < 2^8, and halves the VMEM/HBM footprint the f32 layout
# would blow at N_ENT=2048.
_SEL_DT = jnp.bfloat16 if W_BITS >= 11 else jnp.float32

# Entry-selection strategy (hardware A/B, cf. the colsum=mx dead end —
# MXU round trips inside VPU kernel loops cost relayouts + converts):
#   mx  (default) — one-hot f32 matmul on the MXU per window
#   vpu           — masked accumulate over the N_ENT entry columns on the
#                   VPU (u32 tables; no f32 casts, no MXU relayout); cost
#                   scales with N_ENT so it pairs with BPPP_FBW=4
_FBSEL = os.environ.get("BPPP_FBSEL", "mx")


def build_tables(points):
    """points: PointJ coords (16, F) — unbatched fixed generators.
    -> ONE kernel-ready table array, layout depending on _FBSEL:

      mx  (default): (N_WINDOWS, F, 64, N_ENT) float32, rows stacked as
          [x_lo(16) | y_lo(16) | x_hi(16) | y_hi(16)] BYTE halves of the
          16-bit limbs. The byte split is what makes the kernel's one-hot
          MXU selection EXACT at default matmul precision: the TPU MXU
          multiplies bf16 mantissas (8 bits), which hold integers < 2^8
          exactly but NOT 16-bit limbs — full-limb f32 tables compiled
          fine and returned wrong sums on v5e (round-3 hardware check;
          interpret mode is exact f32 and can never catch it).
      vpu: (N_WINDOWS, F, 32, N_ENT) uint32, rows [x(16) | y(16)] — the
          VPU masked accumulate is exact on full limbs.

    Entry 0 is (0, 0) (identity sentinel; the kernel's mixed add treats
    all-zero affine coords as the identity). The window axis LEADS so the
    kernel's per-window table read is a dynamic index on the leading dim
    (Mosaic rejects dynamic indices on non-leading dims — the old
    (F, W, ...) layout's `tab_ref[0, w]` failed to lower). The layout is
    emitted here, at setup, so per-verify calls carry no table
    concat/cast/transpose glue."""
    from . import curve as dc

    F = points.x.shape[1]

    def w_step(base, _):
        # base: PointJ (16, F) = [2^(w*W)] G_i; entries [2]..[N_ENT-1]*base
        def ent_body(cur, _):
            nxt = dc._pt_add_jnp(cur, base)
            return nxt, nxt

        _, rest = jax.lax.scan(ent_body, base, None, length=N_ENT - 2)
        # rest coords: (N_ENT-2, 16, F); entry d = rest[d-2] for d >= 2
        ents = dc.PointJ(
            *(
                jnp.concatenate([b[None], r], axis=0)
                for b, r in zip(base, rest)
            )
        )  # (N_ENT-1, 16, F)
        # [2^((w+1)W)] = double of entry N_ENT/2 (= rest[N_ENT/2 - 2])
        nxt_base = dc._pt_double_jnp(dc.PointJ(*(r[N_ENT // 2 - 2] for r in rest)))
        return nxt_base, ents

    _, ents = jax.lax.scan(w_step, points, None, length=N_WINDOWS)
    # ents coords: (N_WINDOWS, N_ENT-1, 16, F) -> affine, ONE batched inversion
    flat = dc.PointJ(*(c.transpose(2, 0, 1, 3).reshape(16, -1) for c in ents))
    ax, ay, _ = dc.to_affine(flat)
    ax = ax.reshape(16, N_WINDOWS, N_ENT - 1, F)
    ay = ay.reshape(16, N_WINDOWS, N_ENT - 1, F)
    zero = jnp.zeros((16, N_WINDOWS, 1, F), jnp.uint32)
    tx = jnp.concatenate([zero, ax], axis=2)  # entry 0 = identity sentinel
    ty = jnp.concatenate([zero, ay], axis=2)
    # -> one (w, f) block streams to VMEM per grid step; rows x entries
    # are the selection operand (see docstring for layout per _FBSEL)
    if _FBSEL == "vpu":
        assert W_BITS <= 8, "FBSEL=vpu unrolls N_ENT adds; use mx for wide W"
        rows = jnp.concatenate([tx, ty], axis=0)  # (32, W, NE, F) u32
        return rows.transpose(1, 3, 0, 2)  # (W, F, 32, NE)
    rows = jnp.concatenate(
        [tx & 0xFF, ty & 0xFF, tx >> 8, ty >> 8], axis=0
    ).astype(_SEL_DT)  # (64, W, NE, F): byte halves, exact in bf16/f32
    return rows.transpose(1, 3, 0, 2)  # (W, F, 64, NE)


def _digits(scalars):
    """(16, F, B) limbs -> (N_WINDOWS, F, B) window digits (LSB first).
    Window w covers bits [W_BITS*w, W_BITS*(w+1)), which crosses 16-bit
    limb boundaries when W_BITS does not divide 16 — a zero guard row
    covers the top window's out-of-range high limb."""
    ext = jnp.concatenate([scalars, jnp.zeros_like(scalars[:1])], axis=0)
    rows = []
    for w in range(N_WINDOWS):
        lo = W_BITS * w
        li, off = lo // 16, lo % 16
        v = ext[li] >> np.uint32(off)
        if off + W_BITS > 16:
            v = v | (ext[li + 1] << np.uint32(16 - off))
        rows.append(v & np.uint32(N_ENT - 1))
    return jnp.stack(rows, axis=0)


def _fixed_msm_kernel(tab_ref, dig_ref, ox, oy, oz, ax, ay, az):
    """Grid (B/TILE, F) — the generator axis F is the SEQUENTIAL inner
    dimension and carries the scratch accumulator, so the kernel emits
    the COMPLETE MSM sum per lane (no separate F-axis tree reduction).
    Each step loops this generator's windows in-kernel: per window ONE
    one-hot f32 matmul on the MXU selects both affine coords of the
    table entry per lane (digit 0 selects the all-zero identity
    sentinel; x rows stack above y rows) and ONE incomplete mixed add
    folds it in. Grid steps thus carry ~N_WINDOWS x more compute per
    step than a (F, B, W) grid — per-step pipeline overhead was the
    dominant cost of the unfused version."""
    f_i = pl.program_id(1)

    @pl.when(f_i == 0)
    def _():
        ax[:] = jnp.zeros((16, TILE), jnp.uint32)
        ay[:] = jnp.pad(jnp.ones((1, TILE), jnp.uint32), [(0, 15), (0, 0)])
        az[:] = jnp.zeros((16, TILE), jnp.uint32)

    def w_body(w, carry):
        X, Y, Z = carry
        d = dig_ref[w, 0, 0]  # (1, TILE) digits of window w
        tabw = tab_ref[w, 0]  # (ROWS, N_ENT); w on the LEADING dim —
        # Mosaic rejects dynamic indices on non-leading ref dims
        if _FBSEL == "vpu":
            # masked accumulate over entry columns: tables are per-
            # generator constants shared by every lane, so each entry is
            # a (32, 1) column lane-broadcast under a per-lane digit
            # mask. Entry 0 is the all-zero identity sentinel — skip it.
            q = jnp.zeros((32, TILE), jnp.uint32)
            for e in range(1, N_ENT):
                m = d == jnp.uint32(e)
                # 2-D slice, NOT tabw[:, e, None]: integer indexing makes
                # a 1-D intermediate Mosaic lowers to an unsupported
                # gather (hardware check r3)
                q = q + jnp.where(m, tabw[:, e : e + 1], 0)
        else:
            oh = (
                jax.lax.broadcasted_iota(jnp.uint32, (N_ENT, TILE), 0) == d
            ).astype(_SEL_DT)
            # rows are BYTE halves [x_lo|y_lo|x_hi|y_hi] so the MXU pass
            # is exact at default precision (bf16 mantissas hold ints
            # < 2^8; full 16-bit limbs round — see build_tables).
            # f32 -> i32 -> u32: Mosaic has no direct f32->u32 cast.
            sel = jax.lax.dot_general(
                tabw, oh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(jnp.int32).astype(jnp.uint32)  # (64, TILE)
            q = sel[:32] | (sel[32:] << 8)  # (32, TILE): x over y
        qx = q[:16].reshape(16, _SUB, 128)
        qy = q[16:].reshape(16, _SUB, 128)
        return pf.pt_add_mixed_inc(X, Y, Z, qx, qy)

    X = ax[:].reshape(16, _SUB, 128)
    Y = ay[:].reshape(16, _SUB, 128)
    Z = az[:].reshape(16, _SUB, 128)
    X, Y, Z = jax.lax.fori_loop(0, N_WINDOWS, w_body, (X, Y, Z))
    ax[:] = X.reshape(16, TILE)
    ay[:] = Y.reshape(16, TILE)
    az[:] = Z.reshape(16, TILE)

    @pl.when(f_i == pl.num_programs(1) - 1)
    def _():
        ox[:] = ax[:]
        oy[:] = ay[:]
        oz[:] = az[:]


@jax.jit
def fixed_msm_sum_flat(tab, dig):
    """tab: kernel-ready tables from build_tables — (N_WINDOWS, F, 64,
    N_ENT) f32 byte-split under _FBSEL=mx, (N_WINDOWS, F, 32, N_ENT) u32
    under vpu; dig: (N_WINDOWS, F, nb, 1, TILE) window digits -> 3x
    (16, B) Jacobian sum_i [k_i]G_i per lane."""
    F = tab.shape[1]
    rows = tab.shape[2]
    nb = dig.shape[2]
    B = nb * TILE
    tab_spec = pl.BlockSpec(
        (N_WINDOWS, 1, rows, N_ENT),
        lambda b, f: (0, f, 0, 0),
        memory_space=pltpu.VMEM,
    )
    dig_spec = pl.BlockSpec(
        (N_WINDOWS, 1, 1, 1, TILE),
        lambda b, f: (0, f, b, 0, 0),
        memory_space=pltpu.VMEM,
    )
    out_spec = pl.BlockSpec(
        (16, TILE), lambda b, f: (0, b), memory_space=pltpu.VMEM
    )
    out = jax.ShapeDtypeStruct((16, B), jnp.uint32)
    return pl.pallas_call(
        _fixed_msm_kernel,
        grid=(nb, F),
        in_specs=[tab_spec, dig_spec],
        out_specs=[out_spec] * 3,
        out_shape=[out] * 3,
        scratch_shapes=[pltpu.VMEM((16, TILE), jnp.uint32)] * 3,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=INTERPRET(),
    )(tab, dig)


def msm_fixed_sum(tab, scalars):
    """tab: kernel-ready table array from build_tables (layout/dtype per
    _FBSEL — see its docstring), F fixed points; scalars: (16, F, B) F_n
    limbs. -> PointJ coords (16, B): the complete MSM sum_i [s_i] G_i
    per lane (the F-axis reduction happens inside the kernel's carried
    accumulator). Returns None if shapes don't tile (caller falls back).
    No per-call table prep: build_tables already emitted the kernel
    operand."""
    from .curve import PointJ

    F = tab.shape[1]
    if scalars.ndim != 3 or scalars.shape[1] != F:
        return None
    B = scalars.shape[-1]
    if B % TILE != 0:
        return None  # lane tiles need B to tile
    nb = B // TILE
    dig = _digits(scalars).reshape(N_WINDOWS, F, nb, 1, TILE)
    sx, sy, sz = fixed_msm_sum_flat(tab, dig)
    return PointJ(sx, sy, sz)
