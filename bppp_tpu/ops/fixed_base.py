"""Fixed-base MSM dispatch: route to the window-table Pallas kernel
(ops/pallas_fixed_base.py) when tables are present and the backend runs
Pallas, else to the generic shared-window MSM.

This graph-level dispatch is deliberately SEPARATE from the kernel
module: the CPU AOT source hash (utils/aot.py _src_hash) excludes
pallas_* files so TPU-kernel iterations don't invalidate CPU test
caches, but the fallback logic here IS traced into CPU programs and
must invalidate them when it changes."""

from __future__ import annotations

import jax.numpy as jnp


def msm_mixed(tables, fixed_points, fixed_scalars, dyn_points, dyn_scalars):
    """MSM over fixed generators (via tables) + a few per-proof dynamic
    points (via the generic ladder), one tree reduction. Falls back to
    the shared-window path when tables are absent (CPU) or shapes don't
    tile. fixed_scalars: (16, F, *b) in TABLE order; fixed_points only
    feed the fallback."""
    from . import curve as dc

    if tables is not None and dc._pallas_enabled():
        from . import pallas_fixed_base as pfb

        fixed = pfb.msm_fixed_sum(tables, fixed_scalars)
        if fixed is not None:
            # dynamic points ride the shared-window small-MSM kernel
            dyn_sum = dc.msm(dyn_points, dyn_scalars)
            return dc.pt_add(fixed, dyn_sum)
    pts = dc.PointJ(
        *(
            jnp.concatenate([a, b], axis=1)
            for a, b in zip(fixed_points, dyn_points)
        )
    )
    scs = jnp.concatenate([fixed_scalars, dyn_scalars], axis=1)
    return dc.msm_straus(pts, scs)


def msm_fixed_positions(tables, points, positions, scalars):
    """MSM over a static SUBSET of the fixed-generator table layout:
    sum_j [scalars[:, j]] G_positions[j]. positions: tuple of static
    table indices (len P, any order, no duplicates); scalars:
    (16, P, *sbatch) in POSITION order; points: the FULL table-layout
    generator set (coords (16, F, ...)), used by the fallback only.

    The kernel's cost is F_walked x N_WINDOWS adds per lane, so walking
    only the P live generators beats zero-padding into the full layout
    whenever P < F — the prover's small commitments (commit_value: 2 of
    49, C_O: 9, the per-round WNLA R: 25) spent most of their full-table
    walks adding identity sentinels (r4 prover profile). Table rows are
    gathered once per call (~P/F of the table bytes; HBM-trivial next to
    the adds). Falls back to a Straus MSM over the subset points when
    tables are absent or shapes don't tile."""
    import numpy as np

    from . import curve as dc

    P = len(positions)
    assert scalars.shape[1] == P
    if tables is not None and dc._pallas_enabled():
        from . import pallas_fixed_base as pfb

        sub = jnp.take(tables, jnp.asarray(np.asarray(positions)), axis=1)
        sbatch = scalars.shape[2:]
        flat = scalars.reshape(16, P, -1)
        s = pfb.msm_fixed_sum(sub, flat)
        if s is not None:
            return dc.PointJ(*(a.reshape((16,) + sbatch) for a in s))
    sub_pts = dc.PointJ(
        *(jnp.take(a, jnp.asarray(list(positions)), axis=1) for a in points)
    )
    sbatch = scalars.shape[2:]
    pbatch = sub_pts.x.shape[2:]
    extra = len(sbatch) - len(pbatch)
    if extra:
        idx = (slice(None), slice(None)) + (None,) * extra
        sub_pts = dc.PointJ(
            *(jnp.broadcast_to(a[idx], (16, P) + sbatch) for a in sub_pts)
        )
    return dc.msm_straus(sub_pts, scalars)


def msm_fixed_total(tables, points, scalars):
    """Complete MSM sum_i [s_i] P_i over FIXED generators: rides the
    window tables when present and the flattened batch tiles; otherwise a
    generic Straus MSM over `points` (the same generators, used only by
    the fallback). scalars: (16, F, *sbatch) in TABLE order; points:
    PointJ coords (16, F, *pbatch) with pbatch a suffix of sbatch (extra
    leading batch axes — e.g. several MSMs stacked into one call — are
    broadcast over the shared generators). -> PointJ coords (16, *sbatch).

    Zero scalars contribute the identity on both paths, so callers embed
    sub-MSMs by zero-padding to the full table layout (the prover's
    C_O/C_L/C_R/C_S commitments and per-round WNLA X/R all do this)."""
    from . import curve as dc

    F = scalars.shape[1]
    sbatch = scalars.shape[2:]
    if tables is not None and dc._pallas_enabled():
        from . import pallas_fixed_base as pfb

        flat = scalars.reshape(16, F, -1)
        s = pfb.msm_fixed_sum(tables, flat)  # (16, prod(sbatch))
        if s is not None:
            return dc.PointJ(*(a.reshape((16,) + sbatch) for a in s))
    pbatch = points.x.shape[2:]
    extra = len(sbatch) - len(pbatch)
    if extra:
        idx = (slice(None), slice(None)) + (None,) * extra
        points = dc.PointJ(
            *(jnp.broadcast_to(a[idx], (16, F) + sbatch) for a in points)
        )
    return dc.msm_straus(points, scalars)
