"""secp256k1 group ops, limb-vectorized for TPU (JAX).

Replaces the k256 crate's `ProjectivePoint`/`AffinePoint` engines
(SURVEY.md §2 row 11; reference call sites all over /root/reference/src)
with a batched, branch-free execution model: a point is a `PointJ` pytree
of Jacobian coordinates, each a (16, *batch) uint32 limb array (see
`bppp_tpu.ops.field` for the limb convention). z == 0 encodes the
identity. All exceptional cases (identity operands, doubling collision,
P + (-P)) are handled with lane masks — TPUs have no branches.

Layout convention for vectors of points: coordinates shaped
(16, L, *batch) — the length axis rides in the batch dims so every group
op below vectorizes over (points x proofs) lanes simultaneously.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ..oracle import curve as oc
from ..oracle.field import B as B_INT
from . import field as f


class PointJ(NamedTuple):
    """Jacobian point, limb-major; z == 0 <=> identity."""

    x: jnp.ndarray
    y: jnp.ndarray
    z: jnp.ndarray

    @property
    def batch(self):
        return self.x.shape[1:]


B7 = f.int_to_limbs(B_INT)  # curve b = 7


def _sel(mask, a, b):
    """mask: (*batch,) bool -> limbwise select."""
    return jnp.where(mask[None], a, b)


def pt_select(mask, a: PointJ, b: PointJ) -> PointJ:
    return PointJ(_sel(mask, a.x, b.x), _sel(mask, a.y, b.y), _sel(mask, a.z, b.z))


def identity(batch=()) -> PointJ:
    z16 = jnp.zeros((16,) + tuple(batch), dtype=jnp.uint32)
    one = z16.at[0].set(1)
    return PointJ(z16, one, z16)


def generator(batch=()) -> PointJ:
    return from_int_points([oc.GENERATOR], batch=batch, squeeze=True)


def from_int_points(pts, batch=(), squeeze=False) -> PointJ:
    """Host: list of oracle Points -> PointJ with coords (16, L, *batch).

    With squeeze=True and one point, coords are (16, *batch)."""
    xs, ys, zs = [], [], []
    for p in pts:
        xs.append(p.x)
        ys.append(p.y)
        zs.append(p.z)
    def lift(vals):
        arr = f.ints_to_limbs(vals)  # (16, L)
        a = jnp.asarray(arr)
        if squeeze and len(pts) == 1:
            a = a[:, 0]
            return jnp.broadcast_to(a.reshape((16,) + (1,) * len(batch)), (16,) + tuple(batch))
        return jnp.broadcast_to(
            a.reshape((16, len(pts)) + (1,) * len(batch)),
            (16, len(pts)) + tuple(batch),
        )
    return PointJ(lift(xs), lift(ys), lift(zs))


def to_int_points(p: PointJ) -> list[oc.Point]:
    """Host: PointJ with coords (16, L) -> list of oracle Points."""
    xs = f.limbs_to_ints(np.asarray(p.x).reshape(16, -1))
    ys = f.limbs_to_ints(np.asarray(p.y).reshape(16, -1))
    zs = f.limbs_to_ints(np.asarray(p.z).reshape(16, -1))
    return [oc.Point(x, y, z) for x, y, z in zip(xs, ys, zs)]


def pt_is_identity(p: PointJ):
    return f.fp_is_zero(p.z)


def pt_neg(p: PointJ) -> PointJ:
    return PointJ(p.x, f.fp_neg(p.y), p.z)


import os as _os


def _pallas_enabled() -> bool:
    env = _os.environ.get("BPPP_PALLAS")
    if env is not None:
        return env not in ("0", "false", "")
    try:
        import jax

        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _pallas_bucket(prod: int, tile: int, floor: int = 0) -> int:
    """Round a lane count up to max(floor, tile * 2^k). Every distinct
    kernel SHAPE is a separate ~0.5-5 MB Mosaic binary, and the runtime's
    per-call cost scales with total program code size (measured: a 136 MB
    verify executable ran at ~316 ms/call). Floors collapse a program's
    calls onto ONE instance per kernel at the price of padded compute —
    point-op kernels are cheap per lane, so the trade wins by a lot."""
    b = max(tile, floor)
    while b < prod:
        b *= 2
    return b


def _flatten_for_pallas(arrs, floor: int = 0):
    """(16, *batch) coords -> (16, B) padded to a power-of-two lane
    bucket, plus restore info; None if too small to be worth a kernel."""
    from . import pallas_curve as pc

    shape = arrs[0].shape
    batch = shape[1:]
    prod = 1
    for d in batch:
        prod *= d
    if prod < pc.TILE:
        return None
    bucket = _pallas_bucket(prod, pc.TILE, floor)
    flat = [a.reshape(16, prod) for a in arrs]
    if bucket != prod:
        flat = [jnp.pad(a, ((0, 0), (0, bucket - prod))) for a in flat]
    return flat, batch, prod


def _unflatten(outs, batch, prod):
    return [o[:, :prod].reshape((16,) + batch) for o in outs]


def pt_double(p: PointJ) -> PointJ:
    """dbl-2009-l (a=0). Complete for identity/order-2 inputs: Z3 = 2YZ
    vanishes exactly when the oracle (curve.py:double) returns IDENTITY.
    On TPU with batch >= TILE lanes this dispatches to the fused Pallas
    kernel (ops/pallas_curve.py); semantics are identical."""
    if _pallas_enabled():
        packed = _flatten_for_pallas(list(p))
        if packed is not None:
            from . import pallas_curve as pc

            flat, batch, prod = packed
            outs = pc.pt_double_flat(*flat)
            return PointJ(*_unflatten(outs, batch, prod))
    return _pt_double_jnp(p)


def _pt_double_jnp(p: PointJ) -> PointJ:
    X, Y, Z = p
    A = f.fp_sqr(X)
    Bb = f.fp_sqr(Y)
    C = f.fp_sqr(Bb)
    t = f.fp_add(X, Bb)
    D = f.fp_sub(f.fp_sub(f.fp_sqr(t), A), C)
    D = f.fp_add(D, D)
    E = f.fp_add(f.fp_add(A, A), A)
    F = f.fp_sqr(E)
    X3 = f.fp_sub(F, f.fp_add(D, D))
    C8 = f.fp_add(C, C)
    C8 = f.fp_add(C8, C8)
    C8 = f.fp_add(C8, C8)
    Y3 = f.fp_sub(f.fp_mul(E, f.fp_sub(D, X3)), C8)
    Z3 = f.fp_mul(f.fp_add(Y, Y), Z)
    return PointJ(X3, Y3, Z3)


def pt_add(p: PointJ, q: PointJ) -> PointJ:
    """Complete masked Jacobian add (add-2007-bl shape, matching the
    oracle's curve.py:add): generic path + lane-mask fixups for
    p==identity, q==identity, doubling collision (H==0, r==0) and
    inverse collision (H==0, r!=0). Dispatches to the fused Pallas kernel
    on TPU for large batches."""
    if _pallas_enabled() and p.x.shape == q.x.shape:
        packed = _flatten_for_pallas(list(p) + list(q))
        if packed is not None:
            from . import pallas_curve as pc

            flat, batch, prod = packed
            outs = pc.pt_add_flat(*flat)
            return PointJ(*_unflatten(outs, batch, prod))
    return _pt_add_jnp(p, q)


def _pt_add_jnp(p: PointJ, q: PointJ) -> PointJ:
    Z1Z1 = f.fp_sqr(p.z)
    Z2Z2 = f.fp_sqr(q.z)
    U1 = f.fp_mul(p.x, Z2Z2)
    U2 = f.fp_mul(q.x, Z1Z1)
    S1 = f.fp_mul(p.y, f.fp_mul(q.z, Z2Z2))
    S2 = f.fp_mul(q.y, f.fp_mul(p.z, Z1Z1))
    H = f.fp_sub(U2, U1)
    r = f.fp_sub(S2, S1)
    HH = f.fp_sqr(H)
    HHH = f.fp_mul(H, HH)
    V = f.fp_mul(U1, HH)
    rr = f.fp_sqr(r)
    X3 = f.fp_sub(f.fp_sub(rr, HHH), f.fp_add(V, V))
    Y3 = f.fp_sub(f.fp_mul(r, f.fp_sub(V, X3)), f.fp_mul(S1, HHH))
    Z3 = f.fp_mul(f.fp_mul(p.z, q.z), H)
    out = PointJ(X3, Y3, Z3)

    h_zero = f.fp_is_zero(H)
    r_zero = f.fp_is_zero(r)
    p_id = pt_is_identity(p)
    q_id = pt_is_identity(q)
    neither_id = jnp.logical_not(jnp.logical_or(p_id, q_id))

    # doubling collision: same x AND same y
    dbl = pt_double(p)
    out = pt_select(jnp.logical_and(neither_id, jnp.logical_and(h_zero, r_zero)), dbl, out)
    # inverse collision: same x, different y -> identity (Z3 = z1 z2 H = 0
    # already, but force canonical identity lanes anyway)
    inv_mask = jnp.logical_and(neither_id, jnp.logical_and(h_zero, jnp.logical_not(r_zero)))
    out = pt_select(inv_mask, identity(p.batch), out)
    out = pt_select(q_id, p, out)
    out = pt_select(p_id, q, out)
    return out


def pt_add_mixed(p: PointJ, qx, qy, q_id=None) -> PointJ:
    """p (Jacobian) + q (affine, z=1 implied) — madd-2007-bl shape, saves
    the Z2Z2/S1 scalings. q_id: optional (*batch,) bool marking identity
    lanes of q. Used for fixed-base table accumulation where q is a
    precomputed affine table entry."""
    Z1Z1 = f.fp_sqr(p.z)
    U2 = f.fp_mul(qx, Z1Z1)
    S2 = f.fp_mul(qy, f.fp_mul(p.z, Z1Z1))
    H = f.fp_sub(U2, p.x)
    r = f.fp_sub(S2, p.y)
    HH = f.fp_sqr(H)
    HHH = f.fp_mul(H, HH)
    V = f.fp_mul(p.x, HH)
    rr = f.fp_sqr(r)
    X3 = f.fp_sub(f.fp_sub(rr, HHH), f.fp_add(V, V))
    Y3 = f.fp_sub(f.fp_mul(r, f.fp_sub(V, X3)), f.fp_mul(p.y, HHH))
    Z3 = f.fp_mul(p.z, H)
    out = PointJ(X3, Y3, Z3)

    h_zero = f.fp_is_zero(H)
    r_zero = f.fp_is_zero(r)
    p_id = pt_is_identity(p)
    dbl_mask = jnp.logical_and(jnp.logical_not(p_id), jnp.logical_and(h_zero, r_zero))
    out = pt_select(dbl_mask, pt_double(p), out)
    inv_mask = jnp.logical_and(jnp.logical_not(p_id), jnp.logical_and(h_zero, jnp.logical_not(r_zero)))
    out = pt_select(inv_mask, identity(p.batch), out)
    q_pt = PointJ(qx, qy, jnp.broadcast_to(identity(p.batch).y, qx.shape))
    out = pt_select(p_id, q_pt, out)
    if q_id is not None:
        out = pt_select(q_id, p, out)
    return out


def pt_scalar_mul(p: PointJ, k) -> PointJ:
    """[k]p, 4-bit fixed windows, branch-free.

    k: (16, *batch) canonical F_n limbs. On TPU the entire ladder runs as
    ONE fused Pallas call (ops/pallas_msm.py) — an XLA scan would pay
    per-iteration dispatch inside the while loop, which profiling showed
    dominating the composed verifier. Replaces k256's per-point ladder
    inside every `vector_mul` MSM (SURVEY.md §2 row 15)."""
    if _pallas_enabled():
        from . import pallas_msm as pm

        kb = jnp.broadcast_to(k, p.x.shape)
        packed = _flatten_for_pallas(list(p) + [kb], floor=pm.LADDER_LANE_FLOOR)
        if packed is not None:
            from . import pallas_msm as pm

            flat, batch, prod = packed
            outs = pm.scalar_mul_flat(*flat)
            return PointJ(*_unflatten(outs, batch, prod))
    return _pt_scalar_mul_jnp(p, k)


def _pt_scalar_mul_jnp(p: PointJ, k) -> PointJ:
    import jax

    # table[d] = [d]p, d = 0..15: 14 sequential adds inside a scan so the
    # compiled graph holds ONE pt_add body, not 14 (XLA compile time is
    # ~0.5 ms/eqn; every unrolled point op is ~10k eqns).
    def tab_body(acc, _):
        nxt = pt_add(acc, p)
        return nxt, nxt

    _, rest = jax.lax.scan(tab_body, p, None, length=14)  # [2]p .. [15]p
    tab = PointJ(
        *(
            jnp.concatenate([jnp.stack([i0, c1], axis=0), cr], axis=0)
            for i0, c1, cr in zip(identity(p.batch), p, rest)
        )
    )  # (16, 16, *batch)

    # all 64 nibbles, MSB first: digits (64, *batch)
    digits = jnp.stack(
        [(k[w // 4] >> (4 * (w % 4))) & 15 for w in range(63, -1, -1)], axis=0
    )

    def body(acc, digit):
        for _ in range(4):
            acc = pt_double(acc)
        # branchless table pick: sum of masked entries (no gather — XLA
        # gathers are slow to compile and lane-hostile on TPU)
        onehot = jnp.stack(
            [(digit == d).astype(jnp.uint32) for d in range(16)], axis=0
        )  # (16, *batch)
        sel = PointJ(
            *(jnp.sum(c * onehot[:, None], axis=0) for c in tab)
        )
        return pt_add(acc, sel), None

    acc, _ = jax.lax.scan(body, identity(p.batch), digits)
    return acc


def pt_sum(p: PointJ, axis: int = 1) -> PointJ:
    """Reduce a points axis (default axis 1 of (16, L, *batch)) to a
    single point. On TPU: one fused Pallas reduction call; otherwise a
    pairwise fold + fori accumulate. Identity padding keeps extra lanes
    inert."""
    import jax

    if axis != 1:
        p = PointJ(*(jnp.moveaxis(c, axis, 1) for c in p))
    L = p.x.shape[1]
    if L == 1:
        return PointJ(*(jnp.squeeze(c, axis=1) for c in p))

    if _pallas_enabled():
        batch = p.x.shape[2:]
        prod = 1
        for d in batch:
            prod *= d
        from . import pallas_msm as pm

        if prod >= 256:
            bucket = _pallas_bucket(prod, pm.TILE)
            # bucket the chunk count too: identity-padded chunks are inert
            Lb = 1
            while Lb < L:
                Lb *= 2
            flat = [c.reshape(16, L, prod) for c in p]
            if bucket != prod or Lb != L:
                flat = [
                    jnp.pad(c, ((0, 0), (0, Lb - L), (0, bucket - prod)))
                    for c in flat
                ]
            ox, oy, oz = pm.tree_sum(flat, Lb)
            outs = [o[:, :prod].reshape((16,) + batch) for o in (ox, oy, oz)]
            return PointJ(*outs)
    # One pairwise fold (halves the sequential adds), then a fori_loop
    # accumulation whose single pt_add body keeps the compiled graph small.
    half = L // 2
    s = pt_add(
        PointJ(*(c[:, :half] for c in p)),
        PointJ(*(c[:, half : 2 * half] for c in p)),
    )
    if L % 2:
        s = PointJ(
            *(jnp.concatenate([a, b[:, 2 * half :]], axis=1) for a, b in zip(s, p))
        )
    M = s.x.shape[1]

    def body(i, acc):
        q = PointJ(
            *(
                jax.lax.dynamic_index_in_dim(c, i, axis=1, keepdims=False)
                for c in s
            )
        )
        return pt_add(acc, q)

    first = PointJ(*(c[:, 0] for c in s))
    return jax.lax.fori_loop(1, M, body, first)


def msm(points: PointJ, scalars) -> PointJ:
    """Multi-scalar multiplication: sum_i [s_i] P_i.

    points: coords (16, L, *batch); scalars: (16, L, *batch) F_n limbs.
    Small L (the verifier's per-round folds and commitment-chain MSMs)
    dispatches to a single shared-window kernel (pallas_msm.msm_small_
    flat: 256 + 78L point ops on B lanes instead of 334 ops on L*B
    ladder lanes). Large L ON TPU runs the fused per-lane ladder + tree
    reduction: the bucketed Pippenger's sort + prefix-scan + gather
    structure cannot fuse into one Mosaic kernel, so its ~256 per-window
    scan/add dispatches cost 7-40x MORE device time than the ladder at
    L=64/256 (tools/pippenger_ab.py, v5e, 2026-08-20) despite doing ~5x
    fewer point ops — dispatch count beats op count here. Off-TPU large
    L keeps Pippenger (op count wins when there is no fused ladder
    kernel). This replaces the reference's naive per-term loop
    (util.rs:46-60)."""
    if _pallas_enabled():
        out = _msm_small(points, scalars)
        if out is not None:
            return out
        if points.x.shape[1] > 6:
            return pt_sum(pt_scalar_mul(points, scalars), axis=1)
    if points.x.shape[1] > 6:
        from . import pippenger

        return pippenger.msm_pippenger(points, scalars)
    return pt_sum(pt_scalar_mul(points, scalars), axis=1)


def _msm_small(points: PointJ, scalars) -> PointJ | None:
    """Shared-window kernel path for L <= 6 points; None if not viable.

    With GLV enabled (default; BPPP_GLV=0 disables), each 256-bit scalar
    splits into two signed <=129-bit halves (ops/glv.py) and the kernel
    walks 33 windows instead of 64 — 132 doubles instead of 256 — with
    phi(P) = (beta*x, y) applied to selected table entries on the fly.

    Tile selection (profile-driven, r3): batches that tile at the FULL
    lane tile run chunks of <= FT_DMAX points per kernel call at _SUB=8
    vreg packing (2x the half-tile add rate; in-VMEM tables cap D) and
    combine chunks with one complete add each. Batches that only tile
    at the half tile keep the single D <= 6 call."""
    import os

    from . import pallas_msm as pm

    L = points.x.shape[1]
    if not (1 <= L <= 6):
        return None
    batch = points.x.shape[2:]
    prod = 1
    for d in batch:
        prod *= d
    wnaf = (
        os.environ.get("BPPP_WNAF", "1") != "0"
        and os.environ.get("BPPP_GLV", "1") != "0"
    )
    if (
        os.environ.get("BPPP_MSFT", "1") != "0"
        and prod >= pm.TILE
        and prod % pm.TILE == 0
    ):
        # signed-digit tables are 9/16 the VMEM: 5 points per full-tile
        # call instead of 3 (fewer chunked walks for the verifier's L=5)
        tile, dmax = pm.TILE, (pm.FT_DMAX_WNAF if wnaf else pm.FT_DMAX)
    elif prod >= pm.MS_TILE and prod % pm.MS_TILE == 0:
        tile, dmax = pm.MS_TILE, 6
    else:
        return None
    kk = jnp.broadcast_to(scalars, points.x.shape)

    acc = None
    for lo in range(0, L, dmax):
        hi = min(lo + dmax, L)
        part = _msm_small_call(
            PointJ(*(c[:, lo:hi] for c in points)),
            kk[:, lo:hi],
            prod,
            tile,
        )
        # chunks are independent random points: complete add
        acc = part if acc is None else pt_add(acc, part)
    return PointJ(*(c.reshape((16,) + batch) for c in acc))


def _msm_small_call(points: PointJ, kk, prod: int, tile: int) -> PointJ:
    """One shared-window kernel call over flat (16, prod) lanes."""
    import os

    from . import pallas_msm as pm

    L = points.x.shape[1]

    def re(c):
        return jnp.moveaxis(c, 1, 0).reshape(L, 16, prod)

    if os.environ.get("BPPP_GLV", "1") != "0":
        from . import glv

        m1, n1, m2, n2 = glv.decompose(kk.reshape(16, L, prod))
        if os.environ.get("BPPP_WNAF", "1") != "0":
            # signed-window digits recoded on the graph side (the carry
            # chain is sequential; in-kernel extraction can't have it);
            # plane index = w*2L + j with halves interleaved per point
            d1 = glv.wnaf_digits(m1, n1)  # (W, L, prod)
            d2 = glv.wnaf_digits(m2, n2)
            dig = jnp.stack([d1, d2], axis=2)  # (W, L, 2, prod)
            dig = dig.reshape(glv.GLV_WINDOWS * 2 * L, prod)
            outs = pm.msm_small_wnaf_flat(
                re(points.x), re(points.y), re(points.z), dig, tile=tile
            )
            return PointJ(*outs)
        mags = jnp.moveaxis(
            jnp.stack([m1, m2], axis=2).reshape(16, 2 * L, prod), 1, 0
        )
        signs = (
            jnp.stack([n1, n2], axis=1).reshape(2 * L, prod).astype(jnp.uint32)
        )
        outs = pm.msm_small_glv_flat(
            re(points.x), re(points.y), re(points.z), mags, signs, tile=tile
        )
    else:
        outs = pm.msm_small_flat(
            re(points.x), re(points.y), re(points.z), re(kk), tile=tile
        )
    return PointJ(*outs)


def _tree_sum_axis1(p: PointJ) -> PointJ:
    """Log-depth pairwise reduction of the points axis (axis 1), identity-
    padded to a power of two. log2(L) sequential pt_add calls, each
    vectorized over half the remaining lanes."""
    L = p.x.shape[1]
    while L > 1:
        if L % 2:
            idl = identity((1,) + p.x.shape[2:])
            p = PointJ(
                *(jnp.concatenate([c, i[:, None] if i.ndim == 1 + len(p.x.shape[2:]) else i], axis=1)
                  for c, i in zip(p, PointJ(*(x[:, None] if x.ndim == 1 + len(p.x.shape[2:]) else x for x in identity(p.x.shape[2:])))))
            )
            L += 1
        half = L // 2
        p = pt_add(
            PointJ(*(c[:, :half] for c in p)),
            PointJ(*(c[:, half:] for c in p)),
        )
        L = half
    return PointJ(*(jnp.squeeze(c, axis=1) for c in p))


def msm_straus(points: PointJ, scalars) -> PointJ:
    """Interleaved shared-window MSM (Straus): sum_i [s_i] P_i.

    points: coords (16, L, *batch); scalars: (16, L, *batch) F_n limbs.
    Unlike `msm` (one independent 256-double ladder per point lane), the
    4-bit windows walk ONCE for all points: per window, each point
    contributes a masked table entry and the L selected points fold in a
    log-tree; only 256 doubles total run on the single accumulator lane.
    Work: ~64*L + 14*L + 256 point-ops vs msm's ~320*L — about 4x less
    for the verifier's 20-50 point MSMs. This replaces the reference's
    naive per-term loop (util.rs:46-60) on the hot verify path.

    NOTE (TPU): the interleaved window walk is an XLA scan whose
    per-iteration dispatch overhead exceeds its compute savings on the
    current runtime, so on TPU this routes to the fused-ladder msm
    (2 pallas calls); the shared-window algorithm remains the CPU/XLA
    path and the basis for a future single-kernel version."""
    if _pallas_enabled():
        return msm(points, scalars)
    import jax

    L = points.x.shape[1]
    batch = jnp.broadcast_shapes(points.x.shape[2:], scalars.shape[2:])
    points = PointJ(*(jnp.broadcast_to(c, (16, L) + batch) for c in points))
    scalars = jnp.broadcast_to(scalars, (16, L) + batch)

    # tables tab[e] = [e]P_i, e = 0..15: coords (16ent, 16, L, *batch)
    def tab_body(acc, _):
        nxt = pt_add(acc, points)
        return nxt, nxt

    _, rest = jax.lax.scan(tab_body, points, None, length=14)
    tab = PointJ(
        *(
            jnp.concatenate([jnp.stack([i0, c1], axis=0), cr], axis=0)
            for i0, c1, cr in zip(identity((L,) + batch), points, rest)
        )
    )

    # digit stream: (64, L, *batch), MSB-first nibbles
    digits = jnp.stack(
        [(scalars[w // 4] >> (4 * (w % 4))) & 15 for w in range(63, -1, -1)], axis=0
    )

    def body(acc, digit):
        for _ in range(4):
            acc = pt_double(acc)
        onehot = jnp.stack(
            [(digit == d).astype(jnp.uint32) for d in range(16)], axis=0
        )  # (16ent, L, *batch)
        sel = PointJ(*(jnp.sum(c * onehot[:, None], axis=0) for c in tab))
        return pt_add(acc, _tree_sum_axis1(sel)), None

    acc, _ = jax.lax.scan(body, identity(batch), digits)
    return acc


def to_affine(p: PointJ):
    """-> (x_aff, y_aff, is_id). Identity lanes yield (0, 0, True);
    fp_inv(0) = 0 under the Fermat ladder so no masking is needed before
    the inversion."""
    is_id = pt_is_identity(p)
    zi = f.fp_inv(p.z)
    zi2 = f.fp_sqr(zi)
    x = f.fp_mul(p.x, zi2)
    y = f.fp_mul(p.y, f.fp_mul(zi2, zi))
    x = _sel(is_id, jnp.zeros_like(x), x)
    y = _sel(is_id, jnp.zeros_like(y), y)
    return x, y, is_id


def compress(p: PointJ):
    """SEC1 compressed encoding -> (33, *batch) uint32 byte array.

    Matches the oracle (curve.py:to_bytes) / k256 `to_bytes()`
    (reference transcript.rs:7): 0x02 | (y & 1) prefix + BE x;
    identity -> 33 zero bytes."""
    x, y, is_id = to_affine(p)
    xb = f.limbs_to_be_bytes(x)  # (32, *batch)
    tag = jnp.where(is_id, jnp.uint32(0), jnp.uint32(2) + (y[0] & 1))
    xb = jnp.where(is_id[None], jnp.zeros_like(xb), xb)
    return jnp.concatenate([tag[None], xb], axis=0)


def decompress(b) -> PointJ:
    """(33, *batch) SEC1 bytes -> PointJ. All-zero lanes -> identity.
    Assumes well-formed input (proof deserialization validates on host)."""
    tag = b[0]
    x = f.be_bytes_to_limbs(b[1:])
    rhs = f.fp_add(f.fp_mul(f.fp_sqr(x), x), f._const(B7, x.ndim))
    y = f.fp_sqrt(rhs)
    flip = (y[0] & 1) != (tag & 1)
    y = _sel(flip, f.fp_neg(y), y)
    is_id = jnp.all(b == 0, axis=0)
    one = jnp.zeros_like(x).at[0].set(1)
    z = _sel(is_id, jnp.zeros_like(x), one)
    y = _sel(is_id, one, y)
    return PointJ(x, y, z)


def decompress_checked(b):
    """(33, *batch) SEC1 bytes -> (PointJ, ok mask). Unlike decompress,
    does NOT trust its input (VERDICT r2 #7: raw wire bytes reach device
    verify without the host deserializer's curve check — k256's
    `from_bytes` rejects these on deserialize, reference serde layer).
    ok lanes are: the all-zero identity encoding, OR tag in {2, 3} with
    canonical x < p and x^3 + 7 a quadratic residue (the sqrt ladder's
    output actually squares back to the RHS). Callers must fold ~ok into
    their accept bit; invalid lanes still decode to SOME defined point so
    downstream arithmetic stays total."""
    pt = decompress(b)
    tag = b[0]
    x = f.be_bytes_to_limbs(b[1:])
    # same subgraphs decompress builds — XLA CSEs them, no extra sqrt
    rhs = f.fp_add(f.fp_mul(f.fp_sqr(x), x), f._const(B7, x.ndim))
    is_id = jnp.all(b == 0, axis=0)
    tag_ok = jnp.logical_or(tag == 2, tag == 3)
    x_canon = f.limbs_lt_const(x, f.P_INT)
    on_curve = jnp.all(f.fp_sqr(pt.y) == rhs, axis=0)
    ok = jnp.logical_or(
        is_id, jnp.logical_and(tag_ok, jnp.logical_and(x_canon, on_curve))
    )
    # the wire type is uint32: a non-normalized "byte" >= 256 would alias
    # a different x under be_bytes_to_limbs and slip past x_canon (the
    # limb compare assumes normalized 16-bit limbs) — reject it here so
    # every encoding has exactly one accepted representation
    bytes_ok = jnp.all(b <= 0xFF, axis=0)
    return pt, jnp.logical_and(ok, bytes_ok)


def pt_eq(p: PointJ, q: PointJ):
    """Projective equality mask, as k256 PartialEq (oracle curve.py:eq)."""
    Z1Z1 = f.fp_sqr(p.z)
    Z2Z2 = f.fp_sqr(q.z)
    x_eq = jnp.all(f.fp_mul(p.x, Z2Z2) == f.fp_mul(q.x, Z1Z1), axis=0)
    y_eq = jnp.all(
        f.fp_mul(p.y, f.fp_mul(q.z, Z2Z2)) == f.fp_mul(q.y, f.fp_mul(p.z, Z1Z1)),
        axis=0,
    )
    p_id = pt_is_identity(p)
    q_id = pt_is_identity(q)
    both = jnp.logical_and(x_eq, y_eq)
    either_id = jnp.logical_or(p_id, q_id)
    return jnp.where(either_id, p_id == q_id, jnp.logical_and(both, jnp.logical_not(either_id)))
