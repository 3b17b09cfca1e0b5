"""Stacked-form field arithmetic for Pallas kernel bodies.

The row-list helpers in ops/field.py unroll every limb operation into
hundreds of separate vector statements; a complete point add compiled to
~5 MB of Mosaic binary, and with ~26 kernel instances the composed
verifier's executable hit 136 MB — the runtime's per-call cost scales
with code size, burying the actual compute.

Here a field element inside a kernel is ONE stacked array (L, S, 128)
(limbs leading, VREG-shaped trailing). Limb shifts are static leading-dim
pads/slices, partial-product column sums are an unrolled 16-term add of
shear-aligned slices — ~150 vector statements per modular multiply
instead of ~1900. Semantics are identical to ops/field.py (same fold
reductions, same bounds); cross-checked against the oracle in tests.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from ..oracle.field import N as N_INT
from ..oracle.field import P as P_INT

# Column-sum strategy for the 16x16 partial-product reduction inside
# mul_wide (hardware A/B, see BENCHMARKS.md):
#   seq  (default) — 15 sequential shear-aligned adds
#   tree           — same adds in a log-depth tree (shorter dep chain)
#   mx             — ONE f32 matmul on the MXU against an in-kernel
#                    indicator matrix (exact: <=32 terms < 2^21 < 2^24)
_COLSUM = os.environ.get("BPPP_COLSUM", "seq")

LIMB_MASK = 0xFFFF
_P17 = np.asarray(
    [((P_INT >> (16 * i)) & 0xFFFF) for i in range(17)], dtype=np.uint32
)
_N17 = np.asarray(
    [((N_INT >> (16 * i)) & 0xFFFF) for i in range(17)], dtype=np.uint32
)
_CN9 = [( ( (1 << 256) - N_INT ) >> (16 * i)) & 0xFFFF for i in range(9)]


def _shift_up(a, d: int, out_len: int):
    """(L, S, 128) -> (out_len, S, 128), limbs moved up by d."""
    L = a.shape[0]
    take = min(L, out_len - d)
    body = a[:take]
    pads = [(d, out_len - d - take)] + [(0, 0)] * (a.ndim - 1)
    return jnp.pad(body, pads)


def _fit(a, out_len: int):
    return _shift_up(a, 0, out_len)


def carry(v, out_len: int):
    """Lazy (L, S, 128) u32 (< 2^31) -> out_len normalized limbs."""
    L = v.shape[0]
    assert L <= out_len, "lazy input longer than carry target"
    v = _fit(v, out_len)
    s = (v & LIMB_MASK) + _shift_up(v >> 16, 1, out_len)
    g = s >> 16
    r = s & LIMB_MASK
    p = (r == LIMB_MASK).astype(jnp.uint32)
    d = 1
    while d < out_len:
        g = g | (p & _shift_up(g, d, out_len))
        p = p & _shift_up(p, d, out_len)
        d *= 2
    return (r + _shift_up(g, 1, out_len)) & LIMB_MASK


def _scalar_col(vals, tail):
    """Per-limb host scalars -> (L, *tail) via scalar splats (array-shaped
    captured constants are rejected inside pallas kernels)."""
    return jnp.stack([jnp.full(tail, int(x), jnp.uint32) for x in vals], axis=0)


def _cond_sub(v, m17: np.ndarray):
    """v (17, S, 128) normalized; subtract m when v >= m."""
    L = v.shape[0]
    mbar = _scalar_col([LIMB_MASK - int(x) for x in m17[:L]], v.shape[1:])
    one0 = jnp.pad(
        jnp.ones((1,) + v.shape[1:], jnp.uint32),
        [(0, L - 1)] + [(0, 0)] * (v.ndim - 1),
    )
    s = v + mbar + one0
    ext = jnp.concatenate([s, jnp.zeros((1,) + v.shape[1:], jnp.uint32)], axis=0)
    full = carry(ext, L + 1)
    take = full[L] == 1
    return jnp.where(take, full[:L], v)


def _colsum_mx(lo, hi):
    """lo/hi (16,16,S,128) u32 < 2^16 -> (32,S,128) lazy columns via ONE
    f32 matmul: out[k] = sum_{r+c==k} lo[r,c] + sum_{r+c==k-1} hi[r,c].
    The (32, 512) indicator matrix is built in-kernel from iotas (captured
    array constants are rejected inside pallas kernels); every partial sum
    is <= 32 terms < 2^21 — exact in f32."""
    S = lo.shape[2]
    tail = S * 128
    flat = (
        jnp.concatenate([lo.reshape(256, tail), hi.reshape(256, tail)], axis=0)
        .astype(jnp.int32)  # Mosaic has no u32->f32 cast; values < 2^16
        .astype(jnp.float32)
    )  # (512, S*128): lo rows, then hi rows
    rc = jax.lax.broadcasted_iota(jnp.int32, (32, 512), 1)
    k = jax.lax.broadcasted_iota(jnp.int32, (32, 512), 0)
    pos = rc % 256
    tgt = pos // 16 + pos % 16 + (rc >= 256).astype(jnp.int32)
    M = (tgt == k).astype(jnp.float32)
    out = jax.lax.dot_general(
        M, flat, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    return out.astype(jnp.int32).astype(jnp.uint32).reshape(32, S, 128)


def mul_wide(a, b):
    """(16,S,128) x (16,S,128) canonical -> (32,S,128) LAZY (< 2^21).

    Shear trick: lo/hi halves of the exact 16x16 partial products are
    column-aligned with ONE leading-dim pad+reshape, then summed with 15
    static adds (Mosaic has no u32 reductions). BPPP_COLSUM selects the
    reduction strategy (see module header)."""
    pp = a[:, None] * b[None, :]  # (16, 16, S, 128)
    lo = pp & LIMB_MASK
    hi = pp >> 16
    if _COLSUM == "mx":
        return _colsum_mx(lo, hi)

    def colsum(x):  # (16, 16, S, 128) -> (31, S, 128)
        R, C = 16, 16
        W = C + R
        padded = jnp.pad(x, [(0, 0), (0, R)] + [(0, 0)] * (x.ndim - 2))
        flat = padded.reshape((R * W,) + x.shape[2:])
        sheared = flat[: R * W - R].reshape((R, W - 1) + x.shape[2:])
        if _COLSUM == "tree":
            parts = [sheared[i] for i in range(R)]
            while len(parts) > 1:
                parts = [
                    parts[i] + parts[i + 1] if i + 1 < len(parts) else parts[i]
                    for i in range(0, len(parts), 2)
                ]
            return parts[0]
        acc = sheared[0]
        for i in range(1, R):
            acc = acc + sheared[i]
        return acc

    lo_c = colsum(lo)
    hi_c = colsum(hi)
    return _fit(lo_c, 32) + _shift_up(hi_c, 1, 32)


def _fold_p(wide_lazy):
    """LAZY (32,S,128) -> canonical (16,S,128) mod p."""
    L, H = wide_lazy[:16], wide_lazy[16:]
    t = (
        _fit(L, 19)
        + _fit(H * np.uint32(977), 19)
        + _shift_up(H, 2, 19)
    )
    t = carry(t, 19)
    L2, H2 = t[:16], t[16:19]
    t2 = _fit(L2, 17) + _fit(H2 * np.uint32(977), 17) + _shift_up(H2, 2, 17)
    t2 = carry(t2, 17)
    return _cond_sub(t2, _P17)[:16]


def _mul_const_9(h, out_len: int):
    """h (Lh,S,128) x 9-limb constant C_N -> lazy (out_len,S,128)."""
    acc = None
    for j, cj in enumerate(_CN9):
        if cj == 0:
            continue
        p = h * np.uint32(cj)
        lo = _shift_up(p & LIMB_MASK, j, out_len)
        hi = _shift_up(p >> 16, j + 1, out_len)
        term = lo + hi
        acc = term if acc is None else acc + term
    return acc if acc is not None else jnp.zeros((out_len,) + h.shape[1:], jnp.uint32)


def _fold_n(wide_lazy):
    """LAZY (<=32,S,128) -> canonical mod n (value must fit the window)."""
    t = carry(wide_lazy, wide_lazy.shape[0])
    while t.shape[0] > 17:
        Lo, Hi = t[:16], t[16:]
        prod = carry(_mul_const_9(Hi, Hi.shape[0] + 9), Hi.shape[0] + 9)
        m = max(16, prod.shape[0])
        nxt = 25 if t.shape[0] > 25 else (18 if t.shape[0] > 18 else 17)
        t = carry(_fit(Lo, m) + _fit(prod, m), nxt)
    if t.shape[0] < 17:
        t = carry(t, 17)
    return _cond_sub(t, _N17)[:16]


def mul_p(a, b):
    return _fold_p(mul_wide(a, b))


def mul_n(a, b):
    return _fold_n(mul_wide(a, b))


def add_p(a, b):
    return _cond_sub(carry(a + b, 17), _P17)[:16]


def sub_p(a, b):
    """(a + p - b) mod p via the 17-limb complement window."""
    m = _scalar_col(_P17, a.shape[1:])
    bbar = LIMB_MASK - b
    top = jnp.full((1,) + a.shape[1:], LIMB_MASK, dtype=jnp.uint32)
    s = jnp.concatenate([a + bbar, top], axis=0) + m
    one = jnp.pad(
        jnp.ones((1,) + a.shape[1:], jnp.uint32),
        [(0, 16)] + [(0, 0)] * (a.ndim - 1),
    )
    return _cond_sub(carry(s + one, 17), _P17)[:16]


def add_n(a, b):
    return _cond_sub(carry(a + b, 17), _N17)[:16]


def sub_n(a, b):
    m = _scalar_col(_N17, a.shape[1:])
    bbar = LIMB_MASK - b
    top = jnp.full((1,) + a.shape[1:], LIMB_MASK, dtype=jnp.uint32)
    s = jnp.concatenate([a + bbar, top], axis=0) + m
    one = jnp.pad(
        jnp.ones((1,) + a.shape[1:], jnp.uint32),
        [(0, 16)] + [(0, 0)] * (a.ndim - 1),
    )
    return _cond_sub(carry(s + one, 17), _N17)[:16]


def is_zero(a):
    acc = a[0] == 0
    for i in range(1, a.shape[0]):
        acc = jnp.logical_and(acc, a[i] == 0)
    return acc


def select(mask, a, b):
    """mask (S,128) bool -> limbwise select on stacked elements."""
    return jnp.where(mask[None], a, b)


# -- stacked-form point ops ---------------------------------------------

def pt_dbl(X, Y, Z):
    """dbl-2009-l (a=0), stacked coords (16,S,128)."""
    A = mul_p(X, X)
    Bb = mul_p(Y, Y)
    C = mul_p(Bb, Bb)
    t = add_p(X, Bb)
    D = sub_p(sub_p(mul_p(t, t), A), C)
    D = add_p(D, D)
    E = add_p(add_p(A, A), A)
    F = mul_p(E, E)
    X3 = sub_p(F, add_p(D, D))
    C8 = add_p(C, C)
    C8 = add_p(C8, C8)
    C8 = add_p(C8, C8)
    Y3 = sub_p(mul_p(E, sub_p(D, X3)), C8)
    Z3 = mul_p(add_p(Y, Y), Z)
    return X3, Y3, Z3


def pt_add_mixed(px, py, pz, qx, qy):
    """Complete masked mixed add: p (Jacobian, stacked coords) + q
    (affine, z=1 implied; all-zero coords = identity). madd-2007-bl
    shape — saves the Z2Z2/S1 scalings of the full add. Mirrors
    curve.pt_add_mixed semantics."""
    Z1Z1 = mul_p(pz, pz)
    U2 = mul_p(qx, Z1Z1)
    S2 = mul_p(qy, mul_p(pz, Z1Z1))
    H = sub_p(U2, px)
    r = sub_p(S2, py)
    HH = mul_p(H, H)
    HHH = mul_p(H, HH)
    V = mul_p(px, HH)
    rr = mul_p(r, r)
    X3 = sub_p(sub_p(rr, HHH), add_p(V, V))
    Y3 = sub_p(mul_p(r, sub_p(V, X3)), mul_p(py, HHH))
    Z3 = mul_p(pz, H)

    h_zero = is_zero(H)
    r_zero = is_zero(r)
    p_id = is_zero(pz)
    q_id = jnp.logical_and(is_zero(qx), is_zero(qy))

    dX, dY, dZ = pt_dbl(px, py, pz)
    dbl_m = jnp.logical_and(
        jnp.logical_not(p_id), jnp.logical_and(h_zero, r_zero)
    )
    X3 = select(dbl_m, dX, X3)
    Y3 = select(dbl_m, dY, Y3)
    Z3 = select(dbl_m, dZ, Z3)

    zero = jnp.zeros_like(px)
    one = jnp.pad(
        jnp.ones((1,) + px.shape[1:], jnp.uint32),
        [(0, 15)] + [(0, 0)] * (px.ndim - 1),
    )
    inv_m = jnp.logical_and(
        jnp.logical_not(p_id), jnp.logical_and(h_zero, jnp.logical_not(r_zero))
    )
    X3 = select(inv_m, zero, X3)
    Y3 = select(inv_m, one, Y3)
    Z3 = select(inv_m, zero, Z3)

    # p identity -> q (affine lift); q identity -> p — q_id wins when both
    X3 = select(p_id, qx, X3)
    Y3 = select(p_id, qy, Y3)
    Z3 = select(p_id, one, Z3)
    X3 = select(q_id, px, X3)
    Y3 = select(q_id, py, Y3)
    Z3 = select(q_id, pz, Z3)
    return X3, Y3, Z3


def pt_add_mixed_inc(px, py, pz, qx, qy):
    """INCOMPLETE masked mixed add: p (Jacobian) + q (affine; all-zero
    coords = identity). Handles the identity cases (p_id / q_id) but NOT
    the doubling/inverse collisions p == ±q: those lanes degrade to the
    identity encoding (H = 0 ⇒ Z3 = 0). Safe whenever a collision implies
    a nontrivial DLOG relation between the operands — true for every
    verifier MSM whose scalars are Fiat-Shamir challenges and for table
    chains [k]P + P with 2 <= k < 15 on a prime-order curve. Saves the
    full pt_dbl body (~8 muls) vs pt_add_mixed."""
    Z1Z1 = mul_p(pz, pz)
    U2 = mul_p(qx, Z1Z1)
    S2 = mul_p(qy, mul_p(pz, Z1Z1))
    H = sub_p(U2, px)
    r = sub_p(S2, py)
    HH = mul_p(H, H)
    HHH = mul_p(H, HH)
    V = mul_p(px, HH)
    rr = mul_p(r, r)
    X3 = sub_p(sub_p(rr, HHH), add_p(V, V))
    Y3 = sub_p(mul_p(r, sub_p(V, X3)), mul_p(py, HHH))
    Z3 = mul_p(pz, H)

    p_id = is_zero(pz)
    q_id = jnp.logical_and(is_zero(qx), is_zero(qy))
    one = jnp.pad(
        jnp.ones((1,) + px.shape[1:], jnp.uint32),
        [(0, 15)] + [(0, 0)] * (px.ndim - 1),
    )
    X3 = select(p_id, qx, X3)
    Y3 = select(p_id, qy, Y3)
    Z3 = select(p_id, one, Z3)
    X3 = select(q_id, px, X3)
    Y3 = select(q_id, py, Y3)
    Z3 = select(q_id, pz, Z3)
    return X3, Y3, Z3


def pt_add_inc(px, py, pz, qx, qy, qz):
    """INCOMPLETE masked Jacobian add: identity cases handled, doubling /
    inverse collisions degrade to identity (see pt_add_mixed_inc for the
    safety argument). Saves the pt_dbl body + collision masks."""
    Z1Z1 = mul_p(pz, pz)
    Z2Z2 = mul_p(qz, qz)
    U1 = mul_p(px, Z2Z2)
    U2 = mul_p(qx, Z1Z1)
    S1 = mul_p(py, mul_p(qz, Z2Z2))
    S2 = mul_p(qy, mul_p(pz, Z1Z1))
    H = sub_p(U2, U1)
    r = sub_p(S2, S1)
    HH = mul_p(H, H)
    HHH = mul_p(H, HH)
    V = mul_p(U1, HH)
    rr = mul_p(r, r)
    X3 = sub_p(sub_p(rr, HHH), add_p(V, V))
    Y3 = sub_p(mul_p(r, sub_p(V, X3)), mul_p(S1, HHH))
    Z3 = mul_p(mul_p(pz, qz), H)

    p_id = is_zero(pz)
    q_id = is_zero(qz)
    X3 = select(q_id, px, X3)
    Y3 = select(q_id, py, Y3)
    Z3 = select(q_id, pz, Z3)
    X3 = select(p_id, qx, X3)
    Y3 = select(p_id, qy, Y3)
    Z3 = select(p_id, qz, Z3)
    return X3, Y3, Z3


def pt_add(px, py, pz, qx, qy, qz):
    """Complete masked Jacobian add, stacked coords — mirrors curve.pt_add."""
    Z1Z1 = mul_p(pz, pz)
    Z2Z2 = mul_p(qz, qz)
    U1 = mul_p(px, Z2Z2)
    U2 = mul_p(qx, Z1Z1)
    S1 = mul_p(py, mul_p(qz, Z2Z2))
    S2 = mul_p(qy, mul_p(pz, Z1Z1))
    H = sub_p(U2, U1)
    r = sub_p(S2, S1)
    HH = mul_p(H, H)
    HHH = mul_p(H, HH)
    V = mul_p(U1, HH)
    rr = mul_p(r, r)
    X3 = sub_p(sub_p(rr, HHH), add_p(V, V))
    Y3 = sub_p(mul_p(r, sub_p(V, X3)), mul_p(S1, HHH))
    Z3 = mul_p(mul_p(pz, qz), H)

    h_zero = is_zero(H)
    r_zero = is_zero(r)
    p_id = is_zero(pz)
    q_id = is_zero(qz)
    neither = jnp.logical_not(jnp.logical_or(p_id, q_id))

    dX, dY, dZ = pt_dbl(px, py, pz)
    dbl_m = jnp.logical_and(neither, jnp.logical_and(h_zero, r_zero))
    X3 = select(dbl_m, dX, X3)
    Y3 = select(dbl_m, dY, Y3)
    Z3 = select(dbl_m, dZ, Z3)

    zero = jnp.zeros_like(px)
    one = jnp.pad(
        jnp.ones((1,) + px.shape[1:], jnp.uint32),
        [(0, 15)] + [(0, 0)] * (px.ndim - 1),
    )
    inv_m = jnp.logical_and(neither, jnp.logical_and(h_zero, jnp.logical_not(r_zero)))
    X3 = select(inv_m, zero, X3)
    Y3 = select(inv_m, one, Y3)
    Z3 = select(inv_m, zero, Z3)

    X3 = select(q_id, px, X3)
    Y3 = select(q_id, py, Y3)
    Z3 = select(q_id, pz, Z3)
    X3 = select(p_id, qx, X3)
    Y3 = select(p_id, qy, Y3)
    Z3 = select(p_id, qz, Z3)
    return X3, Y3, Z3
