"""secp256k1 field arithmetic, limb-vectorized for TPU (JAX).

Replaces the k256 crate's scalar/base field engines (SURVEY.md §2 rows
10-11) with a batched execution model: a field element is a uint32 array
of shape (16, *batch) — 16 little-endian limbs of 16 bits, **limb-major**
so the batch dimension maps onto TPU vector lanes.

Why 16x16-bit limbs: TPUs have no u64 and 32x32 products overflow; with
16-bit limbs every partial product fits uint32 exactly, and lazy
column-accumulation stays < 2^21 so carry propagation is deferred to one
pass per multiply.

Internals work on **rows** — Python lists of (*batch,)-shaped arrays, one
per limb. Every operation is then a straight-line sequence of same-shaped
elementwise u32 ops that XLA fuses into a handful of kernels; limb shifts
are list re-indexing at trace time. (The previous array-shaped internals
used pad/concatenate for limb alignment, which broke fusion and made
every field op HBM-bound: measured 84-97 ns/lane on a v5e vs ~2 ns/lane
for this formulation.)

Reduction is fold-based (no Montgomery domain, values stay canonical):
  * F_p:  p = 2^256 - 2^32 - 977, so 2^256 = 2^32 + 977 (mod p);
          two folds + one conditional subtract reach canonical form.
  * F_n:  2^256 = C (mod n) with C = 2^256 - n (129 bits);
          three folds + one conditional subtract.

All public functions broadcast over arbitrary trailing batch shapes;
axis 0 is always the limb axis.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..oracle.field import N as N_INT
from ..oracle.field import P as P_INT

NLIMBS = 16
LIMB_BITS = 16
LIMB_MASK = 0xFFFF

# 2^256 mod n — the scalar-field fold constant (129 bits -> 9 limbs).
C_N_INT = (1 << 256) - N_INT


def int_to_limbs(x: int, nlimbs: int = NLIMBS) -> np.ndarray:
    """Host: python int -> (nlimbs, 1) uint32 limb column (broadcastable)."""
    out = np.zeros((nlimbs, 1), dtype=np.uint32)
    for i in range(nlimbs):
        out[i, 0] = (x >> (LIMB_BITS * i)) & LIMB_MASK
    return out


def limbs_to_int(a) -> int:
    """Host: (nlimbs,) or (nlimbs, 1) limb array -> python int."""
    a = np.asarray(a).reshape(a.shape[0], -1)
    assert a.shape[1] == 1, "limbs_to_int expects a single element"
    return sum(int(a[i, 0]) << (LIMB_BITS * i) for i in range(a.shape[0]))


def ints_to_limbs(xs, nlimbs: int = NLIMBS) -> np.ndarray:
    """Host: list of ints -> (nlimbs, B) uint32."""
    return np.concatenate([int_to_limbs(x, nlimbs) for x in xs], axis=1)


def limbs_to_ints(a) -> list[int]:
    a = np.asarray(a)
    return [
        sum(int(a[i, j]) << (LIMB_BITS * i) for i in range(a.shape[0]))
        for j in range(a.shape[1])
    ]


def _int_limbs(x: int, n: int) -> list[int]:
    return [(x >> (LIMB_BITS * i)) & LIMB_MASK for i in range(n)]


P_ROWS_17 = _int_limbs(P_INT, 17)
N_ROWS_17 = _int_limbs(N_INT, 17)
N_LIMBS = int_to_limbs(N_INT)  # kept for transcript challenge reduction
C_N_ROWS_9 = _int_limbs(C_N_INT, 9)

# -- rows <-> array ------------------------------------------------------


def rows(a) -> list:
    """(L, *batch) array -> list of L (*batch,) rows."""
    return [a[i] for i in range(a.shape[0])]


def unrows(rs: list) -> jnp.ndarray:
    return jnp.stack(rs, axis=0)


def _zeros_like(r):
    return jnp.zeros_like(r)


# -- lazy-row primitives ---------------------------------------------------


def _carry_rows(v: list, out_len: int) -> list:
    """Propagate carries over lazy uint32 rows -> out_len normalized rows.

    Entries must be < 2^31. Log-depth: one local split pass (residual
    per-limb carries in {0,1}), then a Kogge-Stone (generate, propagate)
    prefix. Carry out of the top limb is dropped (mod 2^(16*out_len))."""
    v = list(v)
    assert len(v) <= out_len
    zero = _zeros_like(v[0])
    while len(v) < out_len:
        v.append(zero)
    s = [v[0] & LIMB_MASK] + [
        (v[i] & LIMB_MASK) + (v[i - 1] >> LIMB_BITS) for i in range(1, out_len)
    ]
    g = [x >> LIMB_BITS for x in s]  # {0, 1}
    r = [x & LIMB_MASK for x in s]
    p = [(x == LIMB_MASK).astype(jnp.uint32) for x in r]
    d = 1
    while d < out_len:
        g = [g[i] | (p[i] & g[i - d]) if i >= d else g[i] for i in range(out_len)]
        p = [p[i] & p[i - d] if i >= d else p[i] for i in range(out_len)]
        d *= 2
    return [r[0] & LIMB_MASK] + [
        (r[i] + g[i - 1]) & LIMB_MASK for i in range(1, out_len)
    ]


def _cond_sub_rows(v: list, m_limbs: list[int]) -> list:
    """If v >= m, return v - m, else v. v: normalized rows; m_limbs: host
    ints, len(m_limbs) == len(v). Two's-complement add of ~m + 1; the
    carry out of the window is exactly the (v >= m) predicate."""
    L = len(v)
    assert len(m_limbs) == L
    s = [v[i] + np.uint32(LIMB_MASK - m_limbs[i]) for i in range(L)]
    s[0] = s[0] + np.uint32(1)
    full = _carry_rows(s + [_zeros_like(v[0])], L + 1)
    take = full[L] == 1
    return [jnp.where(take, full[i], v[i]) for i in range(L)]


def _mul_rows(a: list, b: list) -> list:
    """Schoolbook product of canonical rows -> len(a)+len(b) normalized
    rows. Each 16x16 partial product is exact in uint32; lo/hi halves
    accumulate into lazy columns < 2^21. Straight-line elementwise u32."""
    La, Lb = len(a), len(b)
    if La > Lb:
        a, b, La, Lb = b, a, Lb, La
    out_len = La + Lb
    zero = _zeros_like(a[0])
    acc = [None] * out_len
    for i in range(La):
        for j in range(Lb):
            p = a[i] * b[j]  # exact: (2^16-1)^2 < 2^32
            lo = p & LIMB_MASK
            hi = p >> LIMB_BITS
            k = i + j
            acc[k] = lo if acc[k] is None else acc[k] + lo
            acc[k + 1] = hi if acc[k + 1] is None else acc[k + 1] + hi
    acc = [zero if x is None else x for x in acc]
    return _carry_rows(acc, out_len)


def _mul_rows_const(a: list, c_limbs: list[int]) -> list:
    """a * host-constant (skips zero limbs of the constant)."""
    La, Lc = len(a), len(c_limbs)
    out_len = La + Lc
    zero = _zeros_like(a[0])
    acc = [None] * out_len
    for j, cj in enumerate(c_limbs):
        if cj == 0:
            continue
        cj32 = np.uint32(cj)
        for i in range(La):
            p = a[i] * cj32
            lo = p & LIMB_MASK
            hi = p >> LIMB_BITS
            k = i + j
            acc[k] = lo if acc[k] is None else acc[k] + lo
            acc[k + 1] = hi if acc[k + 1] is None else acc[k + 1] + hi
    acc = [zero if x is None else x for x in acc]
    return _carry_rows(acc, out_len)


def _fold_p_rows(wide: list) -> list:
    """Reduce 32 normalized rows mod p (canonical 16 rows out).

    fold: x = L + H * (2^32 + 977); twice; then one conditional subtract."""
    L, H = wide[:16], wide[16:]
    # t = L + H*977 + (H << 2 limbs); lazy entries < 2^16 + 977*2^16 + 2^16 < 2^26
    t = [None] * 19
    for i in range(16):
        t[i] = L[i]
    c977 = np.uint32(977)
    for i, h in enumerate(H):
        p = h * c977  # < 977 * 2^16 < 2^26
        t[i] = t[i] + (p & LIMB_MASK) if i < 16 else p & LIMB_MASK
        nxt = p >> LIMB_BITS
        if t[i + 1] is None:
            t[i + 1] = nxt
        else:
            t[i + 1] = t[i + 1] + nxt
        if t[i + 2] is None:
            t[i + 2] = h
        else:
            t[i + 2] = t[i + 2] + h
    zero = _zeros_like(wide[0])
    t = [zero if x is None else x for x in t]
    t = _carry_rows(t, 19)
    # fold 2: H2 = t[16:19]
    L2, H2 = t[:16], t[16:19]
    t2 = list(L2) + [zero, zero]
    for i, h in enumerate(H2):
        p = h * c977
        t2[i] = t2[i] + (p & LIMB_MASK)
        t2[i + 1] = t2[i + 1] + (p >> LIMB_BITS)
        t2[i + 2] = t2[i + 2] + h
    t2 = _carry_rows(t2[:17], 17)
    return _cond_sub_rows(t2, P_ROWS_17)[:16]


def _fold_n_rows(wide: list) -> list:
    """Reduce <= 32 normalized rows mod n (canonical 16 rows out).

    Three folds by C = 2^256 - n (9 limbs), then one conditional sub."""
    zero = _zeros_like(wide[0])

    def fold(t: list, out_hi: int) -> list:
        lo, hi = t[:16], t[16:]
        prod = _mul_rows_const(hi, C_N_ROWS_9)  # len(hi)+9 rows
        m = max(16, len(prod))
        acc = [
            (lo[i] if i < 16 else zero) + (prod[i] if i < len(prod) else zero)
            for i in range(m)
        ]
        return _carry_rows(acc, out_hi)

    t = fold(wide, 25) if len(wide) > 16 else _carry_rows(wide, 17)
    if len(t) > 17:
        t = fold(t, 18)
    if len(t) > 17:
        t = fold(t, 17)
    return _cond_sub_rows(t, N_ROWS_17)[:16]


def _add_rows_mod(a: list, b: list, m17: list[int]) -> list:
    s = [a[i] + b[i] for i in range(16)]
    return _cond_sub_rows(_carry_rows(s, 17), m17)[:16]


def _sub_rows_mod(a: list, b: list, m17: list[int]) -> list:
    """(a + m - b) mod m over 17 limbs via the complement of b."""
    s = [a[i] + (LIMB_MASK - b[i]) + np.uint32(m17[i]) for i in range(16)]
    s.append(jnp.full_like(a[0], LIMB_MASK) + np.uint32(m17[16]))
    s[0] = s[0] + np.uint32(1)
    # value = a + m - b + 2^272; the 2^272 drops out of the 17-limb window
    return _cond_sub_rows(_carry_rows(s, 17), m17)[:16]


# -- array-level internals (compact HLO for the XLA path) -----------------
#
# The rows functions above unroll ~1k elementwise ops per multiply —
# ideal inside a single Pallas kernel, but they blow up XLA graph size
# (compile time) when every protocol-level field op is built from them.
# The array formulation below expresses the same math in ~20 fusible HLO
# ops per multiply using a shear trick for the anti-diagonal column sums.


def _shift_up(a, d: int):
    """Shift limbs toward higher indices by d (zeros shift in)."""
    pad = jnp.zeros((d,) + a.shape[1:], a.dtype)
    return jnp.concatenate([pad, a[:-d]], axis=0)


def _carry_arr(v, out_len: int):
    """Array Kogge-Stone carry: lazy (L, *batch) uint32 (< 2^31) ->
    out_len normalized limbs; overflow past the window drops."""
    v = v.astype(jnp.uint32)
    L = v.shape[0]
    if L < out_len:
        v = jnp.concatenate(
            [v, jnp.zeros((out_len - L,) + v.shape[1:], jnp.uint32)], axis=0
        )
    elif L > out_len:
        raise ValueError("lazy input longer than carry target")
    s = (v & LIMB_MASK) + _shift_up(v >> LIMB_BITS, 1)
    g = s >> LIMB_BITS
    r = s & LIMB_MASK
    p = (r == LIMB_MASK).astype(jnp.uint32)
    d = 1
    while d < out_len:
        g = g | (p & _shift_up(g, d))
        p = p & _shift_up(p, d)
        d *= 2
    return (r + _shift_up(g, 1)) & LIMB_MASK


def _cond_sub_arr(v, m_limbs: list[int]):
    """If v >= m, v - m, else v; v (L, *batch) normalized."""
    L = v.shape[0]
    assert len(m_limbs) == L
    mbar = np.asarray(
        [LIMB_MASK - x for x in m_limbs], dtype=np.uint32
    ).reshape((L,) + (1,) * (v.ndim - 1))
    s = v + jnp.asarray(mbar)
    s = jnp.concatenate([s[:1] + 1, s[1:]], axis=0)
    ext = jnp.concatenate([s, jnp.zeros((1,) + s.shape[1:], s.dtype)], axis=0)
    full = _carry_arr(ext, L + 1)
    return jnp.where(full[L] == 1, full[:L], v)


def _shear_colsum(pp):
    """pp: (R, C, *batch) u32 -> (R+C-1, *batch) anti-diagonal column sums
    out[k] = sum_i pp[i, k-i], via pad-flatten-reshape (no per-row pads)."""
    R, C = pp.shape[0], pp.shape[1]
    batch = pp.shape[2:]
    W = C + R
    padded = jnp.pad(pp, [(0, 0), (0, R)] + [(0, 0)] * len(batch))
    flat = padded.reshape((R * W,) + batch)
    sheared = flat[: R * W - R].reshape((R, W - 1) + batch)
    return jnp.sum(sheared, axis=0)  # (C + R - 1, *batch)


def _mul_wide_arr(a, b):
    """(La, *b) x (Lb, *b) canonical -> (La+Lb, *b) LAZY columns (< 2^21).

    Partial products are exact in uint32 ((2^16-1)^2 < 2^32); lo/hi
    halves are column-summed with the shear trick and recombined with a
    one-limb shift. ~15 HLO ops, all elementwise/reshape — fuses."""
    La, Lb = a.shape[0], b.shape[0]
    batch = jnp.broadcast_shapes(a.shape[1:], b.shape[1:])
    a = jnp.broadcast_to(a.astype(jnp.uint32), (La,) + batch)
    b = jnp.broadcast_to(b.astype(jnp.uint32), (Lb,) + batch)
    pp = a[:, None] * b[None, :]  # (La, Lb, *batch)
    lo = _shear_colsum(pp & LIMB_MASK)  # (La+Lb-1, *batch), < La*2^16
    hi = _shear_colsum(pp >> LIMB_BITS)
    pad_cfg = [(0, 1)] + [(0, 0)] * (lo.ndim - 1)
    acc = jnp.pad(lo, pad_cfg) + _shift_up(jnp.pad(hi, pad_cfg), 1)
    return acc  # (La+Lb, *batch) lazy, < 2*La*2^16 <= 2^21


_C_N_ARR_9 = None


def _fold_p_arr(wide_lazy):
    """LAZY (32, *batch) columns (< 2^21) -> canonical 16 limbs mod p.
    Folds absorb the lazy input directly: x = L + H*(2^32 + 977), where
    H's lazy columns make products < 2^21 * 977 < 2^31."""
    L, H = wide_lazy[:16], wide_lazy[16:]
    nH = H.shape[0]
    t = (
        jnp.pad(L, [(0, 3)] + [(0, 0)] * (L.ndim - 1))
        + jnp.pad(H * np.uint32(977), [(0, 19 - nH)] + [(0, 0)] * (H.ndim - 1))
        + jnp.pad(_shift_up_ext(H, 2, 19), [(0, 0)] + [(0, 0)] * (H.ndim - 1))
    )
    t = _carry_arr(t, 19)
    L2, H2 = t[:16], t[16:19]
    t2 = (
        jnp.pad(L2, [(0, 1)] + [(0, 0)] * (L2.ndim - 1))
        + jnp.pad(H2 * np.uint32(977), [(0, 14)] + [(0, 0)] * (H2.ndim - 1))
        + jnp.pad(_shift_up_ext(H2, 2, 5), [(0, 12)] + [(0, 0)] * (H2.ndim - 1))
    )
    t2 = _carry_arr(t2, 17)
    return _cond_sub_arr(t2, P_ROWS_17)[:16]


def _shift_up_ext(a, d: int, total: int):
    """Place a's limbs at offset d in a length-total axis."""
    L = a.shape[0]
    cfg = [(d, total - d - L)] + [(0, 0)] * (a.ndim - 1)
    return jnp.pad(a, cfg)


def _fold_n_arr(wide_lazy):
    """LAZY (<=32, *batch) columns -> canonical mod n. First normalizes
    (carry in place: the represented value must fit the column count,
    true for all call sites), then folds by C = 2^256 - n."""
    wide = _carry_arr(wide_lazy, wide_lazy.shape[0])

    def fold(t, out_len):
        Lo, Hi = t[:16], t[16:]
        prod = _mul_wide_arr(Hi, jnp.asarray(
            np.asarray(C_N_ROWS_9, dtype=np.uint32).reshape((9,) + (1,) * (t.ndim - 1))
        ))
        prod = _carry_arr(prod, prod.shape[0])
        m = max(16, prod.shape[0])
        acc = _shift_up_ext(Lo, 0, m) + _shift_up_ext(prod, 0, m)
        return _carry_arr(acc, out_len)

    t = wide
    while t.shape[0] > 17:
        nxt = 25 if t.shape[0] > 25 else (18 if t.shape[0] > 18 else 17)
        t = fold(t, nxt)
    if t.shape[0] < 17:
        t = _carry_arr(t, 17)
    return _cond_sub_arr(t, N_ROWS_17)[:16]


# -- public F_p ops -----------------------------------------------------


def _bcast2(a, b):
    batch = jnp.broadcast_shapes(a.shape[1:], b.shape[1:])
    return jnp.broadcast_to(a, (16,) + batch), jnp.broadcast_to(b, (16,) + batch)


def fp_add(a, b):
    a, b = _bcast2(a, b)
    s = _carry_arr(a + b, 17)
    return _cond_sub_arr(s, P_ROWS_17)[:16]


def _mod_sub_arr(a, b, m17: list[int]):
    """(a + m - b) mod m over a 17-limb window (complement of b)."""
    bbar = LIMB_MASK - b
    mrow = np.asarray(m17, dtype=np.uint32).reshape((17,) + (1,) * (a.ndim - 1))
    top = jnp.full((1,) + a.shape[1:], LIMB_MASK, dtype=jnp.uint32)
    s = jnp.concatenate([a + bbar, top], axis=0) + jnp.asarray(mrow)
    s = jnp.concatenate([s[:1] + 1, s[1:]], axis=0)
    return _cond_sub_arr(_carry_arr(s, 17), m17)[:16]


def fp_sub(a, b):
    a, b = _bcast2(a, b)
    return _mod_sub_arr(a, b, P_ROWS_17)


def fp_neg(a):
    return fp_sub(jnp.zeros_like(a), a)


def fp_mul(a, b):
    return _fold_p_arr(_mul_wide_arr(a, b))


def fp_sqr(a):
    return fp_mul(a, a)


def fp_is_zero(a):
    return jnp.all(a == 0, axis=0)


def _pallas_pow(x, e: int, kind: str):
    """Fused-ladder dispatch: on TPU with enough lanes, run the whole
    exponentiation in one Pallas call (ops/pallas_msm.py). Returns None
    when the XLA path should be used."""
    from .curve import _pallas_enabled  # shared backend/env switch

    if not _pallas_enabled():
        return None
    batch = x.shape[1:]
    prod = 1
    for d in batch:
        prod *= d
    if prod < 512:
        return None
    from . import pallas_msm as pm
    from .curve import _pallas_bucket

    bucket = _pallas_bucket(prod, pm.TILE, pm.POW_LANE_FLOOR)
    flat = x.reshape(16, prod)
    if bucket != prod:
        flat = jnp.pad(flat, ((0, 0), (0, bucket - prod)))
    out = pm.pow_const_flat(flat, e, kind)
    return out[:, :prod].reshape((16,) + batch)


def fp_pow_const(x, e: int):
    """x^e for a host-static exponent via 4-bit fixed windows."""
    out = _pallas_pow(x, e, "p")
    return out if out is not None else _pow_const(x, e, fp_mul)


def fp_inv(x):
    """Fermat: x^(p-2). fp_inv(0) == 0 (masked upstream for identity)."""
    return fp_pow_const(x, P_INT - 2)


def fp_sqrt(x):
    """x^((p+1)/4) — square root when x is a QR (p = 3 mod 4)."""
    return fp_pow_const(x, (P_INT + 1) // 4)


# -- public F_n ops -----------------------------------------------------


def fn_add(a, b):
    a, b = _bcast2(a, b)
    s = _carry_arr(a + b, 17)
    return _cond_sub_arr(s, N_ROWS_17)[:16]


def fn_sub(a, b):
    a, b = _bcast2(a, b)
    return _mod_sub_arr(a, b, N_ROWS_17)


def fn_neg(a):
    return fn_sub(jnp.zeros_like(a), a)


def fn_mul(a, b):
    return _fold_n_arr(_mul_wide_arr(a, b))


def fn_is_zero(a):
    return jnp.all(a == 0, axis=0)


def fn_pow_const(x, e: int):
    out = _pallas_pow(x, e, "n")
    return out if out is not None else _pow_const(x, e, fn_mul)


def fn_inv(x):
    return fn_pow_const(x, N_INT - 2)


def fn_sum(vals):
    """Mod-n sum over axis 0 of a (L, 16, *batch) stack of canonical
    elements — lazy limb sum (safe for L <= 2^15) then one fold."""
    s = jnp.sum(vals.astype(jnp.uint32), axis=0)
    return _fold_n_arr(_carry_arr(s, 18))


# -- array-level lazy helpers (used by vector layers) ---------------------


def _carry(v, out_len: int):
    """Array-shaped lazy carry (vector-layer lazy sums)."""
    return _carry_arr(v, out_len)


def _fold_n(wide):
    return _fold_n_arr(wide)


def _fold_p(wide):
    return _fold_p_arr(wide)


def _cond_sub(v, m_limbs: np.ndarray):
    """(L, *batch) normalized limbs; m_limbs host (L, 1). Public for the
    transcript's challenge reduction."""
    m = [int(m_limbs[i, 0]) for i in range(m_limbs.shape[0])]
    return _cond_sub_arr(v, m)


# -- shared helpers -----------------------------------------------------


def _pow_const(x, e: int, mul):
    """x^e for a host-static exponent: 4-bit windows, lax.scan over the
    (static) digit schedule; the 16-entry table is built under a scan so
    only one mul body is traced."""
    import jax

    assert e > 0
    ndig = max(1, (e.bit_length() + 3) // 4)
    digits = jnp.asarray(
        [(e >> (4 * (ndig - 1 - i))) & 15 for i in range(ndig)], dtype=jnp.uint32
    )
    one = jnp.zeros_like(x).at[0].set(1)

    def tab_body(acc, _):
        nxt = mul(acc, x)
        return nxt, nxt

    _, rest = jax.lax.scan(tab_body, x, None, length=14)  # x^2 .. x^15
    tab = jnp.concatenate([jnp.stack([one, x], axis=0), rest], axis=0)

    def body(acc, d):
        for _ in range(4):
            acc = mul(acc, acc)
        onehot = jnp.stack(
            [(d == jnp.uint32(k)).astype(jnp.uint32) for k in range(16)], axis=0
        ).reshape((16,) + (1,) * (tab.ndim - 1))
        sel = jnp.sum(tab * onehot, axis=0)
        return mul(acc, sel), None

    acc, _ = jax.lax.scan(body, jnp.broadcast_to(one, x.shape), digits)
    return acc


def select(mask, a, b):
    """Limb-wise select: mask is a batch-shaped bool; a where mask else b."""
    return jnp.where(mask, a, b)


def limbs_lt_const(a, m: int):
    """Canonical-range check: (16, *batch) limbs < python int m ->
    (*batch,) bool. Lexicographic from the most-significant limb (the
    limbs themselves must be normalized 16-bit values, true for
    be_bytes_to_limbs output and all field-op results)."""
    m_limbs = [(m >> (16 * i)) & 0xFFFF for i in range(NLIMBS)]
    lt = jnp.zeros(a.shape[1:], bool)
    eq = jnp.ones(a.shape[1:], bool)
    for i in range(NLIMBS - 1, -1, -1):
        mi = jnp.uint32(m_limbs[i])
        lt = jnp.logical_or(lt, jnp.logical_and(eq, a[i] < mi))
        eq = jnp.logical_and(eq, a[i] == mi)
    return lt


def scalar_from_u64(x):
    if isinstance(x, int):
        return jnp.asarray(int_to_limbs(x))
    raise TypeError("scalar_from_u64 expects a python int on host")


def _const(c: np.ndarray, ndim: int):
    """Host (L, 1) limb constant -> (L, 1, 1, ...) broadcastable."""
    return jnp.asarray(c.reshape((c.shape[0],) + (1,) * (ndim - 1)))


# -- byte conversions (for transcript absorption) -----------------------


def limbs_to_be_bytes(a):
    """(16, *batch) limbs -> (32, *batch) big-endian bytes (uint32-typed)."""
    out = []
    for i in range(NLIMBS - 1, -1, -1):
        out.append((a[i] >> 8) & 0xFF)
        out.append(a[i] & 0xFF)
    return jnp.stack(out, axis=0)


def be_bytes_to_limbs(b):
    """(32, *batch) big-endian bytes -> (16, *batch) limbs."""
    out = []
    for i in range(NLIMBS):
        hi = b[30 - 2 * i]
        lo = b[31 - 2 * i]
        out.append((hi << 8) | lo)
    return jnp.stack(out, axis=0).astype(jnp.uint32)
