"""secp256k1 field arithmetic, limb-vectorized for TPU (JAX).

Replaces the k256 crate's scalar/base field engines (SURVEY.md §2 rows
10-11) with a batched execution model: a field element is a uint32 array
of shape (16, *batch) — 16 little-endian limbs of 16 bits, **limb-major**
so the batch dimension maps onto TPU vector lanes and every op below is
one VPU instruction per limb across the whole batch.

Why 16x16-bit limbs: TPUs have no u64 and 32x32 products overflow; with
16-bit limbs every partial product fits uint32 exactly, and lazy
column-accumulation stays < 2^21 so carry propagation is deferred to one
pass per multiply.

Reduction is fold-based (no Montgomery domain, values stay canonical):
  * F_p:  p = 2^256 - 2^32 - 977, so 2^256 = 2^32 + 977 (mod p);
          two folds + one conditional subtract reach canonical form.
  * F_n:  2^256 = C (mod n) with C = 2^256 - n (129 bits);
          three folds + one conditional subtract.

All functions broadcast over arbitrary trailing batch shapes; leading
axes (e.g. vector length) broadcast too as long as the limb axis is
axis 0 of the element... operationally every helper treats axis 0 as
limbs and the rest as batch.
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


P_LIMBS = int_to_limbs(P_INT)
N_LIMBS = int_to_limbs(N_INT)
C_N_LIMBS_9 = int_to_limbs(C_N_INT, 9)
P_LIMBS_17 = int_to_limbs(P_INT, 17)
N_LIMBS_17 = int_to_limbs(N_INT, 17)


def _shift_up(a, d: int):
    """Shift limbs toward higher indices by d (zeros shift in at the bottom)."""
    pad = jnp.zeros((d,) + a.shape[1:], a.dtype)
    return jnp.concatenate([pad, a[:-d]], axis=0)


def _carry(v, out_len: int):
    """Propagate carries over lazy uint32 limbs -> out_len normalized limbs.

    v: (L, *batch) uint32 with entries < 2^31, L <= out_len (or the value
    must fit/wrap mod 2^(16*out_len)). Log-depth: one local split pass
    (carries < 2^15) leaves per-limb carries in {0,1}; the remaining
    ripple (only through 0xFFFF limbs) is a Kogge-Stone prefix over
    (generate, propagate) bits — ~5 steps instead of a 32-step chain.
    Carry out of the top limb is dropped (mod 2^(16*out_len))."""
    v = v.astype(jnp.uint32)
    L = v.shape[0]
    if L < out_len:
        v = jnp.concatenate(
            [v, jnp.zeros((out_len - L,) + v.shape[1:], jnp.uint32)], axis=0
        )
    elif L > out_len:
        raise ValueError("lazy input longer than carry target")
    s = (v & LIMB_MASK) + _shift_up(v >> LIMB_BITS, 1)  # < 2^16 + 2^15
    g = s >> LIMB_BITS  # {0, 1}
    r = s & LIMB_MASK
    p = (r == LIMB_MASK).astype(jnp.uint32)
    d = 1
    while d < out_len:
        g = g | (p & _shift_up(g, d))
        p = p & _shift_up(p, d)
        d *= 2
    return (r + _shift_up(g, 1)) & LIMB_MASK


def _propagate_with_carry(s):
    """Like _carry but returns (limbs, carry_out_of_window). s entries
    must be < 2^31; the value may exceed the window by at most one bit."""
    L = s.shape[0]
    ext = jnp.concatenate([s, jnp.zeros((1,) + s.shape[1:], s.dtype)], axis=0)
    full = _carry(ext, L + 1)
    return full[:L], full[L]


def _const(c: np.ndarray, ndim: int):
    """Host (L, 1) limb constant -> (L, 1, 1, ...) broadcastable to ndim dims."""
    return jnp.asarray(c.reshape((c.shape[0],) + (1,) * (ndim - 1)))


def _cond_sub(v, m_limbs: np.ndarray):
    """If v >= m, return v - m, else v. v: (L, *batch) normalized limbs,
    m_limbs: (L, 1) host constant. Two's-complement add of ~m + 1; the
    carry out of the window is exactly the (v >= m) predicate."""
    L = v.shape[0]
    assert m_limbs.shape[0] == L
    mbar = _const((LIMB_MASK - m_limbs.astype(np.int64)).astype(np.uint32), v.ndim)
    s = v.astype(jnp.uint32) + mbar  # <= 2*mask < 2^17
    s = jnp.concatenate([s[:1] + 1, s[1:]], axis=0)
    res, cout = _propagate_with_carry(s)
    return jnp.where((cout == 1), res, v)


def _pad_to(v, offset: int, total: int):
    """Place v's limb axis at [offset, offset+L) inside a total-length axis
    (zero padding elsewhere). Pure pad — never a scatter (XLA scatters are
    catastrophically slow to compile/run)."""
    L = v.shape[0]
    cfg = [(offset, total - offset - L)] + [(0, 0)] * (v.ndim - 1)
    return jnp.pad(v, cfg)


_MUL_MATS: dict = {}


def _mul_mat(La: int, Lb: int) -> jnp.ndarray:
    """Static (La+Lb, 2*La*Lb) 0/1 matrix folding split partial products
    into limb columns: entry lo(i,j) lands in column i+j, hi(i,j) in
    column i+j+1."""
    key = (La, Lb)
    if key not in _MUL_MATS:
        m = np.zeros((La + Lb, 2 * La * Lb), dtype=np.float32)
        for i in range(La):
            for j in range(Lb):
                m[i + j, i * Lb + j] = 1.0
                m[i + j + 1, La * Lb + i * Lb + j] = 1.0
        _MUL_MATS[key] = m
    return jnp.asarray(_MUL_MATS[key])


def _mul_wide(a, b):
    """Schoolbook product of canonical limb arrays as ONE exact f32 matmul.

    a: (La, *batch), b: (Lb, *batch) -> (La+Lb, *batch) normalized limbs.
    Partial products are split lo/hi (each < 2^16); the anti-diagonal
    column reduction is a static 0/1 matrix contraction whose sums stay
    < min(La,Lb)*2^17 <= 2^21 — exact in f32 (24-bit mantissa) and MXU-
    eligible on TPU. One HLO dot instead of 32 pad/adds."""
    La, Lb = a.shape[0], b.shape[0]
    batch = jnp.broadcast_shapes(a.shape[1:], b.shape[1:])
    a = jnp.broadcast_to(a.astype(jnp.uint32), (La,) + batch)
    b = jnp.broadcast_to(b.astype(jnp.uint32), (Lb,) + batch)
    pp = a[:, None] * b[None, :]  # (La, Lb, *batch), exact in uint32
    lo = (pp & LIMB_MASK).reshape((La * Lb,) + batch)
    hi = (pp >> LIMB_BITS).reshape((La * Lb,) + batch)
    flat = jnp.concatenate([lo, hi], axis=0).astype(jnp.float32)
    import jax

    acc = jnp.tensordot(
        _mul_mat(La, Lb), flat, axes=1, precision=jax.lax.Precision.HIGHEST
    )
    return _carry(acc.astype(jnp.uint32), La + Lb)


def _fold_p(wide):
    """Reduce a (32, *batch) normalized limb value mod p (canonical out).

    fold: x = L + H * (2^32 + 977); twice; then one conditional subtract
    (bounds: after fold2 the value is < 2^256 + 2^81 < p + p)."""
    L, H = wide[:16], wide[16:]
    nH = H.shape[0]
    batch = wide.shape[1:]
    # build lazily: positions 0..15 <- L ; 0..nH-1 <- H*977 ; 2..nH+1 <- H
    t = (
        _pad_to(L, 0, 18)
        + _pad_to(H * np.uint32(977), 0, 18)
        + _pad_to(H, 2, 18)
    )
    t = _carry(t, 19)
    # fold 2: H2 = t[16:19] (3 limbs)
    L2, H2 = t[:16], t[16:19]
    t2 = (
        _pad_to(L2, 0, 17)
        + _pad_to(H2 * np.uint32(977), 0, 17)
        + _pad_to(H2, 2, 17)
    )
    t2 = _carry(t2, 17)
    return _cond_sub(t2, P_LIMBS_17)[:16]


def _fold_n(wide):
    """Reduce a (<=32, *batch) normalized limb value mod n (canonical out).

    Three folds by C = 2^256 - n (9 limbs), then one conditional subtract
    (after fold3 the value is < 2^256 + 2^161)."""
    batch = wide.shape[1:]

    def fold(t, hi_len_out):
        Lo, Hi = t[:16], t[16:]
        prod = _mul_wide(Hi, _const(C_N_LIMBS_9, t.ndim))  # (len(Hi)+9, *batch)
        m = max(16, prod.shape[0])
        acc = _pad_to(Lo, 0, m) + _pad_to(prod, 0, m)
        return _carry(acc, hi_len_out)

    t = fold(wide, 25) if wide.shape[0] > 16 else _carry(wide, 17)
    if t.shape[0] > 17:
        t = fold(t, 18)
    if t.shape[0] > 17:
        t = fold(t, 17)
    return _cond_sub(t, N_LIMBS_17)[:16]


# -- public F_p ops -----------------------------------------------------

def fp_add(a, b):
    s = _carry(a.astype(jnp.uint32) + b.astype(jnp.uint32), 17)
    return _cond_sub(s, P_LIMBS_17)[:16]


def _mod_sub(a, b, m17: np.ndarray):
    """(a + m - b) mod m over 17 limbs: complement-of-b trick keeps every
    lazy limb < 3*2^16, one log-depth carry, one conditional subtract."""
    bbar16 = LIMB_MASK - b.astype(jnp.uint32)  # complement of b's 16 limbs
    batch = a.shape[1:]
    top = jnp.full((1,) + batch, LIMB_MASK, dtype=jnp.uint32)  # limb 16 of ~b_ext
    s = jnp.concatenate([a.astype(jnp.uint32) + bbar16, top], axis=0)
    s = s + _const(m17, s.ndim)
    s = jnp.concatenate([s[:1] + 1, s[1:]], axis=0)
    # value = a + m - b + 2^272; the 2^272 drops out of the 17-limb window
    return _cond_sub(_carry(s, 17), m17)[:16]


def fp_sub(a, b):
    return _mod_sub(a, b, P_LIMBS_17)


def fp_neg(a):
    return fp_sub(jnp.zeros_like(a), a)


def fp_mul(a, b):
    return _fold_p(_mul_wide(a, b))


def fp_sqr(a):
    return fp_mul(a, a)


def fp_is_zero(a):
    return jnp.all(a == 0, axis=0)


def fp_pow_const(x, e: int):
    """x^e for a host-static exponent via 4-bit fixed windows (digits are
    static, so table selection is compile-time — no gathers)."""
    return _pow_const(x, e, fp_mul)


def fp_inv(x):
    """Fermat: x^(p-2). x must be nonzero (masked upstream for identity)."""
    return fp_pow_const(x, P_INT - 2)


def fp_sqrt(x):
    """x^((p+1)/4) — square root when x is a QR (p = 3 mod 4)."""
    return fp_pow_const(x, (P_INT + 1) // 4)


# -- public F_n ops -----------------------------------------------------

def fn_add(a, b):
    s = _carry(a.astype(jnp.uint32) + b.astype(jnp.uint32), 17)
    return _cond_sub(s, N_LIMBS_17)[:16]


def fn_sub(a, b):
    return _mod_sub(a, b, N_LIMBS_17)


def fn_neg(a):
    return fn_sub(jnp.zeros_like(a), a)


def fn_mul(a, b):
    return _fold_n(_mul_wide(a, b))


def fn_is_zero(a):
    return jnp.all(a == 0, axis=0)


def fn_pow_const(x, e: int):
    return _pow_const(x, e, fn_mul)


def fn_inv(x):
    return fn_pow_const(x, N_INT - 2)


def fn_sum(vals):
    """Mod-n sum over axis 0 of a (L, 16, *batch) stack of canonical
    elements — lazy limb sum (safe for L <= 2^15) then one fold."""
    s = jnp.sum(vals.astype(jnp.uint32), axis=0)
    return _fold_n(_carry(s, 18))


# -- shared helpers -----------------------------------------------------

def _pow_const(x, e: int, mul):
    """x^e for a host-static exponent: 4-bit windows, lax.scan over the
    (static) digit schedule so the compiled graph is O(1) in exponent
    size (a fully unrolled 256-bit Fermat ladder blows up XLA compile
    time)."""
    import jax
    import jax.lax as lax

    assert e > 0
    ndig = max(1, (e.bit_length() + 3) // 4)
    digits = jnp.asarray(
        [(e >> (4 * (ndig - 1 - i))) & 15 for i in range(ndig)], dtype=jnp.uint32
    )
    # table[d] = x^d, with x^0 = 1 so the scan body is branch-free; built
    # under a scan so only ONE mul body is traced/compiled.
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


def scalar_from_u64(x):
    """Lift a traced/static uint64-ish value (given as python int or
    (batch,) uint32 pair) — host path only supports python int."""
    if isinstance(x, int):
        return jnp.asarray(int_to_limbs(x))
    raise TypeError("scalar_from_u64 expects a python int on host")


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
