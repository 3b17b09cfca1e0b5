"""GLV endomorphism scalar decomposition for secp256k1.

secp256k1 has an efficiently computable endomorphism phi(x, y) =
(beta*x, y) with phi(P) = [lambda]P (beta^3 = 1 in F_p, lambda^3 = 1 in
F_n). Splitting k = k1 + k2*lambda with |k1|, |k2| <~ 2^128 turns a
256-bit shared-window MSM walk (64 windows -> 256 doubles) into a
132-bit walk (33 windows -> 132 doubles) over per-point PAIRS
(P, phi(P)) — and phi(P)'s window table is just beta * (x-entries of
P's table), so the kernel's VMEM tables do not grow.

The reference computes every scalar-mul with k256's generic ladder and
has no endomorphism use (util.rs:46-60 drives naive MSMs); this is a
TPU-side optimization only — proof bytes are unaffected (verified by the
device-vs-oracle protocol tests).

Decomposition (standard lattice rounding, constants as in libsecp256k1):
    c1 = round(k * b2 / n),  c2 = round(k * -b1 / n)
computed exactly in fixed point as (k * G_i) >> 384 with
G_i = round(2^384 * b_i / n) (the +-1 rounding slack only shifts k1/k2
within their |.| < 2^129 budget; 33 windows cover 132 bits), then
    k2 = -(c1*b1 + c2*b2) mod n,   k1 = k - k2*lambda mod n.
Signs: a value in (n/2, n) is the negative -(n - v); the kernel negates
the selected table entry's y per lane instead.

Validated against 20k random + adversarial scalars in
tools/glv_proto.py and against the host oracle in tests.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from . import field as f
from .field import N_INT

LAMBDA = 0x5363AD4CC05C30E0A5261C028812645A122E22EA20816678DF02967C1B23BD72
BETA = 0x7AE96A2B657C07106E64479EAC3434E99CF0497512F58995C1396C28719501EE

_B1_ABS = 0xE4437ED6010E88286F547FA90ABFE4C3  # b1 = -_B1_ABS
_B2 = 0x3086D221A7D46BCDE86C90E49284EB15

_SHIFT = 384
_G1 = ((_B2 << _SHIFT) + N_INT // 2) // N_INT
_G2 = ((_B1_ABS << _SHIFT) + N_INT // 2) // N_INT

# windows of 4 bits covering the |k_i| < 2^129 magnitude budget (+ slack)
GLV_WINDOWS = 33

_G1_LIMBS = f.int_to_limbs(_G1)
_G2_LIMBS = f.int_to_limbs(_G2)
_B1_ABS_LIMBS = f.int_to_limbs(_B1_ABS)
_B2_LIMBS = f.int_to_limbs(_B2)
_LAMBDA_LIMBS = f.int_to_limbs(LAMBDA)
_BETA_LIMBS = f.int_to_limbs(BETA)
_HALF_N_LIMBS = f.int_to_limbs(N_INT // 2)


def _const(limbs, batch_ndim: int):
    return jnp.asarray(
        np.asarray(limbs, np.uint32).reshape((16,) + (1,) * batch_ndim)
    )


def _mul_shift(k, g_limbs):
    """floor((k * g + 2^383) / 2^384) -> (8, *batch) limbs (< 2^128)."""
    wide = f._mul_wide_arr(k, _const(g_limbs, k.ndim - 1))  # (32,*b) lazy
    half = np.zeros((32,), np.uint32)
    half[23] = 0x8000  # rounding: + 2^383
    wide = wide + jnp.asarray(half.reshape((32,) + (1,) * (k.ndim - 1)))
    return f._carry_arr(wide, 32)[24:32]


def _gt_half_n(a):
    """a > floor(n/2) on canonical (16, *batch) limbs (lex compare)."""
    gt = jnp.zeros(a.shape[1:], bool)
    eq = jnp.ones(a.shape[1:], bool)
    for i in range(15, -1, -1):
        c = np.uint32(_HALF_N_LIMBS[i])
        gt = gt | (eq & (a[i] > c))
        eq = eq & (a[i] == c)
    return gt


def _pad16(a8):
    cfg = [(0, 8)] + [(0, 0)] * (a8.ndim - 1)
    return jnp.pad(a8, cfg)


def wnaf_digits(m, neg):
    """Signed-window recoding of a GLV magnitude half: m (16, *batch)
    canonical limbs < 2^131, neg (*batch,) bool (the half's overall GLV
    sign) -> (GLV_WINDOWS, *batch) uint32 planes packing
    |digit| (low 4 bits, 0..8) and the FINAL per-digit negate bit
    (bit 4 = window_sign XOR neg).

    Recoding d_w' = d_w + carry; if d_w' > 8 the digit becomes
    d_w' - 16 (negative) and carries 1 — digits lie in [-7, 8], so the
    kernel's per-point window table needs magnitudes 0..8 (9 entries)
    instead of 0..15 (16): 44% less scoped VMEM and fewer
    selection-mask adds. The final carry cannot escape: it would need
    m >= 8*16^(GLV_WINDOWS-1) = 2^131, and |halves| < 2^129 + rounding
    slack (see decompose). Sign handling rides the GLV kernel's
    existing per-lane y-negation."""
    carry = jnp.zeros(m.shape[1:], jnp.uint32)
    negu = neg.astype(jnp.uint32)
    planes = []
    for w in range(GLV_WINDOWS):
        raw = (m[w // 4] >> (4 * (w % 4))) & jnp.uint32(15)
        d = raw + carry
        over = d > 8
        carry = over.astype(jnp.uint32)
        mag = jnp.where(over, jnp.uint32(16) - d, d)
        sign = carry ^ negu
        planes.append(mag | (sign << 4))
    return jnp.stack(planes, axis=0)


def decompose(k):
    """k: canonical (16, *batch) F_n limbs ->
    (m1, neg1, m2, neg2): magnitudes (16, *batch) with only the low 9
    limbs nonzero, and boolean negate masks (*batch,), such that
    (-1)^neg1 * m1 + (-1)^neg2 * m2 * lambda == k (mod n)."""
    nd = k.ndim - 1
    c1 = _pad16(_mul_shift(k, _G1_LIMBS))
    c2 = _pad16(_mul_shift(k, _G2_LIMBS))
    # k2 = -(c1*b1 + c2*b2) = c1*|b1| - c2*b2 (mod n)
    k2 = f.fn_sub(
        f.fn_mul(c1, _const(_B1_ABS_LIMBS, nd)),
        f.fn_mul(c2, _const(_B2_LIMBS, nd)),
    )
    k1 = f.fn_sub(k, f.fn_mul(k2, _const(_LAMBDA_LIMBS, nd)))
    neg1 = _gt_half_n(k1)
    neg2 = _gt_half_n(k2)
    m1 = jnp.where(neg1[None], f.fn_neg(k1), k1)
    m2 = jnp.where(neg2[None], f.fn_neg(k2), k2)
    return m1, neg1, m2, neg2
