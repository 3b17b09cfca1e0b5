"""Batched F_n vector math over limb arrays (device twin of oracle/vectors.py).

Conventions: a scalar is (16, *batch) uint32 limbs (see ops/field.py); a
scalar *vector* is (16, L, *batch) with the length axis at position 1 so
every field op broadcasts over (L, *batch) lanes at once. All helpers pad
shorter operands with zeros, matching the reference's `vector_extend`
semantics (/root/reference/src/util.rs:24-26).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ops import field as f


def sv_zeros(L: int, batch: tuple) -> jnp.ndarray:
    return jnp.zeros((16, L) + tuple(batch), dtype=jnp.uint32)


def sv_pad(a, L: int):
    """Zero-pad the length axis (axis 1) to L."""
    if a.shape[1] == L:
        return a
    assert a.shape[1] < L
    cfg = [(0, 0), (0, L - a.shape[1])] + [(0, 0)] * (a.ndim - 2)
    return jnp.pad(a, cfg)


def _pad_pair(a, b):
    L = max(a.shape[1], b.shape[1])
    return sv_pad(a, L), sv_pad(b, L)


def sv_split(a):
    """Even/odd split along the length axis (util.rs:7-22 `reduce`)."""
    return a[:, 0::2], a[:, 1::2]


def sv_add(a, b):
    a, b = _pad_pair(a, b)
    return f.fn_add(a, b)


def sv_sub(a, b):
    a, b = _pad_pair(a, b)
    return f.fn_sub(a, b)


def sv_scale(a, s):
    """a * s with s a (16, *batch) scalar."""
    return f.fn_mul(a, s[:, None])


def sv_hadamard(a, b):
    a, b = _pad_pair(a, b)
    return f.fn_mul(a, b)


def sv_sum(a):
    """Mod-n sum over the length axis: (16, L, *batch) -> (16, *batch).

    Lazy limbwise sum (safe for L <= 2^15 since limbs < 2^16), one fold."""
    s = jnp.sum(a.astype(jnp.uint32), axis=1)
    return f._fold_n(f._carry(s, 18))


def sv_inner(a, b):
    """<a, b> mod n (util.rs:46-60 over scalars)."""
    a, b = _pad_pair(a, b)
    return sv_sum(f.fn_mul(a, b))


def sv_powers(x, L: int, start_at_one: bool = True):
    """[1, x, .., x^(L-1)] (start_at_one) or [x, x^2, .., x^L]; (16, L, *batch).

    Log-depth doubling build: e_{2k} = e_k  (x^k * e_k), so only
    ceil(log2 L) sequential fn_muls instead of L (util.rs:87-95)."""
    one = jnp.zeros_like(x).at[0].set(1)
    e = one[:, None]  # [1]
    xp = x  # x^(current length)
    while e.shape[1] < L:
        e = jnp.concatenate([e, f.fn_mul(e, xp[:, None])], axis=1)
        if e.shape[1] < L:
            xp = f.fn_mul(xp, xp)
    e = e[:, :L]
    if start_at_one:
        return e
    return f.fn_mul(e, x[:, None])


def sv_weight_inner(a, b, w, pw=None):
    """sum_i a_i b_i w^(i+1) (util.rs:28-44). pw: optional precomputed
    [w, w^2, ...] (16, >=L, *batch) to share across call sites."""
    a, b = _pad_pair(a, b)
    if pw is None:
        pw = sv_powers(w, a.shape[1], start_at_one=False)
    return sv_sum(f.fn_mul(f.fn_mul(a, b), pw[:, : a.shape[1]]))


def sv_tensor(a, b):
    """Kronecker concat of a*b_j for each j (util.rs:111-116):
    out[:, j*La + i] = a_i * b_j."""
    La, Lb = a.shape[1], b.shape[1]
    prod = f.fn_mul(a[:, :, None], b[:, None, :])  # (16, La, Lb, *batch)
    prod = jnp.moveaxis(prod, 2, 1)  # (16, Lb, La, *batch)
    return prod.reshape((16, La * Lb) + a.shape[2:])


def sv_interleave(a, b):
    """out[:, 2t] = a_t, out[:, 2t+1] = b_t — inverse of sv_split."""
    assert a.shape == b.shape
    st = jnp.stack([a, b], axis=2)  # (16, L, 2, *batch)
    return st.reshape((16, 2 * a.shape[1]) + a.shape[2:])


def sv_neg(a):
    return f.fn_neg(a)


def sv_concat(parts):
    parts = list(parts)
    batch = parts[0].shape[2:]
    for p in parts:
        assert p.shape[2:] == batch
    return jnp.concatenate(parts, axis=1)


def s_const(x: int, batch: tuple) -> jnp.ndarray:
    """Host int -> broadcast (16, *batch) limb constant."""
    assert 0 <= x < (1 << 256), "pass canonical residues"
    c = f.int_to_limbs(x)
    a = jnp.asarray(c.reshape((16,) + (1,) * len(batch)))
    return jnp.broadcast_to(a, (16,) + tuple(batch))


def sv_const(xs: list[int], batch: tuple) -> jnp.ndarray:
    """Host int list -> (16, L, *batch) limb constant vector."""
    arr = f.ints_to_limbs(xs)  # (16, L)
    a = jnp.asarray(arr.reshape((16, len(xs)) + (1,) * len(batch)))
    return jnp.broadcast_to(a, (16, len(xs)) + tuple(batch))


def fn_inv_vec(a):
    """Batched modular inversion over the length axis via the Montgomery
    trick: one Fermat ladder for the whole vector + 3(L-1) muls, with the
    prefix/suffix products in log depth (associative scans).

    a: (16, L, *batch), all entries nonzero. Replaces the reference's
    one-by-one `invert` calls (reciprocal.rs:117-119, 179-183)."""
    L = a.shape[1]
    if L == 1:
        return f.fn_inv(a[:, 0])[:, None]
    # prefix[i] = a_0 * ... * a_i  (inclusive scan, log depth)
    pre = _scan_mul(a)
    total_inv = f.fn_inv(pre[:, L - 1])  # one ladder
    # suffix[i] = a_{i+1} * ... * a_{L-1} = total_inv * pre[i] ... careful:
    # inv(a_i) = pre[i-1] * suf_inv[i] where suf_inv[i] = inv(a_i*..*a_{L-1}).
    # Build suf_inv by reverse inclusive scan of inverses: instead use the
    # standard trick: walk down with running inverse — do it with a reversed
    # scan: suf[i] = a_i * ... * a_{L-1}; inv(a_i) = pre[i-1] * inv(suf[0]) ...
    # Simplest log-depth: inv(a_i) = pre[i-1] * suf[i+1] * total_inv.
    suf = _scan_mul(a[:, ::-1])[:, ::-1]  # suf[i] = a_i*..*a_{L-1}
    one = jnp.zeros_like(a[:, :1]).at[0].set(1)
    pre_shift = jnp.concatenate([one, pre[:, :-1]], axis=1)  # pre[i-1], pre[-1]=1
    suf_shift = jnp.concatenate([suf[:, 1:], one], axis=1)  # suf[i+1], suf[L]=1
    return f.fn_mul(f.fn_mul(pre_shift, suf_shift), total_inv[:, None])


def _scan_mul(a):
    """Inclusive prefix product along axis 1, log-depth (Hillis-Steele)."""
    L = a.shape[1]
    out = a
    d = 1
    while d < L:
        shifted = out[:, :-d]
        prod = f.fn_mul(out[:, d:], shifted)
        out = jnp.concatenate([out[:, :d], prod], axis=1)
        d *= 2
    return out
