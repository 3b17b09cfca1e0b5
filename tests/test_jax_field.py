"""JAX limb field kernels vs the host oracle (property/cross-check)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bppp_tpu.oracle import field as hf
from bppp_tpu.ops import field as jf

rng = np.random.default_rng(1234)


def rand_ints(k, mod):
    out = []
    for _ in range(k):
        out.append(int.from_bytes(rng.bytes(40), "big") % mod)
    return out


SPECIALS_P = [0, 1, 2, hf.P - 1, hf.P - 2, 0xFFFF, 1 << 255, (1 << 256) % hf.P]
SPECIALS_N = [0, 1, 2, hf.N - 1, hf.N - 2, 0xFFFF, 1 << 255, (1 << 256) % hf.N]


@pytest.mark.parametrize("which", ["p", "n"])
def test_limb_roundtrip(which):
    mod = hf.P if which == "p" else hf.N
    xs = rand_ints(8, mod) + (SPECIALS_P if which == "p" else SPECIALS_N)
    limbs = jf.ints_to_limbs(xs)
    assert jf.limbs_to_ints(limbs) == xs


def check_binop(jax_op, int_op, mod, k=24):
    a = rand_ints(k, mod) + (SPECIALS_P if mod == hf.P else SPECIALS_N)
    b = rand_ints(k, mod) + list(reversed(SPECIALS_P if mod == hf.P else SPECIALS_N))
    la, lb = jf.ints_to_limbs(a), jf.ints_to_limbs(b)
    got = jf.limbs_to_ints(np.asarray(jax.jit(jax_op)(la, lb)))
    want = [int_op(x, y) % mod for x, y in zip(a, b)]
    assert got == want


def test_fp_add():
    check_binop(jf.fp_add, lambda x, y: x + y, hf.P)


def test_fp_sub():
    check_binop(jf.fp_sub, lambda x, y: x - y, hf.P)


def test_fp_mul():
    check_binop(jf.fp_mul, lambda x, y: x * y, hf.P)


def test_fn_add():
    check_binop(jf.fn_add, lambda x, y: x + y, hf.N)


def test_fn_sub():
    check_binop(jf.fn_sub, lambda x, y: x - y, hf.N)


def test_fn_mul():
    check_binop(jf.fn_mul, lambda x, y: x * y, hf.N)


def test_fp_inv():
    xs = rand_ints(8, hf.P) + [1, 2, hf.P - 1]
    limbs = jf.ints_to_limbs(xs)
    got = jf.limbs_to_ints(np.asarray(jax.jit(jf.fp_inv)(limbs)))
    assert got == [hf.fp_inv(x) for x in xs]


def test_fn_inv():
    xs = rand_ints(8, hf.N) + [1, 2, hf.N - 1]
    limbs = jf.ints_to_limbs(xs)
    got = jf.limbs_to_ints(np.asarray(jax.jit(jf.fn_inv)(limbs)))
    assert got == [hf.fn_inv(x) for x in xs]


def test_fp_sqrt():
    xs = [hf.fp_mul(x, x) for x in rand_ints(6, hf.P)]
    limbs = jf.ints_to_limbs(xs)
    got = jf.limbs_to_ints(np.asarray(jax.jit(jf.fp_sqrt)(limbs)))
    for g, x in zip(got, xs):
        assert hf.fp_mul(g, g) == x


def test_fn_sum():
    vals = [rand_ints(16, hf.N) for _ in range(40)]
    stack = jnp.stack([jnp.asarray(jf.ints_to_limbs(v)) for v in vals], axis=0)
    got = jf.limbs_to_ints(np.asarray(jax.jit(jf.fn_sum)(stack)))
    want = [sum(vals[i][j] for i in range(40)) % hf.N for j in range(16)]
    assert got == want


def test_byte_conversions():
    xs = rand_ints(10, hf.N) + [0, 1, hf.N - 1]
    limbs = jf.ints_to_limbs(xs)
    be = np.asarray(jf.limbs_to_be_bytes(jnp.asarray(limbs)))
    for j, x in enumerate(xs):
        assert bytes(be[:, j].astype(np.uint8).tolist()) == x.to_bytes(32, "big")
    back = np.asarray(jf.be_bytes_to_limbs(jnp.asarray(be)))
    assert jf.limbs_to_ints(back) == xs


def test_batch_shapes():
    # (L, 16, B) vector-of-scalars broadcasting through binops.
    a = np.stack([jf.ints_to_limbs(rand_ints(4, hf.N)) for _ in range(5)])
    b = np.stack([jf.ints_to_limbs(rand_ints(4, hf.N)) for _ in range(5)])
    # move limb axis to front per convention: ops treat axis0 as limbs, so
    # vector stacks use shape (16, L*B) via reshape at call sites instead.
    a2 = np.transpose(a, (1, 0, 2)).reshape(16, -1)
    b2 = np.transpose(b, (1, 0, 2)).reshape(16, -1)
    out = np.asarray(jf.fn_mul(jnp.asarray(a2), jnp.asarray(b2)))
    want = [
        hf.fn_mul(x, y)
        for x, y in zip(jf.limbs_to_ints(a2), jf.limbs_to_ints(b2))
    ]
    assert jf.limbs_to_ints(out) == want
