"""JAX masked curve ops vs the host oracle."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bppp_tpu.oracle import curve as ocurve
from bppp_tpu.oracle import field as hf
from bppp_tpu.ops import curve as jc
from bppp_tpu.ops import field as jf

rng = np.random.default_rng(77)


def rand_scalar():
    return int.from_bytes(rng.bytes(40), "big") % hf.N


def rand_points(k):
    return [ocurve.GENERATOR.mul(rand_scalar()) for k_ in range(k)]


def as_pointj(pts):
    return jc.from_int_points(pts)


def test_double_add_vs_oracle():
    pts = rand_points(6)
    qts = rand_points(6)
    # exceptional lanes: identity op, doubling collision, inverse collision
    pts += [ocurve.IDENTITY, pts[0], pts[1], pts[2]]
    qts += [qts[0], ocurve.IDENTITY, pts[1], pts[2].neg()]
    P, Q = as_pointj(pts), as_pointj(qts)
    got_d = jc.to_int_points(jax.jit(jc.pt_double)(P))
    got_a = jc.to_int_points(jax.jit(jc.pt_add)(P, Q))
    for g, p in zip(got_d, pts):
        assert g.eq(p.double())
    for g, p, q in zip(got_a, pts, qts):
        assert g.eq(p.add(q))


def test_add_mixed():
    pts = rand_points(5) + [ocurve.IDENTITY]
    qts = rand_points(5) + [rand_points(1)[0]]
    qaff = [q.to_affine() for q in qts]
    P = as_pointj(pts)
    qx = jnp.asarray(jf.ints_to_limbs([a[0] for a in qaff]))
    qy = jnp.asarray(jf.ints_to_limbs([a[1] for a in qaff]))
    got = jc.to_int_points(jax.jit(jc.pt_add_mixed)(P, qx, qy))
    for g, p, q in zip(got, pts, qts):
        assert g.eq(p.add(q))


def test_scalar_mul():
    pts = rand_points(4) + [ocurve.IDENTITY]
    ks = [rand_scalar() for _ in range(3)] + [0, 1]
    P = as_pointj(pts)
    K = jnp.asarray(jf.ints_to_limbs(ks))
    got = jc.to_int_points(jax.jit(jc.pt_scalar_mul)(P, K))
    for g, p, k in zip(got, pts, ks):
        assert g.eq(p.mul(k))


def test_msm_vs_oracle():
    L = 7
    pts = rand_points(L)
    ks = [rand_scalar() for _ in range(L)]
    P = as_pointj(pts)
    K = jnp.asarray(jf.ints_to_limbs(ks))[:, :, None]  # (16, L, B=1)
    got = jc.to_int_points(
        jax.jit(jc.msm)(jc.PointJ(P.x[..., None], P.y[..., None], P.z[..., None]), K)
    )[0]
    want = ocurve.IDENTITY
    for p, k in zip(pts, ks):
        want = want.add(p.mul(k))
    assert got.eq(want)


def test_compress_decompress():
    pts = rand_points(6) + [ocurve.IDENTITY]
    P = as_pointj(pts)
    b = np.asarray(jax.jit(jc.compress)(P))
    for j, p in enumerate(pts):
        assert bytes(b[:, j].astype(np.uint8).tolist()) == p.to_bytes()
    back = jc.to_int_points(jax.jit(jc.decompress)(jnp.asarray(b)))
    for g, p in zip(back, pts):
        assert g.eq(p)


def test_pt_eq_mask():
    pts = rand_points(3)
    a = as_pointj([pts[0], pts[1], ocurve.IDENTITY, pts[2]])
    # same points with different Z (scale by 2): (X*4, Y*8, Z*2)
    def rescale(p):
        return ocurve.Point(
            hf.fp_mul(p.x, 4), hf.fp_mul(p.y, 8), hf.fp_mul(p.z, 2)
        )
    b = as_pointj([rescale(pts[0]), pts[2], ocurve.IDENTITY, ocurve.IDENTITY])
    m = np.asarray(jax.jit(jc.pt_eq)(a, b))
    assert m.tolist() == [True, False, True, False]


@pytest.mark.parametrize("L", [16, 64, 256])
def test_msm_pippenger_vs_oracle(L):
    """Bucketed Pippenger (ops/pippenger.py, the L > 6 msm dispatch)
    vs the oracle, with edge lanes: identity point, zero scalar,
    duplicate points (prefix-scan doubling collisions), batch B=2.
    L=256 takes the c=8 window branch (_pick_c: L > 112) — the
    per_limb=2 digit extraction and 255-entry boundary gather
    (VERDICT r3 weak #1)."""
    from bppp_tpu.ops.pippenger import _pick_c

    assert _pick_c(L) == (8 if L > 112 else 4)
    B = 2
    pts = rand_points(L - 3) + [ocurve.IDENTITY]
    pts += [pts[0], pts[0]]  # duplicates: complete-add path in the scan
    ks = [rand_scalar() for _ in range(L - 2)] + [0, rand_scalar()]
    P = as_pointj(pts)
    K = jnp.asarray(jf.ints_to_limbs(ks))
    Pb = jc.PointJ(*(jnp.repeat(c[..., None], B, axis=-1) for c in P))
    Kb = jnp.repeat(K[..., None], B, axis=-1)
    out = jax.jit(jc.msm)(Pb, Kb)
    want = ocurve.IDENTITY
    for p, k in zip(pts, ks):
        want = want.add(p.mul(k))
    for lane in range(B):
        got = jc.to_int_points(jc.PointJ(*(c[..., lane] for c in out)))[0]
        assert got.eq(want), f"lane {lane}"


def test_msm_pippenger_c8_explicit_small():
    """The c=8 window path at a small, fast-to-compile L: same math as
    the L=256 dispatch case but cheap enough to debug in isolation."""
    from bppp_tpu.ops.pippenger import msm_pippenger

    L = 8
    pts = rand_points(L - 1) + [ocurve.IDENTITY]
    ks = [rand_scalar() for _ in range(L - 1)] + [rand_scalar()]
    P = as_pointj(pts)
    K = jnp.asarray(jf.ints_to_limbs(ks))
    out = jax.jit(lambda p, k: msm_pippenger(p, k, c=8))(P, K)
    want = ocurve.IDENTITY
    for p, k in zip(pts, ks):
        want = want.add(p.mul(k))
    # out has no batch axis: coords (16,) -> add a length-1 lane axis
    got = jc.to_int_points(jc.PointJ(*(c[:, None] for c in out)))[0]
    assert got.eq(want)


def test_decompress_checked_masks():
    """decompress_checked flags off-curve x, bad tags, and non-canonical
    x >= p while accepting valid compressed points and the identity."""
    from bppp_tpu.oracle.field import P as P_INT

    pts = rand_points(2) + [ocurve.IDENTITY]
    raw = [np.frombuffer(p.to_bytes(), np.uint8).astype(np.uint32) for p in pts]
    x_nr = next(
        x for x in range(2, 100) if pow(x**3 + 7, (P_INT - 1) // 2, P_INT) != 1
    )
    bad_curve = np.array([2] + list(x_nr.to_bytes(32, "big")), np.uint32)
    bad_tag = raw[0].copy()
    bad_tag[0] = 5
    bad_canon = np.array([3] + [0xFF] * 32, np.uint32)
    bad_id = np.zeros(33, np.uint32)
    bad_id[32] = 1  # tag 0 but nonzero payload
    cols = np.stack(raw + [bad_curve, bad_tag, bad_canon, bad_id], axis=1)
    pt, ok = jax.jit(jc.decompress_checked)(jnp.asarray(cols))
    assert np.asarray(ok).tolist() == [True, True, True, False, False, False, False]
    back = jc.to_int_points(jc.PointJ(*(c[:, :3] for c in pt)))
    for g, p in zip(back, pts):
        assert g.eq(p)
