"""Unit tests for protocol-layer vector/point helpers against the host
oracle: batched inversion, powers, tensor products, Straus MSM."""

import jax
import numpy as np
import pytest

from bppp_tpu.oracle import curve as oc
from bppp_tpu.oracle.field import N, fn_inv, fn_mul
from bppp_tpu.oracle.vectors import e_powers, p_vector_mul, s_vector_tensor_mul
from bppp_tpu.ops import curve as dc
from bppp_tpu.ops import field as f
from bppp_tpu.protocol import convert as cv
from bppp_tpu.protocol import vectors as sv
from bppp_tpu.utils.rng import SeededRng


def test_fn_inv_vec():
    rng = SeededRng("inv vec")
    vals = [rng.scalars(7), rng.scalars(7)]
    a = cv.scalar_cols(vals)
    out = jax.jit(sv.fn_inv_vec)(a)
    for b in range(2):
        got = cv.scalars_lane(out, b)
        assert got == [fn_inv(v) for v in vals[b]]


def test_sv_powers():
    rng = SeededRng("powers")
    xs = [rng.scalar(), rng.scalar()]
    x = f.ints_to_limbs(xs)
    for L in (1, 2, 5, 8):
        out = jax.jit(lambda x: sv.sv_powers(x, L))(x)
        out1 = jax.jit(lambda x: sv.sv_powers(x, L, start_at_one=False))(x)
        for b in range(2):
            assert cv.scalars_lane(out, b) == e_powers(xs[b], L)
            assert cv.scalars_lane(out1, b) == [
                fn_mul(p, xs[b]) for p in e_powers(xs[b], L)
            ]


def test_sv_tensor():
    rng = SeededRng("tensor")
    a_vals = [rng.scalars(3), rng.scalars(3)]
    b_vals = [rng.scalars(2), rng.scalars(2)]
    out = jax.jit(sv.sv_tensor)(cv.scalar_cols(a_vals), cv.scalar_cols(b_vals))
    for b in range(2):
        assert cv.scalars_lane(out, b) == s_vector_tensor_mul(a_vals[b], b_vals[b])


@pytest.mark.parametrize("L", [1, 3, 8])
def test_msm_straus_matches_oracle(L):
    rng = SeededRng(f"straus {L}")
    pts = [oc.GENERATOR.mul(rng.scalar()) for _ in range(L)]
    lanes = [rng.scalars(L), rng.scalars(L)]
    dev_pts = cv.points_batched(pts, 2)
    dev_scs = cv.scalar_cols(lanes)
    out = jax.jit(dc.msm_straus)(dev_pts, dev_scs)
    ladder = jax.jit(dc.msm)(dev_pts, dev_scs)
    for b in range(2):
        want = p_vector_mul(pts, lanes[b])
        assert cv.point_lane(out, b).eq(want)
        assert cv.point_lane(ladder, b).eq(want)


def test_msm_straus_zero_and_identity_lanes():
    rng = SeededRng("straus edge")
    pts = [oc.GENERATOR.mul(rng.scalar()), oc.IDENTITY, oc.GENERATOR]
    scalars = [[rng.scalar(), rng.scalar(), 0], [0, 0, 0]]
    out = jax.jit(dc.msm_straus)(cv.points_batched(pts, 2), cv.scalar_cols(scalars))
    assert cv.point_lane(out, 0).eq(p_vector_mul(pts, scalars[0]))
    assert cv.point_lane(out, 1).is_identity()
