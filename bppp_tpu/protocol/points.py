"""Batched point-vector helpers (device twin of the point side of
oracle/vectors.py; reference: generic util.rs helpers instantiated at
T = ProjectivePoint). Point vectors are `PointJ` pytrees with coordinates
(16, L, *batch); identity-padding mirrors `vector_extend`'s
`T::default()` (util.rs:24-26)."""

from __future__ import annotations

import jax.numpy as jnp

from ..ops import curve as c
from ..ops.curve import PointJ
from . import vectors as v


def pv_len(p: PointJ) -> int:
    return p.x.shape[1]


def pv_pad(p: PointJ, L: int) -> PointJ:
    """Identity-pad the length axis (axis 1) to L."""
    have = pv_len(p)
    if have == L:
        return p
    assert have < L
    batch = p.x.shape[2:]
    idl = c.identity((L - have,) + batch)
    return PointJ(
        *(jnp.concatenate([a, b], axis=1) for a, b in zip(p, idl))
    )


def pv_split(p: PointJ):
    """Even/odd split along the length axis (util.rs:7-22)."""
    return (
        PointJ(*(a[:, 0::2] for a in p)),
        PointJ(*(a[:, 1::2] for a in p)),
    )


def pv_concat(parts) -> PointJ:
    return PointJ(
        *(jnp.concatenate(cs, axis=1) for cs in zip(*parts))
    )


def pv_add(p: PointJ, q: PointJ) -> PointJ:
    L = max(pv_len(p), pv_len(q))
    return c.pt_add(pv_pad(p, L), pv_pad(q, L))


def pv_scale(p: PointJ, s) -> PointJ:
    """[s]p lane-wise; s a (16, *batch) scalar shared across the vector."""
    return c.pt_scalar_mul(p, jnp.broadcast_to(s[:, None], p.x.shape))


def msm(points: PointJ, scalars) -> PointJ:
    """sum_i [s_i] P_i with zero/identity padding (util.rs:46-60)."""
    L = max(pv_len(points), scalars.shape[1])
    points = pv_pad(points, L)
    scalars = v.sv_pad(scalars, L)
    return c.msm(points, scalars)


def single(p: PointJ) -> PointJ:
    """Insert a length axis: (16, *batch) coords -> (16, 1, *batch)."""
    return PointJ(*(a[:, None] for a in p))
