"""General bucketed Pippenger MSM for large dynamic point sets.

Replaces the reference's naive per-term loop (/root/reference/src/
util.rs:46-60) for L > 6 points, where the shared-window small-MSM
kernel's in-VMEM tables no longer fit (ops/pallas_msm.py caps at D=6)
and per-lane ladders cost 334 point-ops per (point x lane).

TPU-native formulation: classic Pippenger needs data-dependent bucket
SCATTER, which does not exist on TPU. Instead, per c-bit window:

  1. window digits d_i, sort point lanes by digit DESCENDING (argsort +
     gather — static shapes, pure data movement);
  2. prefix point-sums T_j = P_(0) + .. + P_(j) along the sorted axis
     with jax.lax.associative_scan (log-depth, each level a batched
     complete point add that rides the fused Pallas add kernel when the
     lane count tiles);
  3. the weighted bucket reduction collapses to a GATHER: with points
     sorted descending,  sum_b b*S_b = sum_{t=1}^{2^c-1} T_{cnt_t - 1}
     where cnt_t = |{i : d_i >= t}| (write b = sum_{t<=b} 1 and swap
     sums) — cnt_t is a plain histogram count, T_{-1} the identity;
  4. fold windows MSB-first: total = [2^c] total + window_sum.

Work per window ~2L complete adds (scan) + 2^c - 1 gathered adds (tree
reduction) + c doubles, so ~(256/c)(2L + 2^c) adds total vs the ladder's
334*L — a ~5x op reduction at c=8 before counting the ladder's masked
doubles. Everything is jnp sort/gather/scan on static shapes: no
dynamic control flow, vmap-free batching (batch axes trail).

Sharded variant: parallel/mesh.msm_sharded partitions the POINTS axis
across chips; each chip runs this kernel on its shard and partial
Jacobian sums combine with one all_gather + log-tree add over ICI.
(A psum of bucket sums is NOT sound — Jacobian coordinates are not an
additive group under field psum; the gather-of-partials IS the correct
TPU collective for a point monoid.)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import curve as dc
from . import field as f
from .curve import PointJ

def _pick_c(L: int) -> int:
    """Window width by problem size, restricted to divisors of the
    16-bit limb width (digit extraction stays pure shifts). Per-window
    work ~ 2L (prefix scan) + 2^c - 1 (boundary gather tree), total
    (256/c)(2L + 2^c): c=8 only amortizes its 255-entry tree when
    L > ~112; c=4 wins below that."""
    return 8 if L > 112 else 4


def _digits_all(scalars, c: int):
    """(16, L, *b) limbs -> (256/c, L, *b) int32 digits, MSB first."""
    per_limb = 16 // c
    rows = []
    for w in range(256 // c - 1, -1, -1):
        rows.append(
            (scalars[w // per_limb] >> (c * (w % per_limb))) & ((1 << c) - 1)
        )
    return jnp.stack(rows, axis=0).astype(jnp.int32)


def _prefix_pt_sum(p: PointJ) -> PointJ:
    """Inclusive prefix point-sums along axis 1 of (16, L, *b) coords.
    Complete adds: sorted lanes can hold EQUAL points (repeated inputs),
    so the doubling-collision mask must stay on."""

    def comb(a, b):
        s = dc.pt_add(PointJ(*a), PointJ(*b))
        return (s.x, s.y, s.z)

    out = jax.lax.associative_scan(comb, tuple(p), axis=1)
    return PointJ(*out)


def msm_pippenger(points: PointJ, scalars, c: int | None = None) -> PointJ:
    """sum_i [s_i] P_i. points: coords (16, L, *batch); scalars
    (16, L, *batch) F_n limbs (broadcastable). -> coords (16, *batch).
    c: window bits (default _pick_c(L); must divide 16)."""
    L = points.x.shape[1]
    c = c or _pick_c(L)
    n_ent = 1 << c
    batch = points.x.shape[2:]
    scalars = jnp.broadcast_to(scalars, points.x.shape)
    digs = _digits_all(scalars, c)  # (W, L, *b) MSB first

    idv = dc.identity(batch)
    id_col = PointJ(*(a[:, None] for a in idv))
    thresholds = jnp.arange(1, n_ent, dtype=jnp.int32).reshape(
        (n_ent - 1,) + (1,) * len(batch)
    )

    def window(carry, d):
        total = PointJ(*carry)
        for _ in range(c):
            total = dc.pt_double(total)
        # sort lanes by digit descending (argsort of -d; ties arbitrary)
        order = jnp.argsort(-d, axis=0)  # (L, *b)
        srt = PointJ(
            *(jnp.take_along_axis(c, order[None], axis=1) for c in points)
        )
        d_sorted = jnp.take_along_axis(d, order, axis=0)
        pre = _prefix_pt_sum(srt)
        # T[0] = identity, T[j+1] = prefix_j  (cnt_t = 0 -> identity)
        T = PointJ(*(jnp.concatenate([i, c], axis=1) for i, c in zip(id_col, pre)))
        # cnt_t = #digits >= t, t = 1..2^c-1  -> (2^c-1, *b)
        cnt = jnp.sum(
            (d_sorted[None] >= thresholds[:, None]).astype(jnp.int32), axis=1
        )
        sel = PointJ(
            *(jnp.take_along_axis(c, cnt[None], axis=1) for c in T)
        )
        # log-depth pairwise reduction (8 add sites in the scan body);
        # pt_sum's generic path would serialize 2^c-1 adds per window
        wsum = dc._tree_sum_axis1(sel)
        nxt = dc.pt_add(total, wsum)
        return tuple(nxt), None

    carry, _ = jax.lax.scan(window, tuple(idv), digs)
    return PointJ(*carry)
