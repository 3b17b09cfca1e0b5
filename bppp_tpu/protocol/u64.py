"""u64 range proof on device (JAX), batched — the flagship entry point.

Fixed instantiation of the reciprocal protocol (reference:
/root/reference/src/range_proof/u64_proof.rs): base 16, 16 hex digits;
g_vec = 16, h_vec = 26 circuit + 6 WNLA padding = 32. Proof: 13 group
elements + 3 scalars per value.

Values enter as (2, *batch) uint32 (lo, hi) words; digit and
multiplicity decomposition (u64_proof.rs:84-102) happens on device with
static shifts and one-hot counting — no host round trip.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import curve as dc
from ..ops.curve import PointJ
from ..transcript.device import Transcript
from . import points as pv
from . import vectors as sv
from .reciprocal import (
    ReciprocalProofBytes,
    ReciprocalProofDev,
    ReciprocalRangeProofDevice,
    ReciprocalWitnessDev,
    reciprocal_blind_draws,
)

G_VEC_FULL_SZ = 16
H_VEC_CIRCUIT_SZ = 26
H_VEC_FULL_SZ = 32
DIM_ND = 16
DIM_NP = 16

U64_BLIND_DRAWS = reciprocal_blind_draws(DIM_ND)  # 52


class U64RangeProofDevice:
    """g: PointJ (16, *batch); g_vec: (16, 16, *batch); h_vec: (16, 32, *batch).

    Registered as a pytree so instances pass as jit ARGUMENTS: embedding
    the generator arrays as trace-time constants makes some runtimes
    re-upload them on every execute (measured ~150 ms/call on the
    tunneled v5e vs ~0.3 ms with device-resident arguments)."""

    def __init__(self, g: PointJ, g_vec: PointJ, h_vec: PointJ, tables=None):
        assert pv.pv_len(g_vec) == G_VEC_FULL_SZ
        assert pv.pv_len(h_vec) == H_VEC_FULL_SZ
        self.g, self.g_vec, self.h_vec = g, g_vec, h_vec
        # Optional fixed-base window tables (ops/fixed_base.build_tables
        # over [g | h_vec | g_vec]): {'full': 49-point set for the WNLA
        # final MSM, 'gv': [g | g_vec] subset for the circuit fast MSM}.
        self.tables = tables

    @property
    def batch(self):
        return self.g.x.shape[1:]

    def _reciprocal(self) -> ReciprocalRangeProofDevice:
        batch = self.batch
        empty = dc.identity((0,) + batch)
        return ReciprocalRangeProofDevice(
            dim_nd=DIM_ND,
            dim_np=DIM_NP,
            g=self.g,
            g_vec=self.g_vec,
            h_vec=PointJ(*(a[:, :H_VEC_CIRCUIT_SZ] for a in self.h_vec)),
            g_vec_=empty,
            h_vec_=PointJ(*(a[:, H_VEC_CIRCUIT_SZ:] for a in self.h_vec)),
            tables=self.tables,
        )

    def commit_value(self, x_words, s) -> PointJ:
        """x_words: (2, *batch) uint32 (lo, hi); s: (16, *batch) limbs."""
        return self._reciprocal().commit_value(u64_to_limbs(x_words), s)

    def prove(self, x_words, s, t: Transcript, blind) -> ReciprocalProofDev:
        """blind: (16, U64_BLIND_DRAWS, *batch) host-sampled stream."""
        witness = ReciprocalWitnessDev(
            x=u64_to_limbs(x_words),
            s=s,
            m=u64_to_hex_mapped(x_words),
            digits=u64_to_hex(x_words),
        )
        recip = self._reciprocal()
        commitment = recip.commit_value(witness.x, witness.s)
        return recip.prove(commitment, witness, t, blind)

    def verify(
        self,
        commitment_bytes,
        t: Transcript,
        proof: ReciprocalProofBytes,
        fast: bool = False,
    ):
        """fast=True runs the collapsed one-MSM verifier (same transcript,
        same accept/reject set — SURVEY.md §3.2)."""
        return self._reciprocal().verify(commitment_bytes, t, proof, fast=fast)


def _u64_flatten(d):
    return ((d.g, d.g_vec, d.h_vec, d.tables), None)


def _u64_unflatten(aux, kids):
    obj = object.__new__(U64RangeProofDevice)
    obj.g, obj.g_vec, obj.h_vec, obj.tables = kids
    return obj


def build_u64_tables(g: PointJ, g_vec: PointJ, h_vec: PointJ):
    """Fixed-base window tables for a u64 generator set. Inputs are the
    UNBATCHED device points (coords (16,) / (16, L)). -> dict pytree for
    U64RangeProofDevice(tables=...)."""
    import jax.numpy as jnp

    from ..ops import pallas_fixed_base as fb

    pts = PointJ(
        *(
            jnp.concatenate([a[:, None], b, c], axis=1)
            for a, b, c in zip(g, h_vec, g_vec)
        )
    )  # [g | h(32) | g_vec(16)] -> (16, 49)
    tab = fb.build_tables(pts)
    # tab is kernel-ready (N_WINDOWS, F, rows, N_ENT) — layout/dtype per
    # BPPP_FBSEL (pallas_fixed_base.build_tables docstring); the circuit
    # MSM subset [g | g_vec] slices the generator axis 1
    gv = jnp.concatenate([tab[:, :1], tab[:, 1 + H_VEC_FULL_SZ :]], axis=1)
    return {"full": tab, "gv": gv}


jax.tree_util.register_pytree_node(U64RangeProofDevice, _u64_flatten, _u64_unflatten)


def u64_to_limbs(x_words):
    """(2, *batch) uint32 (lo, hi) -> (16, *batch) F_n limbs."""
    lo, hi = x_words[0], x_words[1]
    limbs = [
        lo & 0xFFFF,
        (lo >> 16) & 0xFFFF,
        hi & 0xFFFF,
        (hi >> 16) & 0xFFFF,
    ]
    zero = jnp.zeros_like(lo)
    return jnp.stack(limbs + [zero] * 12, axis=0).astype(jnp.uint32)


def u64_digits(x_words):
    """(2, *batch) -> (16, *batch) hex-digit values (plain uint32, 0..15),
    least-significant first (u64_proof.rs:84-90)."""
    lo, hi = x_words[0].astype(jnp.uint32), x_words[1].astype(jnp.uint32)
    digs = [(lo >> (4 * i)) & 15 for i in range(8)]
    digs += [(hi >> (4 * i)) & 15 for i in range(8)]
    return jnp.stack(digs, axis=0)


def u64_to_hex(x_words):
    """(2, *batch) -> (16, nd=16, *batch) digit limbs."""
    d = u64_digits(x_words)  # (16, *batch) digit values
    batch = d.shape[1:]
    out = jnp.zeros((16, 16) + batch, jnp.uint32)
    return out.at[0].set(d)


def u64_to_hex_mapped(x_words):
    """Digit multiplicities (u64_proof.rs:92-102): out[:, v] = #digits == v,
    as (16, np=16, *batch) limbs."""
    d = u64_digits(x_words)  # (16, *batch)
    counts = jnp.stack(
        [jnp.sum((d == v).astype(jnp.uint32), axis=0) for v in range(16)], axis=0
    )  # (16, *batch) counts per value v
    batch = d.shape[1:]
    out = jnp.zeros((16, 16) + batch, jnp.uint32)
    return out.at[0].set(counts)
