"""Host <-> device bridges for protocol data.

Everything here runs on host (NumPy) at setup/teardown of a traced
program: lifting oracle Points / python ints into limb arrays and
lowering device results back into oracle objects for cross-checking and
serialization. Wire formats match k256 serde conventions (SEC1
compressed points; 32-byte BE scalars) — see oracle/curve.py:to_bytes
and /root/reference/src/transcript.rs:7.
"""

from __future__ import annotations

import numpy as np

from ..ops import curve as dc
from ..ops import field as f
from ..oracle import curve as oc
from ..oracle.wnla import WNLAProof
from .wnla import WNLAProofBytes, WNLAProofDev


# -- scalars -------------------------------------------------------------

def scalar_cols(cols: list[list[int]]) -> np.ndarray:
    """cols[b] = per-lane scalar vector (len L) -> (16, L, B) limbs."""
    B = len(cols)
    L = len(cols[0])
    out = np.zeros((16, L, B), dtype=np.uint32)
    for b, col in enumerate(cols):
        assert len(col) == L
        out[:, :, b] = f.ints_to_limbs(col)
    return out


def scalars_lane(arr, b) -> list[int]:
    """(16, L, B) device limbs -> python ints for lane b."""
    a = np.asarray(arr)
    return [
        sum(int(a[i, j, b]) << (16 * i) for i in range(16))
        for j in range(a.shape[1])
    ]


def scalar_lane(arr, b) -> int:
    a = np.asarray(arr)
    return sum(int(a[i, b]) << (16 * i) for i in range(16))


# -- points --------------------------------------------------------------

def points_batched(pts: list[oc.Point], B: int) -> dc.PointJ:
    """Shared point vector, broadcast over a batch of B lanes:
    coords (16, L, B). Empty list -> zero-length identity vector."""
    if not pts:
        return dc.identity((0, B))
    return dc.from_int_points(pts, batch=(B,))


def point_batched(p: oc.Point, B: int) -> dc.PointJ:
    return dc.from_int_points([p], batch=(B,), squeeze=True)


def point_lane(p: dc.PointJ, b) -> oc.Point:
    """PointJ coords (16, B) -> oracle Point at lane b."""
    get = lambda a: sum(int(np.asarray(a)[i, b]) << (16 * i) for i in range(16))
    return oc.Point(get(p.x), get(p.y), get(p.z))


def point_vec_lane(p: dc.PointJ, b) -> list[oc.Point]:
    """PointJ coords (16, L, B) -> oracle Points at lane b."""
    arrs = [np.asarray(a) for a in p]
    L = arrs[0].shape[1]
    out = []
    for j in range(L):
        get = lambda a: sum(int(a[i, j, b]) << (16 * i) for i in range(16))
        out.append(oc.Point(get(arrs[0]), get(arrs[1]), get(arrs[2])))
    return out


def compressed_cols(pts_per_lane: list[list[oc.Point]]) -> np.ndarray:
    """pts_per_lane[b] = K points -> (33, K, B) uint32 SEC1 bytes."""
    B = len(pts_per_lane)
    K = len(pts_per_lane[0])
    out = np.zeros((33, K, B), dtype=np.uint32)
    for b, pts in enumerate(pts_per_lane):
        for k, pt in enumerate(pts):
            out[:, k, b] = np.frombuffer(pt.to_bytes(), dtype=np.uint8)
    return out


# -- WNLA proofs ----------------------------------------------------------

def wnla_proofs_to_bytes(proofs: list[WNLAProof]) -> WNLAProofBytes:
    """One oracle proof per batch lane -> device wire form. All lanes
    must share sizes (same instance dims)."""
    return WNLAProofBytes(
        r=compressed_cols([p.r for p in proofs]),
        x=compressed_cols([p.x for p in proofs]),
        l=scalar_cols([p.l for p in proofs]),
        n=scalar_cols([p.n for p in proofs]),
    )


def wnla_dev_to_oracle(proof: WNLAProofDev, b) -> WNLAProof:
    return WNLAProof(
        r=point_vec_lane(proof.r, b),
        x=point_vec_lane(proof.x, b),
        l=scalars_lane(proof.l, b),
        n=scalars_lane(proof.n, b),
    )


def wnla_dev_to_bytes(proof: WNLAProofDev) -> WNLAProofBytes:
    """Device proof (Jacobian points) -> wire form, compressing on device."""
    return WNLAProofBytes(
        r=dc.compress(proof.r),
        x=dc.compress(proof.x),
        l=proof.l,
        n=proof.n,
    )


# -- circuit / reciprocal proofs ------------------------------------------

def point_bytes(pts: list[oc.Point]) -> np.ndarray:
    """One point per lane -> (33, B) uint32 SEC1 bytes."""
    return np.stack(
        [np.frombuffer(p.to_bytes(), dtype=np.uint8).astype(np.uint32) for p in pts],
        axis=1,
    )


def circuit_proofs_to_bytes(proofs):
    """One oracle CircuitProof per lane -> device CircuitProofBytes."""
    from .circuit import CircuitProofBytes

    return CircuitProofBytes(
        c_l=point_bytes([p.c_l for p in proofs]),
        c_r=point_bytes([p.c_r for p in proofs]),
        c_o=point_bytes([p.c_o for p in proofs]),
        c_s=point_bytes([p.c_s for p in proofs]),
        wnla=WNLAProofBytes(
            r=compressed_cols([p.r for p in proofs]),
            x=compressed_cols([p.x for p in proofs]),
            l=scalar_cols([p.l for p in proofs]),
            n=scalar_cols([p.n for p in proofs]),
        ),
    )


def circuit_dev_to_oracle(proof, b):
    """Device CircuitProofDev -> oracle CircuitProof at lane b."""
    from ..oracle.circuit import CircuitProof

    return CircuitProof(
        c_l=point_lane(proof.c_l, b),
        c_r=point_lane(proof.c_r, b),
        c_o=point_lane(proof.c_o, b),
        c_s=point_lane(proof.c_s, b),
        r=point_vec_lane(proof.wnla.r, b),
        x=point_vec_lane(proof.wnla.x, b),
        l=scalars_lane(proof.wnla.l, b),
        n=scalars_lane(proof.wnla.n, b),
    )


def reciprocal_proofs_to_bytes(proofs):
    """One oracle ReciprocalProof per lane -> device ReciprocalProofBytes."""
    from .reciprocal import ReciprocalProofBytes

    return ReciprocalProofBytes(
        circuit=circuit_proofs_to_bytes([p.circuit_proof for p in proofs]),
        r=point_bytes([p.r for p in proofs]),
    )


def reciprocal_dev_to_oracle(proof, b):
    from ..oracle.reciprocal import ReciprocalProof

    return ReciprocalProof(
        circuit_proof=circuit_dev_to_oracle(proof.circuit, b),
        r=point_lane(proof.r, b),
    )


# -- instance lifting ------------------------------------------------------

def matrix_const(rows: list[list[int]], B: int) -> np.ndarray:
    """Host int matrix -> (16, R, C, B) broadcast limb tensor."""
    R, C = len(rows), len(rows[0])
    out = np.zeros((16, R, C, 1), dtype=np.uint32)
    for r in range(R):
        for c_ in range(C):
            out[:, r, c_, 0] = f.int_to_limbs(rows[r][c_])[:, 0]
    return np.broadcast_to(out, (16, R, C, B))


def vector_const(vals: list[int], B: int) -> np.ndarray:
    """Host int vector -> (16, L, B) broadcast limbs."""
    return np.broadcast_to(f.ints_to_limbs(vals)[:, :, None], (16, len(vals), B))


def circuit_from_oracle(circ, B: int):
    """Lift an oracle ArithmeticCircuit instance (static W/a data) into an
    ArithmeticCircuitDevice over a B-lane batch."""
    from .circuit import ArithmeticCircuitDevice

    return ArithmeticCircuitDevice(
        dim_nm=circ.dim_nm,
        dim_no=circ.dim_no,
        k=circ.k,
        dim_nl=circ.dim_nl,
        dim_nv=circ.dim_nv,
        dim_nw=circ.dim_nw,
        g=point_batched(circ.g, B),
        g_vec=points_batched(circ.g_vec, B),
        h_vec=points_batched(circ.h_vec, B),
        W_m=matrix_const(circ.W_m, B),
        W_l=matrix_const(circ.W_l, B),
        a_m=vector_const(circ.a_m, B),
        a_l=vector_const(circ.a_l, B),
        f_l=circ.f_l,
        f_m=circ.f_m,
        g_vec_=points_batched(circ.g_vec_, B),
        h_vec_=points_batched(circ.h_vec_, B),
        partition=circ.partition,
    )
