"""ctypes bindings for the C++ native host engine (native/bppp.cc).

Builds lazily with g++ on first use (cached as native/libbppp.so); falls
back gracefully (available() -> False) when no toolchain exists. The
native engine mirrors the host oracle bit-for-bit — tests cross-check
proofs/challenges between oracle, native, and device paths.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

_DIR = Path(__file__).resolve().parent.parent.parent / "native"
_SRC = _DIR / "bppp.cc"
_LIB = _DIR / "libbppp.so"

_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-std=c++17",
             str(_SRC), "-o", str(_LIB)],
            check=True, capture_output=True, timeout=300,
        )
        return True
    except Exception:
        return False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(str(_LIB))
    except OSError:
        return None
    lib.bppp_u64_prove.restype = ctypes.c_int
    lib.bppp_u64_verify.restype = ctypes.c_int
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


PROOF_BYTES = 525


def _pts_buf(points) -> bytes:
    return b"".join(p.to_bytes() for p in points)


def u64_prove(public, x: int, s: int, label: bytes, blind: list[int]):
    """Native u64 prove. public: oracle U64RangeProof. Returns
    (proof_bytes(525), commitment_bytes(33))."""
    lib = _load()
    assert lib is not None, "native engine unavailable"
    assert len(blind) == 52
    out = ctypes.create_string_buffer(PROOF_BYTES)
    out_v = ctypes.create_string_buffer(33)
    blind_buf = b"".join(b.to_bytes(32, "big") for b in blind)
    rc = lib.bppp_u64_prove(
        label, len(label),
        public.g.to_bytes(), _pts_buf(public.g_vec), _pts_buf(public.h_vec),
        ctypes.c_uint64(x), s.to_bytes(32, "big"), blind_buf, out, out_v,
    )
    if rc != 0:
        raise RuntimeError(f"native prove failed rc={rc}")
    return bytes(out.raw), bytes(out_v.raw)


def u64_verify(public, v_bytes: bytes, label: bytes, proof_bytes: bytes) -> bool:
    lib = _load()
    assert lib is not None, "native engine unavailable"
    assert len(proof_bytes) == PROOF_BYTES and len(v_bytes) == 33
    rc = lib.bppp_u64_verify(
        label, len(label),
        public.g.to_bytes(), _pts_buf(public.g_vec), _pts_buf(public.h_vec),
        v_bytes, proof_bytes,
    )
    return rc == 1


def merlin_probe(label: bytes, msg_label: bytes, msg: bytes, ch_label: bytes) -> bytes:
    lib = _load()
    assert lib is not None
    out = ctypes.create_string_buffer(32)
    lib.bppp_merlin_probe(
        label, len(label), msg_label, len(msg_label), msg, len(msg),
        ch_label, len(ch_label), out,
    )
    return bytes(out.raw)


def fn_mul(a: int, b: int) -> int:
    lib = _load()
    out = ctypes.create_string_buffer(32)
    lib.bppp_fn_mul(a.to_bytes(32, "big"), b.to_bytes(32, "big"), out)
    return int.from_bytes(out.raw, "big")


def fp_mul(a: int, b: int) -> int:
    lib = _load()
    out = ctypes.create_string_buffer(32)
    lib.bppp_fp_mul(a.to_bytes(32, "big"), b.to_bytes(32, "big"), out)
    return int.from_bytes(out.raw, "big")


def fn_inv(a: int) -> int:
    lib = _load()
    out = ctypes.create_string_buffer(32)
    lib.bppp_fn_inv(a.to_bytes(32, "big"), out)
    return int.from_bytes(out.raw, "big")


def pt_mul(p_bytes: bytes, k: int) -> bytes:
    lib = _load()
    out = ctypes.create_string_buffer(33)
    lib.bppp_pt_mul(p_bytes, k.to_bytes(32, "big"), out)
    return bytes(out.raw)


# -- wire-format pack/unpack (525-byte layout, see native/bppp.cc) --------

def pack_oracle_proof(proof) -> bytes:
    """oracle ReciprocalProof -> 525-byte wire blob."""
    cp = proof.circuit_proof
    out = b"".join(
        p.to_bytes() for p in (cp.c_l, cp.c_r, cp.c_o, cp.c_s, proof.r)
    )
    out += b"".join(p.to_bytes() for p in cp.x)
    out += b"".join(p.to_bytes() for p in cp.r)
    out += b"".join(v.to_bytes(32, "big") for v in cp.l + cp.n)
    assert len(out) == PROOF_BYTES
    return out


def unpack_to_oracle(blob: bytes):
    """525-byte wire blob -> oracle ReciprocalProof."""
    from ..oracle import curve
    from ..oracle.circuit import CircuitProof
    from ..oracle.reciprocal import ReciprocalProof

    assert len(blob) == PROOF_BYTES
    pts = [curve.from_bytes(blob[33 * i : 33 * (i + 1)]) for i in range(13)]
    sc = blob[13 * 33 :]
    scalars = [int.from_bytes(sc[32 * i : 32 * (i + 1)], "big") for i in range(3)]
    return ReciprocalProof(
        circuit_proof=CircuitProof(
            c_l=pts[0], c_r=pts[1], c_o=pts[2], c_s=pts[3],
            x=pts[5:9], r=pts[9:13], l=scalars[:2], n=scalars[2:],
        ),
        r=pts[4],
    )


def pack_batch(blobs: list[bytes]):
    """N wire blobs -> the device verifier's ReciprocalProofBytes arrays
    (batch-last layout), via one vectorized numpy reinterpret."""
    import numpy as np

    from ..protocol.circuit import CircuitProofBytes
    from ..protocol.reciprocal import ReciprocalProofBytes
    from ..protocol.wnla import WNLAProofBytes

    B = len(blobs)
    raw = np.frombuffer(b"".join(blobs), dtype=np.uint8).reshape(B, PROOF_BYTES)
    pts = raw[:, : 13 * 33].reshape(B, 13, 33).astype(np.uint32)
    sc = raw[:, 13 * 33 :].reshape(B, 3, 32)

    def pt(i):
        return np.ascontiguousarray(pts[:, i].T)  # (33, B)

    def pt_range(lo, hi):  # (33, K, B), innermost-first kept as stored
        return np.ascontiguousarray(pts[:, lo:hi].transpose(2, 1, 0))

    def scalars(lo, hi):  # (16, L, B) limbs from BE bytes
        be = sc[:, lo:hi]  # (B, L, 32)
        limbs = np.zeros((16, hi - lo, B), dtype=np.uint32)
        for i in range(16):
            hi_b = be[:, :, 30 - 2 * i].astype(np.uint32)
            lo_b = be[:, :, 31 - 2 * i].astype(np.uint32)
            limbs[i] = ((hi_b << 8) | lo_b).T
        return limbs

    return ReciprocalProofBytes(
        circuit=CircuitProofBytes(
            c_l=pt(0), c_r=pt(1), c_o=pt(2), c_s=pt(3),
            wnla=WNLAProofBytes(
                x=pt_range(5, 9), r=pt_range(9, 13),
                l=scalars(0, 2), n=scalars(2, 3),
            ),
        ),
        r=pt(4),
    )
