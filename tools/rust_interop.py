#!/usr/bin/env python
"""Rust-reference interop harness (VERDICT r3 missing #1 / SURVEY Phase
0's fixture letter, as far as a Rust-less environment allows).

Two one-command directions:

  python tools/rust_interop.py export            # -> interop/u64_case.json
  python tools/rust_interop.py verify PROOF.json [--case interop/u64_case.json]
                                                 [--commitment HEX]

`export` writes a self-contained case file a Rust driver can consume to
(a) verify OUR proof with the reference crate and (b) regenerate the
SAME proof bit-exact by replaying the blinding draw stream:

  format            "bppp-interop v1"
  transcript_label  merlin transcript label (caller-chosen, tests.rs:34)
  x                 the u64 value; s: 32-byte BE hex blinding scalar
  g / g_vec / h_vec SEC1-compressed hex points (k256 serde convention;
                    identity would encode as "00")
  commitment        SEC1 hex of commit_value(x, s) = x*g + s*h_vec[0]
  draw_blocks       52 x 128-hex-char (64-byte) blocks. One scalar draw
                    = one block, wide-reduced as a BIG-ENDIAN 512-bit
                    integer mod n — value-equivalent to k256 v0.13
                    Scalar::generate_biased fed those bytes by
                    RngCore::fill_bytes (bppp_tpu/utils/rng.py spec).
                    Draw ORDER: r_blind, ro(7), rl(6), rr(5), l_s(17),
                    n_s(16) — matching circuit.rs:264-298,371-372.
  draws             the reduced scalars (32-byte BE hex), for checking a
                    replay implementation without running a prover
  proof             serde_json shape of the reference's
                    reciprocal::SerializableProof (tests.rs:38)

`verify` checks an externally-supplied proof JSON (reference-generated,
same serde shape) against OUR host-oracle verifier using the case
file's generators + label. Exit code 0 = accepted.

tools/rust_snippet.rs (vendored text, not built — no Rust toolchain in
this image) shows the ~30-line Rust driver for both directions.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bppp_tpu.oracle import curve as oc  # noqa: E402
from bppp_tpu.oracle import serde  # noqa: E402
from bppp_tpu.oracle.field import N  # noqa: E402
from bppp_tpu.oracle.merlin import Transcript  # noqa: E402
from bppp_tpu.oracle.u64 import U64RangeProof  # noqa: E402
from bppp_tpu.protocol.u64 import U64_BLIND_DRAWS  # noqa: E402
from bppp_tpu.utils.rng import ReplayRng, SeededRng  # noqa: E402

CASE_PATH = os.path.join(REPO, "interop", "u64_case.json")
LABEL = "u64 range proof"
SEED = "rust interop case v1"
X = 123456  # the reference's own test value (tests.rs:16)


def _seeded_block(seed: bytes, i: int) -> bytes:
    """The exact 64-byte block SeededRng.scalar() reduces (rng.py)."""
    h1 = hashlib.sha256(seed + i.to_bytes(8, "little") + b"\x00").digest()
    h2 = hashlib.sha256(seed + i.to_bytes(8, "little") + b"\x01").digest()
    return h1 + h2


def export(path: str = CASE_PATH) -> None:
    rng = SeededRng(SEED)
    g = oc.GENERATOR.mul(rng.scalar())
    g_vec = [oc.GENERATOR.mul(rng.scalar()) for _ in range(16)]
    h_vec = [oc.GENERATOR.mul(rng.scalar()) for _ in range(32)]
    s = rng.scalar()
    first_draw = rng.counter  # blinding draws start AFTER the setup draws

    blocks = [
        _seeded_block(rng.seed, first_draw + i) for i in range(U64_BLIND_DRAWS)
    ]
    draws = [int.from_bytes(b, "big") % N for b in blocks]
    # replay must agree with the live stream
    assert draws == SeededRng(SEED).scalars(first_draw + U64_BLIND_DRAWS)[first_draw:]

    public = U64RangeProof(g=g, g_vec=g_vec, h_vec=h_vec)
    com = public.commit_value(X, s)
    proof = public.prove(X, s, Transcript(LABEL.encode()), ReplayRng(draws))
    assert public.verify(com, proof, Transcript(LABEL.encode()))

    case = {
        "format": "bppp-interop v1",
        "transcript_label": LABEL,
        "x": X,
        "s": serde.scalar_to_hex(s),
        "g": serde.point_to_hex(g),
        "g_vec": [serde.point_to_hex(p) for p in g_vec],
        "h_vec": [serde.point_to_hex(p) for p in h_vec],
        "commitment": serde.point_to_hex(com),
        "draw_blocks": [b.hex() for b in blocks],
        "draws": [serde.scalar_to_hex(d) for d in draws],
        "proof": serde.reciprocal_proof_to_dict(proof),
    }
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as fh:
        json.dump(case, fh, indent=1)
    print(f"wrote {path} ({len(blocks)} draw blocks; proof verified)")


def verify(proof_path: str, case_path: str = CASE_PATH,
           commitment_hex: str | None = None) -> bool:
    with open(case_path) as fh:
        case = json.load(fh)
    with open(proof_path) as fh:
        proof = serde.reciprocal_proof_from_dict(json.load(fh))
    public = U64RangeProof(
        g=serde.point_from_hex(case["g"]),
        g_vec=[serde.point_from_hex(h) for h in case["g_vec"]],
        h_vec=[serde.point_from_hex(h) for h in case["h_vec"]],
    )
    com = serde.point_from_hex(commitment_hex or case["commitment"])
    label = case["transcript_label"].encode()
    ok = public.verify(com, proof, Transcript(label))
    print(f"{proof_path}: {'ACCEPTED' if ok else 'REJECTED'}")
    return ok


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)
    sub.add_parser("export")
    v = sub.add_parser("verify")
    v.add_argument("proof")
    v.add_argument("--case", default=CASE_PATH)
    v.add_argument("--commitment", default=None)
    args = ap.parse_args()
    if args.cmd == "export":
        export()
        return 0
    return 0 if verify(args.proof, args.case, args.commitment) else 1


if __name__ == "__main__":
    sys.exit(main())
