"""Frozen proof vectors: the committed JSON fixtures pin the exact bytes
the deterministic prover must produce (regression tripwire for any change
to field/curve/transcript/protocol code). The reference repo has no fixed
vectors at all (SURVEY.md §4) — proofs there are OsRng-randomized."""

import json
import os

from bppp_tpu.oracle import curve as oc
from bppp_tpu.oracle import serde
from bppp_tpu.oracle.field import fn_mul
from bppp_tpu.oracle.merlin import Transcript
from bppp_tpu.oracle.u64 import U64RangeProof
from bppp_tpu.oracle.wnla import WNLA
from bppp_tpu.utils.rng import SeededRng

FIX = os.path.join(os.path.dirname(__file__), "fixtures")


def test_u64_frozen_vector():
    fx = json.load(open(os.path.join(FIX, "u64_proof.json")))
    rng = SeededRng(fx["seed"])
    pub = U64RangeProof(
        g=oc.GENERATOR.mul(rng.scalar()),
        g_vec=[oc.GENERATOR.mul(rng.scalar()) for _ in range(16)],
        h_vec=[oc.GENERATOR.mul(rng.scalar()) for _ in range(32)],
    )
    x, s = fx["x"], rng.scalar()
    com = pub.commit_value(x, s)
    assert serde.point_to_hex(com) == fx["commitment"]

    # reproduce byte-identically from the seeded RNG
    proof = pub.prove(x, s, Transcript(b"u64 range proof"), rng)
    assert serde.reciprocal_proof_to_dict(proof) == fx["proof"]

    # and the frozen proof verifies as loaded
    loaded = serde.reciprocal_proof_from_dict(fx["proof"])
    assert pub.verify(com, loaded, Transcript(b"u64 range proof"))


def test_wnla_frozen_vector():
    fx = json.load(open(os.path.join(FIX, "wnla_proof.json")))
    rng = SeededRng(fx["seed"])
    w = WNLA(
        g=oc.GENERATOR.mul(rng.scalar()),
        g_vec=[oc.GENERATOR.mul(rng.scalar()) for _ in range(4)],
        h_vec=[oc.GENERATOR.mul(rng.scalar()) for _ in range(4)],
        c=rng.scalars(4),
        rho=(rho := rng.scalar()),
        mu=fn_mul(rho, rho),
    )
    l, n = [1, 2, 3, 4], [8, 7, 6, 5]
    com = w.commit(l, n)
    assert serde.point_to_hex(com) == fx["commitment"]
    proof = w.prove(com, Transcript(b"wnla test"), l, n)
    assert serde.wnla_proof_to_dict(proof) == fx["proof"]
    loaded = serde.wnla_proof_from_dict(fx["proof"])
    assert w.verify(com, Transcript(b"wnla test"), loaded)
