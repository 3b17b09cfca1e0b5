"""JSON proof interchange (k256 serde conventions): round trips and
format checks (SURVEY.md §2 row 8; reference serde twins wnla.rs:33-61,
circuit.rs:36-76, reciprocal.rs:37-59)."""

import json

from bppp_tpu.oracle import curve, serde
from bppp_tpu.oracle.field import N, fn_mul
from bppp_tpu.oracle.merlin import Transcript
from bppp_tpu.oracle.u64 import U64RangeProof
from bppp_tpu.oracle.wnla import WNLA
from bppp_tpu.utils.rng import SeededRng


def test_wnla_json_round_trip():
    rng = SeededRng("serde wnla")
    g = curve.GENERATOR.mul(rng.scalar())
    wnla = WNLA(
        g=g,
        g_vec=[curve.GENERATOR.mul(rng.scalar()) for _ in range(4)],
        h_vec=[curve.GENERATOR.mul(rng.scalar()) for _ in range(4)],
        c=rng.scalars(4),
        rho=(rho := rng.scalar()),
        mu=fn_mul(rho, rho),
    )
    l, n = rng.scalars(4), rng.scalars(4)
    com = wnla.commit(l, n)
    proof = wnla.prove(com, Transcript(b"wnla test"), l, n)

    s = serde.dumps(proof)
    d = json.loads(s)
    # k256 serde formats: 33-byte SEC1 hex points, 32-byte BE hex scalars
    assert all(len(h) == 66 and h[:2] in ("02", "03") for h in d["r"] + d["x"])
    assert all(len(h) == 64 for h in d["l"] + d["n"])

    back = serde.loads_wnla(s)
    assert wnla.verify(com, Transcript(b"wnla test"), back)


def test_u64_json_round_trip():
    rng = SeededRng("serde u64")
    g = curve.GENERATOR.mul(rng.scalar())
    public = U64RangeProof(
        g=g,
        g_vec=[curve.GENERATOR.mul(rng.scalar()) for _ in range(16)],
        h_vec=[curve.GENERATOR.mul(rng.scalar()) for _ in range(32)],
    )
    x, s = 987654321, rng.scalar()
    com = public.commit_value(x, s)
    proof = public.prove(x, s, Transcript(b"u64 range proof"), rng)

    js = serde.dumps(proof)
    d = json.loads(js)
    assert set(d) == {"circuit_proof", "r"}
    assert set(d["circuit_proof"]) == {"c_l", "c_r", "c_o", "c_s", "r", "x", "l", "n"}

    back = serde.loads_reciprocal(js)
    assert public.verify(com, back, Transcript(b"u64 range proof"))

    # identity encodes as the 1-byte "00" (k256 EncodedPoint convention)
    assert serde.point_to_hex(curve.IDENTITY) == "00"
    assert serde.point_from_hex("00").is_identity()

    # out-of-range scalar rejected
    try:
        serde.scalar_from_hex(format(N, "064x"))
        raise AssertionError("expected ValueError")
    except ValueError:
        pass
