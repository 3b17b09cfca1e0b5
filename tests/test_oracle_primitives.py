"""Oracle primitive tests: field, curve, Keccak, STROBE/Merlin.

Known-answer vectors: SEC2 generator multiples, Keccak-f[1600] zero-state
permutation, and the public Merlin v3.0.0 transcript KAT.
"""

from bppp_tpu.oracle import curve, field, keccak
from bppp_tpu.oracle.merlin import Transcript
from bppp_tpu.oracle.curve import GENERATOR, IDENTITY, Point, from_bytes


def test_field_basics():
    a = 0xDEADBEEF1234567890ABCDEF << 128
    b = 12345678901234567890
    assert field.fp_mul(a, field.fp_inv(a)) == 1
    assert field.fn_mul(b, field.fn_inv(b)) == 1
    assert field.fp_add(field.P - 1, 1) == 0
    assert field.fn_sub(0, 1) == field.N - 1
    r = field.fp_sqrt(field.fp_mul(a % field.P, a % field.P))
    assert r in (a % field.P, field.P - a % field.P)


def test_generator_multiples():
    # 2G — standard known value.
    g2 = GENERATOR.double()
    x2, y2 = g2.to_affine()
    assert x2 == 0xC6047F9441ED7D6D3045406E95C07CD85C778E4B8CEF3CA7ABAC09B95C709EE5
    assert y2 == 0x1AE168FEA63DC339A3C58419466CEAEEF7F632653266D0E1236431A950CFE52A
    # add == double consistency, n*G == identity
    assert GENERATOR.add(GENERATOR).eq(g2)
    assert GENERATOR.mul(field.N).is_identity()
    assert GENERATOR.mul(field.N - 1).eq(GENERATOR.neg())
    # scalar-mul distributivity
    a, b = 0x123456789ABCDEF, 0xFEDCBA987654321
    assert GENERATOR.mul(a).add(GENERATOR.mul(b)).eq(GENERATOR.mul((a + b) % field.N))
    assert curve.is_on_curve(GENERATOR.mul(a))


def test_point_encoding_roundtrip():
    p = GENERATOR.mul(0xABCDEF0123456789)
    assert from_bytes(p.to_bytes()).eq(p)
    assert from_bytes(IDENTITY.to_bytes()).is_identity()
    assert len(p.to_bytes()) == 33
    assert p.to_bytes()[0] in (2, 3)


def test_point_exception_cases():
    p = GENERATOR.mul(7)
    assert p.add(IDENTITY).eq(p)
    assert IDENTITY.add(p).eq(p)
    assert p.add(p.neg()).is_identity()
    assert p.add(p).eq(p.double())
    assert IDENTITY.double().is_identity()


def test_keccak_f1600_zero_state():
    # First lane of Keccak-f[1600] applied to the all-zero state (KAT from
    # the Keccak reference "state after permutation on zero state").
    lanes = keccak.f1600([0] * 25)
    assert lanes[0] == 0xF1258F7940E1DDE7
    assert lanes[1] == 0x84D5CCF933C0478A
    assert lanes[24] == 0xEAF1FF7B5CECA249
    # Second application
    lanes2 = keccak.f1600(lanes)
    assert lanes2[0] == 0x2D5C954DF96ECB3C


def test_keccak_bytes_roundtrip():
    s = bytes(range(200))
    assert keccak.lanes_to_bytes(keccak.bytes_to_lanes(s)) == s


def test_merlin_kat_simple():
    # merlin v3.0.0 transcript KAT (merlin/src/transcript.rs
    # test `equivalence_simple`).
    t = Transcript(b"test protocol")
    t.append_message(b"some label", b"some data")
    challenge = t.challenge_bytes(b"challenge", 32)
    assert challenge.hex() == (
        "d5a21972d0d5fe320c0d263fac7fffb8145aa640af6e9bca177c03c7efcf0615"
    )


def test_merlin_divergence():
    # Different labels/messages must diverge; identical transcripts agree.
    t1 = Transcript(b"proto")
    t2 = Transcript(b"proto")
    t3 = Transcript(b"other proto")
    for t in (t1, t2, t3):
        t.append_message(b"m", b"payload")
    c1 = t1.challenge_bytes(b"c", 32)
    c2 = t2.challenge_bytes(b"c", 32)
    c3 = t3.challenge_bytes(b"c", 32)
    assert c1 == c2 != c3
    # drawing again gives fresh bytes
    assert t1.challenge_bytes(b"c", 32) != c1


def test_merlin_u64_framing():
    # append_u64 == append_message of LE8 bytes
    t1 = Transcript(b"p")
    t1.append_u64(b"n", 32)
    t2 = Transcript(b"p")
    t2.append_message(b"n", (32).to_bytes(8, "little"))
    assert t1.challenge_bytes(b"c", 32) == t2.challenge_bytes(b"c", 32)


def test_merlin_long_message_rate_crossing():
    # Messages larger than the 166-byte STROBE rate must trigger mid-absorb
    # permutations without corrupting state.
    t = Transcript(b"rate test")
    t.append_message(b"big", bytes(range(256)) * 3)
    c = t.challenge_bytes(b"c", 200)
    assert len(c) == 200
    # deterministic
    t2 = Transcript(b"rate test")
    t2.append_message(b"big", bytes(range(256)) * 3)
    assert t2.challenge_bytes(b"c", 200) == c
