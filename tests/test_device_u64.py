"""Device u64 range proof end-to-end vs host oracle: bit-exact proofs,
batched verify, per-lane values (SURVEY.md §7 Phase 6 milestone)."""

import numpy as np
import pytest

from bppp_tpu.oracle import curve as oc
from bppp_tpu.oracle.merlin import Transcript as HostTranscript
from bppp_tpu.oracle.u64 import U64RangeProof
from bppp_tpu.protocol import convert as cv
from bppp_tpu.protocol.u64 import U64_BLIND_DRAWS, U64RangeProofDevice
from bppp_tpu.transcript.device import Transcript as DevTranscript
from bppp_tpu.utils import aot
from bppp_tpu.utils.rng import ReplayRng, SeededRng

B = 2
LABEL = b"u64 range proof"
XS = [123456, 2**64 - 1]


@pytest.fixture(scope="module")
def fixture():
    rng = SeededRng("device u64")
    g = oc.GENERATOR.mul(rng.scalar())
    g_vec = [oc.GENERATOR.mul(rng.scalar()) for _ in range(16)]
    h_vec = [oc.GENERATOR.mul(rng.scalar()) for _ in range(32)]
    public = U64RangeProof(g=g, g_vec=g_vec, h_vec=h_vec)

    lanes = []
    for b in range(B):
        x = XS[b]
        s = rng.scalar()
        draws = rng.scalars(U64_BLIND_DRAWS)
        com = public.commit_value(x, s)
        proof = public.prove(x, s, HostTranscript(LABEL), ReplayRng(draws))
        assert public.verify(com, proof, HostTranscript(LABEL))
        lanes.append(dict(x=x, s=s, draws=draws, com=com, proof=proof))

    dev = U64RangeProofDevice(
        g=cv.point_batched(g, B),
        g_vec=cv.points_batched(g_vec, B),
        h_vec=cv.points_batched(h_vec, B),
    )
    x_words = np.zeros((2, B), dtype=np.uint32)
    for b, ln in enumerate(lanes):
        x_words[0, b] = ln["x"] & 0xFFFFFFFF
        x_words[1, b] = ln["x"] >> 32
    args = dict(
        x=x_words,
        s=np.asarray(
            np.concatenate(
                [np.asarray(cv.f.int_to_limbs(ln["s"])) for ln in lanes], axis=1
            )
        ),
        blind=cv.scalar_cols([ln["draws"] for ln in lanes]),
        com_bytes=cv.point_bytes([ln["com"] for ln in lanes]),
    )
    return public, lanes, dev, args


def _prove_prog(dev):
    def fn(args):
        t = DevTranscript(LABEL, batch=(B,))
        return dev.prove(args["x"], args["s"], t, args["blind"])

    return aot.cached("test_u64_prove", fn)


def test_device_u64_prove_bit_exact(fixture):
    public, lanes, dev, args = fixture
    proof = _prove_prog(dev)(args)
    for b, ln in enumerate(lanes):
        got = cv.reciprocal_dev_to_oracle(proof, b)
        want = ln["proof"]
        assert got.r.to_bytes() == want.r.to_bytes()
        g_cp, w_cp = got.circuit_proof, want.circuit_proof
        for name in ("c_l", "c_r", "c_o", "c_s"):
            assert getattr(g_cp, name).to_bytes() == getattr(w_cp, name).to_bytes(), name
        assert [p.to_bytes() for p in g_cp.r] == [p.to_bytes() for p in w_cp.r]
        assert [p.to_bytes() for p in g_cp.x] == [p.to_bytes() for p in w_cp.x]
        assert g_cp.l == w_cp.l and g_cp.n == w_cp.n


def test_device_u64_verify(fixture):
    public, lanes, dev, args = fixture
    pb = cv.reciprocal_proofs_to_bytes([ln["proof"] for ln in lanes])

    def fn(args, pb):
        t = DevTranscript(LABEL, batch=(B,))
        return dev.verify(args["com_bytes"], t, pb)

    prog = aot.cached("test_u64_verify", fn)
    ok = np.asarray(prog(args, pb))
    assert ok.tolist() == [True, True]

    # tampered poles commitment -> lane fails
    bad_r = np.asarray(pb.r).copy()
    bad_r[5, 0] ^= 0x40
    ok2 = np.asarray(prog(args, pb._replace(r=bad_r)))
    assert ok2.tolist() == [False, True]

    # tampered final scalar
    bad_l = np.asarray(pb.circuit.wnla.l).copy()
    bad_l[0, 0, 1] = (bad_l[0, 0, 1] + 1) % (1 << 16)
    ok3 = np.asarray(
        prog(args, pb._replace(circuit=pb.circuit._replace(wnla=pb.circuit.wnla._replace(l=bad_l))))
    )
    assert ok3.tolist() == [True, False]


def _fast_prog(dev):
    def fn(args, pb):
        t = DevTranscript(LABEL, batch=(B,))
        return dev.verify(args["com_bytes"], t, pb, fast=True)

    return aot.cached("test_u64_verify_fast", fn)


def test_device_u64_verify_fast(fixture):
    """The collapsed one-MSM verifier (the bench path) accepts exactly the
    proofs the mirror verifier accepts."""
    public, lanes, dev, args = fixture
    pb = cv.reciprocal_proofs_to_bytes([ln["proof"] for ln in lanes])

    prog = _fast_prog(dev)
    ok = np.asarray(prog(args, pb))
    assert ok.tolist() == [True, True]

    bad_r = np.asarray(pb.r).copy()
    bad_r[5, 0] ^= 0x40
    ok2 = np.asarray(prog(args, pb._replace(r=bad_r)))
    assert ok2.tolist() == [False, True]

    bad_l = np.asarray(pb.circuit.wnla.l).copy()
    bad_l[0, 0, 1] = (bad_l[0, 0, 1] + 1) % (1 << 16)
    ok3 = np.asarray(
        prog(args, pb._replace(circuit=pb.circuit._replace(wnla=pb.circuit.wnla._replace(l=bad_l))))
    )
    assert ok3.tolist() == [True, False]

    bad_x = np.asarray(pb.circuit.wnla.x).copy()
    bad_x[3, 2, 0] ^= 0x11  # middle-round X point
    ok4 = np.asarray(
        prog(args, pb._replace(circuit=pb.circuit._replace(wnla=pb.circuit.wnla._replace(x=bad_x))))
    )
    assert ok4.tolist() == [False, True]


def test_device_u64_verify_malformed_bytes(fixture):
    """Raw wire bytes that never passed host deserialization must yield
    False — never an exception or an undefined accept bit (VERDICT r2
    #7). k256 rejects these at deserialize (off-curve x, invalid tag,
    non-canonical x >= p, scalar >= n); the device path instead folds an
    on-curve/canonicality mask into the result (reciprocal.verify
    wire_ok). Reuses the AOT'd fast-verify program — no new compile."""
    from bppp_tpu.oracle.field import N as N_INT
    from bppp_tpu.oracle.field import P as P_INT

    public, lanes, dev, args = fixture
    pb = cv.reciprocal_proofs_to_bytes([ln["proof"] for ln in lanes])
    prog = _fast_prog(dev)

    def expect(new_pb, want):
        assert np.asarray(prog(args, new_pb)).tolist() == want

    # off-curve x: smallest x with x^3 + 7 a quadratic non-residue
    x_nr = next(
        x for x in range(2, 100) if pow(x**3 + 7, (P_INT - 1) // 2, P_INT) != 1
    )
    bad = np.asarray(pb.r).copy()
    bad[0, 0] = 2
    bad[1:, 0] = list(x_nr.to_bytes(32, "big"))
    expect(pb._replace(r=bad), [False, True])

    # invalid SEC1 tag byte (only 2/3 compressed or 33x00 identity allowed)
    bad = np.asarray(pb.circuit.c_s).copy()
    bad[0, 0] = 7
    expect(pb._replace(circuit=pb.circuit._replace(c_s=bad)), [False, True])

    # non-canonical x >= p (0xFF..FF: x mod p may even be on-curve)
    bad = np.asarray(pb.r).copy()
    bad[0, 1] = 2
    bad[1:, 1] = 0xFF
    expect(pb._replace(r=bad), [True, False])

    # out-of-range final scalar: any 16-limb encoding >= n must be
    # rejected (k256 Scalar::from_repr). Note s+n malleability cannot
    # even be ENCODED for random s (n is within 2^129 of 2^256), so the
    # check matters exactly for encodings in [n, 2^256) like this one.
    bad_val = N_INT + 5
    bad_l = np.asarray(pb.circuit.wnla.l).copy()
    for i in range(16):
        bad_l[i, 0, 0] = (bad_val >> (16 * i)) & 0xFFFF
    expect(
        pb._replace(circuit=pb.circuit._replace(wnla=pb.circuit.wnla._replace(l=bad_l))),
        [False, True],
    )

    # pure garbage bytes everywhere in one lane
    rng = np.random.default_rng(3)
    garb = {}
    for name in ("c_l", "c_r", "c_o", "c_s"):
        b = np.asarray(getattr(pb.circuit, name)).copy()
        b[:, 1] = rng.integers(0, 256, size=33)
        garb[name] = b
    expect(pb._replace(circuit=pb.circuit._replace(**garb)), [True, False])

    # NON-NORMALIZED scalar limbs (ADVICE r3): limb[i] -= 1 and
    # limb[i-1] += 2^16 encode the SAME integer in the uint32 wire type,
    # so the proof would verify — but it is a second byte encoding of
    # one proof (malleability); the wire_ok normalization mask must
    # reject it.
    bad_l = np.asarray(pb.circuit.wnla.l).copy()
    i = next(j for j in range(1, 16) if bad_l[j, 0, 0] >= 1)
    bad_l[i, 0, 0] -= 1
    bad_l[i - 1, 0, 0] += 1 << 16
    expect(
        pb._replace(circuit=pb.circuit._replace(wnla=pb.circuit.wnla._replace(l=bad_l))),
        [False, True],
    )

    # NON-NORMALIZED point byte: hi_byte -= 1 / lo_byte += 256 of one
    # 16-bit limb pair aliases the same x in be_bytes_to_limbs — a
    # second encoding of the same point; decompress_checked's byte-range
    # mask must reject it.
    bad = np.asarray(pb.r).copy()
    k = next(j for j in range(1, 32, 2) if bad[j, 0] >= 1)
    bad[k, 0] -= 1
    bad[k + 1, 0] += 256
    expect(pb._replace(r=bad), [False, True])
