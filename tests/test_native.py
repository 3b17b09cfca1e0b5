"""C++ native host engine vs the Python oracle: bit-exact proofs,
transcript parity, wire-format pack/unpack (native/bppp.cc)."""

import numpy as np
import pytest

from bppp_tpu import native
from bppp_tpu.oracle import curve as oc
from bppp_tpu.oracle.field import fn_inv, fn_mul
from bppp_tpu.oracle.merlin import Transcript
from bppp_tpu.oracle.u64 import U64RangeProof
from bppp_tpu.utils.rng import ReplayRng, SeededRng

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native engine not built (no g++?)"
)


@pytest.fixture(scope="module")
def public():
    rng = SeededRng("native tests")
    return U64RangeProof(
        g=oc.GENERATOR.mul(rng.scalar()),
        g_vec=[oc.GENERATOR.mul(rng.scalar()) for _ in range(16)],
        h_vec=[oc.GENERATOR.mul(rng.scalar()) for _ in range(32)],
    ), rng


def test_field_probes():
    rng = SeededRng("native field")
    a, b = rng.scalar(), rng.scalar()
    assert native.fn_mul(a, b) == fn_mul(a, b)
    assert native.fn_inv(a) == fn_inv(a)
    assert native.pt_mul(oc.GENERATOR.to_bytes(), a) == oc.GENERATOR.mul(a).to_bytes()


def test_merlin_parity():
    t = Transcript(b"parity")
    t.append_message(b"m", b"x" * 200)  # spans a sponge boundary
    want = t.challenge_bytes(b"c", 32)
    assert native.merlin_probe(b"parity", b"m", b"x" * 200, b"c") == want


def test_native_prove_bit_exact(public):
    public, rng = public
    x, s = 0xFEDCBA9876543210, rng.scalar()
    draws = rng.scalars(52)
    blob, vb = native.u64_prove(public, x, s, b"u64 range proof", draws)
    want = public.prove(x, s, Transcript(b"u64 range proof"), ReplayRng(draws))
    assert native.pack_oracle_proof(want) == blob
    # wire round trip
    back = native.unpack_to_oracle(blob)
    assert native.pack_oracle_proof(back) == blob
    # native verifies, oracle verifies, tamper fails
    assert native.u64_verify(public, vb, b"u64 range proof", blob)
    com = public.commit_value(x, s)
    assert com.to_bytes() == vb
    assert public.verify(com, back, Transcript(b"u64 range proof"))
    bad = bytearray(blob)
    bad[50] ^= 2
    assert not native.u64_verify(public, vb, b"u64 range proof", bytes(bad))


def test_pack_batch_layout(public):
    public, rng = public
    draws = rng.scalars(52)
    blob, vb = native.u64_prove(public, 42, rng.scalar(), b"u64 range proof", draws)
    pb = native.pack_batch([blob, blob])
    assert np.asarray(pb.circuit.c_l).shape == (33, 2)
    assert np.asarray(pb.circuit.wnla.x).shape == (33, 4, 2)
    assert np.asarray(pb.circuit.wnla.l).shape == (16, 2, 2)
    # lane 0 bytes match the blob
    assert bytes(np.asarray(pb.circuit.c_l)[:, 0].astype(np.uint8)) == blob[:33]
    assert bytes(np.asarray(pb.r)[:, 0].astype(np.uint8)) == blob[4 * 33 : 5 * 33]
