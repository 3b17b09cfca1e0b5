"""Device WNLA vs host oracle: bit-exact proofs, batched verify.

Mirrors tests.rs:138-171 (wnla_works) but runs B=2 instances with
different witnesses/challenges per batch lane to exercise the batched
execution model."""

import jax
import numpy as np
import pytest

from bppp_tpu.oracle import curve as oc
from bppp_tpu.oracle.field import N, fn_mul
from bppp_tpu.oracle.merlin import Transcript as HostTranscript
from bppp_tpu.oracle.wnla import WNLA
from bppp_tpu.ops import curve as dc
from bppp_tpu.ops import field as f
from bppp_tpu.protocol import convert as cv
from bppp_tpu.protocol.wnla import WNLADevice, WNLAProofBytes
from bppp_tpu.transcript.device import Transcript as DevTranscript
from bppp_tpu.utils import aot
from bppp_tpu.utils.rng import SeededRng

SZ = 4
B = 2
LABEL = b"wnla test"


@pytest.fixture(scope="module")
def fixture():
    rng = SeededRng("device wnla")
    g = oc.GENERATOR.mul(rng.scalar())
    g_vec = [oc.GENERATOR.mul(rng.scalar()) for _ in range(SZ)]
    h_vec = [oc.GENERATOR.mul(rng.scalar()) for _ in range(SZ)]

    lanes = []
    for b in range(B):
        c = rng.scalars(SZ)
        rho = rng.scalar()
        l = rng.scalars(SZ)
        n = rng.scalars(SZ)
        wnla = WNLA(g=g, g_vec=g_vec, h_vec=h_vec, c=c, rho=rho, mu=fn_mul(rho, rho))
        com = wnla.commit(l, n)
        proof = wnla.prove(com, HostTranscript(LABEL), l, n)
        assert wnla.verify(com, HostTranscript(LABEL), proof)
        lanes.append(dict(c=c, rho=rho, l=l, n=n, wnla=wnla, com=com, proof=proof))

    dev = dict(
        g=cv.point_batched(g, B),
        g_vec=cv.points_batched(g_vec, B),
        h_vec=cv.points_batched(h_vec, B),
        c=cv.scalar_cols([ln["c"] for ln in lanes]),
        rho=f.ints_to_limbs([ln["rho"] for ln in lanes]),
        mu=f.ints_to_limbs([fn_mul(ln["rho"], ln["rho"]) for ln in lanes]),
        l=cv.scalar_cols([ln["l"] for ln in lanes]),
        n=cv.scalar_cols([ln["n"] for ln in lanes]),
        # per-lane commitments: from_int_points with batch=() puts the
        # lane list on axis 1 -> coords (16, B), exactly the batched shape
        com=dc.from_int_points([ln["com"] for ln in lanes]),
    )
    return lanes, dev


def _mk(dev):
    return WNLADevice(dev["g"], dev["g_vec"], dev["h_vec"], dev["c"],
                      jax.numpy.asarray(dev["rho"]), jax.numpy.asarray(dev["mu"]))


_commit_prog = aot.cached("test_wnla_commit", lambda dev: _mk(dev).commit(dev["l"], dev["n"]))


def _prove_fn(dev):
    t = DevTranscript(LABEL, batch=(B,))
    return _mk(dev).prove(dev["com"], t, dev["l"], dev["n"])


_prove_prog = aot.cached("test_wnla_prove", _prove_fn)


def _verify_fn(dev, pb):
    t = DevTranscript(LABEL, batch=(B,))
    return _mk(dev).verify(dev["com"], t, pb)


_verify_prog = aot.cached("test_wnla_verify", _verify_fn)


def test_device_commit_matches(fixture):
    lanes, dev = fixture
    com = _commit_prog(dev)
    for b, ln in enumerate(lanes):
        assert cv.point_lane(com, b).eq(ln["com"])


def test_device_prove_bit_exact(fixture):
    lanes, dev = fixture
    proof = _prove_prog(dev)
    for b, ln in enumerate(lanes):
        got = cv.wnla_dev_to_oracle(proof, b)
        want = ln["proof"]
        assert [p.to_bytes() for p in got.r] == [p.to_bytes() for p in want.r]
        assert [p.to_bytes() for p in got.x] == [p.to_bytes() for p in want.x]
        assert got.l == want.l
        assert got.n == want.n


def test_device_verify_accepts_and_rejects(fixture):
    lanes, dev = fixture
    pb = cv.wnla_proofs_to_bytes([ln["proof"] for ln in lanes])

    ok = np.asarray(_verify_prog(dev, pb))
    assert ok.tolist() == [True, True]

    # tamper lane 1's final scalar -> only lane 1 fails
    bad_l = np.asarray(pb.l).copy()
    bad_l[0, 0, 1] = (bad_l[0, 0, 1] + 1) % (1 << 16)
    bad = WNLAProofBytes(r=pb.r, x=pb.x, l=bad_l, n=pb.n)
    ok2 = np.asarray(_verify_prog(dev, bad))
    assert ok2.tolist() == [True, False]
