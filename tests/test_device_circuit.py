"""Device arithmetic-circuit protocol vs host oracle (ac_works fixture:
x+y=r, x*y=z — tests.rs:44-136). B=2 lanes share the witness but use
different blinding streams, so every proof point differs per lane."""

import numpy as np
import pytest

from bppp_tpu.oracle.merlin import Transcript as HostTranscript
from bppp_tpu.protocol import convert as cv
from bppp_tpu.protocol.circuit import CircuitWitnessDev, n_blind_draws
from bppp_tpu.transcript.device import Transcript as DevTranscript
from bppp_tpu.utils import aot
from bppp_tpu.utils.rng import ReplayRng
from test_oracle_protocols import make_ac_fixture

B = 2
LABEL = b"circuit test"


@pytest.fixture(scope="module")
def fixture():
    circuit, witness, rng = make_ac_fixture("device ac")
    v = [circuit.commit(witness.v[i], witness.s_v[i]) for i in range(circuit.k)]

    draws = [rng.scalars(n_blind_draws(circuit.dim_nv, circuit.dim_nm)) for _ in range(B)]
    proofs = [
        circuit.prove(v, witness, HostTranscript(LABEL), ReplayRng(d)) for d in draws
    ]
    for p in proofs:
        assert circuit.verify(v, HostTranscript(LABEL), p)

    dev_circuit = cv.circuit_from_oracle(circuit, B)
    wit_dev = CircuitWitnessDev(
        v=np.stack([cv.scalar_cols([witness.v[i]] * B) for i in range(circuit.k)], axis=1),
        s_v=cv.scalar_cols([witness.s_v] * B),
        w_l=cv.scalar_cols([witness.w_l] * B),
        w_r=cv.scalar_cols([witness.w_r] * B),
        w_o=cv.scalar_cols([witness.w_o] * B),
    )
    args = dict(
        v=cv.points_batched(v, B),
        v_bytes=cv.compressed_cols([v] * B),
        blind=cv.scalar_cols(draws),
        wit=wit_dev,
    )
    return circuit, witness, v, proofs, dev_circuit, args


def test_device_circuit_prove_bit_exact(fixture):
    circuit, witness, v, proofs, dev_circuit, args = fixture

    def fn(args):
        t = DevTranscript(LABEL, batch=(B,))
        return dev_circuit.prove(args["v"], args["v_bytes"], args["wit"], t, args["blind"])

    prog = aot.cached("test_ac_prove", fn)
    proof = prog(args)
    for b in range(B):
        got = cv.circuit_dev_to_oracle(proof, b)
        want = proofs[b]
        for name in ("c_l", "c_r", "c_o", "c_s"):
            assert getattr(got, name).to_bytes() == getattr(want, name).to_bytes(), name
        assert [p.to_bytes() for p in got.r] == [p.to_bytes() for p in want.r]
        assert [p.to_bytes() for p in got.x] == [p.to_bytes() for p in want.x]
        assert got.l == want.l and got.n == want.n


def test_device_circuit_verify(fixture):
    circuit, witness, v, proofs, dev_circuit, args = fixture
    pb = cv.circuit_proofs_to_bytes(proofs)

    def fn(args, pb):
        t = DevTranscript(LABEL, batch=(B,))
        return dev_circuit.verify(args["v"], args["v_bytes"], t, pb)

    prog = aot.cached("test_ac_verify", fn)
    ok = np.asarray(prog(args, pb))
    assert ok.tolist() == [True, True]

    # tamper with one lane's c_s bytes -> decompression yields a different
    # point -> transcript diverges -> only that lane fails
    bad_cs = np.asarray(pb.c_s).copy()
    bad_cs[1, 0] ^= 1  # flip a bit of lane 0's x-coordinate byte
    bad = pb._replace(c_s=bad_cs)
    ok2 = np.asarray(prog(args, bad))
    assert ok2.tolist() == [False, True]
