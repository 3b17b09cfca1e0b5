"""Oracle protocol round-trip tests, mirroring the reference test strategy
(/root/reference/src/tests.rs) plus the negative/tamper tests the
reference lacks (SURVEY.md §4)."""

import pytest

from bppp_tpu.oracle import curve
from bppp_tpu.oracle.circuit import (
    ArithmeticCircuit,
    CircuitWitness,
    PartitionType,
)
from bppp_tpu.oracle.field import N, fn_mul
from bppp_tpu.oracle.merlin import Transcript
from bppp_tpu.oracle.u64 import (
    G_VEC_FULL_SZ,
    H_VEC_FULL_SZ,
    U64RangeProof,
    u64_to_hex,
    u64_to_hex_mapped,
)
from bppp_tpu.oracle.wnla import WNLA
from bppp_tpu.utils.rng import SeededRng


def rand_points(rng: SeededRng, k: int) -> list[curve.Point]:
    return [curve.GENERATOR.mul(rng.scalar()) for _ in range(k)]


def test_wnla_works():
    # mirrors tests.rs:138-171 (N=4, fixed l/n).
    rng = SeededRng("wnla test vectors")
    g = curve.GENERATOR.mul(rng.scalar())
    g_vec = rand_points(rng, 4)
    h_vec = rand_points(rng, 4)
    c = rng.scalars(4)
    rho = rng.scalar()

    wnla = WNLA(g=g, g_vec=g_vec, h_vec=h_vec, c=c, rho=rho, mu=fn_mul(rho, rho))
    l = [1, 2, 3, 4]
    n = [8, 7, 6, 5]
    commit = wnla.commit(l, n)

    pt = Transcript(b"wnla test")
    proof = wnla.prove(commit, pt, l, n)

    # (4,4) -> (2,2): one folding round.
    assert len(proof.r) == len(proof.x) == 1
    assert len(proof.l) == 2 and len(proof.n) == 2

    vt = Transcript(b"wnla test")
    assert wnla.verify(commit, vt, proof)

    # tamper: wrong commitment fails
    vt2 = Transcript(b"wnla test")
    assert not wnla.verify(commit.add(g), vt2, proof)
    # tamper: wrong transcript label fails
    vt3 = Transcript(b"wrong label")
    assert not wnla.verify(commit, vt3, proof)


def test_wnla_sizes_16_32_64():
    # BASELINE.json config 2: standalone WNLA at larger sizes.
    for sz in (16, 32, 64):
        rng = SeededRng(f"wnla {sz}")
        g = curve.GENERATOR.mul(rng.scalar())
        wnla = WNLA(
            g=g,
            g_vec=rand_points(rng, sz),
            h_vec=rand_points(rng, sz),
            c=rng.scalars(sz),
            rho=(rho := rng.scalar()),
            mu=fn_mul(rho, rho),
        )
        l = rng.scalars(sz)
        n = rng.scalars(sz)
        commit = wnla.commit(l, n)
        proof = wnla.prove(commit, Transcript(b"wnla big"), l, n)
        assert wnla.verify(commit, Transcript(b"wnla big"), proof)


def make_ac_fixture(seed="ac test"):
    # mirrors tests.rs:44-136: knowledge of x, y with x+y=r, x*y=z.
    x, y, r, z = 3, 5, 8, 15
    w_l, w_r, w_o = [x], [y], [z, r]
    dim_nm, dim_no, dim_nv, k = 1, 2, 2, 1
    dim_nl = dim_nv * k
    dim_nw = dim_nm + dim_nm + dim_no

    W_m = [[0, 0, 1, 0]]
    a_m = [0]
    W_l = [[0, 1, 0, 0], [0, N - 1, 1, 0]]
    a_l = [(-r) % N, (-z) % N]

    rng = SeededRng(seed)
    g = curve.GENERATOR.mul(rng.scalar())
    g_vec = rand_points(rng, 1)
    h_vec = rand_points(rng, 16)

    def partition(typ, index):
        return index if typ == PartitionType.LL else None

    circuit = ArithmeticCircuit(
        dim_nm=dim_nm, dim_no=dim_no, k=k, dim_nl=dim_nl, dim_nv=dim_nv,
        dim_nw=dim_nw, g=g,
        g_vec=g_vec[:dim_nm], h_vec=h_vec[: 9 + dim_nv],
        W_m=W_m, W_l=W_l, a_m=a_m, a_l=a_l, f_l=True, f_m=False,
        g_vec_=g_vec[dim_nm:], h_vec_=h_vec[9 + dim_nv :],
        partition=partition,
    )
    witness = CircuitWitness(v=[[x, y]], s_v=[rng.scalar()], w_l=w_l, w_r=w_r, w_o=w_o)
    return circuit, witness, rng


def test_ac_works():
    circuit, witness, rng = make_ac_fixture()
    v = [circuit.commit(witness.v[i], witness.s_v[i]) for i in range(circuit.k)]

    proof = circuit.prove(v, witness, Transcript(b"circuit test"), rng)
    assert circuit.verify(v, Transcript(b"circuit test"), proof)

    # tamper: flip one proof point
    proof.c_s = proof.c_s.add(circuit.g)
    assert not circuit.verify(v, Transcript(b"circuit test"), proof)


def test_u64_digits():
    assert u64_to_hex(0x123456) == [6, 5, 4, 3, 2, 1] + [0] * 10
    m = u64_to_hex_mapped(0x123456)
    assert m[0] == 10 and m[1] == m[2] == m[3] == m[4] == m[5] == m[6] == 1
    assert sum(m) == 16
    assert u64_to_hex(2**64 - 1) == [15] * 16


@pytest.fixture(scope="module")
def u64_fixture():
    rng = SeededRng("u64 proof test")
    g = curve.GENERATOR.mul(rng.scalar())
    public = U64RangeProof(
        g=g,
        g_vec=rand_points(rng, G_VEC_FULL_SZ),
        h_vec=rand_points(rng, H_VEC_FULL_SZ),
    )
    x = 123456
    s = rng.scalar()
    commitment = public.commit_value(x, s)
    proof = public.prove(x, s, Transcript(b"u64 range proof"), rng)
    return public, x, s, commitment, proof


def test_u64_proof_works(u64_fixture):
    public, x, s, commitment, proof = u64_fixture
    assert public.verify(commitment, proof, Transcript(b"u64 range proof"))


def test_u64_proof_size(u64_fixture):
    # 13 G + 3 F (README.md:30-34): C_L, C_R, C_O, C_S, poles R,
    # 4 rounds x {X, R} = 8, plus l(2) + n(1) scalars.
    _, _, _, _, proof = u64_fixture
    cp = proof.circuit_proof
    n_points = 4 + 1 + len(cp.r) + len(cp.x)
    n_scalars = len(cp.l) + len(cp.n)
    assert len(cp.r) == len(cp.x) == 4
    assert n_points == 13
    assert n_scalars == 3


def test_u64_tamper_rejected(u64_fixture):
    public, x, s, commitment, proof = u64_fixture
    # wrong commitment
    assert not public.verify(
        commitment.add(public.g), proof, Transcript(b"u64 range proof")
    )
    # tampered scalar
    import copy

    bad = copy.deepcopy(proof)
    bad.circuit_proof.l[0] = (bad.circuit_proof.l[0] + 1) % N
    assert not public.verify(commitment, bad, Transcript(b"u64 range proof"))
    # tampered poles commitment
    bad2 = copy.deepcopy(proof)
    bad2.r = bad2.r.add(public.g)
    assert not public.verify(commitment, bad2, Transcript(b"u64 range proof"))


def test_u64_determinism():
    # Same seed -> byte-identical proof (replayable RNG contract).
    def run():
        rng = SeededRng("determinism")
        g = curve.GENERATOR.mul(rng.scalar())
        public = U64RangeProof(
            g=g,
            g_vec=rand_points(rng, G_VEC_FULL_SZ),
            h_vec=rand_points(rng, H_VEC_FULL_SZ),
        )
        proof = public.prove(987654321, 42, Transcript(b"u64 range proof"), rng)
        return proof

    p1, p2 = run(), run()
    assert p1.r.to_bytes() == p2.r.to_bytes()
    assert p1.circuit_proof.l == p2.circuit_proof.l
    assert [pt.to_bytes() for pt in p1.circuit_proof.x] == [
        pt.to_bytes() for pt in p2.circuit_proof.x
    ]


def test_commit_poles_invariant():
    # commit_value(x,s) + commit_poles(r, rb) == circuit.commit([x||r], s+rb)
    # — what makes reciprocal.rs:104 sound (SURVEY.md §3.4).
    rng = SeededRng("invariant")
    g = curve.GENERATOR.mul(rng.scalar())
    public = U64RangeProof(
        g=g,
        g_vec=rand_points(rng, G_VEC_FULL_SZ),
        h_vec=rand_points(rng, H_VEC_FULL_SZ),
    )
    recip = public._reciprocal()
    x, s = 5555, rng.scalar()
    r = rng.scalars(16)
    rb = rng.scalar()
    lhs = recip.commit_value(x, s).add(recip.commit_poles(r, rb))
    circuit = recip.make_circuit(e=rng.scalar())
    rhs = circuit.commit([x] + r, (s + rb) % N)
    assert lhs.eq(rhs)
