"""Device Merlin/STROBE transcript vs the host oracle (bit-exactness)."""

import numpy as np

import jax
import jax.numpy as jnp

from bppp_tpu.oracle import curve as oc
from bppp_tpu.oracle import field as hf
from bppp_tpu.oracle.merlin import Transcript as HostTranscript
from bppp_tpu.transcript import keccak as jk
from bppp_tpu.transcript.device import Transcript as DevTranscript

rng = np.random.default_rng(99)


def test_f1600_bytes_matches_oracle():
    from bppp_tpu.oracle.keccak import f1600_bytes as host_f

    states = [rng.bytes(200) for _ in range(3)]
    arr = np.stack(
        [np.frombuffer(s, dtype=np.uint8).astype(np.uint32) for s in states], axis=1
    )
    out = np.asarray(jax.jit(jk.f1600_bytes)(jnp.asarray(arr)))
    for j, s in enumerate(states):
        assert bytes(out[:, j].astype(np.uint8).tolist()) == host_f(s)


def _bytes_col(bs_list):
    """list of equal-length byte strings -> (n, B) u32 array."""
    return jnp.asarray(
        np.stack(
            [np.frombuffer(b, dtype=np.uint8).astype(np.uint32) for b in bs_list],
            axis=1,
        )
    )


def test_transcript_schedule_matches_oracle():
    B = 3
    # per-lane data: a 33-byte "point", a second message crossing the rate
    pts = [oc.GENERATOR.mul(int.from_bytes(rng.bytes(32), "big") % hf.N) for _ in range(B)]
    blobs = [rng.bytes(200) for _ in range(B)]

    def run(label_data):
        t = DevTranscript(b"u64 range proof", batch=(B,))
        t.append_message(b"reciprocal_commitment", label_data[0])
        e1 = t.challenge_bytes(b"reciprocal_challenge", 32)
        t.append_message(b"big", label_data[1])
        t.append_u64(b"l.sz", 32)
        t.append_u64(b"n.sz", 16)
        e2 = t.challenge_bytes(b"wnla_challenge", 32)
        return e1, e2

    pd = _bytes_col([p.to_bytes() for p in pts])
    bd = _bytes_col(blobs)
    e1, e2 = jax.jit(run)((pd, bd))
    e1, e2 = np.asarray(e1), np.asarray(e2)

    for j in range(B):
        ht = HostTranscript(b"u64 range proof")
        ht.append_message(b"reciprocal_commitment", pts[j].to_bytes())
        h1 = ht.challenge_bytes(b"reciprocal_challenge", 32)
        ht.append_message(b"big", blobs[j])
        ht.append_u64(b"l.sz", 32)
        ht.append_u64(b"n.sz", 16)
        h2 = ht.challenge_bytes(b"wnla_challenge", 32)
        assert bytes(e1[:, j].astype(np.uint8).tolist()) == h1
        assert bytes(e2[:, j].astype(np.uint8).tolist()) == h2


def test_challenge_scalar():
    B = 2
    pts = [oc.GENERATOR.mul(7 + j) for j in range(B)]
    pd = _bytes_col([p.to_bytes() for p in pts])

    def run(pd):
        t = DevTranscript(b"wnla test", batch=(B,))
        t.append_message(b"wnla_com", pd)
        return t.challenge_scalar(b"wnla_challenge")

    got = np.asarray(jax.jit(run)(pd))
    from bppp_tpu.ops.field import limbs_to_ints
    from bppp_tpu.oracle.merlin import get_challenge

    for j in range(B):
        ht = HostTranscript(b"wnla test")
        ht.append_message(b"wnla_com", pts[j].to_bytes())
        want = get_challenge(b"wnla_challenge", ht)
        assert limbs_to_ints(got)[j] == want
