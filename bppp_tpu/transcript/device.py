"""Batched Merlin/STROBE-128 transcript, statically scheduled for TPU.

The crucial structural fact (SURVEY.md §2 "Transcript byte-layout"):
every label, length prefix, framing byte, and operation boundary in the
BP++ transcript is *static* — only point encodings and challenge bytes
are data. So this transcript mirrors the byte-exact STROBE-128 machine
(oracle twin: `bppp_tpu.oracle.strobe` / `.merlin`; reference:
/root/reference/src/transcript.rs + merlin v3.0.0) while tracking
`pos` / `pos_begin` / `cur_flags` as *Python* ints during tracing. The
compiled graph is just constant XORs at static offsets, slice reads, and
Keccak-f[1600] permutations, all vectorized over the proof batch.

Usage inside a traced function:

    t = Transcript(b"u64 range proof", batch=(B,))
    t.append_message(b"reciprocal_commitment", v_bytes)   # (33, B) u32
    e = t.challenge_scalar(b"reciprocal_challenge")        # (16, B) F_n limbs
"""

from __future__ import annotations

import struct

import jax.numpy as jnp
import numpy as np

from ..oracle.strobe import FLAG_A, FLAG_C, FLAG_I, FLAG_K, FLAG_M, STROBE_R
from ..ops import field as f
from .keccak import f1600_bytes

MERLIN_PROTOCOL_LABEL = b"Merlin v1.0"


class Transcript:
    def __init__(self, label: bytes, batch: tuple = ()):
        # The prefix up to the first traced byte is fully static: replay
        # it on the host oracle and lift the resulting state.
        from ..oracle.merlin import Transcript as HostTranscript

        ht = HostTranscript(label)
        s = np.frombuffer(bytes(ht.strobe.state), dtype=np.uint8).astype(np.uint32)
        self.state = jnp.broadcast_to(
            jnp.asarray(s).reshape((200,) + (1,) * len(batch)), (200,) + tuple(batch)
        )
        self.batch = tuple(batch)
        self.pos: int = ht.strobe.pos
        self.pos_begin: int = ht.strobe.pos_begin
        self.cur_flags: int = ht.strobe.cur_flags

    # -- low-level sponge ----------------------------------------------

    def _run_f(self) -> None:
        st = self.state
        pad = np.zeros(200, dtype=np.uint32)
        pad[self.pos] ^= self.pos_begin
        pad[self.pos + 1] ^= 0x04
        pad[STROBE_R + 1] ^= 0x80
        st = st ^ jnp.asarray(pad).reshape((200,) + (1,) * len(self.batch))
        self.state = f1600_bytes(st)
        self.pos = 0
        self.pos_begin = 0

    def _absorb_static(self, data: bytes) -> None:
        i = 0
        while i < len(data):
            k = min(len(data) - i, STROBE_R - self.pos)
            pad = np.zeros(200, dtype=np.uint32)
            pad[self.pos : self.pos + k] = np.frombuffer(
                data[i : i + k], dtype=np.uint8
            ).astype(np.uint32)
            self.state = self.state ^ jnp.asarray(pad).reshape(
                (200,) + (1,) * len(self.batch)
            )
            self.pos += k
            i += k
            if self.pos == STROBE_R:
                self._run_f()

    def _absorb_traced(self, data) -> None:
        """data: (n, *batch) u32 byte array. XOR-at-static-offset is a
        single pad + xor (fusable) — the previous slice/concat state
        rebuild compiled to dynamic-update-slice chains that dominated
        the composed verifier's XLA glue time."""
        n = data.shape[0]
        i = 0
        while i < n:
            k = min(n - i, STROBE_R - self.pos)
            chunk = data[i : i + k]
            pads = [(self.pos, 200 - self.pos - k)] + [(0, 0)] * (
                data.ndim - 1
            )
            self.state = self.state ^ jnp.pad(chunk, pads)
            self.pos += k
            i += k
            if self.pos == STROBE_R:
                self._run_f()

    def _squeeze(self, n: int):
        """-> (n, *batch) u32 bytes; zeroes the squeezed state positions
        with one constant-mask select (no state rebuild)."""
        outs = []
        got = 0
        while got < n:
            k = min(n - got, STROBE_R - self.pos)
            st = self.state
            outs.append(st[self.pos : self.pos + k])
            mask = np.zeros((200,) + (1,) * len(self.batch), dtype=bool)
            mask[self.pos : self.pos + k] = True
            self.state = jnp.where(jnp.asarray(mask), jnp.uint32(0), st)
            self.pos += k
            got += k
            if self.pos == STROBE_R:
                self._run_f()
        return jnp.concatenate(outs, axis=0) if len(outs) > 1 else outs[0]

    def _begin_op(self, flags: int) -> None:
        old_begin = self.pos_begin
        self.pos_begin = self.pos + 1
        self.cur_flags = flags
        self._absorb_static(bytes([old_begin, flags]))
        if flags & (FLAG_C | FLAG_K) and self.pos != 0:
            self._run_f()

    # -- STROBE ops ------------------------------------------------------

    def meta_ad(self, data: bytes) -> None:
        self._begin_op(FLAG_M | FLAG_A)
        self._absorb_static(data)

    def _meta_ad_more(self, data: bytes) -> None:
        assert self.cur_flags == FLAG_M | FLAG_A
        self._absorb_static(data)

    def ad_traced(self, data) -> None:
        self._begin_op(FLAG_A)
        self._absorb_traced(data)

    def ad_static(self, data: bytes) -> None:
        self._begin_op(FLAG_A)
        self._absorb_static(data)

    def prf(self, n: int):
        self._begin_op(FLAG_I | FLAG_A | FLAG_C)
        return self._squeeze(n)

    # -- Merlin framing ---------------------------------------------------

    def append_message(self, label: bytes, message) -> None:
        """message: (n, *batch) u32 byte array (traced) or bytes (static)."""
        if isinstance(message, (bytes, bytearray)):
            self.meta_ad(label)
            self._meta_ad_more(struct.pack("<I", len(message)))
            self.ad_static(bytes(message))
        else:
            self.meta_ad(label)
            self._meta_ad_more(struct.pack("<I", int(message.shape[0])))
            self.ad_traced(message)

    def append_u64(self, label: bytes, x: int) -> None:
        self.append_message(label, struct.pack("<Q", x))

    def challenge_bytes(self, label: bytes, n: int):
        self.meta_ad(label)
        self._meta_ad_more(struct.pack("<I", n))
        return self.prf(n)

    def challenge_scalar(self, label: bytes):
        """32 challenge bytes -> F_n limbs. k256 from_repr rejects >= N
        (probability 2^-128; reference unwraps, transcript.rs:13); here
        the value is < 2^256 < 2N so one conditional subtract is the
        same scalar on every reachable input."""
        buf = self.challenge_bytes(label, 32)
        limbs = f.be_bytes_to_limbs(buf)
        return f._cond_sub(limbs, f.N_LIMBS)
