"""Blinding randomness sources.

The reference threads a caller-supplied `RngCore + CryptoRng` through the
prover and draws `Scalar::generate_biased` for every blinding lane
(circuit.rs:264-298, :371-372; reciprocal.rs:121). Here an RNG is any
object with `.scalar() -> int in [0, N)`. Three implementations:

  * OsRng        — os.urandom wide reduction (production prover)
  * SeededRng    — deterministic SHA-256 counter stream (fixtures/tests)
  * ReplayRng    — replays an explicit list (reproducing external fixtures)
"""

from __future__ import annotations

import hashlib
import os

from ..oracle.field import N


class OsRng:
    def scalar(self) -> int:
        # 64-byte wide reduction: bias ~2^-256, matching the shape of
        # k256's generate_biased (wide scalar reduced mod N).
        return int.from_bytes(os.urandom(64), "big") % N


class SeededRng:
    """Deterministic stream: scalar_i = SHA256(seed || LE64(i)) * 2 draws,
    64 bytes reduced mod N. Stable across platforms/versions."""

    def __init__(self, seed: bytes | str):
        if isinstance(seed, str):
            seed = seed.encode()
        self.seed = seed
        self.counter = 0

    def scalar(self) -> int:
        h1 = hashlib.sha256(self.seed + self.counter.to_bytes(8, "little") + b"\x00").digest()
        h2 = hashlib.sha256(self.seed + self.counter.to_bytes(8, "little") + b"\x01").digest()
        self.counter += 1
        return int.from_bytes(h1 + h2, "big") % N

    def scalars(self, k: int) -> list[int]:
        return [self.scalar() for _ in range(k)]


class ReplayRng:
    def __init__(self, values: list[int]):
        self.values = list(values)
        self.pos = 0

    def scalar(self) -> int:
        v = self.values[self.pos]
        self.pos += 1
        return v
