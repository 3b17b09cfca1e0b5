"""Pure-Python host oracle: the bit-exactness reference for every TPU kernel.

Slow, obviously-correct implementations of the full Bulletproofs++ stack
(field, curve, Keccak/STROBE/Merlin transcript, WNLA, arithmetic circuit,
reciprocal + u64 range proofs). Every JAX/Pallas kernel in bppp_tpu.ops /
bppp_tpu.models is cross-checked against this package in tests.
"""

from . import field, curve, keccak, strobe, merlin, vectors, wnla, circuit, reciprocal, u64  # noqa: F401
