"""Device-side (JAX/TPU) Bulletproofs++ protocol layers.

Mirrors the protocol semantics of the host oracle (`bppp_tpu.oracle`) and
the Rust reference (/root/reference/src), but executes batched over a
proof axis: every scalar is a (16, *batch) uint32 limb array, every
scalar vector a (16, L, *batch) array, every point vector a `PointJ`
with coordinates (16, L, *batch). One traced program proves/verifies an
entire batch of independent proofs simultaneously.
"""
