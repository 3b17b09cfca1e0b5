"""bppp_tpu — a TPU-native Bulletproofs++ framework (JAX / XLA / Pallas).

A from-scratch rebuild of the capabilities of `distributed-lab/bp-pp`
(Bulletproofs++ over secp256k1, reference mounted at /root/reference):

  * weight-norm linear argument (WNLA)        -> bppp_tpu.models.wnla
  * arithmetic-circuit protocol               -> bppp_tpu.models.circuit
  * reciprocal range proof                    -> bppp_tpu.models.reciprocal
  * u64 range proof (hex-digit instantiation) -> bppp_tpu.models.u64
  * Merlin/STROBE-128 transcript (bit-exact)  -> bppp_tpu.transcript
  * secp256k1 field/curve/MSM TPU kernels     -> bppp_tpu.ops
  * mesh sharding / collectives               -> bppp_tpu.parallel
  * pure-Python host oracle (cross-check)     -> bppp_tpu.oracle

Execution model (TPU-first, not a translation of the Rust reference):
the reference is single-threaded scalar Rust; here every scalar/point
operation is limb-vectorized over a proof batch (radix-2^16 limbs in
uint32 lanes), transcripts run as a statically-scheduled batched
Keccak-f[1600] engine, MSMs use shared-window Straus/Pippenger
accumulation, and scale-out uses jax.sharding meshes with psum
collectives over ICI.
"""

__version__ = "0.1.0"

from . import oracle  # noqa: F401
