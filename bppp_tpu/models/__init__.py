"""Model-level entry points: ready-made protocol instances.

The reference is a proof-system library; its "models" are the protocol
instantiations a user actually runs (u64 range proof, reciprocal range
proof, arithmetic circuits, standalone WNLA). This package re-exports the
batched device implementations plus fixture helpers to stand up an
instance from a seed.
"""

from ..protocol.circuit import ArithmeticCircuitDevice, CircuitWitnessDev
from ..protocol.reciprocal import ReciprocalRangeProofDevice, ReciprocalWitnessDev
from ..protocol.u64 import U64RangeProofDevice
from ..protocol.wnla import WNLADevice

__all__ = [
    "ArithmeticCircuitDevice",
    "CircuitWitnessDev",
    "ReciprocalRangeProofDevice",
    "ReciprocalWitnessDev",
    "U64RangeProofDevice",
    "WNLADevice",
    "u64_fixture",
]


def u64_fixture(seed: str, B: int, tables: str = "auto"):
    """Host-side setup: seeded generators -> (oracle U64RangeProof,
    device U64RangeProofDevice batched over B lanes).

    tables: "auto" builds fixed-base window tables (ops/fixed_base.py)
    when running on TPU (or BPPP_FIXED_TABLES=1); "never" skips them."""
    import os

    from ..oracle import curve as oc
    from ..oracle.u64 import U64RangeProof
    from ..protocol import convert as cv
    from ..utils.rng import SeededRng

    rng = SeededRng(seed)
    g = oc.GENERATOR.mul(rng.scalar())
    g_vec = [oc.GENERATOR.mul(rng.scalar()) for _ in range(16)]
    h_vec = [oc.GENERATOR.mul(rng.scalar()) for _ in range(32)]
    public = U64RangeProof(g=g, g_vec=g_vec, h_vec=h_vec)

    tables_val = None
    if tables == "auto":
        import jax

        if (
            jax.default_backend() == "tpu"
            or os.environ.get("BPPP_FIXED_TABLES") == "1"
        ):
            from ..ops import curve as dcv
            from ..protocol.u64 import build_u64_tables

            gp = dcv.from_int_points([g], squeeze=True)
            hvp = dcv.from_int_points(h_vec)
            gvp = dcv.from_int_points(g_vec)
            tables_val = jax.jit(build_u64_tables)(gp, gvp, hvp)

    dev = U64RangeProofDevice(
        g=cv.point_batched(g, B),
        g_vec=cv.points_batched(g_vec, B),
        h_vec=cv.points_batched(h_vec, B),
        tables=tables_val,
    )
    return public, dev, rng
