"""Batched Keccak-f[1600] for TPU (JAX), 64-bit lanes as u32 pairs.

Device engine behind the Merlin/STROBE transcript (oracle twin:
`bppp_tpu.oracle.keccak`; reference dependency chain merlin v3.0.0 ->
keccak 0.1.5, /root/reference/Cargo.lock). The sponge state is carried
as a (200, *batch) uint32 BYTE array so STROBE's byte-position logic
stays trivial; packing to 25 (lo, hi) u32 lane pairs happens here. The
24 rounds run under lax.scan (one ~300-eqn round body, not 24 unrolled
copies).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..oracle.keccak import ROUND_CONSTANTS, ROTATIONS

_RC_LO = np.asarray([rc & 0xFFFFFFFF for rc in ROUND_CONSTANTS], dtype=np.uint32)
_RC_HI = np.asarray([rc >> 32 for rc in ROUND_CONSTANTS], dtype=np.uint32)

# pi permutation: dst[y + 5*((2x+3y)%5)] = src[x + 5y]
_PI_SRC = [0] * 25
for _x in range(5):
    for _y in range(5):
        _PI_SRC[_y + 5 * ((2 * _x + 3 * _y) % 5)] = _x + 5 * _y


def _rotl64(lo, hi, n: int):
    n %= 64
    if n == 0:
        return lo, hi
    if n == 32:
        return hi, lo
    if n < 32:
        return (
            (lo << n) | (hi >> (32 - n)),
            (hi << n) | (lo >> (32 - n)),
        )
    m = n - 32
    return (
        (hi << m) | (lo >> (32 - m)),
        (lo << m) | (hi >> (32 - m)),
    )


def _round(lo, hi, rc_lo, rc_hi):
    """One Keccak round. lo/hi: (25, *batch) u32."""
    # theta
    clo = lo[0:5] ^ lo[5:10] ^ lo[10:15] ^ lo[15:20] ^ lo[20:25]
    chi_ = hi[0:5] ^ hi[5:10] ^ hi[10:15] ^ hi[15:20] ^ hi[20:25]
    rlo, rhi = _rotl64(jnp.roll(clo, -1, axis=0), jnp.roll(chi_, -1, axis=0), 1)
    dlo = jnp.roll(clo, 1, axis=0) ^ rlo
    dhi = jnp.roll(chi_, 1, axis=0) ^ rhi
    lo = lo ^ jnp.tile(dlo, (5,) + (1,) * (dlo.ndim - 1))
    hi = hi ^ jnp.tile(dhi, (5,) + (1,) * (dhi.ndim - 1))
    # rho + pi
    blo, bhi = [], []
    for i in range(25):
        s = _PI_SRC[i]
        l2, h2 = _rotl64(lo[s], hi[s], ROTATIONS[s])
        blo.append(l2)
        bhi.append(h2)
    blo = jnp.stack(blo, axis=0)
    bhi = jnp.stack(bhi, axis=0)
    # chi: rows of 5 along x
    b5lo = blo.reshape((5, 5) + blo.shape[1:])
    b5hi = bhi.reshape((5, 5) + bhi.shape[1:])
    nlo = b5lo ^ (~jnp.roll(b5lo, -1, axis=1) & jnp.roll(b5lo, -2, axis=1))
    nhi = b5hi ^ (~jnp.roll(b5hi, -1, axis=1) & jnp.roll(b5hi, -2, axis=1))
    lo = nlo.reshape((25,) + blo.shape[1:])
    hi = nhi.reshape((25,) + bhi.shape[1:])
    # iota
    lo = jnp.concatenate([(lo[:1] ^ rc_lo), lo[1:]], axis=0)
    hi = jnp.concatenate([(hi[:1] ^ rc_hi), hi[1:]], axis=0)
    return lo, hi


def f1600_lanes(lo, hi):
    """24 rounds over (25, *batch) u32 lane halves."""

    def body(carry, rc):
        l, h = carry
        l, h = _round(l, h, rc[0], rc[1])
        return (l, h), None

    rcs = jnp.stack([jnp.asarray(_RC_LO), jnp.asarray(_RC_HI)], axis=1)  # (24, 2)
    (lo, hi), _ = jax.lax.scan(body, (lo, hi), rcs)
    return lo, hi


def pack_bytes(state):
    """(200, *batch) u32 bytes -> ((25, *batch) lo, (25, *batch) hi),
    little-endian per 8-byte lane."""
    b = state.reshape((25, 8) + state.shape[1:])
    lo = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16) | (b[:, 3] << 24)
    hi = b[:, 4] | (b[:, 5] << 8) | (b[:, 6] << 16) | (b[:, 7] << 24)
    return lo, hi


def unpack_bytes(lo, hi):
    """Inverse of pack_bytes -> (200, *batch) u32 bytes."""
    parts = [
        lo & 0xFF, (lo >> 8) & 0xFF, (lo >> 16) & 0xFF, (lo >> 24) & 0xFF,
        hi & 0xFF, (hi >> 8) & 0xFF, (hi >> 16) & 0xFF, (hi >> 24) & 0xFF,
    ]
    b = jnp.stack(parts, axis=1)  # (25, 8, *batch)
    return b.reshape((200,) + lo.shape[1:])


def f1600_bytes(state):
    """(200, *batch) u32 byte state -> permuted byte state. On TPU with
    enough lanes this is ONE fused Pallas call (ops/pallas_keccak.py);
    the scan path below is the CPU/XLA reference."""
    from ..ops.curve import _pallas_enabled

    batch = state.shape[1:]
    prod = 1
    for d in batch:
        prod *= d
    if _pallas_enabled() and prod >= 256:
        from ..ops import pallas_keccak as pk
        from ..ops.curve import _pallas_bucket

        bucket = _pallas_bucket(prod, pk.TILE)
        flat = state.reshape(200, prod)
        if bucket != prod:
            flat = jnp.pad(flat, ((0, 0), (0, bucket - prod)))
        out = pk.f1600_flat(flat)
        return out[:, :prod].reshape((200,) + batch)

    lo, hi = pack_bytes(state)
    lo, hi = f1600_lanes(lo, hi)
    return unpack_bytes(lo, hi)
