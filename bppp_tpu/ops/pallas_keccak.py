"""Fused Keccak-f[1600] Pallas kernel: one call per permutation.

The XLA path (transcript/keccak.py) runs 24 rounds under lax.scan; each
transcript absorb/challenge costs a while-loop whose per-iteration
dispatch dwarfs the actual VPU work at production batch sizes. Here the
whole permutation — byte->lane packing, 24 unrolled rounds, unpacking —
is one kernel. 64-bit lanes are (lo, hi) u32 pairs as in the XLA path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..oracle.keccak import ROTATIONS, ROUND_CONSTANTS

TILE = 512
_SUB = 4

_PI_SRC = [0] * 25
for _x in range(5):
    for _y in range(5):
        _PI_SRC[_y + 5 * ((2 * _x + 3 * _y) % 5)] = _x + 5 * _y


def _rotl(lo, hi, n: int):
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


def _f1600_kernel(rc_ref, s_ref, o_ref):
    """24 rounds under ONE fori_loop (the round body is all static
    rotations/xors; only the iota constant varies, read from SMEM) —
    per-call runtime cost scales with Mosaic code size, so the unrolled
    24-round body was ~20x more code for zero compute difference."""
    b = [s_ref[i].reshape(_SUB, 128) for i in range(200)]
    lo = []
    hi = []
    for i in range(25):
        l = b[8 * i]
        for j in range(1, 4):
            l = l | (b[8 * i + j] << (8 * j))
        h = b[8 * i + 4]
        for j in range(1, 4):
            h = h | (b[8 * i + 4 + j] << (8 * j))
        lo.append(l)
        hi.append(h)

    def round_body(rnd, carry):
        lo, hi = list(carry[0]), list(carry[1])
        # theta
        clo = [lo[x] ^ lo[x + 5] ^ lo[x + 10] ^ lo[x + 15] ^ lo[x + 20] for x in range(5)]
        chi = [hi[x] ^ hi[x + 5] ^ hi[x + 10] ^ hi[x + 15] ^ hi[x + 20] for x in range(5)]
        for x in range(5):
            rl, rh = _rotl(clo[(x + 1) % 5], chi[(x + 1) % 5], 1)
            dlo = clo[(x + 4) % 5] ^ rl
            dhi = chi[(x + 4) % 5] ^ rh
            for y in range(5):
                lo[x + 5 * y] = lo[x + 5 * y] ^ dlo
                hi[x + 5 * y] = hi[x + 5 * y] ^ dhi
        # rho + pi
        blo, bhi = [None] * 25, [None] * 25
        for i in range(25):
            s = _PI_SRC[i]
            blo[i], bhi[i] = _rotl(lo[s], hi[s], ROTATIONS[s])
        # chi
        for y in range(5):
            row_l = [blo[x + 5 * y] for x in range(5)]
            row_h = [bhi[x + 5 * y] for x in range(5)]
            for x in range(5):
                lo[x + 5 * y] = row_l[x] ^ (~row_l[(x + 1) % 5] & row_l[(x + 2) % 5])
                hi[x + 5 * y] = row_h[x] ^ (~row_h[(x + 1) % 5] & row_h[(x + 2) % 5])
        # iota
        lo[0] = lo[0] ^ rc_ref[rnd, 0]
        hi[0] = hi[0] ^ rc_ref[rnd, 1]
        return tuple(lo), tuple(hi)

    lo, hi = jax.lax.fori_loop(0, 24, round_body, (tuple(lo), tuple(hi)))

    for i in range(25):
        for j in range(4):
            o_ref[8 * i + j] = ((lo[i] >> (8 * j)) & 0xFF).reshape(TILE)
            o_ref[8 * i + 4 + j] = ((hi[i] >> (8 * j)) & 0xFF).reshape(TILE)


_RC_TABLE = np.asarray(
    [[rc & 0xFFFFFFFF, rc >> 32] for rc in ROUND_CONSTANTS], dtype=np.uint32
)


@jax.jit
def f1600_flat(state):
    """(200, B) u32 byte state -> permuted, B % TILE == 0, one call."""
    from .pallas_curve import INTERPRET

    B = state.shape[1]
    spec = pl.BlockSpec((200, TILE), lambda i: (0, i), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _f1600_kernel,
        grid=(B // TILE,),
        in_specs=[
            pl.BlockSpec((24, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
            spec,
        ],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((200, B), jnp.uint32),
        interpret=INTERPRET(),
    )(jnp.asarray(_RC_TABLE), state)
