#!/usr/bin/env python
"""Probe keccak kernel formulations: fori rounds vs unrolled, and a
transposed (byte-rows as sublanes) layout. Chained timing."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bppp_tpu.oracle.keccak import ROTATIONS, ROUND_CONSTANTS
from bppp_tpu.ops.pallas_keccak import _PI_SRC, _rotl, _RC_TABLE


def make_kernel(unroll: bool, B: int):
    SUB = B // 128

    def kern(rc_ref, s_ref, o_ref):
        b = [s_ref[i].reshape(SUB, 128) for i in range(200)]
        lo, hi = [], []
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
            clo = [lo[x] ^ lo[x + 5] ^ lo[x + 10] ^ lo[x + 15] ^ lo[x + 20] for x in range(5)]
            chi = [hi[x] ^ hi[x + 5] ^ hi[x + 10] ^ hi[x + 15] ^ hi[x + 20] for x in range(5)]
            for x in range(5):
                rl, rh = _rotl(clo[(x + 1) % 5], chi[(x + 1) % 5], 1)
                dlo = clo[(x + 4) % 5] ^ rl
                dhi = chi[(x + 4) % 5] ^ rh
                for y in range(5):
                    lo[x + 5 * y] = lo[x + 5 * y] ^ dlo
                    hi[x + 5 * y] = hi[x + 5 * y] ^ dhi
            blo, bhi = [None] * 25, [None] * 25
            for i in range(25):
                s = _PI_SRC[i]
                blo[i], bhi[i] = _rotl(lo[s], hi[s], ROTATIONS[s])
            for y in range(5):
                row_l = [blo[x + 5 * y] for x in range(5)]
                row_h = [bhi[x + 5 * y] for x in range(5)]
                for x in range(5):
                    lo[x + 5 * y] = row_l[x] ^ (~row_l[(x + 1) % 5] & row_l[(x + 2) % 5])
                    hi[x + 5 * y] = row_h[x] ^ (~row_h[(x + 1) % 5] & row_h[(x + 2) % 5])
            if unroll:
                rc = ROUND_CONSTANTS[int(rnd)]
                lo[0] = lo[0] ^ np.uint32(rc & 0xFFFFFFFF)
                hi[0] = hi[0] ^ np.uint32(rc >> 32)
            else:
                lo[0] = lo[0] ^ rc_ref[rnd, 0]
                hi[0] = hi[0] ^ rc_ref[rnd, 1]
            return tuple(lo), tuple(hi)

        if unroll:
            carry = (tuple(lo), tuple(hi))
            for rnd in range(24):
                carry = round_body(rnd, carry)
            lo, hi = carry
        else:
            lo, hi = jax.lax.fori_loop(0, 24, round_body, (tuple(lo), tuple(hi)))

        for i in range(25):
            for j in range(4):
                o_ref[8 * i + j] = ((lo[i] >> (8 * j)) & 0xFF).reshape(B)
                o_ref[8 * i + 4 + j] = ((hi[i] >> (8 * j)) & 0xFF).reshape(B)

    @jax.jit
    def run(state):
        spec = pl.BlockSpec((200, B), lambda i: (0, i), memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kern,
            grid=(state.shape[1] // B,),
            in_specs=[
                pl.BlockSpec((24, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
                spec,
            ],
            out_specs=spec,
            out_shape=jax.ShapeDtypeStruct(state.shape, jnp.uint32),
        )(jnp.asarray(_RC_TABLE), state)

    return run


def make_words_kernel(B: int):
    """State as (50, B) u32 words (lo/hi interleaved per lane): no
    byte pack/unpack inside the kernel."""
    SUB = B // 128

    def kern(rc_ref, s_ref, o_ref):
        lo = [s_ref[2 * i].reshape(SUB, 128) for i in range(25)]
        hi = [s_ref[2 * i + 1].reshape(SUB, 128) for i in range(25)]

        def round_body(rnd, carry):
            lo, hi = list(carry[0]), list(carry[1])
            clo = [lo[x] ^ lo[x + 5] ^ lo[x + 10] ^ lo[x + 15] ^ lo[x + 20] for x in range(5)]
            chi = [hi[x] ^ hi[x + 5] ^ hi[x + 10] ^ hi[x + 15] ^ hi[x + 20] for x in range(5)]
            for x in range(5):
                rl, rh = _rotl(clo[(x + 1) % 5], chi[(x + 1) % 5], 1)
                dlo = clo[(x + 4) % 5] ^ rl
                dhi = chi[(x + 4) % 5] ^ rh
                for y in range(5):
                    lo[x + 5 * y] = lo[x + 5 * y] ^ dlo
                    hi[x + 5 * y] = hi[x + 5 * y] ^ dhi
            blo, bhi = [None] * 25, [None] * 25
            for i in range(25):
                s = _PI_SRC[i]
                blo[i], bhi[i] = _rotl(lo[s], hi[s], ROTATIONS[s])
            for y in range(5):
                row_l = [blo[x + 5 * y] for x in range(5)]
                row_h = [bhi[x + 5 * y] for x in range(5)]
                for x in range(5):
                    lo[x + 5 * y] = row_l[x] ^ (~row_l[(x + 1) % 5] & row_l[(x + 2) % 5])
                    hi[x + 5 * y] = row_h[x] ^ (~row_h[(x + 1) % 5] & row_h[(x + 2) % 5])
            lo[0] = lo[0] ^ rc_ref[rnd, 0]
            hi[0] = hi[0] ^ rc_ref[rnd, 1]
            return tuple(lo), tuple(hi)

        lo, hi = jax.lax.fori_loop(0, 24, round_body, (tuple(lo), tuple(hi)))
        for i in range(25):
            o_ref[2 * i] = lo[i].reshape(B)
            o_ref[2 * i + 1] = hi[i].reshape(B)

    @jax.jit
    def run(state):
        spec = pl.BlockSpec((50, B), lambda i: (0, i), memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kern,
            grid=(state.shape[1] // B,),
            in_specs=[
                pl.BlockSpec((24, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
                spec,
            ],
            out_specs=spec,
            out_shape=jax.ShapeDtypeStruct(state.shape, jnp.uint32),
        )(jnp.asarray(_RC_TABLE), state)

    return run


def bench(name, run, st, reps=8):
    cur = run(st)
    np.asarray(cur)
    t0 = time.perf_counter()
    for _ in range(reps):
        cur = run(cur)
    np.asarray(cur)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:28s} t={dt*1e3:8.3f} ms", flush=True)


def main():
    rng = np.random.default_rng(0)
    for B in (512, 4096):
        stw = jnp.asarray(
            rng.integers(0, 1 << 31, size=(50, B), dtype=np.uint32)
        )
        bench(f"words-only rounds B={B}", make_words_kernel(min(B, 512)), stw)


if __name__ == "__main__":
    main()
