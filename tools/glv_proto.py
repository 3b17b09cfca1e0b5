#!/usr/bin/env python
"""Prototype + validate the secp256k1 GLV scalar decomposition.

k = k1 + k2*lambda (mod n) with |k1|, |k2| ~ 2^128, so a 256-bit MSM
walk becomes a 128-bit walk over twice the points (phi(P) = (beta*x, y)).
Validates: round-trip identity, magnitude bounds over random + adversarial
scalars, and the exact fixed-point (Barrett) c1/c2 computation the device
uses (mul by precomputed g1/g2, >> 384, round).
"""

import random
import sys

sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))

from bppp_tpu.oracle.field import N, P
from bppp_tpu.oracle import curve as oc

# cube roots of unity: lambda in F_n (acts on scalars), beta in F_p
# (acts on x-coords): lambda*(x, y) = (beta*x, y).
LAMBDA = 0x5363AD4CC05C30E0A5261C028812645A122E22EA20816678DF02967C1B23BD72
BETA = 0x7AE96A2B657C07106E64479EAC3434E99CF0497512F58995C1396C28719501EE

# lattice basis for the kernel of (k1, k2) -> k1 + k2*lambda (mod n)
A1 = 0x3086D221A7D46BCDE86C90E49284EB15
B1 = -0xE4437ED6010E88286F547FA90ABFE4C3
A2 = 0x114CA50F7A8E2F3F657C1108D9D44CFD8
B2 = A1

SHIFT = 384
G1 = ((B2 << SHIFT) + N // 2) // N  # round(2^384 * b2 / n)
G2 = (((-B1) << SHIFT) + N // 2) // N  # round(2^384 * -b1 / n)


def decompose(k: int):
    """-> (sign1, |k1|, sign2, |k2|) with k1 + k2*lambda == k (mod n)."""
    c1 = ((k * G1) + (1 << (SHIFT - 1))) >> SHIFT
    c2 = ((k * G2) + (1 << (SHIFT - 1))) >> SHIFT
    k2 = (-c1 * B1 - c2 * B2) % N
    k1 = (k - k2 * LAMBDA) % N
    s1, m1 = (1, k1) if k1 <= N // 2 else (-1, N - k1)
    s2, m2 = (1, k2) if k2 <= N // 2 else (-1, N - k2)
    return s1, m1, s2, m2


def main():
    assert pow(LAMBDA, 3, N) == 1 and LAMBDA != 1
    assert pow(BETA, 3, P) == 1 and BETA != 1
    # endomorphism sanity: lambda*G == (beta*x, y)
    G = oc.GENERATOR
    lG = G.mul(LAMBDA)
    ax, ay = lG.to_affine()
    gx, gy = G.to_affine()
    assert ax == (BETA * gx) % P and ay == gy % P

    rng = random.Random(1234)
    worst = 0
    cases = [0, 1, 2, N - 1, N - 2, N // 2, N // 2 + 1, LAMBDA, N - LAMBDA,
             (1 << 128) - 1, 1 << 128, (1 << 128) + 1]
    cases += [rng.randrange(N) for _ in range(20000)]
    for k in cases:
        s1, m1, s2, m2 = decompose(k)
        assert (s1 * m1 + s2 * m2 * LAMBDA) % N == k % N, hex(k)
        worst = max(worst, m1.bit_length(), m2.bit_length())
        # point identity: [k]P == [s1*m1]P + [s2*m2]phi(P)
    print("max |k_i| bits:", worst)
    assert worst <= 129, "need <= 129-bit magnitudes (33 4-bit windows)"

    # spot-check the point identity on a few scalars
    Pt = G.mul(987654321)
    phiP = oc.Point(BETA * Pt.x % P, Pt.y, Pt.z)
    for k in cases[:64]:
        s1, m1, s2, m2 = decompose(k)
        t1 = Pt.mul(m1)
        if s1 < 0:
            t1 = oc.Point(t1.x, (P - t1.y) % P, t1.z)
        t2 = phiP.mul(m2)
        if s2 < 0:
            t2 = oc.Point(t2.x, (P - t2.y) % P, t2.z)
        assert t1.add(t2).eq(Pt.mul(k)), hex(k)
    print("GLV decomposition + endomorphism verified (20k scalars)")
    print("G1 =", hex(G1))
    print("G2 =", hex(G2))


if __name__ == "__main__":
    main()
