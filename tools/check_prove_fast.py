#!/usr/bin/env python
"""Host-side check of the expanded-coefficient WNLA prover math
(protocol/wnla.py _prove_fast) against the oracle mirror prover, using
pure-Python oracle field/curve ops — no JAX, runs in milliseconds.

Validates, for several (|h|, |g|) sizes (K = 1..4 rounds):
  * per-round X/R computed over the ORIGINAL generators via the kron
    weights w_h (of [1, y_k]) / w_g (of [rho_k, y_k]) and the
    interleave(l1, l0) / interleave(0, l1) coefficient layout
  * the commitment chain via the fold identity C' = C + yX + (y^2-1)R
match the oracle's folded-generator prover byte-for-byte.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bppp_tpu.oracle import curve as oc
from bppp_tpu.oracle.field import N, fn_add, fn_inv, fn_mul, fn_sub
from bppp_tpu.oracle.merlin import Transcript, app_point, get_challenge
from bppp_tpu.oracle.wnla import WNLA
from bppp_tpu.utils.rng import SeededRng

LABEL = b"check prove fast"


def num_rounds(lh, lg):
    k = 0
    while lh + lg >= 6:
        lh -= lh // 2
        lg -= lg // 2
        k += 1
    return k


def msm(points, scalars):
    acc = oc.IDENTITY
    for p, s in zip(points, scalars):
        acc = acc.add(p.mul(s))
    return acc


def interleave(a, b):
    out = []
    for x, y in zip(a, b):
        out += [x, y]
    return out


def tensor(a, b):
    # out[j*La + i] = a[i] * b[j]  (matches protocol/vectors.sv_tensor)
    return [fn_mul(a[i], b[j]) for j in range(len(b)) for i in range(len(a))]


def prove_fast(wnla, commitment, t, l, n):
    lh, lg = len(l), len(n)
    K = num_rounds(lh, lg)
    assert lh % (1 << K) == 0 and lg % (1 << K) == 0
    g, h_vec, g_vec = wnla.g, list(wnla.h_vec), list(wnla.g_vec)
    c = list(wnla.c)
    rho_k, mu_k = wnla.rho, wnla.mu
    rho_inv = fn_inv(rho_k)
    w_h, w_g = [1], [1]
    xs, rs = [], []
    for k in range(K):
        c0, c1 = c[0::2], c[1::2]
        l0, l1 = l[0::2], l[1::2]
        n0, n1 = n[0::2], n[1::2]
        mu2 = fn_mul(mu_k, mu_k)
        vx = 0
        for i, (a, b) in enumerate(zip(n0, n1)):
            vx = fn_add(vx, fn_mul(fn_mul(a, b), pow(mu2, i + 1, N)))
        vx = fn_mul(vx, fn_mul(2, rho_inv))
        for a, b in zip(c0, l1):
            vx = fn_add(vx, fn_mul(a, b))
        for a, b in zip(c1, l0):
            vx = fn_add(vx, fn_mul(a, b))
        vr = 0
        for i, b in enumerate(n1):
            vr = fn_add(vr, fn_mul(fn_mul(b, b), pow(mu2, i + 1, N)))
        for a, b in zip(c1, l1):
            vr = fn_add(vr, fn_mul(a, b))

        xh = tensor(w_h, interleave(l1, l0))
        xg = tensor(
            w_g,
            interleave(
                [fn_mul(rho_k, v) for v in n1], [fn_mul(rho_inv, v) for v in n0]
            ),
        )
        rh = tensor(w_h, interleave([0] * len(l1), l1))
        rg = tensor(w_g, interleave([0] * len(n1), n1))
        x_pt = msm([g] + h_vec + g_vec, [vx] + xh + xg)
        r_pt = msm([g] + h_vec + g_vec, [vr] + rh + rg)
        xs.append(x_pt)
        rs.append(r_pt)

        app_point(b"wnla_com", commitment, t)
        app_point(b"wnla_x", x_pt, t)
        app_point(b"wnla_r", r_pt, t)
        t.append_u64(b"l.sz", len(l))
        t.append_u64(b"n.sz", len(n))
        y = get_challenge(b"wnla_challenge", t)

        l = [fn_add(a, fn_mul(y, b)) for a, b in zip(l0, l1)]
        n = [fn_add(fn_mul(rho_inv, a), fn_mul(y, b)) for a, b in zip(n0, n1)]
        c = [fn_add(a, fn_mul(y, b)) for a, b in zip(c0, c1)]
        w_h = tensor(w_h, [1, y])
        w_g = tensor(w_g, [rho_k, y])
        commitment = commitment.add(x_pt.mul(y)).add(
            r_pt.mul(fn_sub(fn_mul(y, y), 1))
        )
        rho_k, mu_k = mu_k, mu2
        rho_inv = fn_inv(rho_k)  # = old mu_inv
    xs.reverse()
    rs.reverse()
    from bppp_tpu.oracle.wnla import WNLAProof

    return WNLAProof(r=rs, x=xs, l=l, n=n)


def check(lh, lg, seed):
    rng = SeededRng(seed)
    g = oc.GENERATOR.mul(rng.scalar())
    g_vec = [oc.GENERATOR.mul(rng.scalar()) for _ in range(lg)]
    h_vec = [oc.GENERATOR.mul(rng.scalar()) for _ in range(lh)]
    c = rng.scalars(lh)
    rho = rng.scalar()
    l = rng.scalars(lh)
    n = rng.scalars(lg)
    wnla = WNLA(g=g, g_vec=g_vec, h_vec=h_vec, c=c, rho=rho, mu=fn_mul(rho, rho))
    com = wnla.commit(l, n)
    want = wnla.prove(com, Transcript(LABEL), l, n)
    got = prove_fast(wnla, com, Transcript(LABEL), list(l), list(n))
    ok = (
        [p.to_bytes() for p in got.r] == [p.to_bytes() for p in want.r]
        and [p.to_bytes() for p in got.x] == [p.to_bytes() for p in want.x]
        and got.l == want.l
        and got.n == want.n
    )
    K = num_rounds(lh, lg)
    print(f"lh={lh:3d} lg={lg:3d} K={K}: {'OK' if ok else 'MISMATCH'}")
    return ok


if __name__ == "__main__":
    all_ok = True
    for lh, lg in [(4, 4), (8, 8), (8, 4), (32, 16), (16, 16)]:
        all_ok &= check(lh, lg, f"pf {lh} {lg}")
    sys.exit(0 if all_ok else 1)
