"""Weight-norm linear argument on device (JAX), batched over proofs.

Protocol semantics: /root/reference/src/wnla.rs (see oracle/wnla.py for
the host twin). TPU-first structural changes, none of which alter a
single transcript byte:

  * The recursion depth is a static function of (|l|, |n|) — it is
    unrolled at trace time; the compiled graph is a fixed 4-level (for
    u64 dims) pipeline of fused fold+MSM stages.
  * X and R per level are computed by ONE stacked MSM (the point/scalar
    lists are padded to a common length and stacked on an extra lane
    axis) so the window ladder runs once per level.
  * rho^-1 / mu^-1 per level come from a single pair of Fermat ladders
    at entry: the fold sets (rho', mu') = (mu, mu^2) (wnla.rs:180-185),
    so inverses chain by squaring — the reference inverts per level
    (wnla.rs:135).
  * Everything carries a trailing batch shape: one trace proves B
    independent instances (shared sizes, per-lane data).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..ops import curve as c
from ..ops import field as f
from ..ops.curve import PointJ
from ..transcript.device import Transcript
from . import points as pv
from . import vectors as sv


class WNLAProofDev(NamedTuple):
    """Device proof: points stacked innermost-first on axis 1 (matching
    the reference's proof.r/x ordering, wnla.rs:187-189)."""

    r: PointJ  # (16, K, *batch)
    x: PointJ  # (16, K, *batch)
    l: jnp.ndarray  # (16, Ll, *batch) F_n limbs
    n: jnp.ndarray  # (16, Ln, *batch)


class WNLAProofBytes(NamedTuple):
    """Wire-form proof for the verifier: SEC1-compressed X/R bytes are
    absorbed directly (the transcript needs the exact bytes), and
    decompressed once for the arithmetic."""

    r: jnp.ndarray  # (33, K, *batch) uint32 bytes
    x: jnp.ndarray  # (33, K, *batch)
    l: jnp.ndarray  # (16, Ll, *batch) limbs
    n: jnp.ndarray  # (16, Ln, *batch)


def num_rounds(lh: int, lg: int) -> int:
    """Static recursion depth: fold while |l| + |n| >= 6 (wnla.rs:126)."""
    k = 0
    while lh + lg >= 6:
        lh = lh - lh // 2  # even half keeps ceil(L/2)
        lg = lg - lg // 2
        k += 1
    return k


def _msm_stack(groups):
    """groups: list of (points:PointJ, scalars) pairs -> PointJ (16,M,*b)
    computing each group's MSM with ONE shared window ladder."""
    M = len(groups)
    L = max(max(pv.pv_len(p), s.shape[1]) for p, s in groups)
    pts = []
    scs = []
    for p, s in groups:
        p = pv.pv_pad(p, L)
        s = sv.sv_pad(s, L)
        pts.append(PointJ(*(a[:, :, None] for a in p)))
        scs.append(s[:, :, None])
    points = PointJ(*(jnp.concatenate(cs, axis=2) for cs in zip(*pts)))
    scalars = jnp.concatenate(scs, axis=2)  # (16, L, M, *batch)
    return c.msm(points, scalars)  # reduces axis 1 -> (16, M, *batch)


class WNLADevice:
    """One WNLA instance family: fixed sizes, batched data.

    g: PointJ (16, *batch); g_vec/h_vec: PointJ (16, L, *batch);
    c_vec: (16, Lh, *batch) limbs; rho/mu: (16, *batch) limbs."""

    def __init__(
        self, g: PointJ, g_vec: PointJ, h_vec: PointJ, c_vec, rho, mu,
        tables=None,
    ):
        self.g = g
        self.g_vec = g_vec
        self.h_vec = h_vec
        self.c = sv.sv_pad(c_vec, pv.pv_len(h_vec))
        self.rho = rho
        self.mu = mu
        self.batch = g.x.shape[1:]
        # fixed-base window tables for [g | h_vec | g_vec] (ops/fixed_base
        # .py) — used by verify_fast's final MSM when present
        self.tables = tables

    # -- commitment (wnla.rs:66-72) -------------------------------------

    def commit_value(self, l, n):
        """v = <c, l> + |n|^2_mu."""
        return f.fn_add(sv.sv_inner(self.c, l), sv.sv_weight_inner(n, n, self.mu))

    def commit(self, l, n) -> PointJ:
        v = self.commit_value(l, n)
        pts = pv.pv_concat([pv.single(self.g), self.h_vec, self.g_vec])
        scs = sv.sv_concat(
            [
                v[:, None],
                sv.sv_pad(l, pv.pv_len(self.h_vec)),
                sv.sv_pad(n, pv.pv_len(self.g_vec)),
            ]
        )
        return pv.msm(pts, scs)

    # -- prove (wnla.rs:125-190) ----------------------------------------

    def prove(
        self, commitment: PointJ, t: Transcript, l, n, inv=None,
        zero_tail=(0, 0),
    ) -> WNLAProofDev:
        """inv: optional precomputed (rho^-1, mu^-1) — callers that
        already ran a batched inversion (circuit.prove's tau^-1 ladder)
        pass them in to skip this entry's fn_inv_vec ladder.
        zero_tail: static (zh, zg) — the caller guarantees the LAST zh
        entries of l and zg entries of n are zero (the circuit layer pads
        l(tau) from nh_live to |h_vec|); the fast prover then skips the
        table rows whose X/R kron coefficients are provably zero."""
        lh, lg = l.shape[1], n.shape[1]
        assert lh == pv.pv_len(self.h_vec) and lg == pv.pv_len(self.g_vec)
        K = num_rounds(lh, lg)
        if K > 0 and lh % (1 << K) == 0 and lg % (1 << K) == 0:
            return self._prove_fast(
                commitment, t, l, n, K, inv=inv, zero_tail=zero_tail
            )
        if K > 0:
            # transcript-identical, so this is silent-correct — but ~10x
            # slower (per-round folded-generator ladders instead of one
            # fixed-base MSM per round). Surface it at trace time.
            import warnings

            warnings.warn(
                f"WNLA prove: |h|={lh}, |g|={lg} not divisible by 2^K="
                f"{1 << K}; using the mirror prover (~10x slower). Pad "
                "the instance to power-of-two sizes for the fast path.",
                stacklevel=2,
            )

        # One batched inversion pair; per-level inverses chain by squaring.
        if inv is None:
            inv2 = sv.fn_inv_vec(jnp.stack([self.rho, self.mu], axis=1))
            inv = inv2[:, 0], inv2[:, 1]
        rho_inv, mu_inv = inv

        cur = self
        xs, rs = [], []
        for _ in range(K):
            commitment, l, n, x_pt, r_pt, cur = _prove_round(
                cur, commitment, t, l, n, rho_inv
            )
            xs.append(x_pt)
            rs.append(r_pt)
            # fold law (rho', mu') = (mu, mu^2) => inverses chain by squaring
            rho_inv = mu_inv
            mu_inv = f.fn_mul(mu_inv, mu_inv)

        xs.reverse()  # innermost-first, matching wnla.rs:187-189
        rs.reverse()
        stack = lambda ps: (
            PointJ(*(jnp.stack(cs, axis=1) for cs in zip(*ps)))
            if ps
            else c.identity((0,) + self.batch)
        )
        return WNLAProofDev(r=stack(rs), x=stack(xs), l=l, n=n)

    def _prove_fast(
        self, commitment, t, l, n, K: int, inv=None, zero_tail=(0, 0)
    ) -> WNLAProofDev:
        """Prover twin of `verify_fast` (transcript-identical to the
        mirror `prove`): every per-round X/R commitment is expressed over
        the ORIGINAL generators via kron-expanded coefficient vectors —
        one fixed-base MSM per round instead of scalar-mul ladders over
        the folded generator points — and the commitment chain uses the
        verifier's fold identity C' = C + y X + (y^2-1) R (wnla.rs:100-102),
        which for an honest prover is the same group element the
        reference recomputes from scratch (wnla.rs:186). The generators
        are never folded; only c / l / n (scalars) fold per round.

        Derivation: with h_k[q] = sum_{m<2^k} w_k[m] h[(q<<k)|m] (w_k the
        per-round kron of [1, y_k]) the X-round terms <h0_k, l1> +
        <h1_k, l0> (wnla.rs:152-160) become <h, w_k (x) interleave(l1, l0)>
        over the original h; the g-side uses wg_k (kron of [rho_k, y_k])
        and interleave(rho_k n1, rho_k^-1 n0); R (only odd-half
        generators, wnla.rs:157-160) uses interleave(0, l1) /
        interleave(0, n1). Requires |h|, |g| divisible by 2^K."""
        from ..ops import fixed_base as fb

        batch = self.batch
        lh, lg = pv.pv_len(self.h_vec), pv.pv_len(self.g_vec)
        one = sv.s_const(1, batch)
        two = sv.s_const(2, batch)
        all_pts = pv.pv_concat([pv.single(self.g), self.h_vec, self.g_vec])

        if inv is None:
            inv2 = sv.fn_inv_vec(jnp.stack([self.rho, self.mu], axis=1))
            inv = inv2[:, 0], inv2[:, 1]
        rho_inv, mu_inv = inv
        rho_k, mu_k = self.rho, self.mu
        cvec = self.c
        w_h = one[:, None]
        w_g = one[:, None]
        # static trailing-zero counts of l / n (zero_tail contract): the
        # fold l' = l0 + y l1 keeps a pair of zeros zero, so z' = z // 2.
        # X's original-row coefficient for row block m is
        # (l1[t] if m=2t else l0[t]) * w — zero blocks are the TRAILING
        # 2*(z//2) interleave entries; R touches only l1[t] = l_k[2t+1],
        # zero for t >= (|l|-z)//2. Both trims are static position-range
        # cuts, so the kernel walks fewer table rows (u64: l(tau) is
        # padded 26 -> 32, saving 6+4 X rows and 3+4+4 R rows over the
        # four rounds).
        zh, zg = zero_tail

        xs, rs = [], []
        for k in range(K):
            c0, c1 = sv.sv_split(cvec)
            l0, l1 = sv.sv_split(l)
            n0, n1 = sv.sv_split(n)
            mu2 = f.fn_mul(mu_k, mu_k)
            pw2 = sv.sv_powers(mu2, max(n0.shape[1], 1), start_at_one=False)
            vx = f.fn_add(
                f.fn_mul(
                    sv.sv_weight_inner(n0, n1, mu2, pw=pw2),
                    f.fn_mul(rho_inv, two),
                ),
                f.fn_add(sv.sv_inner(c0, l1), sv.sv_inner(c1, l0)),
            )
            vr = f.fn_add(
                sv.sv_weight_inner(n1, n1, mu2, pw=pw2), sv.sv_inner(c1, l1)
            )

            K_ = 1 << k
            # live pair counts after dropping provably-zero trailing
            # coefficient blocks (no-ops when zero_tail is (0, 0))
            xh_p = l0.shape[1] - zh // 2
            xg_p = n0.shape[1] - zg // 2
            xh = sv.sv_tensor(
                w_h, sv.sv_interleave(l1[:, :xh_p], l0[:, :xh_p])
            )
            xg = sv.sv_tensor(
                w_g,
                sv.sv_interleave(
                    sv.sv_scale(n1[:, :xg_p], rho_k),
                    sv.sv_scale(n0[:, :xg_p], rho_inv),
                ),
            )
            # X covers the contiguous live-row prefixes of h and g; R's
            # kron coefficients are additionally zero at every even
            # inner-interleave position (wnla.rs:157-160: R only touches
            # the odd halves), so its walk covers ~half the rows — the
            # r3 stacked X|R call paid the full walk twice.
            x_pos = (
                (0,)
                + tuple(range(1, 1 + 2 * xh_p * K_))
                + tuple(range(1 + lh, 1 + lh + 2 * xg_p * K_))
            )
            x_scal = sv.sv_concat([vx[:, None], xh, xg])
            if len(x_pos) == 1 + lh + lg:
                x_pt = fb.msm_fixed_total(self.tables, all_pts, x_scal)
            else:
                x_pt = fb.msm_fixed_positions(
                    self.tables, all_pts, x_pos, x_scal
                )
            # sv_tensor(a, b)[:, j*La + i] = a_i * b_j (b is the OUTER
            # axis), so R's live positions are p = (2t+1)*2^k + i,
            # ordered (t outer, i inner) — sv_tensor(w, odd_half)'s
            # layout — for the live t prefix only.
            # l1[t] = l_k[2t+1] is zero for 2t+1 >= |l| - zh
            rh_p = (l1.shape[1] * 2 - zh) // 2  # live l1 entries
            rg_p = (n1.shape[1] * 2 - zg) // 2
            r_pos = (
                (0,)
                + tuple(
                    1 + (2 * t + 1) * K_ + i
                    for t in range(rh_p)
                    for i in range(K_)
                )
                + tuple(
                    1 + lh + (2 * t + 1) * K_ + i
                    for t in range(rg_p)
                    for i in range(K_)
                )
            )
            rh = sv.sv_tensor(w_h, l1[:, :rh_p])
            rg = sv.sv_tensor(w_g, n1[:, :rg_p])
            r_pt = fb.msm_fixed_positions(
                self.tables,
                all_pts,
                r_pos,
                sv.sv_concat([vr[:, None], rh, rg]),
            )
            xs.append(x_pt)
            rs.append(r_pt)

            three = pv.pv_concat(
                [pv.single(commitment), pv.single(x_pt), pv.single(r_pt)]
            )
            byts = c.compress(three)
            t.append_message(b"wnla_com", byts[:, 0])
            t.append_message(b"wnla_x", byts[:, 1])
            t.append_message(b"wnla_r", byts[:, 2])
            t.append_u64(b"l.sz", l.shape[1])
            t.append_u64(b"n.sz", n.shape[1])
            y = t.challenge_scalar(b"wnla_challenge")

            l = sv.sv_add(l0, sv.sv_scale(l1, y))
            n = sv.sv_add(sv.sv_scale(n0, rho_inv), sv.sv_scale(n1, y))
            cvec = sv.sv_add(c0, sv.sv_scale(c1, y))
            w_h = sv.sv_tensor(w_h, jnp.stack([one, y], axis=1))
            w_g = sv.sv_tensor(w_g, jnp.stack([rho_k, y], axis=1))
            if k < K - 1:
                y2m1 = f.fn_sub(f.fn_mul(y, y), one)
                folded = pv.msm(
                    pv.pv_concat([pv.single(x_pt), pv.single(r_pt)]),
                    jnp.stack([y, y2m1], axis=1),
                )
                commitment = c.pt_add(commitment, folded)
            rho_k, mu_k = mu_k, mu2
            rho_inv = mu_inv
            mu_inv = f.fn_mul(mu_inv, mu_inv)
            zh //= 2  # a zero PAIR folds to a zero entry
            zg //= 2

        xs.reverse()
        rs.reverse()
        stack = lambda ps: PointJ(*(jnp.stack(cs, axis=1) for cs in zip(*ps)))
        return WNLAProofDev(r=stack(rs), x=stack(xs), l=l, n=n)

    # -- verify (wnla.rs:75-121) ----------------------------------------

    def verify(
        self, commitment: PointJ, t: Transcript, proof: WNLAProofBytes, xr=None
    ):
        """-> (*batch,) bool mask. Mirror verifier: folds generators per
        level exactly like the reference (the collapsed one-MSM verifier
        lives in the circuit layer's fast path). xr: optional
        pre-decompressed X|R points, coords (16, 2K, *batch) — callers
        batch ALL proof-point decompressions into one sqrt ladder."""
        lh, lg = pv.pv_len(self.h_vec), pv.pv_len(self.g_vec)
        K = num_rounds(lh, lg)
        assert proof.r.shape[1] == K and proof.x.shape[1] == K

        both = (
            c.decompress(jnp.concatenate([proof.x, proof.r], axis=1))
            if xr is None
            else xr
        )
        xs = PointJ(*(a[:, :K] for a in both))  # coords (16, K, *batch)
        rs = PointJ(*(a[:, K:] for a in both))

        cur = self
        for k in range(K):
            idx = K - 1 - k  # verifier consumes from the END
            x_pt = PointJ(*(a[:, idx] for a in xs))
            r_pt = PointJ(*(a[:, idx] for a in rs))
            t.append_message(b"wnla_com", c.compress(commitment))
            t.append_message(b"wnla_x", proof.x[:, idx])
            t.append_message(b"wnla_r", proof.r[:, idx])
            t.append_u64(b"l.sz", pv.pv_len(cur.h_vec))
            t.append_u64(b"n.sz", pv.pv_len(cur.g_vec))
            y = t.challenge_scalar(b"wnla_challenge")

            # C' = C + y*X + (y^2 - 1)*R  (wnla.rs:100-102)
            y2m1 = f.fn_sub(f.fn_mul(y, y), sv.s_const(1, self.batch))
            folded = pv.msm(
                pv.pv_concat([pv.single(x_pt), pv.single(r_pt)]),
                jnp.stack([y, y2m1], axis=1),
            )
            commitment = c.pt_add(commitment, folded)
            cur = cur._fold_public(y)

        return c.pt_eq(commitment, cur.commit(proof.l, proof.n))

    def verify_fast(
        self, commitment: PointJ, t: Transcript, proof: WNLAProofBytes, xr=None
    ):
        """Collapsed verifier: transcript-identical to `verify`, but the
        per-round generator folds (the expensive point work,
        wnla.rs:104-110) are replaced by scalar coefficient vectors over
        the ORIGINAL generators and ONE shared-window MSM at the end —
        the standard Bulletproofs verifier optimization the reference
        does NOT implement (SURVEY.md §3.2).

        Derivation: after K folds, h_K[j] = sum_m (prod_k y_k^{bit_k(m)})
        h_0[(j<<K)|m] and g_K picks factor rho_k for 0-bits; the folded
        commitment chain C' = C + y X + (y^2-1) R must still materialize
        per round because its bytes are absorbed (wnla_com), but the last
        round's X/R fold moves into the final MSM. Requires |h|, |g|
        divisible by 2^K (all power-of-two instances: u64, WNLA 16/32/64)."""
        lh, lg = pv.pv_len(self.h_vec), pv.pv_len(self.g_vec)
        K = num_rounds(lh, lg)
        if K == 0:
            return self.verify(commitment, t, proof, xr=xr)
        M = 1 << K
        if lh % M != 0 or lg % M != 0:
            # transcript-identical mirror verifier accepts exactly the
            # same proofs — correctness is preserved, only speed differs
            import warnings

            warnings.warn(
                f"WNLA verify_fast: |h|={lh}, |g|={lg} not divisible by "
                f"2^K={M}; falling back to the mirror verifier (~10x "
                "slower). Pad the instance to power-of-two sizes.",
                stacklevel=2,
            )
            return self.verify(commitment, t, proof, xr=xr)
        assert proof.r.shape[1] == K and proof.x.shape[1] == K
        assert proof.l.shape[1] == lh // M and proof.n.shape[1] == lg // M

        both = (
            c.decompress(jnp.concatenate([proof.x, proof.r], axis=1))
            if xr is None
            else xr
        )
        xs = PointJ(*(a[:, :K] for a in both))
        rs = PointJ(*(a[:, K:] for a in both))
        batch = self.batch
        one = sv.s_const(1, batch)

        ys, rho_factors = [], []
        rho_k, mu_k = self.rho, self.mu
        C = commitment
        for k in range(K):
            idx = K - 1 - k
            t.append_message(b"wnla_com", c.compress(C))
            t.append_message(b"wnla_x", proof.x[:, idx])
            t.append_message(b"wnla_r", proof.r[:, idx])
            t.append_u64(b"l.sz", lh >> k)
            t.append_u64(b"n.sz", lg >> k)
            y = t.challenge_scalar(b"wnla_challenge")
            ys.append(y)
            rho_factors.append(rho_k)
            rho_k, mu_k = mu_k, f.fn_mul(mu_k, mu_k)
            if k < K - 1:
                x_pt = PointJ(*(a[:, idx] for a in xs))
                r_pt = PointJ(*(a[:, idx] for a in rs))
                y2m1 = f.fn_sub(f.fn_mul(y, y), one)
                folded = pv.msm(
                    pv.pv_concat([pv.single(x_pt), pv.single(r_pt)]),
                    jnp.stack([y, y2m1], axis=1),
                )
                C = c.pt_add(C, folded)

        # coefficient vectors over original generators (kron over rounds)
        w_h = one[:, None]
        w_g = one[:, None]
        for k in range(K):
            w_h = sv.sv_tensor(w_h, jnp.stack([one, ys[k]], axis=1))
            w_g = sv.sv_tensor(w_g, jnp.stack([rho_factors[k], ys[k]], axis=1))
        a_coef = sv.sv_tensor(w_h, proof.l)  # (16, lh, *b)
        b_coef = sv.sv_tensor(w_g, proof.n)  # (16, lg, *b)

        # folded public c vector: c_K[j] = sum_m w_h[m] * c0[(j<<K)|m]
        c0 = self.c.reshape((16, lh // M, M) + batch)
        ck_terms = f.fn_mul(c0, w_h[:, None])
        c_K = f._fold_n(f._carry(jnp.sum(ck_terms.astype(jnp.uint32), axis=2), 18))

        v_final = f.fn_add(
            sv.sv_inner(c_K, proof.l),
            sv.sv_weight_inner(proof.n, proof.n, mu_k),  # mu_k = mu^(2^K)
        )

        # final check: C_{K-1} + y X_0 + (y^2-1) R_0 == v g + <h,a> + <g,b>
        # -> fold the last X/R into the MSM with negated coefficients.
        last_y = ys[-1]
        neg_y = f.fn_neg(last_y)
        neg_y2m1 = f.fn_neg(f.fn_sub(f.fn_mul(last_y, last_y), one))
        x0 = PointJ(*(a[:, 0] for a in xs))
        r0 = PointJ(*(a[:, 0] for a in rs))
        from ..ops import fixed_base as fb

        fixed_pts = pv.pv_concat([pv.single(self.g), self.h_vec, self.g_vec])
        fixed_scs = sv.sv_concat([v_final[:, None], a_coef, b_coef])
        dyn_pts = pv.pv_concat([pv.single(x0), pv.single(r0)])
        dyn_scs = sv.sv_concat([neg_y[:, None], neg_y2m1[:, None]])
        rhs = fb.msm_mixed(self.tables, fixed_pts, fixed_scs, dyn_pts, dyn_scs)
        return c.pt_eq(C, rhs)

    # -- internals --------------------------------------------------------

    def _fold_public(self, y) -> "WNLADevice":
        """(wnla.rs:170-185): h' = h0 + y h1, g' = rho g0 + y g1,
        c' = c0 + y c1, (rho', mu') = (mu, mu^2). One shared ladder for
        the three point scalings."""
        c0, c1 = sv.sv_split(self.c)
        g0, g1 = pv.pv_split(self.g_vec)
        h0, h1 = pv.pv_split(self.h_vec)

        Lg0, Lg1, Lh1 = pv.pv_len(g0), pv.pv_len(g1), pv.pv_len(h1)
        pts = pv.pv_concat([g0, g1, h1])
        scs = sv.sv_concat(
            [
                jnp.broadcast_to(self.rho[:, None], (16, Lg0) + self.batch),
                jnp.broadcast_to(y[:, None], (16, Lg1) + self.batch),
                jnp.broadcast_to(y[:, None], (16, Lh1) + self.batch),
            ]
        )
        scaled = c.pt_scalar_mul(pts, scs)
        sg0 = PointJ(*(a[:, :Lg0] for a in scaled))
        sg1 = PointJ(*(a[:, Lg0 : Lg0 + Lg1] for a in scaled))
        sh1 = PointJ(*(a[:, Lg0 + Lg1 :] for a in scaled))

        return WNLADevice(
            g=self.g,
            g_vec=pv.pv_add(sg0, sg1),
            h_vec=pv.pv_add(h0, sh1),
            c_vec=sv.sv_add(c0, sv.sv_scale(c1, y)),
            rho=self.mu,
            mu=f.fn_mul(self.mu, self.mu),
        )


def _prove_round(cur: WNLADevice, commitment, t, l, n, rho_inv):
    """One folding round (wnla.rs:135-186). Returns the next state."""
    batch = cur.batch
    c0, c1 = sv.sv_split(cur.c)
    l0, l1 = sv.sv_split(l)
    n0, n1 = sv.sv_split(n)
    g0, g1 = pv.pv_split(cur.g_vec)
    h0, h1 = pv.pv_split(cur.h_vec)
    mu2 = f.fn_mul(cur.mu, cur.mu)

    two = sv.s_const(2, batch)
    pw2 = sv.sv_powers(mu2, max(n0.shape[1], 1), start_at_one=False)
    vx = f.fn_add(
        f.fn_mul(sv.sv_weight_inner(n0, n1, mu2, pw=pw2), f.fn_mul(rho_inv, two)),
        f.fn_add(sv.sv_inner(c0, l1), sv.sv_inner(c1, l0)),
    )
    vr = f.fn_add(sv.sv_weight_inner(n1, n1, mu2, pw=pw2), sv.sv_inner(c1, l1))

    # X = vx*g + <h0,l1> + <h1,l0> + <g0, rho n1> + <g1, rho^-1 n0>
    # R = vr*g + <h1,l1> + <g1,n1>      — one stacked ladder for both.
    # Each term pads points (identity) and scalars (zero) to a common
    # length, matching vector_extend semantics (util.rs:24-26) for the
    # odd/empty-half cases.
    def term(p, s):
        L = max(pv.pv_len(p), s.shape[1])
        return pv.pv_pad(p, L), sv.sv_pad(s, L)

    def build(terms):
        pts, scs = zip(*(term(p, s) for p, s in terms))
        return pv.pv_concat(pts), sv.sv_concat(scs)

    x_groups = build(
        [
            (pv.single(cur.g), vx[:, None]),
            (h0, l1),
            (h1, l0),
            (g0, sv.sv_scale(n1, cur.rho)),
            (g1, sv.sv_scale(n0, rho_inv)),
        ]
    )
    r_groups = build(
        [(pv.single(cur.g), vr[:, None]), (h1, l1), (g1, n1)]
    )
    xr = _msm_stack([x_groups, r_groups])
    x_pt = PointJ(*(a[:, 0] for a in xr))
    r_pt = PointJ(*(a[:, 1] for a in xr))

    # Compress all three absorbed points with one shared inversion path.
    three = pv.pv_concat([pv.single(commitment), pv.single(x_pt), pv.single(r_pt)])
    byts = c.compress(three)  # (33, 3, *batch)
    t.append_message(b"wnla_com", byts[:, 0])
    t.append_message(b"wnla_x", byts[:, 1])
    t.append_message(b"wnla_r", byts[:, 2])
    t.append_u64(b"l.sz", l.shape[1])
    t.append_u64(b"n.sz", n.shape[1])
    y = t.challenge_scalar(b"wnla_challenge")

    nxt = cur._fold_public(y)
    l_ = sv.sv_add(l0, sv.sv_scale(l1, y))
    n_ = sv.sv_add(sv.sv_scale(n0, rho_inv), sv.sv_scale(n1, y))

    # Prover recomputes the folded commitment from scratch (wnla.rs:186).
    com_ = nxt.commit(l_, n_)
    return com_, l_, n_, x_pt, r_pt, nxt
