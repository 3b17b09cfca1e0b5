"""Sequence-parallel WNLA: generator/scalar vectors sharded across chips.

The reference's only length-reduction mechanism is WNLA's log-halving
recursion (wnla.rs:125-190). For instances too large for one chip (or to
cut per-chip work), this module shards every length-L vector (g_vec,
h_vec, c, l, n) across a mesh axis in **contiguous blocks of even size**
— the pair-blocked layout from SURVEY.md §5: an even/odd split of the
global index equals the even/odd split of the local index, so the fold
h' = h0 + y*h1 is purely LOCAL (a reshape plus lane math, no
communication). Only three things communicate per round:

  * the cross-term inner products v_x, v_r   -> combined inside the
    partial-MSM point combine (the g-scalar rides the MSM)
  * the X/R partial MSMs                     -> one all_gather of n
    Jacobian partials + a replicated log-tree point reduction
  * the folded commitment (prover recomputes commit(l', n'), wnla.rs:186)
    -> same combine

The transcript runs REPLICATED on every shard (same bytes -> same
challenge y on all chips, no broadcast needed). When the halving makes
the per-shard block odd-sized, the remaining small instance is gathered
onto every chip and finished locally with the single-device prover.

Transcript bytes are identical to the single-device path — this is an
execution-layout change only.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..ops import curve as dc
from ..ops import field as f
from ..ops.curve import PointJ
from ..protocol import points as pv
from ..protocol import vectors as sv
from ..protocol.wnla import WNLADevice, WNLAProofDev
from ..transcript.device import Transcript


def _combine_partials(local: PointJ, axis: str) -> PointJ:
    """all_gather each shard's Jacobian partial and tree-add (replicated)."""
    gx = jax.lax.all_gather(local.x, axis)  # (n, 16, *batch)
    gy = jax.lax.all_gather(local.y, axis)
    gz = jax.lax.all_gather(local.z, axis)
    parts = PointJ(
        jnp.moveaxis(gx, 0, 1), jnp.moveaxis(gy, 0, 1), jnp.moveaxis(gz, 0, 1)
    )
    return dc.pt_sum(parts, axis=1)


def _partial_inner(c_blk, l_blk):
    """Local lazy inner product -> canonical (16, *batch); psum of
    canonical values would exceed limb bounds, so each shard reduces to
    canonical and the values combine as an extra MSM scalar on g."""
    return sv.sv_inner(c_blk, l_blk)


def _weight_partial(n0, n1, mu2, block_start_pow):
    """sum_i n0_i n1_i mu2^(i+1) over a local block whose global indices
    start at `block_start` — the weight for local index j is
    mu2^(block_start + j + 1) = mu2^(block_start) * mu2^(j+1)."""
    local = sv.sv_weight_inner(n0, n1, mu2)
    return f.fn_mul(local, block_start_pow)


def prove_sharded(
    mesh: Mesh,
    axis: str,
    g: PointJ,
    g_vec: PointJ,
    h_vec: PointJ,
    c_vec,
    rho,
    mu,
    commitment: PointJ,
    label: bytes,
    l,
    n,
) -> WNLAProofDev:
    """Sharded WNLA prove. All arrays are GLOBAL (coords (16, L, *batch));
    sharding happens inside via shard_map with the length axis on `axis`.
    Requires L_h and L_g divisible by 2*n_shards (pair-blocked layout).
    Returns a replicated proof identical to WNLADevice.prove's."""
    nsh = mesh.shape[axis]
    Lh, Lg = pv.pv_len(h_vec), pv.pv_len(g_vec)
    batch = g.x.shape[1:]
    bspec = (None,) * len(batch)

    # rounds we can run sharded: per-shard block must stay even-sized
    k_sharded = 0
    lh, lg = Lh, Lg
    while (
        lh + lg >= 6
        and lh % (2 * nsh) == 0
        and lg % (2 * nsh) == 0
    ):
        lh //= 2
        lg //= 2
        k_sharded += 1

    vec = lambda: P(None, axis, *bspec)
    rep = lambda: P(None, *bspec)

    def body(gx, gy, gz, hx, hy, hz, cv, l_, n_, gsx, gsy, gsz, comx, comy, comz, rho_, mu_):
        g_blk = PointJ(gx, gy, gz)
        h_blk = PointJ(hx, hy, hz)
        g_pt = PointJ(gsx, gsy, gsz)
        com = PointJ(comx, comy, comz)
        idx = jax.lax.axis_index(axis)

        t = Transcript(label, batch=batch)
        inv2 = sv.fn_inv_vec(jnp.stack([rho_, mu_], axis=1))
        rho_inv, mu_inv = inv2[:, 0], inv2[:, 1]
        rho_c, mu_c = rho_, mu_
        cv_, l_c, n_c = cv, l_, n_
        xs, rs = [], []

        for k in range(k_sharded):
            # local pair-blocked splits (global parity == local parity)
            c0, c1 = sv.sv_split(cv_)
            l0, l1 = sv.sv_split(l_c)
            n0, n1 = sv.sv_split(n_c)
            g0, g1 = pv.pv_split(g_blk)
            h0, h1 = pv.pv_split(h_blk)
            mu2 = f.fn_mul(mu_c, mu_c)

            # global pair-index offset: local pair j on shard `idx` is
            # global pair idx*halfblk + j, so the weight multiplier is
            # mu2^(idx*halfblk)
            start_pow = _shard_start_pow(mu2, n0.shape[1], idx, nsh, batch)

            two = sv.s_const(2, batch)
            vx_local = f.fn_add(
                f.fn_mul(
                    _weight_partial(n0, n1, mu2, start_pow),
                    f.fn_mul(rho_inv, two),
                ),
                f.fn_add(_partial_inner(c0, l1), _partial_inner(c1, l0)),
            )
            vr_local = f.fn_add(
                _weight_partial(n1, n1, mu2, start_pow), _partial_inner(c1, l1)
            )

            # local partial MSMs (without the g term), then combine
            x_loc = pv.msm(
                pv.pv_concat([h0, h1, g0, g1]),
                sv.sv_concat(
                    [
                        sv.sv_pad(l1, pv.pv_len(h0)),
                        sv.sv_pad(l0, pv.pv_len(h1)),
                        sv.sv_pad(sv.sv_scale(n1, rho_c), pv.pv_len(g0)),
                        sv.sv_pad(sv.sv_scale(n0, rho_inv), pv.pv_len(g1)),
                    ]
                ),
            )
            r_loc = pv.msm(
                pv.pv_concat([h1, g1]),
                sv.sv_concat([sv.sv_pad(l1, pv.pv_len(h1)), sv.sv_pad(n1, pv.pv_len(g1))]),
            )
            # scalar partials combine mod n via per-limb psum + one fold
            vx = _psum_fn(vx_local, axis)
            vr = _psum_fn(vr_local, axis)
            x_pt = dc.pt_add(
                _combine_partials(x_loc, axis), dc.pt_scalar_mul(g_pt, vx)
            )
            r_pt = dc.pt_add(
                _combine_partials(r_loc, axis), dc.pt_scalar_mul(g_pt, vr)
            )

            three = pv.pv_concat([pv.single(com), pv.single(x_pt), pv.single(r_pt)])
            byts = dc.compress(three)
            t.append_message(b"wnla_com", byts[:, 0])
            t.append_message(b"wnla_x", byts[:, 1])
            t.append_message(b"wnla_r", byts[:, 2])
            t.append_u64(b"l.sz", Lh >> k)
            t.append_u64(b"n.sz", Lg >> k)
            y = t.challenge_scalar(b"wnla_challenge")

            # fold: LOCAL (pair-blocked)
            scaled = dc.pt_scalar_mul(
                pv.pv_concat([g0, g1, h1]),
                sv.sv_concat(
                    [
                        jnp.broadcast_to(rho_c[:, None], (16, pv.pv_len(g0)) + batch),
                        jnp.broadcast_to(y[:, None], (16, pv.pv_len(g1)) + batch),
                        jnp.broadcast_to(y[:, None], (16, pv.pv_len(h1)) + batch),
                    ]
                ),
            )
            Lg0, Lg1 = pv.pv_len(g0), pv.pv_len(g1)
            g_blk = pv.pv_add(
                PointJ(*(a[:, :Lg0] for a in scaled)),
                PointJ(*(a[:, Lg0 : Lg0 + Lg1] for a in scaled)),
            )
            h_blk = pv.pv_add(h0, PointJ(*(a[:, Lg0 + Lg1 :] for a in scaled)))
            cv_ = sv.sv_add(c0, sv.sv_scale(c1, y))
            l_c = sv.sv_add(l0, sv.sv_scale(l1, y))
            n_c = sv.sv_add(sv.sv_scale(n0, rho_inv), sv.sv_scale(n1, y))
            rho_c, mu_c = mu_c, f.fn_mul(mu_c, mu_c)
            rho_inv, mu_inv = mu_inv, f.fn_mul(mu_inv, mu_inv)

            # recompute folded commitment: v*g + <h,l> + <g,n> combined
            com_loc = pv.msm(
                pv.pv_concat([h_blk, g_blk]),
                sv.sv_concat(
                    [
                        sv.sv_pad(l_c, pv.pv_len(h_blk)),
                        sv.sv_pad(n_c, pv.pv_len(g_blk)),
                    ]
                ),
            )
            v_loc = f.fn_add(
                _partial_inner(cv_, l_c),
                _weight_partial(
                    n_c,
                    n_c,
                    mu_c,
                    _shard_start_pow(mu_c, n_c.shape[1], idx, nsh, batch),
                ),
            )
            v_all = _psum_fn(v_loc, axis)
            com = dc.pt_add(
                _combine_partials(com_loc, axis), dc.pt_scalar_mul(g_pt, v_all)
            )
            xs.append(x_pt)
            rs.append(r_pt)

        # gather the small remainder onto every shard and finish locally:
        # all_gather gives (n, 16, L, *b); shard-major concat along L is
        # moveaxis(0 -> 1) then a (16, n*L, *b) reshape.
        def gather_sv(a):
            g_ = jax.lax.all_gather(a, axis)
            return jnp.moveaxis(g_, 0, 1).reshape((16, -1) + batch)

        def gather_pts(p):
            return PointJ(*(gather_sv(a) for a in p))

        g_full = gather_pts(g_blk)
        h_full = gather_pts(h_blk)
        c_full = gather_sv(cv_)
        l_full = gather_sv(l_c)
        n_full = gather_sv(n_c)

        wnla = WNLADevice(g_pt, g_full, h_full, c_full, rho_c, mu_c)
        tail = wnla.prove(com, t, l_full, n_full)
        # innermost-first: tail points first, sharded rounds outermost last
        xs_all = pv.pv_concat([tail.x] + [pv.single(p) for p in reversed(xs)])
        rs_all = pv.pv_concat([tail.r] + [pv.single(p) for p in reversed(rs)])
        return (
            rs_all.x, rs_all.y, rs_all.z,
            xs_all.x, xs_all.y, xs_all.z,
            tail.l, tail.n,
        )

    leaves = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(
            vec(), vec(), vec(),  # g_vec coords
            vec(), vec(), vec(),  # h_vec coords
            vec(),                # c
            vec(), vec(),         # l, n
            rep(), rep(), rep(),  # g coords
            rep(), rep(), rep(),  # commitment coords
            rep(), rep(),         # rho, mu
        ),
        out_specs=(P(),) * 8,
        check_vma=False,
    )(
        g_vec.x, g_vec.y, g_vec.z,
        h_vec.x, h_vec.y, h_vec.z,
        c_vec, l, n,
        g.x, g.y, g.z,
        commitment.x, commitment.y, commitment.z,
        rho, mu,
    )
    rx, ry, rz, xx, xy, xz, l_out, n_out = leaves
    return WNLAProofDev(
        r=PointJ(rx, ry, rz), x=PointJ(xx, xy, xz), l=l_out, n=n_out
    )


def _psum_fn(x, axis):
    """Mod-n combine of per-shard canonical scalars: lazy limb psum (each
    limb < 2^16, n_shards <= 2^15) then one fold."""
    s = jax.lax.psum(x, axis)
    return f._fold_n(f._carry(s, 18))


def _shard_start_pow(mu_c, blk, idx, nsh, batch):
    """mu_c^(idx*blk) via one-hot over the static shard count."""
    offs = [sv.s_const(1, batch)]
    step = f.fn_pow_const(mu_c, blk) if blk > 0 else sv.s_const(1, batch)
    for _ in range(1, nsh):
        offs.append(f.fn_mul(offs[-1], step))
    onehot = jnp.stack(
        [(idx == s_i).astype(jnp.uint32) for s_i in range(nsh)], axis=0
    )
    stacked = jnp.stack(offs, axis=1)  # (16, nsh, *batch)
    oh = onehot.reshape((1, nsh) + (1,) * len(batch))
    return sv.sv_sum(stacked * oh)
