#!/usr/bin/env python
"""Compare msm_mixed (tables + dynamic) against the generic msm for the
exact configurations the u64 fast verifier uses, on the real backend."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from bppp_tpu.models import u64_fixture
from bppp_tpu.oracle import curve as oc
from bppp_tpu.ops import curve as dc
from bppp_tpu.ops import field as f
from bppp_tpu.ops import fixed_base as fb
from bppp_tpu.ops import pallas_fixed_base as pfb
from bppp_tpu.protocol import convert as cv
from bppp_tpu.protocol import points as pv
from bppp_tpu.utils.rng import SeededRng

B = 512


def rand_scal(rng, L):
    return jnp.stack(
        [
            jnp.asarray(f.ints_to_limbs([rng.scalar() for _ in range(B)]))
            for _ in range(L)
        ],
        axis=1,
    )


def check(name, tables, fixed_pts, Ffix, dyn_pts, D, rng):
    fixed_scs = rand_scal(rng, Ffix)
    dyn_scs = rand_scal(rng, D)

    got = jax.jit(
        lambda fp, fs, dp, ds: fb.msm_mixed(tables, fp, fs, dp, ds)
    )(fixed_pts, fixed_scs, dyn_pts, dyn_scs)
    want = jax.jit(
        lambda fp, fs, dp, ds: dc.msm(
            dc.PointJ(*(jnp.concatenate([a, b], axis=1) for a, b in zip(fp, dp))),
            jnp.concatenate([fs, ds], axis=1),
        )
    )(fixed_pts, fixed_scs, dyn_pts, dyn_scs)
    eq = np.asarray(jax.jit(dc.pt_eq)(got, want))
    print(f"{name}: equal lanes {eq.sum()}/{eq.size}", flush=True)
    return bool(eq.all())


def main():
    public, dev, rng = u64_fixture("bench generators", B)
    assert dev.tables is not None, "expected tables (run on TPU or set BPPP_FIXED_TABLES=1)"

    rng2 = SeededRng("debug dyn points")
    dyn_host = [oc.GENERATOR.mul(rng2.scalar()) for _ in range(5)]
    dyn5 = cv.points_batched(dyn_host, B)
    dyn2 = pv.PointJ(*(a[:, :2] for a in dyn5))

    g = dev.g
    h = dev.h_vec
    gv = dev.g_vec
    full_pts = pv.pv_concat([pv.single(g), h, gv])
    gv_pts = pv.pv_concat([pv.single(g), gv])

    # 0) tables identical to a fresh direct build?
    unb = pv.PointJ(*(a[..., 0] for a in full_pts))  # (16, 49) lane 0
    fresh = jax.jit(pfb.build_tables)(unb)
    same = all(
        np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(fresh, dev.tables["full"])
    )
    print("tables == fresh build:", same, flush=True)

    # 1) fixed part only: msm_fixed + pt_sum vs generic msm
    fs = rand_scal(rng2, 49)
    got = jax.jit(
        lambda fs: pfb.msm_fixed_sum(dev.tables["full"], fs)
    )(fs)
    want = jax.jit(lambda fs: dc.msm(full_pts, fs))(fs)
    eq = np.asarray(jax.jit(dc.pt_eq)(got, want))
    print(f"fixed-only: equal lanes {eq.sum()}/{eq.size}", flush=True)

    # 2) dyn part only
    ds = rand_scal(rng2, 2)
    got = jax.jit(
        lambda ds: dc.pt_sum(
            dc.pt_scalar_mul(dyn2, jnp.broadcast_to(ds, dyn2.x.shape)), axis=1
        )
    )(ds)
    want = jax.jit(lambda ds: dc.msm(dyn2, ds))(ds)
    eq = np.asarray(jax.jit(dc.pt_eq)(got, want))
    print(f"dyn-only: equal lanes {eq.sum()}/{eq.size}", flush=True)

    ok1 = check("full49+dyn2", dev.tables["full"], full_pts, 49, dyn2, 2, rng2)
    ok2 = check("gv17+dyn5", dev.tables["gv"], gv_pts, 17, dyn5, 5, rng2)
    print("ALL OK" if (ok1 and ok2) else "MISMATCH", flush=True)


if __name__ == "__main__":
    main()
