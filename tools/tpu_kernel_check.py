#!/usr/bin/env python
"""Compile-and-run EVERY production Pallas kernel on the REAL TPU backend
and cross-check a few lanes against the host oracle.

This is the gate that makes interpret-mode-only kernel regressions
structurally impossible (three shipped in rounds 1-2: GLV sublane
alignment, f32->u32 cast, 1-D->2-D shape cast — all Mosaic rules
interpret mode never checks). Run it after ANY kernel change, BEFORE
committing:

    python tools/tpu_kernel_check.py              # all steps
    python tools/tpu_kernel_check.py msm glv      # named steps only

Steps: add dbl ladder pow keccak tree msm glv glv_ft wnaf pippenger
fixed fixed_vpu
Exit code is the number of failed steps.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np
import jax

# make JAX_PLATFORMS stick past the axon site hook (CLAUDE.md): CPU
# sanity runs set JAX_PLATFORMS=cpu and must not touch the tunnel
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
import jax.numpy as jnp

from bppp_tpu.oracle import curve as oc
from bppp_tpu.oracle import field as of
from bppp_tpu.oracle import keccak as ok
from bppp_tpu.ops import field as f
from bppp_tpu.ops import curve as dc
from bppp_tpu.ops import pallas_curve as pc
from bppp_tpu.ops import pallas_keccak as pk
from bppp_tpu.ops import pallas_msm as pm
from bppp_tpu.ops import pallas_fixed_base as pfb

TILE = pc.TILE
MS_TILE = pm.MS_TILE
rng = np.random.default_rng(77)


def _rand_wide(bound, n):
    vals = []
    for _ in range(n):
        v = 0
        for _ in range(4):
            v = (v << 64) | int(rng.integers(0, 2**63))
        vals.append(v % bound)
    return vals


def _flat_points(pts):
    xs = jnp.asarray(f.ints_to_limbs([p.x for p in pts]))
    ys = jnp.asarray(f.ints_to_limbs([p.y for p in pts]))
    zs = jnp.asarray(f.ints_to_limbs([p.z for p in pts]))
    return xs, ys, zs


def _lane_point(arrs, i):
    ox, oy, oz = (np.asarray(a) for a in arrs)
    return oc.Point(
        sum(int(ox[l, i]) << (16 * l) for l in range(16)),
        sum(int(oy[l, i]) << (16 * l) for l in range(16)),
        sum(int(oz[l, i]) << (16 * l) for l in range(16)),
    )


def check_add():
    pts = [oc.GENERATOR.mul(k | 1) for k in _rand_wide(of.N, 2 * TILE)]
    pts[0] = oc.IDENTITY
    pts[TILE + 1] = oc.IDENTITY
    pts[TILE + 2] = pts[2]           # doubling collision
    pts[TILE + 3] = pts[3].neg()     # inverse collision
    p, q = pts[:TILE], pts[TILE:]
    outs = pc.pt_add_flat(*_flat_points(p), *_flat_points(q))
    bad = 0
    for i in [0, 1, 2, 3, 9, TILE - 1]:
        if not _lane_point(outs, i).eq(p[i].add(q[i])):
            bad += 1
            print(f"  ADD MISMATCH lane {i}")
    return bad


def check_dbl():
    pts = [oc.GENERATOR.mul(k | 1) for k in _rand_wide(of.N, TILE)]
    pts[0] = oc.IDENTITY
    outs = pc.pt_double_flat(*_flat_points(pts))
    bad = 0
    for i in [0, 1, 9, TILE - 1]:
        if not _lane_point(outs, i).eq(pts[i].double()):
            bad += 1
            print(f"  DBL MISMATCH lane {i}")
    return bad


def check_ladder():
    pts = [oc.GENERATOR.mul(k | 1) for k in _rand_wide(of.N, TILE)]
    pts[0] = oc.IDENTITY
    ks = _rand_wide(of.N, TILE)
    ks[1], ks[2], ks[3] = 0, 1, of.N - 1
    karr = jnp.asarray(f.ints_to_limbs(ks))
    outs = pm.scalar_mul_flat(*_flat_points(pts), karr)
    bad = 0
    for i in [0, 1, 2, 3, 7, 100, TILE - 1]:
        if not _lane_point(outs, i).eq(pts[i].mul(ks[i])):
            bad += 1
            print(f"  LADDER MISMATCH lane {i}")
    return bad


def check_pow():
    xs = [v | 1 for v in _rand_wide(of.P, TILE)]
    xs[0] = 0
    out = np.asarray(
        pm.pow_const_flat(jnp.asarray(f.ints_to_limbs(xs)), of.P - 2, "p")
    )
    bad = 0
    for i in [0, 1, 5, TILE - 1]:
        got = sum(int(out[l, i]) << (16 * l) for l in range(16))
        want = 0 if xs[i] == 0 else of.fp_inv(xs[i])
        if got != want:
            bad += 1
            print(f"  POW MISMATCH lane {i}")
    return bad


def check_keccak():
    states = rng.integers(0, 256, size=(200, pk.TILE), dtype=np.uint32)
    kout = np.asarray(pk.f1600_flat(jnp.asarray(states)))
    bad = 0
    for lane in [0, 17, pk.TILE - 1]:
        want = ok.f1600_bytes(bytes(int(b) for b in states[:, lane]))
        got = bytes(int(b) for b in kout[:, lane])
        if got != want:
            bad += 1
            print(f"  KECCAK MISMATCH lane {lane}")
    return bad


def check_tree():
    L, B = 4, TILE
    pts = [
        [oc.GENERATOR.mul(k | 1) for k in _rand_wide(of.N, B)] for _ in range(L)
    ]
    pts[2][5] = oc.IDENTITY  # identity padding stays inert
    px = jnp.stack([jnp.asarray(f.ints_to_limbs([p.x for p in row])) for row in pts], axis=1)
    py = jnp.stack([jnp.asarray(f.ints_to_limbs([p.y for p in row])) for row in pts], axis=1)
    pz = jnp.stack([jnp.asarray(f.ints_to_limbs([p.z for p in row])) for row in pts], axis=1)
    outs = pm.tree_sum((px, py, pz), L)
    bad = 0
    for i in [0, 5, B - 1]:
        want = oc.IDENTITY
        for row in pts:
            want = want.add(row[i])
        if not _lane_point(outs, i).eq(want):
            bad += 1
            print(f"  TREE MISMATCH lane {i}")
    return bad


def _msm_case(D, B):
    pts = [
        [oc.GENERATOR.mul(k | 1) for k in _rand_wide(of.N, B)] for _ in range(D)
    ]
    pts[0][0] = oc.IDENTITY
    ks = [_rand_wide(of.N, B) for _ in range(D)]
    ks[D - 1][1] = 0
    px = jnp.stack([jnp.asarray(f.ints_to_limbs([p.x for p in row])) for row in pts], axis=1)
    py = jnp.stack([jnp.asarray(f.ints_to_limbs([p.y for p in row])) for row in pts], axis=1)
    pz = jnp.stack([jnp.asarray(f.ints_to_limbs([p.z for p in row])) for row in pts], axis=1)
    kk = jnp.stack([jnp.asarray(f.ints_to_limbs(row)) for row in ks], axis=1)
    points = dc.PointJ(px, py, pz)  # (16, D, B)
    return pts, ks, points, kk


def _msm_check(outs, pts, ks, B, label):
    bad = 0
    for i in [0, 1, 7, B - 1]:
        want = oc.IDENTITY
        for row_p, row_k in zip(pts, ks):
            want = want.add(row_p[i].mul(row_k[i]))
        if not _lane_point(outs, i).eq(want):
            bad += 1
            print(f"  {label} MISMATCH lane {i}")
    return bad


def check_msm():
    prev = os.environ.get("BPPP_GLV")
    os.environ["BPPP_GLV"] = "0"
    try:
        B = MS_TILE  # half-tile path
        pts, ks, points, kk = _msm_case(2, B)
        out = dc.msm(points, kk)
        return _msm_check(tuple(out), pts, ks, B, "MSM")
    finally:
        if prev is None:
            os.environ.pop("BPPP_GLV", None)
        else:
            os.environ["BPPP_GLV"] = prev


def _with_env(key, val, fn):
    prev = os.environ.get(key)
    os.environ[key] = val
    try:
        return fn()
    finally:
        if prev is None:
            os.environ.pop(key, None)
        else:
            os.environ[key] = prev


def check_glv():
    """Unsigned-digit GLV kernel (BPPP_WNAF=0 A/B path)."""
    def run():
        B = MS_TILE  # half-tile path
        pts, ks, points, kk = _msm_case(2, B)
        out = dc.msm(points, kk)
        return _msm_check(tuple(out), pts, ks, B, "GLV-MSM")

    return _with_env("BPPP_WNAF", "0", run)


def check_glv_ft():
    """Unsigned full-tile chunked dispatch (D <= FT_DMAX + combine)."""
    def run():
        B = TILE
        pts, ks, points, kk = _msm_case(5, B)
        out = dc.msm(points, kk)  # 2 chunked calls at FT_DMAX=3
        return _msm_check(tuple(out), pts, ks, B, "GLV-MSM-FT")

    return _with_env("BPPP_WNAF", "0", run)


def check_wnaf():
    """Signed-digit (wNAF) GLV kernel — the default dispatch: half-tile
    D=2, full-tile D=5 single call, and full-tile D=6 (5+1 chunk)."""
    bad = 0
    for D, B, label in (
        (2, MS_TILE, "WNAF-MSM"),
        (5, TILE, "WNAF-MSM-FT5"),
        (6, TILE, "WNAF-MSM-FT6"),
    ):
        pts, ks, points, kk = _msm_case(D, B)
        out = dc.msm(points, kk)
        bad += _msm_check(tuple(out), pts, ks, B, label)
    return bad


def check_pippenger():
    """Bucketed Pippenger at L=16 (c=4) and L=128 (c=8) on the real
    backend — sort/gather/scan lowering plus the complete-add scan body
    have never run on hardware before r4 (VERDICT r3 weak #1). B small:
    this is the LARGE-L/one-proof regime, not the batched verify path."""
    bad = 0
    from bppp_tpu.ops.pippenger import msm_pippenger, _pick_c

    for L in (16, 128):
        B = 8
        pts = [
            [oc.GENERATOR.mul(k | 1) for k in _rand_wide(of.N, B)]
            for _ in range(L)
        ]
        pts[0][0] = oc.IDENTITY
        pts[1][1] = pts[2][1]  # duplicate: complete-add path
        ks = [_rand_wide(of.N, B) for _ in range(L)]
        ks[L - 1][1] = 0
        px = jnp.stack([jnp.asarray(f.ints_to_limbs([p.x for p in row])) for row in pts], axis=1)
        py = jnp.stack([jnp.asarray(f.ints_to_limbs([p.y for p in row])) for row in pts], axis=1)
        pz = jnp.stack([jnp.asarray(f.ints_to_limbs([p.z for p in row])) for row in pts], axis=1)
        kk = jnp.stack([jnp.asarray(f.ints_to_limbs(row)) for row in ks], axis=1)
        out = jax.jit(msm_pippenger)(dc.PointJ(px, py, pz), kk)
        bad += _msm_check(tuple(out), pts, ks, B, f"PIPPENGER(L={L},c={_pick_c(L)})")
    return bad


def _check_fixed(label):
    F, B = 3, TILE
    gens = [oc.GENERATOR.mul(3 + i) for i in range(F)]
    gx = jnp.asarray(f.ints_to_limbs([g.x for g in gens]))
    gy = jnp.asarray(f.ints_to_limbs([g.y for g in gens]))
    gz = jnp.asarray(f.ints_to_limbs([g.z for g in gens]))
    tables = pfb.build_tables(dc.PointJ(gx, gy, gz))
    ks = [_rand_wide(of.N, B) for _ in range(F)]
    ks[0][0] = 0
    kk = jnp.stack([jnp.asarray(f.ints_to_limbs(row)) for row in ks], axis=1)
    out = pfb.msm_fixed_sum(tables, kk)
    assert out is not None
    bad = 0
    for i in [0, 1, B - 1]:
        want = oc.IDENTITY
        for g, row_k in zip(gens, ks):
            want = want.add(g.mul(row_k[i]))
        if not _lane_point(tuple(out), i).eq(want):
            bad += 1
            print(f"  {label} MISMATCH lane {i}")
    return bad


def check_fixed():
    return _check_fixed("FIXED(mx)" if pfb._FBSEL == "mx" else "FIXED(vpu)")


def check_fixed_vpu():
    """vpu selection pairs with narrow windows (FBW=4: the masked
    accumulate unrolls N_ENT adds, and FBW=8 vpu alone compiles ~10 min);
    the production W=11 default asserts vpu off, so pin W=4 here."""
    prev = (pfb._FBSEL, pfb.W_BITS, pfb.N_WINDOWS, pfb.N_ENT, pfb._SEL_DT)
    pfb._FBSEL = "vpu"
    pfb.W_BITS, pfb.N_WINDOWS, pfb.N_ENT = 4, 64, 16
    try:
        return _check_fixed("FIXED(vpu,w4)")
    finally:
        pfb._FBSEL, pfb.W_BITS, pfb.N_WINDOWS, pfb.N_ENT, pfb._SEL_DT = prev


STEPS = [
    ("add", check_add),
    ("dbl", check_dbl),
    ("pow", check_pow),
    ("keccak", check_keccak),
    ("tree", check_tree),
    ("msm", check_msm),
    ("glv", check_glv),
    ("glv_ft", check_glv_ft),
    ("wnaf", check_wnaf),
    ("ladder", check_ladder),
    ("pippenger", check_pippenger),
    ("fixed", check_fixed),
    ("fixed_vpu", check_fixed_vpu),
]


def _log_run(steps, failed):
    """Append a one-line JSON record to tools/hw_results.jsonl so "did the
    hardware gate run at tree X" is answerable afterwards (VERDICT r4
    weak #6: the W=11 default shipped without a recorded gate run)."""
    import json
    import subprocess

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    try:
        git = subprocess.run(
            ["git", "-C", root, "describe", "--always", "--dirty"],
            capture_output=True, text=True, timeout=10,
        ).stdout.strip()
    except Exception:
        git = "?"
    from bppp_tpu.utils.aot import _src_hash

    rec = dict(
        step="kernel_check",
        rc=failed,
        steps={n: rc for n, rc in steps},
        git=git,
        src=_src_hash("tpu"),
        backend=jax.default_backend(),
        cfg=f"_SUB={pc._SUB} TILE={TILE} FBW={pfb.W_BITS} FBSEL={pfb._FBSEL}",
        ts=time.strftime("%Y-%m-%d %H:%M:%S"),
    )
    with open(os.path.join(root, "tools", "hw_results.jsonl"), "a") as fh:
        fh.write(json.dumps(rec) + "\n")


def main():
    names = set(sys.argv[1:])
    print(f"backend={jax.default_backend()} _SUB={pc._SUB} TILE={TILE} "
          f"MS_TILE={MS_TILE} FBW={pfb.W_BITS} FBSEL={pfb._FBSEL}", flush=True)
    failed = 0
    results = []
    for name, fn in STEPS:
        if names and name not in names:
            continue
        t0 = time.perf_counter()
        try:
            bad = fn()
        except Exception as e:  # compile failures are the point of this tool
            bad = 1
            print(f"  {name} RAISED: {type(e).__name__}: {str(e)[:500]}")
        dt = time.perf_counter() - t0
        status = "ok" if bad == 0 else f"FAIL ({bad})"
        print(f"[{name}] {status} ({dt:.0f}s)", flush=True)
        results.append((name, int(bad)))
        failed += bad != 0
    _log_run(results, failed)
    print(f"kernel check done, failed steps = {failed}", flush=True)
    return failed


if __name__ == "__main__":
    sys.exit(main())
