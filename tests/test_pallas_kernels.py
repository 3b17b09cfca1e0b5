"""CPU validation of the Pallas TPU kernels via interpret mode.

The fused kernels (ops/pallas_curve.py, ops/pallas_msm.py,
ops/pallas_keccak.py) normally run only on the TPU backend; these tests
execute them through pallas interpret mode so their semantics are pinned
against the host oracle on every CPU test run. Shapes use the production
TILE (512 lanes) so layout/reshape logic is exercised exactly.
"""

import os

os.environ["BPPP_PALLAS_INTERPRET"] = "1"

import numpy as np
import jax.numpy as jnp
import pytest

from bppp_tpu.oracle import curve as oc
from bppp_tpu.oracle import field as of
from bppp_tpu.oracle import keccak as ok
from bppp_tpu.ops import field as f
from bppp_tpu.ops import pallas_keccak as pk
from bppp_tpu.ops import pallas_msm as pm
from bppp_tpu.ops import pallas_curve as pcv

TILE = pm.TILE  # 512


def _flat_points(pts):
    """list of oracle Points (len B) -> 3x (16, B) limb arrays."""
    xs = jnp.asarray(f.ints_to_limbs([p.x for p in pts]))
    ys = jnp.asarray(f.ints_to_limbs([p.y for p in pts]))
    zs = jnp.asarray(f.ints_to_limbs([p.z for p in pts]))
    return xs, ys, zs


def _to_points(ox, oy, oz):
    xs = f.limbs_to_ints(np.asarray(ox))
    ys = f.limbs_to_ints(np.asarray(oy))
    zs = f.limbs_to_ints(np.asarray(oz))
    return [oc.Point(x, y, z) for x, y, z in zip(xs, ys, zs)]


def _rand_wide(rng, bound, n):
    """n pseudo-random ints in [0, bound) with bound up to 2^256."""
    vals = []
    for _ in range(n):
        v = 0
        for _ in range(4):
            v = (v << 64) | int(rng.integers(0, 2**63))
        vals.append(v % bound)
    return vals


def _rand_points(rng, n):
    """Deterministic pseudo-random points: [k]G for random k (plus a few
    edge lanes patched in by callers)."""
    ks = [int(rng.integers(1, 2**63)) | 1 for _ in range(n)]
    return [oc.GENERATOR.mul(k) for k in ks]


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(1234)


def test_ladder_kernel_vs_oracle(rng):
    pts = _rand_points(rng, TILE)
    # edge lanes: identity base, k = 0, k = 1, k = n - 1
    pts[0] = oc.IDENTITY
    ks = _rand_wide(rng, of.N, TILE)
    ks[1] = 0
    ks[2] = 1
    ks[3] = of.N - 1
    px, py, pz = _flat_points(pts)
    karr = jnp.asarray(f.ints_to_limbs(ks))
    ox, oy, oz = pm.scalar_mul_flat(px, py, pz, karr)
    got = _to_points(ox, oy, oz)
    for i in [0, 1, 2, 3] + [7, 100, 511]:
        want = pts[i].mul(ks[i])
        assert got[i].eq(want), f"lane {i}"


def test_pow_kernel_vs_oracle(rng):
    xs = [v | 1 for v in _rand_wide(rng, of.P, TILE)]
    xs[0] = 0  # fp_inv(0) == 0 convention
    xf = jnp.asarray(f.ints_to_limbs(xs))
    out = pm.pow_const_flat(xf, of.P - 2, "p")
    got = f.limbs_to_ints(np.asarray(out))
    for i in [0, 1, 5, 511]:
        want = 0 if xs[i] == 0 else of.fp_inv(xs[i])
        assert got[i] == want, f"lane {i}"

    out_n = pm.pow_const_flat(jnp.asarray(f.ints_to_limbs(xs)), of.N - 2, "n")
    got_n = f.limbs_to_ints(np.asarray(out_n))
    for i in [1, 9, 510]:
        assert got_n[i] == of.fn_inv(xs[i] % of.N), f"lane {i}"


def test_tree_sum_vs_oracle(rng):
    L = 8
    pts = [_rand_points(rng, TILE) for _ in range(L)]
    pts[3][5] = oc.IDENTITY  # identity chunk lane
    px = jnp.stack([_flat_points(row)[0] for row in pts], axis=1)
    py = jnp.stack([_flat_points(row)[1] for row in pts], axis=1)
    pz = jnp.stack([_flat_points(row)[2] for row in pts], axis=1)
    ox, oy, oz = pm.tree_sum((px, py, pz), L)
    got = _to_points(ox, oy, oz)
    for i in [0, 5, 511]:
        want = oc.IDENTITY
        for row in pts:
            want = want.add(row[i])
        assert got[i].eq(want), f"lane {i}"


def test_pt_add_double_kernels(rng):
    ps = _rand_points(rng, TILE)
    qs = _rand_points(rng, TILE)
    # edge lanes: p==q (doubling collision), p==-q (inverse), identities
    qs[0] = ps[0]
    qs[1] = oc.Point(ps[1].x, of.fp_sub(0, ps[1].y), ps[1].z)
    ps[2] = oc.IDENTITY
    qs[3] = oc.IDENTITY
    px, py, pz = _flat_points(ps)
    qx, qy, qz = _flat_points(qs)
    ox, oy, oz = pcv.pt_add_flat(px, py, pz, qx, qy, qz)
    got = _to_points(ox, oy, oz)
    for i in [0, 1, 2, 3, 250, 511]:
        assert got[i].eq(ps[i].add(qs[i])), f"add lane {i}"
    dx, dy, dz = pcv.pt_double_flat(px, py, pz)
    gotd = _to_points(dx, dy, dz)
    for i in [0, 2, 400]:
        assert gotd[i].eq(ps[i].double()), f"double lane {i}"


def test_msm_small_kernel_vs_oracle(rng):
    """Shared-window small-MSM kernel (D=3, B=512) vs the oracle,
    including identity point and zero/one scalar edge lanes."""
    D, B = 3, TILE
    rows = [_rand_points(rng, B) for _ in range(D)]
    rows[1][0] = oc.IDENTITY
    ks = [_rand_wide(rng, of.N, B) for _ in range(D)]
    ks[0][1] = 0
    ks[2][2] = 1
    px = jnp.stack([_flat_points(r)[0] for r in rows], axis=0)
    py = jnp.stack([_flat_points(r)[1] for r in rows], axis=0)
    pz = jnp.stack([_flat_points(r)[2] for r in rows], axis=0)
    kk = jnp.stack([jnp.asarray(f.ints_to_limbs(k)) for k in ks], axis=0)
    ox, oy, oz = pm.msm_small_flat(px, py, pz, kk)
    got = _to_points(ox, oy, oz)
    for p in [0, 1, 2, 100, 511]:
        want = oc.IDENTITY
        for i in range(D):
            want = want.add(rows[i][p].mul(ks[i][p]))
        assert got[p].eq(want), f"lane {p}"


def test_msm_small_glv_kernel_vs_oracle(rng):
    """GLV shared-window MSM kernel (halved window walk, beta-on-the-fly
    phi tables, per-lane sign negation) vs the oracle, with identity
    point and zero/one/lambda scalar edge lanes."""
    from bppp_tpu.ops import glv

    D, B = 3, TILE
    rows = [_rand_points(rng, B) for _ in range(D)]
    rows[1][0] = oc.IDENTITY
    ks = [_rand_wide(rng, of.N, B) for _ in range(D)]
    ks[0][1] = 0
    ks[2][2] = 1
    ks[0][3] = glv.LAMBDA
    ks[1][4] = of.N - 1
    px = jnp.stack([_flat_points(r)[0] for r in rows], axis=0)
    py = jnp.stack([_flat_points(r)[1] for r in rows], axis=0)
    pz = jnp.stack([_flat_points(r)[2] for r in rows], axis=0)
    kk = jnp.stack([jnp.asarray(f.ints_to_limbs(k)) for k in ks], axis=0)

    import jax

    m1, n1, m2, n2 = jax.jit(glv.decompose)(jnp.moveaxis(kk, 0, 1))
    mags = jnp.moveaxis(jnp.stack([m1, m2], axis=2).reshape(16, 2 * D, B), 1, 0)
    signs = jnp.stack([n1, n2], axis=1).reshape(2 * D, B).astype(jnp.uint32)
    ox, oy, oz = pm.msm_small_glv_flat(px, py, pz, mags, signs)
    got = _to_points(ox, oy, oz)
    for p in [0, 1, 2, 3, 4, 100, 511]:
        want = oc.IDENTITY
        for i in range(D):
            want = want.add(rows[i][p].mul(ks[i][p]))
        assert got[p].eq(want), f"lane {p}"


def test_msm_small_wnaf_kernel_vs_oracle(rng):
    """Signed-digit (wNAF) GLV MSM kernel — 8-entry stride-8 tables,
    graph-side digit recode, LSB-first planes under the MSB-first walk —
    vs the oracle, with identity point and zero/one/lambda/n-1 scalar
    edge lanes (the digit planes of n-1 and lambda exercise both-half
    negation and carries)."""
    import jax

    from bppp_tpu.ops import glv

    D, B = 3, TILE
    rows = [_rand_points(rng, B) for _ in range(D)]
    rows[1][0] = oc.IDENTITY
    ks = [_rand_wide(rng, of.N, B) for _ in range(D)]
    ks[0][1] = 0
    ks[2][2] = 1
    ks[0][3] = glv.LAMBDA
    ks[1][4] = of.N - 1
    px = jnp.stack([_flat_points(r)[0] for r in rows], axis=0)
    py = jnp.stack([_flat_points(r)[1] for r in rows], axis=0)
    pz = jnp.stack([_flat_points(r)[2] for r in rows], axis=0)
    kk = jnp.stack([jnp.asarray(f.ints_to_limbs(k)) for k in ks], axis=0)

    def digits(kk):
        m1, n1, m2, n2 = glv.decompose(jnp.moveaxis(kk, 0, 1))
        d1 = glv.wnaf_digits(m1, n1)
        d2 = glv.wnaf_digits(m2, n2)
        return jnp.stack([d1, d2], axis=2).reshape(glv.GLV_WINDOWS * 2 * D, B)

    dig = jax.jit(digits)(kk)
    ox, oy, oz = pm.msm_small_wnaf_flat(px, py, pz, dig)
    got = _to_points(ox, oy, oz)
    for p in [0, 1, 2, 3, 4, 100, 511]:
        want = oc.IDENTITY
        for i in range(D):
            want = want.add(rows[i][p].mul(ks[i][p]))
        assert got[p].eq(want), f"lane {p}"


def test_msm_fixed_positions_vs_oracle(rng):
    """msm_fixed_positions: the kernel walks a static SUBSET of the
    table rows (the prover's live-position MSMs) — table gather +
    position-order scalars vs the oracle."""
    import jax

    from bppp_tpu.ops import curve as dc
    from bppp_tpu.ops import fixed_base as dfb
    from bppp_tpu.ops import pallas_fixed_base as fb

    F, B = 5, TILE
    base_pts = _rand_points(rng, F)
    pts = dc.from_int_points(base_pts)
    tables = jax.jit(fb.build_tables)(pts)
    positions = (0, 2, 4)
    ks = [_rand_wide(rng, of.N, B) for _ in positions]
    ks[0][0] = 0
    scal = jnp.stack([jnp.asarray(f.ints_to_limbs(k)) for k in ks], axis=1)
    out = dfb.msm_fixed_positions(tables, pts, positions, scal)
    got = _to_points(out.x, out.y, out.z)
    for p in [0, 1, 511]:
        want = oc.IDENTITY
        for pos, krow in zip(positions, ks):
            want = want.add(base_pts[pos].mul(krow[p]))
        assert got[p].eq(want), f"lane {p}"


@pytest.mark.parametrize("wnaf", ["0", "1"])
def test_msm_dispatch_glv_vs_oracle(rng, monkeypatch, wnaf):
    """curve.msm end-to-end through the GLV dispatch (_msm_small ->
    glv.decompose -> unsigned or signed-digit kernel) vs the oracle."""
    monkeypatch.setenv("BPPP_PALLAS", "1")
    monkeypatch.setenv("BPPP_WNAF", wnaf)
    from bppp_tpu.ops import curve as dc

    L, B = 2, TILE
    rows = [_rand_points(rng, B) for _ in range(L)]
    ks = [_rand_wide(rng, of.N, B) for _ in range(L)]
    ks[0][0] = 0
    pts = dc.PointJ(
        jnp.stack([_flat_points(r)[0] for r in rows], axis=1),
        jnp.stack([_flat_points(r)[1] for r in rows], axis=1),
        jnp.stack([_flat_points(r)[2] for r in rows], axis=1),
    )
    kk = jnp.stack([jnp.asarray(f.ints_to_limbs(k)) for k in ks], axis=1)
    out = dc.msm(pts, kk)
    got = _to_points(out.x, out.y, out.z)
    for p in [0, 1, 100, 511]:
        want = oc.IDENTITY
        for i in range(L):
            want = want.add(rows[i][p].mul(ks[i][p]))
        assert got[p].eq(want), f"lane {p}"


def test_fixed_base_msm_vs_oracle(rng):
    """build_tables + fused fixed_msm kernel == sum_i [s_i] G_i
    (F=2, B=TILE; the F-axis reduction is carried in-kernel)."""
    import jax

    from bppp_tpu.ops import curve as dc
    from bppp_tpu.ops import pallas_fixed_base as fb

    F, B = 2, TILE
    base_pts = _rand_points(rng, F)
    pts = dc.from_int_points(base_pts)  # (16, F)
    tables = jax.jit(fb.build_tables)(pts)

    ks = [_rand_wide(rng, of.N, B) for _ in range(F)]
    ks[0][0] = 0  # zero scalar -> that generator contributes identity
    ks[0][2] = 0
    ks[1][2] = 0  # all-zero lane -> MSM result is the identity
    ks[1][1] = 1
    scal = jnp.stack(
        [jnp.asarray(f.ints_to_limbs(krow)) for krow in ks], axis=1
    )  # (16, F, B)
    out = fb.msm_fixed_sum(tables, scal)
    assert out is not None
    got = _to_points(out.x, out.y, out.z)
    for p in [0, 1, 2, 5, 511]:
        want = oc.IDENTITY
        for i in range(F):
            want = want.add(base_pts[i].mul(ks[i][p]))
        assert got[p].eq(want), f"lane {p}"


def test_fixed_base_msm_wide_window_vs_oracle(rng, monkeypatch):
    """W=11 production path: cross-limb window digits + NE=2048 bf16
    byte-split tables/one-hot (exact: all values < 2^8). The module
    constants are patched because conftest pins BPPP_FBW=8 to keep the
    other interpret tests' table builds small; shapes differ so the
    jitted kernel re-traces under the patched globals."""
    import jax

    from bppp_tpu.ops import curve as dc
    from bppp_tpu.ops import pallas_fixed_base as fb

    monkeypatch.setattr(fb, "W_BITS", 11)
    monkeypatch.setattr(fb, "N_WINDOWS", -(-256 // 11))
    monkeypatch.setattr(fb, "N_ENT", 1 << 11)
    monkeypatch.setattr(fb, "_SEL_DT", jnp.bfloat16)

    F, B = 2, TILE
    base_pts = _rand_points(rng, F)
    pts = dc.from_int_points(base_pts)
    tables = jax.jit(lambda p: fb.build_tables(p))(pts)
    assert tables.dtype == jnp.bfloat16 and tables.shape == (24, F, 64, 2048)
    ks = [_rand_wide(rng, of.N, B) for _ in range(F)]
    ks[0][0] = 0  # zero scalar -> identity contribution
    scal = jnp.stack([jnp.asarray(f.ints_to_limbs(k)) for k in ks], axis=1)
    out = fb.msm_fixed_sum(tables, scal)
    assert out is not None
    got = _to_points(out.x, out.y, out.z)
    for p in [0, 1, B - 1]:
        want = oc.IDENTITY
        for i in range(F):
            want = want.add(base_pts[i].mul(ks[i][p]))
        assert got[p].eq(want), f"lane {p}"


def test_fixed_base_msm_vpu_select_matches_mx(rng):
    """BPPP_FBSEL=vpu (masked-add entry selection, u32 tables) computes
    the same MSM as the default mx (byte-split one-hot MXU) path. Tables
    are FBSEL-specific (layout AND dtype differ), so each half builds its
    own; the differing kernel-input dtypes also guarantee the two halves
    can never silently trace the same program (ADVICE r2: the old test
    relied on clear_caches for that)."""
    import jax

    from bppp_tpu.ops import curve as dc
    from bppp_tpu.ops import pallas_fixed_base as fb

    F, B = 2, TILE
    pts = dc.from_int_points(_rand_points(rng, F))
    ks = [_rand_wide(rng, of.N, B) for _ in range(F)]
    scal = jnp.stack(
        [jnp.asarray(f.ints_to_limbs(krow)) for krow in ks], axis=1
    )
    old = fb._FBSEL
    try:
        # fresh lambda identities: jax.jit caches on the underlying
        # callable, so jit(fb.build_tables) twice would reuse one trace
        fb._FBSEL = "mx"
        tab_mx = jax.jit(lambda p: fb.build_tables(p))(pts)
        assert tab_mx.dtype == jnp.float32 and tab_mx.shape[2] == 64
        a = jax.tree_util.tree_map(np.asarray, fb.msm_fixed_sum(tab_mx, scal))
        fb._FBSEL = "vpu"
        tab_vpu = jax.jit(lambda p: fb.build_tables(p))(pts)
        assert tab_vpu.dtype == jnp.uint32 and tab_vpu.shape[2] == 32
        b = fb.msm_fixed_sum(tab_vpu, scal)
    finally:
        fb._FBSEL = old
    for ca, cb in zip(a, b):
        assert np.array_equal(ca, np.asarray(cb))


def test_keccak_kernel_vs_oracle(rng):
    states = rng.integers(0, 256, size=(200, TILE), dtype=np.uint32)
    out = np.asarray(pk.f1600_flat(jnp.asarray(states)))
    for lane in [0, 17, 511]:
        state_bytes = bytes(int(b) for b in states[:, lane])
        want = ok.f1600_bytes(state_bytes)
        got = bytes(int(b) for b in out[:, lane])
        assert got == want, f"lane {lane}"


@pytest.mark.parametrize("wnaf,L", [("0", 5), ("1", 5), ("1", 6)])
def test_msm_dispatch_fulltile_chunked_vs_oracle(rng, monkeypatch, wnaf, L):
    """Full-tile dispatch above/at the per-call point cap: unsigned at
    L=5 runs ceil(5/3)=2 chunked calls + a complete-add combine (the r3
    fast path); wNAF at L=5 is ONE call (FT_DMAX_WNAF=5) and at L=6
    chunks 5+1."""
    monkeypatch.setenv("BPPP_PALLAS", "1")
    monkeypatch.setenv("BPPP_WNAF", wnaf)
    from bppp_tpu.ops import curve as dc

    B = TILE
    rows = [_rand_points(rng, B) for _ in range(L)]
    rows[3][0] = oc.IDENTITY
    ks = [_rand_wide(rng, of.N, B) for _ in range(L)]
    ks[0][0] = 0
    pts = dc.PointJ(
        jnp.stack([_flat_points(r)[0] for r in rows], axis=1),
        jnp.stack([_flat_points(r)[1] for r in rows], axis=1),
        jnp.stack([_flat_points(r)[2] for r in rows], axis=1),
    )
    kk = jnp.stack([jnp.asarray(f.ints_to_limbs(k)) for k in ks], axis=1)
    out = dc.msm(pts, kk)
    got = _to_points(out.x, out.y, out.z)
    for p in [0, 1, 100, TILE - 1]:
        want = oc.IDENTITY
        for i in range(L):
            want = want.add(rows[i][p].mul(ks[i][p]))
        assert got[p].eq(want), f"lane {p}"
