#!/usr/bin/env python
"""Compare fb.msm_fixed_total (fallback path) against _msm_stack and the
host oracle on small random inputs with structured zeros."""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from bppp_tpu.oracle import curve as oc
from bppp_tpu.ops import curve as dc
from bppp_tpu.ops import field as f
from bppp_tpu.ops import fixed_base as fb
from bppp_tpu.protocol import convert as cv
from bppp_tpu.protocol import points as pv
from bppp_tpu.protocol import vectors as sv
from bppp_tpu.protocol.wnla import _msm_stack
from bppp_tpu.utils.rng import SeededRng

L, B, M = 9, 2, 2  # M = extra stacked axis (X and R)
rng = SeededRng("msm total dbg")
pts_int = [oc.GENERATOR.mul(rng.scalar()) for _ in range(L)]
# scalars per (m, lane): include structured zeros like the R rows
scs_int = [[[0 if (m == 1 and i % 2 == 0 and i > 0) else rng.scalar()
             for i in range(L)] for b in range(B)] for m in range(M)]

pts = cv.points_batched(pts_int, B)  # coords (16, L, B)
# scal (16, L, M, B)
scal = np.zeros((16, L, M, B), np.uint32)
for m in range(M):
    for b in range(B):
        col = np.asarray(f.ints_to_limbs(scs_int[m][b]))  # (16, L)
        scal[:, :, m, b] = col

@jax.jit
def run_total(pts_x, pts_y, pts_z, scal):
    return fb.msm_fixed_total(None, dc.PointJ(pts_x, pts_y, pts_z), jnp.asarray(scal))

@jax.jit
def run_stack(pts_x, pts_y, pts_z, scal):
    p = dc.PointJ(pts_x, pts_y, pts_z)
    groups = [(p, jnp.asarray(scal[:, :, m])) for m in range(M)]
    return _msm_stack(groups)

tot = jax.tree_util.tree_map(np.asarray, run_total(*pts, scal))
stk = jax.tree_util.tree_map(np.asarray, run_stack(*pts, scal))

ok = True
for m in range(M):
    for b in range(B):
        want = oc.IDENTITY
        for i in range(L):
            want = want.add(pts_int[i].mul(scs_int[m][b][i]))
        got_t = cv.point_lane(dc.PointJ(*(a[:, m] for a in tot)), b)
        got_s = cv.point_lane(dc.PointJ(*(a[:, m] for a in stk)), b)
        t_ok, s_ok = got_t.eq(want), got_s.eq(want)
        ok &= t_ok and s_ok
        print(f"m={m} b={b}: total {'OK' if t_ok else 'MISMATCH'} "
              f"stack {'OK' if s_ok else 'MISMATCH'}")
sys.exit(0 if ok else 1)
