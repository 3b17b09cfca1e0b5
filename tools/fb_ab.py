#!/usr/bin/env python
"""Device-time A/B of the fixed-base MSM kernel at the verify shape.

The fixed-base kernels are the fast verifier's dominant cost (~51 ms of
92 ms at batch 512 in round 1). This compiles fixed_msm_sum_flat
standalone — random table/scalar bits; point validity doesn't affect
timing since the add body is branchless — and reports profiler DEVICE
time (wall clock through the tunnel is untrustworthy, see BENCHMARKS.md).

Knobs are read at import by the kernel module, so run one config per
process:

    BPPP_FBW=8 BPPP_FBSEL=mx  python tools/fb_ab.py   # round-1 default
    BPPP_FBW=4 BPPP_FBSEL=vpu python tools/fb_ab.py
    FB_F=49 FB_B=1024 ...                             # shape override
"""

import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from bppp_tpu.ops import pallas_fixed_base as pfb

F = int(os.environ.get("FB_F", "49"))
B = int(os.environ.get("FB_B", "1024"))


def device_ms(fn, *args):
    """-> (sum, max) of TPU XLA-op device durations, ms. The SUM is the
    comparison metric: the two A/B configs split work differently
    between the fused kernel and graph-level side ops (vpu adds a table
    cast, FBW=4 doubles the digit prep), so max-of-one-op biases toward
    whichever config pushes more cost outside the kernel (ADVICE r2)."""
    o = fn(*args)
    jax.block_until_ready(o)
    tdir = "/tmp/jax_fb_trace"
    os.system(f"rm -rf {tdir}")
    with jax.profiler.trace(tdir):
        o = fn(*args)
        jax.block_until_ready(o)
        np.asarray(o[0])
    best = 0.0
    total = 0.0
    for path in glob.glob(f"{tdir}/**/*.xplane.pb", recursive=True):
        pd = jax.profiler.ProfileData.from_file(path)
        for plane in pd.planes:
            if "TPU" not in plane.name:
                continue
            for line in plane.lines:
                if line.name != "XLA Ops":
                    continue
                # merge intervals per line: concurrently scheduled ops
                # must count busy time once, or the A/B 'total' overstates
                # whichever config overlaps more work (ADVICE r3)
                ivals = []
                for ev in line.events:
                    best = max(best, ev.duration_ns)
                    ivals.append((ev.start_ns, ev.start_ns + ev.duration_ns))
                ivals.sort()
                cur_s = cur_e = None
                for s, e in ivals:
                    if cur_e is None or s > cur_e:
                        if cur_e is not None:
                            total += cur_e - cur_s
                        cur_s, cur_e = s, e
                    else:
                        cur_e = max(cur_e, e)
                if cur_e is not None:
                    total += cur_e - cur_s
    return total / 1e6, best / 1e6


def main():
    rng = np.random.default_rng(0)
    # random table BITS in the real build_tables layout/dtype (point
    # validity doesn't affect timing; the add body is branchless)
    if pfb._FBSEL == "vpu":
        tab = jnp.asarray(
            rng.integers(0, 1 << 16, (pfb.N_WINDOWS, F, 32, pfb.N_ENT)),
            jnp.uint32,
        )
    else:
        tab = jnp.asarray(
            rng.integers(0, 1 << 8, (pfb.N_WINDOWS, F, 64, pfb.N_ENT)),
            pfb._SEL_DT,  # f32 (W<=10) or bf16 (W=11): byte values exact
        )
    scalars = jnp.asarray(rng.integers(0, 1 << 16, (16, F, B)), jnp.uint32)
    # table as a device ARGUMENT, like the production fixture: a closure
    # constant ships inside the program upload and blows the tunnel's
    # remote_compile body limit at W=11 (308 MB -> HTTP 413)
    tab = jax.device_put(tab)
    fn = jax.jit(lambda t_, s: pfb.msm_fixed_sum(t_, s))
    total_ms, max_ms = device_ms(fn, tab, scalars)
    adds = F * pfb.N_WINDOWS
    print(
        f"FBW={pfb.W_BITS} FBSEL={pfb._FBSEL} F={F} B={B}: "
        f"{total_ms:8.2f} ms device total (max op {max_ms:.2f}) = "
        f"{total_ms*1e6/adds/B:6.2f} ns/lane/add ({adds} adds/lane)"
    )


if __name__ == "__main__":
    main()
