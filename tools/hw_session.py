#!/usr/bin/env python
"""One-command hardware measurement session for when the TPU tunnel is up.

Runs the round's pending measurements in cost order (cheap probes first,
tens-of-minutes full-protocol compiles last), appending one JSON line per
step to tools/hw_results.jsonl so a dropped tunnel mid-session loses
nothing. Re-runs skip steps already recorded (delete the jsonl line to
redo one).

    python tools/hw_session.py            # run all pending steps
    python tools/hw_session.py probe glv  # run named steps only

Steps:
  probe    tunnel liveness (tiny dispatch, 120 s timeout)
  sublane  tools/sublane_probe.py — vreg packing A/B (_SUB 4/8/16)
  glv      small-MSM kernel A/B: GLV on vs off (kernel-level, fast compile)
  verify   python bench.py (batch 512, defaults) — the headline number
  prove    BPPP_BENCH_MODE=prove bench.py
  sub8     BPPP_SUB=8 BPPP_BENCH_BATCH=1024 bench.py (only worth running
           if the sublane step shows _SUB=8 winning)
"""

import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RESULTS = os.path.join(ROOT, "tools", "hw_results.jsonl")

PROBE_CODE = """
import jax, jax.numpy as jnp
print(jax.default_backend())
print(float(jnp.ones(128).sum()))
"""

GLV_AB_CODE = """
import os, sys, time
sys.path.insert(0, %r)
import numpy as np, jax
from bppp_tpu.ops import curve as dc, field as fld
from bppp_tpu.oracle import curve as oc
from bppp_tpu.utils.rng import SeededRng

rng = SeededRng("glv ab")
B, L = 512, 2
pts = dc.from_int_points([oc.GENERATOR.mul(rng.scalar()) for _ in range(L)], batch=(B,))
ks = np.asarray(fld.ints_to_limbs(rng.scalars(L)))[:, :, None]
ks = np.broadcast_to(ks, (16, L, B)).copy()

import jax.numpy as jnp
ksj = jnp.asarray(ks)
for glv in ("1", "0"):
    os.environ["BPPP_GLV"] = glv
    f = jax.jit(dc.msm)
    out = f(pts, ksj)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    o = out
    for _ in range(5):  # chain: a zero derived from the output feeds the input
        dep = (o.z.max() * 0).astype(jnp.uint32)
        o = f(pts, ksj + dep)
    jax.block_until_ready(o)
    dt = (time.perf_counter() - t0) / 5
    print("GLV=%%s  %%0.2f ms per msm(L=%%d, B=%%d) call" %% (glv, dt * 1e3, L, B))
    jax.clear_caches()
""" % (ROOT,)


def record(step, rc, tail, secs):
    row = {"step": step, "rc": rc, "secs": round(secs, 1), "tail": tail[-2000:],
           "ts": time.strftime("%Y-%m-%d %H:%M:%S")}
    with open(RESULTS, "a") as fh:
        fh.write(json.dumps(row) + "\n")
    print(f"[{step}] rc={rc} ({secs:.0f}s)")
    print(tail[-2000:])


def done_steps():
    if not os.path.exists(RESULTS):
        return set()
    out = set()
    with open(RESULTS) as fh:
        for line in fh:
            try:
                row = json.loads(line)
            except json.JSONDecodeError:
                continue
            if row.get("rc") == 0:
                out.add(row["step"])
    return out


def run(step, argv, env=None, timeout=3600, code=None):
    cmd = [sys.executable] + (["-c", code] if code else argv)
    t0 = time.perf_counter()
    try:
        p = subprocess.run(cmd, env=dict(os.environ, **(env or {})), cwd=ROOT,
                           capture_output=True, text=True, timeout=timeout)
        rc, tail = p.returncode, (p.stdout + p.stderr)
    except subprocess.TimeoutExpired as e:
        rc, tail = 124, ((e.stdout or b"").decode(errors="replace") if isinstance(e.stdout, bytes) else (e.stdout or "")) + " [TIMEOUT]"
    record(step, rc, tail, time.perf_counter() - t0)
    return rc


STEPS = [
    ("probe",   lambda: run("probe", None, timeout=120, code=PROBE_CODE)),
    ("sublane", lambda: run("sublane", ["tools/sublane_probe.py"], timeout=1800)),
    ("glv",     lambda: run("glv", None, timeout=1800, code=GLV_AB_CODE)),
    ("verify",  lambda: run("verify", ["bench.py"], timeout=4800)),
    ("prove",   lambda: run("prove", ["bench.py"],
                            env={"BPPP_BENCH_MODE": "prove"}, timeout=4800)),
    ("sub8",    lambda: run("sub8", ["bench.py"],
                            env={"BPPP_SUB": "8", "BPPP_BENCH_BATCH": "1024"},
                            timeout=4800)),
]


def main():
    want = set(sys.argv[1:])
    skip = done_steps() if not want else set()
    for name, fn in STEPS:
        if want and name not in want:
            continue
        if name in skip:
            print(f"[{name}] already recorded, skipping")
            continue
        rc = fn()
        if name == "probe" and rc != 0:
            print("tunnel down — aborting session")
            return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
