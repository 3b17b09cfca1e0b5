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
  sub      tools/kernel_ab.py sub — vreg packing A/B, DEVICE time
  colsum   tools/kernel_ab.py colsum — partial-product reduction A/B
  verify   python bench.py (defaults: batch 1024, _SUB 8, GLV on)
  prove    BPPP_BENCH_MODE=prove bench.py

Wall-clock chained timings are NOT used anywhere here: on this tunnel
they are wrong in both directions (see tools/kernel_ab.py header).
Measured 2026-08-18 (v5e): _SUB=8 wins 2.0x over 4; colsum seq beats
tree and mx; GLV on beats off 2.49 vs 2.97 ms device per L=2 msm.
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
    ("sub",     lambda: run("sub", ["tools/kernel_ab.py", "sub"], timeout=1800)),
    ("colsum",  lambda: run("colsum", ["tools/kernel_ab.py", "colsum"], timeout=1800)),
    ("verify",  lambda: run("verify", ["bench.py"], timeout=4800)),
    ("prove",   lambda: run("prove", ["bench.py"],
                            env={"BPPP_BENCH_MODE": "prove"}, timeout=4800)),
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
