#!/usr/bin/env python
"""Freeze-then-certify round-end procedure (VERDICT r4 task 1).

Run AFTER the last source change of a round, with NO edits afterwards:

    python tools/certify.py            # all steps
    python tools/certify.py suite bench_verify   # named steps

Steps, in order (each logged; stops on first failure):

  suite        full CPU test suite (also warms the per-file AOT caches)
  kernel_check every Pallas kernel on the real TPU (appends its own
               hw_results.jsonl line with the source hash)
  bench_verify bench.py reps=10 at the frozen tree
  bench_prove  bench.py prove mode reps=10 (lane-0 oracle cross-check)
  warm_dryrun  dryrun_multichip(8) twice under the driver's env — the
               second (warm) time is what the driver will see

Writes CERTIFY_r{N}.json (BPPP_ROUND, default 5) at the repo root with
per-step rc/secs/tail and the git+source state, so "the artifacts match
the shipped tree" is checkable. The snapshot commit comes AFTER this
passes — committing first and certifying later is how r4 shipped a red
dryrun and an unmeasured default.
"""

import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

ROUND = os.environ.get("BPPP_ROUND", "5")


def run(name, cmd, env=None, timeout=7200):
    print(f"[certify:{name}] {' '.join(cmd)}", flush=True)
    t0 = time.perf_counter()
    try:
        p = subprocess.run(
            cmd, cwd=ROOT, env=env or dict(os.environ),
            capture_output=True, text=True, timeout=timeout,
        )
        rc, out = p.returncode, (p.stdout + p.stderr)
    except subprocess.TimeoutExpired as e:
        rc, out = 124, (e.stdout or "") + "\nTIMEOUT"
    secs = round(time.perf_counter() - t0, 1)
    print(f"[certify:{name}] rc={rc} ({secs}s)", flush=True)
    tail = out[-1200:]
    if rc != 0:
        print(tail, flush=True)
    return dict(name=name, rc=rc, secs=secs, tail=tail)


def main():
    names = set(sys.argv[1:])
    git = subprocess.run(
        ["git", "-C", ROOT, "describe", "--always", "--dirty"],
        capture_output=True, text=True,
    ).stdout.strip()
    from bppp_tpu.utils.aot import _src_hash

    dry_env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=8",
    )
    dry_code = (
        "import sys; sys.path.insert(0, %r); "
        "import __graft_entry__ as g; g.dryrun_multichip(8); print('dryrun ok')"
        % ROOT
    )
    steps = [
        ("suite", [sys.executable, "-m", "pytest", "tests/", "-q"], None, 10800),
        ("kernel_check", [sys.executable, "tools/tpu_kernel_check.py"], None, 5400),
        ("bench_verify", [sys.executable, "bench.py"],
         dict(os.environ, BPPP_BENCH_REPS="10"), 7200),
        ("bench_prove", [sys.executable, "bench.py"],
         dict(os.environ, BPPP_BENCH_REPS="10", BPPP_BENCH_MODE="prove"), 7200),
        ("warm_dryrun", [sys.executable, "-c", dry_code], dry_env, 7200),
        ("warm_dryrun2", [sys.executable, "-c", dry_code], dry_env, 3600),
    ]
    results = []
    ok = True
    for name, cmd, env, tmo in steps:
        if names and name not in names:
            continue
        r = run(name, cmd, env=env, timeout=tmo)
        results.append(r)
        if r["rc"] != 0:
            ok = False
            break
    # Named-step invocations merge into the existing artifact (the 1-core
    # host wants the low-CPU hardware gate overlapped with the CPU-bound
    # suite; the artifact must still end up as ONE record) — but only
    # when the tree state matches, so stale-step smuggling is impossible.
    path = os.path.join(ROOT, f"CERTIFY_r{ROUND}.json")
    merged = results
    if names and os.path.exists(path):
        try:
            prev = json.load(open(path))
            # compare the COMMIT (the artifacts themselves — hw_results,
            # CERTIFY — dirty the tree between steps); the source hash is
            # the real same-code guard
            same_commit = prev.get("git", "").split("-dirty")[0] == git.split("-dirty")[0]
            if same_commit and prev.get("src_cpu") == _src_hash("cpu"):
                done = {r["name"] for r in results}
                merged = [
                    r for r in prev.get("steps", []) if r["name"] not in done
                ] + results
                ok = ok and all(r["rc"] == 0 for r in merged)
        except (ValueError, OSError):
            pass
    art = dict(
        ok=ok and bool(merged),
        git=git,
        src_cpu=_src_hash("cpu"),
        src_tpu=_src_hash("tpu"),
        ts=time.strftime("%Y-%m-%d %H:%M:%S"),
        steps=merged,
    )
    with open(path, "w") as fh:
        json.dump(art, fh, indent=1)
    print(f"certify: {'OK' if ok else 'FAILED'} -> {path}", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
