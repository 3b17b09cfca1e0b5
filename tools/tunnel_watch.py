#!/usr/bin/env python
"""Poll the tunneled TPU with a tiny dispatch until it responds.

Appends one line per probe to tools/tunnel_watch.log and exits 0 the
first time a probe succeeds (so a supervisor can chain `&& ...`).

    python tools/tunnel_watch.py [interval_s] [max_probes]
"""

import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LOG = os.path.join(ROOT, "tools", "tunnel_watch.log")

PROBE = (
    "import jax, jax.numpy as jnp;"
    "print(jax.default_backend());"
    "print(float(jnp.ones(128).sum()))"
)


def probe(timeout=90):
    try:
        p = subprocess.run(
            [sys.executable, "-c", PROBE],
            capture_output=True, text=True, timeout=timeout, cwd=ROOT,
        )
        return p.returncode == 0 and "128.0" in p.stdout
    except subprocess.TimeoutExpired:
        return False


def main():
    interval = float(sys.argv[1]) if len(sys.argv) > 1 else 300
    max_probes = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    for i in range(max_probes):
        ok = probe()
        with open(LOG, "a") as fh:
            fh.write(f"{time.strftime('%H:%M:%S')} probe={i} up={ok}\n")
        if ok:
            print("tunnel up")
            return 0
        time.sleep(interval)
    return 1


if __name__ == "__main__":
    sys.exit(main())
