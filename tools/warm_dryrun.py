#!/usr/bin/env python
"""Pre-warm the caches the driver's multichip dryrun needs.

The driver validates multi-chip sharding by running
__graft_entry__.dryrun_multichip(8) under
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8
Cold, the full u64 verify graph takes tens of minutes to trace+compile on
this 1-core host and the driver times out (round 1: rc 124). Warm, the
persistent XLA cache (enabled inside the entry hooks) makes it minutes.

Run this AFTER the last source change of a round, with the SAME env the
driver uses:

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python tools/warm_dryrun.py

Prints the wall time of a second (warm) run so you can verify the driver
will fit its timeout.
"""

import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

ENV = dict(
    os.environ,
    JAX_PLATFORMS="cpu",
    XLA_FLAGS="--xla_force_host_platform_device_count=8",
)

CODE = (
    "import sys; sys.path.insert(0, %r); "
    "import __graft_entry__ as g; g.dryrun_multichip(8); print('dryrun ok')"
    % ROOT
)


def run() -> float:
    t0 = time.perf_counter()
    subprocess.run([sys.executable, "-c", CODE], env=ENV, check=True, cwd=ROOT)
    return time.perf_counter() - t0


if __name__ == "__main__":
    cold = run()
    print(f"first run: {cold:.1f}s")
    warm = run()
    print(f"warm run:  {warm:.1f}s  (driver sees this)")
