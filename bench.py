#!/usr/bin/env python
"""Headline benchmark: batched u64 range-proof verification throughput.

Baseline (BASELINE.md): the reference Rust verifier does one u64 verify in
3.808 ms single-threaded (~262.6 verifies/s). This measures the batched
TPU fast verifier (collapsed one-MSM path) on whatever jax.default_backend()
provides and prints ONE JSON line.

Env knobs: BPPP_BENCH_BATCH (default 512 on accelerators, 16 on cpu),
BPPP_BENCH_REPS (default 3).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

BASELINE_VERIFIES_PER_S = 262.6  # macbook-m3-pro-36GB-bench-result.txt:16


def main() -> None:
    import jax

    backend = jax.default_backend()
    B = int(os.environ.get("BPPP_BENCH_BATCH", 512 if backend != "cpu" else 16))
    reps = int(os.environ.get("BPPP_BENCH_REPS", 3))

    from bppp_tpu.models import u64_fixture
    from bppp_tpu.oracle.merlin import Transcript as HostTranscript
    from bppp_tpu.protocol import convert as cv
    from bppp_tpu.transcript.device import Transcript as DevTranscript
    from bppp_tpu.utils import aot
    from bppp_tpu.utils.rng import SeededRng

    public, dev, rng = u64_fixture("bench generators", B)

    # One real proof (host oracle), replicated across the batch — the
    # verifier's control flow is data-independent, so throughput is
    # representative of B distinct proofs.
    x, s = 0xDEADBEEFCAFEBABE, rng.scalar()
    com = public.commit_value(x, s)
    proof = public.prove(x, s, HostTranscript(b"u64 range proof"), rng)
    assert public.verify(com, proof, HostTranscript(b"u64 range proof"))

    pb = cv.reciprocal_proofs_to_bytes([proof] * B)
    com_bytes = cv.point_bytes([com] * B)

    # generators enter as device-resident ARGUMENTS (a closure constant
    # would be re-uploaded per execute on the tunneled runtime)
    dev = jax.device_put(dev)
    pb = jax.device_put(pb)
    com_bytes = jax.device_put(com_bytes)

    def verify_fn(dev, com_bytes, pb):
        t = DevTranscript(b"u64 range proof", batch=(B,))
        return dev.verify(com_bytes, t, pb, fast=True)

    prog = aot.cached(f"bench_u64_verify_fast_b{B}", verify_fn)

    ok = np.asarray(prog(dev, com_bytes, pb))  # warmup (trace/compile/load)
    if not bool(ok.all()):
        print(json.dumps({"metric": "u64_verify_throughput", "value": 0.0,
                          "unit": "verifies/s", "vs_baseline": 0.0,
                          "error": "verification failed"}))
        return

    t0 = time.perf_counter()
    for _ in range(reps):
        out = prog(dev, com_bytes, pb)
    np.asarray(out)
    dt = time.perf_counter() - t0
    rate = B * reps / dt

    print(json.dumps({
        "metric": "u64_verify_throughput",
        "value": round(rate, 2),
        "unit": "verifies/s",
        "vs_baseline": round(rate / BASELINE_VERIFIES_PER_S, 3),
        "batch": B,
        "backend": backend,
    }))


if __name__ == "__main__":
    main()
