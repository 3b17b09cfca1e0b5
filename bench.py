#!/usr/bin/env python
"""Headline benchmark: batched u64 range-proof verification throughput.

Baseline (BASELINE.md): the reference Rust verifier does one u64 verify in
3.808 ms single-threaded (~262.6 verifies/s); the prover takes 14.361 ms
(~69.6 proofs/s). This measures the batched TPU fast verifier (collapsed
one-MSM path) on whatever jax.default_backend() provides and prints ONE
JSON line.

Env knobs: BPPP_BENCH_BATCH (default 512 on accelerators, 16 on cpu),
BPPP_BENCH_REPS (default 3), BPPP_BENCH_MODE=verify|prove (default
verify — prove measures the batched device prover against the 69.6/s
reference baseline instead).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

BASELINE_VERIFIES_PER_S = 262.6  # macbook-m3-pro-36GB-bench-result.txt:16
BASELINE_PROVES_PER_S = 69.6  # macbook-m3-pro-36GB-bench-result.txt:9


def _env_tag() -> str:
    """Env knobs that change the traced program without changing the
    source hash the AOT cache keys on — fold them into the program name
    so A/B runs never reuse a stale cached program."""
    sub = os.environ.get("BPPP_SUB", "8")
    glv = os.environ.get("BPPP_GLV", "1")
    fbw = os.environ.get("BPPP_FBW", "10")
    cs = os.environ.get("BPPP_COLSUM", "seq")
    fbsel = os.environ.get("BPPP_FBSEL", "mx")
    wnaf = os.environ.get("BPPP_WNAF", "1")
    tag = f"_s{sub}" + ("" if glv != "0" else "_noglv")
    tag += "" if wnaf != "0" else "_nownaf"
    tag += "" if fbw == "10" else f"_w{fbw}"
    tag += "" if fbsel == "mx" else f"_f{fbsel}"
    return tag + ("" if cs == "seq" else f"_c{cs}")


def bench_prove(B: int, reps: int, backend: str) -> None:
    """Batched device prover throughput (BPPP_BENCH_MODE=prove)."""
    import jax

    from bppp_tpu.models import u64_fixture
    from bppp_tpu.oracle.field import N as N_INT
    from bppp_tpu.oracle.merlin import Transcript as HostTranscript
    from bppp_tpu.protocol import convert as cv
    from bppp_tpu.protocol.u64 import U64_BLIND_DRAWS
    from bppp_tpu.transcript.device import Transcript as DevTranscript
    from bppp_tpu.utils import aot
    from bppp_tpu.utils.rng import SeededRng

    public, dev, rng = u64_fixture("bench generators", B)

    x = 0xDEADBEEFCAFEBABE
    s = rng.scalar()
    x_words = np.broadcast_to(
        np.array([[x & 0xFFFFFFFF], [x >> 32]], np.uint32), (2, B)
    )
    s_limbs = np.broadcast_to(np.asarray(cv.f.int_to_limbs(s)), (16, B))
    draws = rng.scalars(U64_BLIND_DRAWS)
    blind = np.broadcast_to(
        np.asarray(cv.scalar_cols([draws])), (16, U64_BLIND_DRAWS, B)
    ).copy()

    dev = jax.device_put(dev)
    x_words = jax.device_put(np.asarray(x_words))
    s_limbs = jax.device_put(np.asarray(s_limbs))
    blind = jax.device_put(blind)

    def prove_fn(dev, x_words, s_limbs, blind):
        t = DevTranscript(b"u64 range proof", batch=(B,))
        return dev.prove(x_words, s_limbs, t, blind)

    prog = aot.cached(f"bench_u64_prove_b{B}{_env_tag()}", prove_fn)
    if os.environ.get("BPPP_BENCH_PRETRACE"):
        prog.warm(dev, x_words, s_limbs, blind)
        print(json.dumps({"metric": "pretrace", "program": prog.name}))
        return
    proof = prog(dev, x_words, s_limbs, blind)  # warmup
    jax.block_until_ready(proof)

    # cross-check lane 0 against the host oracle (same replayed draws)
    from bppp_tpu.utils.rng import ReplayRng

    want = public.prove(x, s, HostTranscript(b"u64 range proof"), ReplayRng(draws))
    got = cv.reciprocal_dev_to_oracle(jax.tree_util.tree_map(np.asarray, proof), 0)
    if got.r.to_bytes() != want.r.to_bytes() or got.circuit_proof.l != want.circuit_proof.l:
        print(json.dumps({"metric": "u64_prove_throughput", "value": 0.0,
                          "unit": "proofs/s", "vs_baseline": 0.0,
                          "error": "prover mismatch vs host oracle"}))
        return

    t0 = time.perf_counter()
    for _ in range(reps):
        out = prog(dev, x_words, s_limbs, blind)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    rate = B * reps / dt
    print(json.dumps({
        "metric": "u64_prove_throughput",
        "value": round(rate, 2),
        "unit": "proofs/s",
        "vs_baseline": round(rate / BASELINE_PROVES_PER_S, 3),
        "batch": B,
        "backend": backend,
    }))


def main() -> None:
    # Pretrace mode (BPPP_BENCH_PRETRACE=1 BPPP_AOT_TARGET=tpu on a CPU
    # host): reproduce the TPU run's traced program exactly — force the
    # pallas dispatch and the fixed-base tables the TPU fixture builds.
    if os.environ.get("BPPP_BENCH_PRETRACE") and os.environ.get("BPPP_AOT_TARGET"):
        tgt = os.environ["BPPP_AOT_TARGET"]
        os.environ.setdefault("BPPP_PALLAS", "1" if tgt == "tpu" else "0")
        os.environ.setdefault("BPPP_FIXED_TABLES", "1" if tgt == "tpu" else "0")

    import jax

    backend = os.environ.get("BPPP_AOT_TARGET") or jax.default_backend()
    # default batch: one full lane tile (TILE = BPPP_SUB * 128 lanes,
    # default 1024) on accelerators; tiny on CPU
    tile = int(os.environ.get("BPPP_SUB", "8")) * 128
    B = int(os.environ.get("BPPP_BENCH_BATCH", tile if backend != "cpu" else 16))
    reps = int(os.environ.get("BPPP_BENCH_REPS", 3))
    if os.environ.get("BPPP_BENCH_MODE", "verify") == "prove":
        bench_prove(B, reps, backend)
        return

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

    prog = aot.cached(f"bench_u64_verify_fast_b{B}{_env_tag()}", verify_fn)

    # BPPP_BENCH_PRETRACE=1 (+ BPPP_AOT_TARGET=tpu on a CPU host): build
    # the serialized export without executing, so the first on-device run
    # skips the tens-of-minutes cold re-trace.
    if os.environ.get("BPPP_BENCH_PRETRACE"):
        prog.warm(dev, com_bytes, pb)
        print(json.dumps({"metric": "pretrace", "program": prog.name}))
        return

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
