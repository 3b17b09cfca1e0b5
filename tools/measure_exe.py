#!/usr/bin/env python
"""Measure Mosaic kernel executable sizes and per-call cost on the TPU.

Usage: python tools/measure_exe.py [kernels|verify|law]

  kernels — compile each Pallas kernel standalone at production shapes,
            report generated-code size + steady-state wall time.
  verify  — compile the batch-B fast verifier, report total executable
            size, per-call time, and the pallas custom-call census.
  law     — re-measure the per-call-cost-vs-code-size law with dummy
            programs of increasing size.

Env: BPPP_BENCH_BATCH (default 512).
"""

import os
import re
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def _time_call(fn, *args, reps=5):
    out = fn(*args)
    jax_block(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax_block(out)
    return (time.perf_counter() - t0) / reps


def jax_block(out):
    import jax

    jax.tree_util.tree_map(
        lambda x: x.block_until_ready() if hasattr(x, "block_until_ready") else x, out
    )


def _exe_stats(compiled):
    try:
        ma = compiled.memory_analysis()
        code = getattr(ma, "generated_code_size_in_bytes", None)
    except Exception:
        code = None
    return code


def census(hlo_text: str):
    """Count pallas/custom calls by (name, shape signature)."""
    counts = {}
    for m in re.finditer(r"custom-call[^\n]*custom_call_target=\"([^\"]+)\"", hlo_text):
        counts[m.group(1)] = counts.get(m.group(1), 0) + 1
    return counts


def run_kernels():
    import jax
    import jax.numpy as jnp

    from bppp_tpu.ops import pallas_curve as pcv
    from bppp_tpu.ops import pallas_keccak as pk
    from bppp_tpu.ops import pallas_msm as pm
    from bppp_tpu.oracle.field import N as N_INT
    from bppp_tpu.oracle.field import P as P_INT

    rng = np.random.default_rng(0)

    def limbs(B):
        return jnp.asarray(
            rng.integers(0, 1 << 16, size=(16, B), dtype=np.uint32)
        )

    results = []
    for B in (512, 4096, 32768):
        px, py, pz, k = limbs(B), limbs(B), limbs(B), limbs(B)

        lowered = jax.jit(pm.scalar_mul_flat).lower(px, py, pz, k)
        comp = lowered.compile()
        dt = _time_call(comp, px, py, pz, k)
        results.append(("ladder", B, _exe_stats(comp), dt))

        lowered = jax.jit(lambda x: pm.pow_const_flat(x, P_INT - 2, "p")).lower(px)
        comp = lowered.compile()
        dt = _time_call(comp, px)
        results.append(("pow_p_inv", B, _exe_stats(comp), dt))

        lowered = jax.jit(pcv.pt_add_flat).lower(px, py, pz, px, py, pz)
        comp = lowered.compile()
        dt = _time_call(comp, px, py, pz, px, py, pz)
        results.append(("pt_add", B, _exe_stats(comp), dt))

        st = jnp.asarray(rng.integers(0, 256, size=(200, B), dtype=np.uint32))
        lowered = jax.jit(pk.f1600_flat).lower(st)
        comp = lowered.compile()
        dt = _time_call(comp, st)
        results.append(("keccak", B, _exe_stats(comp), dt))

    for name, B, code, dt in results:
        code_mb = f"{code/1e6:8.2f} MB" if code else "   n/a  "
        print(
            f"{name:10s} B={B:6d}  code={code_mb}  t={dt*1e3:9.3f} ms  "
            f"({dt/B*1e9:8.1f} ns/lane)"
        )


def run_verify():
    import jax

    from bppp_tpu.models import u64_fixture
    from bppp_tpu.oracle.merlin import Transcript as HostTranscript
    from bppp_tpu.protocol import convert as cv
    from bppp_tpu.transcript.device import Transcript as DevTranscript
    from bppp_tpu.utils.rng import SeededRng

    B = int(os.environ.get("BPPP_BENCH_BATCH", 512))
    public, dev, rng = u64_fixture("bench generators", B)
    x, s = 0xDEADBEEFCAFEBABE, rng.scalar()
    com = public.commit_value(x, s)
    proof = public.prove(x, s, HostTranscript(b"u64 range proof"), rng)
    pb = cv.reciprocal_proofs_to_bytes([proof] * B)
    com_bytes = cv.point_bytes([com] * B)
    dev = jax.device_put(dev)
    pb = jax.device_put(pb)
    com_bytes = jax.device_put(com_bytes)

    def verify_fn(dev, com_bytes, pb):
        t = DevTranscript(b"u64 range proof", batch=(B,))
        return dev.verify(com_bytes, t, pb, fast=True)

    t0 = time.perf_counter()
    lowered = jax.jit(verify_fn).lower(dev, com_bytes, pb)
    print(f"trace+lower: {time.perf_counter()-t0:.1f}s")
    t0 = time.perf_counter()
    comp = lowered.compile()
    print(f"compile: {time.perf_counter()-t0:.1f}s")
    code = _exe_stats(comp)
    print(f"generated code size: {code/1e6 if code else -1:.2f} MB")
    ok = comp(dev, com_bytes, pb)
    print("verify ok:", bool(np.asarray(ok).all()))
    dt = _time_call(comp, dev, com_bytes, pb)
    print(f"steady-state: {dt*1e3:.2f} ms/call -> {B/dt:.0f} verifies/s")

    hlo = lowered.as_text()
    from collections import Counter

    calls = Counter()
    for m in re.finditer(r"tpu_custom_call[^\n]*", hlo):
        pass
    # census over the compiled HLO for accuracy
    try:
        txt = comp.as_text()
    except Exception:
        txt = hlo
    for m in re.finditer(r"custom_call_target=\"([^\"]+)\"", txt):
        calls[m.group(1)] += 1
    print("custom calls:", dict(calls))


def run_chain():
    """Data-dependent chained calls: per-call cost that async dispatch
    cannot hide (each call consumes the previous call's output)."""
    import jax
    import jax.numpy as jnp

    from bppp_tpu.ops import pallas_curve as pcv
    from bppp_tpu.ops import pallas_keccak as pk
    from bppp_tpu.ops import pallas_msm as pm
    from bppp_tpu.oracle.field import P as P_INT

    rng = np.random.default_rng(0)

    def limbs(B):
        return jnp.asarray(rng.integers(0, 1 << 16, size=(16, B), dtype=np.uint32))

    reps = int(os.environ.get("REPS", 16))
    for B in (512, 4096, 32768):
        px, py, pz, k = limbs(B), limbs(B), limbs(B), limbs(B)

        # ladder chain: outputs become next base point
        comp = jax.jit(pm.scalar_mul_flat).lower(px, py, pz, k).compile()
        out = comp(px, py, pz, k)
        np.asarray(out[0])
        t0 = time.perf_counter()
        cur = (px, py, pz)
        for _ in range(reps):
            cur = comp(*cur, k)
        np.asarray(cur[0])
        dt = (time.perf_counter() - t0) / reps
        print(f"ladder  B={B:6d}  t={dt*1e3:9.3f} ms  ({dt/B*1e9:8.1f} ns/lane)")

        # pt_add chain
        comp = jax.jit(pcv.pt_add_flat).lower(px, py, pz, px, py, pz).compile()
        out = comp(px, py, pz, px, py, pz)
        np.asarray(out[0])
        t0 = time.perf_counter()
        cur = (px, py, pz)
        for _ in range(reps):
            cur = comp(*cur, px, py, pz)
        np.asarray(cur[0])
        dt = (time.perf_counter() - t0) / reps
        print(f"pt_add  B={B:6d}  t={dt*1e3:9.3f} ms  ({dt/B*1e9:8.1f} ns/lane)")

        # pow chain
        powf = jax.jit(lambda x: pm.pow_const_flat(x, P_INT - 2, "p"))
        comp = powf.lower(px).compile()
        out = comp(px)
        np.asarray(out)
        t0 = time.perf_counter()
        cur = px
        for _ in range(reps):
            cur = comp(cur)
        np.asarray(cur)
        dt = (time.perf_counter() - t0) / reps
        print(f"pow_p   B={B:6d}  t={dt*1e3:9.3f} ms  ({dt/B*1e9:8.1f} ns/lane)")

        # keccak chain
        st = jnp.asarray(rng.integers(0, 256, size=(200, B), dtype=np.uint32))
        comp = jax.jit(pk.f1600_flat).lower(st).compile()
        out = comp(st)
        np.asarray(out)
        t0 = time.perf_counter()
        cur = st
        for _ in range(reps):
            cur = comp(cur)
        np.asarray(cur)
        dt = (time.perf_counter() - t0) / reps
        print(f"keccak  B={B:6d}  t={dt*1e3:9.3f} ms  ({dt/B*1e9:8.1f} ns/lane)")


def run_profile():
    """jax.profiler trace of one composed fast-verify (or, with
    BPPP_PROFILE_MODE=prove, fast-prove) call; prints the top ops by
    device time."""
    import glob
    import jax

    from bppp_tpu.models import u64_fixture
    from bppp_tpu.oracle.merlin import Transcript as HostTranscript
    from bppp_tpu.protocol import convert as cv
    from bppp_tpu.transcript.device import Transcript as DevTranscript

    B = int(os.environ.get("BPPP_BENCH_BATCH", 512))
    mode = os.environ.get("BPPP_PROFILE_MODE", "verify")
    public, dev, rng = u64_fixture("bench generators", B)
    x, s = 0xDEADBEEFCAFEBABE, rng.scalar()
    if mode == "prove":
        from bppp_tpu.protocol.u64 import U64_BLIND_DRAWS

        x_words = np.broadcast_to(
            np.array([[x & 0xFFFFFFFF], [x >> 32]], np.uint32), (2, B)
        )
        s_limbs = np.broadcast_to(np.asarray(cv.f.int_to_limbs(s)), (16, B))
        blind = np.broadcast_to(
            np.asarray(cv.scalar_cols([rng.scalars(U64_BLIND_DRAWS)])),
            (16, U64_BLIND_DRAWS, B),
        ).copy()
        args = (
            jax.device_put(dev),
            jax.device_put(np.asarray(x_words)),
            jax.device_put(np.asarray(s_limbs)),
            jax.device_put(blind),
        )

        def step_fn(dev, x_words, s_limbs, blind):
            t = DevTranscript(b"u64 range proof", batch=(B,))
            return dev.prove(x_words, s_limbs, t, blind)

    else:
        com = public.commit_value(x, s)
        proof = public.prove(x, s, HostTranscript(b"u64 range proof"), rng)
        pb = cv.reciprocal_proofs_to_bytes([proof] * B)
        com_bytes = cv.point_bytes([com] * B)
        args = (
            jax.device_put(dev),
            jax.device_put(com_bytes),
            jax.device_put(pb),
        )

        def step_fn(dev, com_bytes, pb):
            t = DevTranscript(b"u64 range proof", batch=(B,))
            return dev.verify(com_bytes, t, pb, fast=True)

    comp = jax.jit(step_fn).lower(*args).compile()
    jax.block_until_ready(comp(*args))  # warm

    tdir = "/tmp/jaxtrace"
    os.system(f"rm -rf {tdir}")
    with jax.profiler.trace(tdir):
        out = comp(*args)
        jax.block_until_ready(out)

    files = glob.glob(f"{tdir}/**/*.xplane.pb", recursive=True)
    print("trace files:", files)
    from collections import defaultdict

    def cat(name: str) -> str:
        base = name.split(" ")[0].lstrip("%")
        if base.startswith("copy"):
            return "copy/layout"
        if "plane_accum" in name or "fixed_msm" in name:
            return "pallas:fixed_msm"
        if "scalar_mul" in name:
            return "pallas:ladder"
        if "tree" in name:
            return "pallas:tree"
        if "f1600" in name:
            return "pallas:keccak"
        if "run." in base or "pow" in name:
            return "pallas:pow"
        if base.startswith("fusion") or base.startswith("loop_"):
            return "xla:fusion"
        if base.startswith("slice") or base.startswith("dynamic"):
            return "xla:slice/dus"
        if base.startswith("convolution") or base.startswith("dot") or "conv" in base:
            return "xla:dot"
        if base.startswith("jit_"):
            return "(whole-call span)"
        return "other:" + base.split(".")[0]

    for path in files:
        pd = jax.profiler.ProfileData.from_file(path)
        for plane in pd.planes:
            if "TPU" not in plane.name:
                continue
            print(f"-- plane {plane.name}")
            for line in plane.lines:
                agg = defaultdict(float)
                per_op = defaultdict(float)
                n = 0
                for ev in line.events:
                    agg[cat(ev.name)] += ev.duration_ns
                    c = cat(ev.name)
                    if c in (
                        "xla:slice/dus",
                        "other:pad",
                        "other:reduce_sum",
                        "other:reshape",
                        "xla:fusion",
                    ):
                        per_op[ev.name.split(" = ")[0]] += ev.duration_ns
                    n += 1
                if not n:
                    continue
                total = sum(v for k, v in agg.items() if k != "(whole-call span)")
                print(f"  line '{line.name}': {n} events, {total/1e6:.1f} ms excl. wrapper")
                for k, v in sorted(agg.items(), key=lambda kv: -kv[1])[:14]:
                    print(f"    {v/1e6:9.2f} ms  {k}")
                if line.name == "XLA Ops" and per_op:
                    print("  top glue ops:")
                    for k, v in sorted(per_op.items(), key=lambda kv: -kv[1])[:25]:
                        print(f"    {v/1e6:9.3f} ms  {k[:120]}")


def run_census():
    """Trace+lower the fast verifier (no compile) and attribute code size
    to each tpu_custom_call site via its backend-config blob length."""
    import jax

    from bppp_tpu.models import u64_fixture
    from bppp_tpu.oracle.merlin import Transcript as HostTranscript
    from bppp_tpu.protocol import convert as cv
    from bppp_tpu.transcript.device import Transcript as DevTranscript

    B = int(os.environ.get("BPPP_BENCH_BATCH", 512))
    public, dev, rng = u64_fixture("bench generators", B)
    x, s = 0xDEADBEEFCAFEBABE, rng.scalar()
    com = public.commit_value(x, s)
    proof = public.prove(x, s, HostTranscript(b"u64 range proof"), rng)
    pb = cv.reciprocal_proofs_to_bytes([proof] * B)
    com_bytes = cv.point_bytes([com] * B)

    def verify_fn(dev, com_bytes, pb):
        t = DevTranscript(b"u64 range proof", batch=(B,))
        return dev.verify(com_bytes, t, pb, fast=True)

    t0 = time.perf_counter()
    lowered = jax.jit(verify_fn).lower(dev, com_bytes, pb)
    print(f"trace+lower: {time.perf_counter()-t0:.1f}s")
    txt = lowered.as_text()
    print(f"stablehlo text: {len(txt)/1e6:.1f} MB")

    # stablehlo custom_call: @tpu_custom_call with kernel_name in config
    sites = []
    for m in re.finditer(r"stablehlo\.custom_call @tpu_custom_call\(([^)]*)\)[^\n]*", txt):
        line = m.group(0)
        km = re.search(r'kernel_name\\22:\s*\\22([A-Za-z0-9_]+)', line) or re.search(
            r'kernel_name[^A-Za-z0-9_]+([A-Za-z0-9_]+)', line
        )
        name = km.group(1) if km else "?"
        shp = re.findall(r"tensor<([0-9x]+)xui32>", line)
        sites.append((name, tuple(shp[:4]), len(line)))
    from collections import Counter, defaultdict

    by = defaultdict(lambda: [0, 0])
    for name, shp, sz in sites:
        key = (name, shp)
        by[key][0] += 1
        by[key][1] += sz
    total = 0
    for (name, shp), (cnt, sz) in sorted(by.items(), key=lambda kv: -kv[1][1]):
        total += sz
        print(f"{name:28s} x{cnt:3d}  {sz/1e6:8.2f} MB  shapes={shp}")
    print(f"total custom-call text: {total/1e6:.1f} MB over {len(sites)} sites")


def run_law():
    """Per-call cost vs code size: N distinct trivial pallas kernels
    chained in one jit program."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from bppp_tpu.ops import pallas_field as pf

    B = 2048
    body_muls = int(os.environ.get("BODY_MULS", 1))

    def mk(i):
        def kern(x_ref, o_ref):
            a = x_ref[:].reshape(16, B // 128, 128)
            # unique constants prevent dedup; BODY_MULS scales body size
            for j in range(body_muls):
                a = pf.mul_p(a, a + np.uint32(i * body_muls + j + 1))
            o_ref[:] = a.reshape(16, B)

        def call(x):
            return pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct((16, B), jnp.uint32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(x)

        return call

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 1 << 16, size=(16, B), dtype=np.uint32))
    ns = [int(v) for v in os.environ.get("LAW_NS", "1,4,16,64").split(",")]
    for n in ns:
        calls = [mk(i) for i in range(n)]

        def prog(x):
            for c in calls:
                x = c(x)
            return x

        comp = jax.jit(prog).lower(x).compile()
        code = _exe_stats(comp)
        dt = _time_call(comp, x)
        print(
            f"n={n:3d} kernels  code={code/1e6 if code else -1:8.2f} MB  "
            f"t={dt*1e3:8.3f} ms"
        )


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "kernels"
    {
        "kernels": run_kernels,
        "verify": run_verify,
        "law": run_law,
        "chain": run_chain,
        "census": run_census,
        "profile": run_profile,
    }[mode]()
