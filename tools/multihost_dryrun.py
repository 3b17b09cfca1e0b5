#!/usr/bin/env python
"""Execute the multi-host path once (VERDICT r3 missing #2 / BASELINE
config 5): two REAL jax.distributed processes on localhost, each owning
2 virtual CPU devices, forming one global 4-device dp mesh that runs a
batched WNLA device verify with per-process local batch shards.

This turns parallel/multihost.py from mirrors-the-recipe into exercised
code: jax.distributed.initialize, global_dp_mesh spanning both
processes, shard_local_batch (make_array_from_process_local_data — each
process contributes only ITS lanes), a jit step over the global mesh,
and local-shard readback. Real DCN is impossible on this single-host
box — the gRPC coordinator + cross-process mesh is the honest maximum
here, and dp puts zero proof data on the wire by construction.

Run:  python tools/multihost_dryrun.py          (parent; spawns 2 children)
Artifact: MULTIHOST_DRYRUN.json at the repo root.

The verify step is the standalone WNLA at |l|=|n|=4 (the wnla_works
analog, /root/reference/src/tests.rs:138-171) — small enough to jit
fresh in each process on this 1-core host; the protocol content (fold
rounds, MSM, transcript) is the same family the u64 path uses.
"""

import json
import os
import socket
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

B_GLOBAL = 4
NPROC = 2
LABEL = b"wnla test"


def child(pid: int, port: int) -> None:
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        "--xla_force_host_platform_device_count=2 "
        + os.environ.get("XLA_FLAGS", "")
    )
    import jax

    jax.config.update("jax_platforms", "cpu")  # axon .pth hook override
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=NPROC,
        process_id=pid,
    )
    import numpy as np

    from bppp_tpu.oracle import curve as oc
    from bppp_tpu.oracle.field import fn_mul
    from bppp_tpu.oracle.merlin import Transcript as HostTranscript
    from bppp_tpu.oracle.wnla import WNLA
    from bppp_tpu.ops import curve as dc
    from bppp_tpu.ops import field as f
    from bppp_tpu.parallel import multihost
    from bppp_tpu.protocol import convert as cv
    from bppp_tpu.protocol.wnla import WNLADevice
    from bppp_tpu.transcript.device import Transcript as DevTranscript
    from bppp_tpu.utils.rng import SeededRng

    assert len(jax.devices()) == 4, jax.devices()
    assert len(jax.local_devices()) == 2
    assert jax.process_count() == NPROC

    # deterministic fixture: every process derives the same global batch
    sz = 4
    rng = SeededRng("multihost dryrun")
    g = oc.GENERATOR.mul(rng.scalar())
    g_vec = [oc.GENERATOR.mul(rng.scalar()) for _ in range(sz)]
    h_vec = [oc.GENERATOR.mul(rng.scalar()) for _ in range(sz)]
    lanes = []
    for _ in range(B_GLOBAL):
        c = rng.scalars(sz)
        rho = rng.scalar()
        l = rng.scalars(sz)
        n = rng.scalars(sz)
        w = WNLA(g=g, g_vec=g_vec, h_vec=h_vec, c=c, rho=rho, mu=fn_mul(rho, rho))
        com = w.commit(l, n)
        proof = w.prove(com, HostTranscript(LABEL), l, n)
        assert w.verify(com, HostTranscript(LABEL), proof)
        lanes.append(dict(c=c, rho=rho, com=com, proof=proof))

    dev = dict(
        g=cv.point_batched(g, B_GLOBAL),
        g_vec=cv.points_batched(g_vec, B_GLOBAL),
        h_vec=cv.points_batched(h_vec, B_GLOBAL),
        c=cv.scalar_cols([ln["c"] for ln in lanes]),
        rho=np.asarray(f.ints_to_limbs([ln["rho"] for ln in lanes])),
        mu=np.asarray(
            f.ints_to_limbs([fn_mul(ln["rho"], ln["rho"]) for ln in lanes])
        ),
        com=dc.from_int_points([ln["com"] for ln in lanes]),
    )
    pb = cv.wnla_proofs_to_bytes([ln["proof"] for ln in lanes])
    # tamper the LAST global lane's final scalar (owned by process 1)
    bad_l = np.asarray(pb.l).copy()
    bad_l[0, 0, B_GLOBAL - 1] = (bad_l[0, 0, B_GLOBAL - 1] + 1) % (1 << 16)
    pb = pb._replace(l=bad_l)

    # each process keeps only ITS local lanes (batch-last layout) and
    # contributes them via make_array_from_process_local_data
    lo, hi = pid * (B_GLOBAL // NPROC), (pid + 1) * (B_GLOBAL // NPROC)
    take = lambda leaf: np.asarray(leaf)[..., lo:hi]
    local = jax.tree_util.tree_map(take, (dev, pb))

    mesh = multihost.global_dp_mesh()
    gdev, gpb = multihost.shard_local_batch(local, mesh)

    def verify_fn(dv, p):
        w = WNLADevice(
            dv["g"], dv["g_vec"], dv["h_vec"], dv["c"],
            jax.numpy.asarray(dv["rho"]), jax.numpy.asarray(dv["mu"]),
        )
        t = DevTranscript(LABEL, batch=(B_GLOBAL,))
        return w.verify(dv["com"], t, p)

    t0 = time.time()
    ok = jax.jit(verify_fn)(gdev, gpb)
    ok.block_until_ready()
    shards = sorted(
        ((s.index, np.asarray(s.data)) for s in ok.addressable_shards),
        key=lambda kv: kv[0],
    )
    local_ok = np.concatenate([d for _, d in shards]).tolist()
    want = [True, True] if pid == 0 else [True, False]
    print(
        f"[proc {pid}] devices={len(jax.devices())} local={len(jax.local_devices())} "
        f"mesh={dict(mesh.shape)} ok_local={local_ok} want={want} "
        f"({time.time() - t0:.0f}s)",
        flush=True,
    )
    assert local_ok == want, (local_ok, want)
    jax.distributed.shutdown()


def main() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    procs = []
    for pid in range(NPROC):
        env = dict(os.environ)
        procs.append(
            subprocess.Popen(
                [sys.executable, os.path.abspath(__file__), str(pid), str(port)],
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                env=env,
                cwd=REPO,
            )
        )
    outs, rcs = [], []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=1800)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out.decode(errors="replace"))
        rcs.append(p.returncode)
    ok = all(rc == 0 for rc in rcs)
    art = dict(
        ok=ok,
        n_processes=NPROC,
        n_devices_global=4,
        rcs=rcs,
        tails=[o[-1500:] for o in outs],
        note=(
            "2 real jax.distributed processes on localhost (gRPC "
            "coordinator), 4-device global dp mesh, per-process local "
            "batch shards, one WNLA device verify step with a tampered "
            "lane on process 1. Real DCN needs >1 host (unavailable)."
        ),
    )
    with open(os.path.join(REPO, "MULTIHOST_DRYRUN.json"), "w") as fh:
        json.dump(art, fh, indent=1)
    for i, o in enumerate(outs):
        print(f"--- proc {i} (rc={rcs[i]}) ---\n{o}")
    print(f"multihost dryrun: {'OK' if ok else 'FAILED'}")
    return 0 if ok else 1


if __name__ == "__main__":
    if len(sys.argv) == 3:
        child(int(sys.argv[1]), int(sys.argv[2]))
    else:
        sys.exit(main())
