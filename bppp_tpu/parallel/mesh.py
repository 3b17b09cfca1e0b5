"""Device-mesh scaling for batched proving/verifying.

The reference is single-threaded Rust with no parallelism of any kind
(SURVEY.md §2 rows 13-14); the TPU-native scaling model is:

  * data parallel ("dp"): the proof batch axis — every protocol array in
    this package carries the batch as its LAST axis, so dp sharding is a
    single PartitionSpec(..., "dp") on every leaf and needs ZERO
    collectives (proofs are independent).
  * tensor parallel ("tp"): generator vectors / MSM points partitioned
    across chips; per-chip partial sums combine with one all_gather over
    ICI + a local log-tree point reduction (see msm_sharded).

Multi-host: the same Mesh spans hosts after jax.distributed.initialize();
dp stays collective-free (DCN never sees proof data), tp collectives ride
ICI within a slice.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import curve as dc
from ..ops.curve import PointJ


def make_mesh(n: int | None = None, axis: str = "dp") -> Mesh:
    devices = jax.devices()
    if n is not None:
        devices = devices[:n]
    return Mesh(np.asarray(devices), (axis,))


def batch_sharding(mesh: Mesh, axis: str = "dp"):
    """Sharding placing the trailing (batch) axis of a leaf on the mesh."""

    def spec(leaf):
        ndim = np.ndim(leaf)
        return NamedSharding(mesh, P(*([None] * (ndim - 1) + [axis])))

    return spec


def shard_batch(tree, mesh: Mesh, axis: str = "dp"):
    """Place every leaf of a pytree with batch-last layout onto the mesh,
    batch axis sharded across `axis`."""
    spec = batch_sharding(mesh, axis)
    return jax.tree_util.tree_map(
        lambda leaf: jax.device_put(leaf, spec(leaf)), tree
    )


def msm_sharded(points: PointJ, scalars, mesh: Mesh, axis: str = "tp") -> PointJ:
    """MSM with the POINTS axis sharded across the mesh (BASELINE config 5
    analog: per-chip partial accumulation, combine over ICI).

    points: coords (16, L, *batch), L divisible by mesh size; scalars
    (16, L, *batch). Each chip runs the window ladder on its L/n-chunk
    and reduces locally; partials are all_gathered (n points per lane)
    and summed in a log tree. The all_gather payload is 3*16 u32 per
    lane — negligible next to the ladder."""
    from jax.experimental.shard_map import shard_map

    n = mesh.shape[axis]
    L = points.x.shape[1]
    assert L % n == 0, "points axis must divide the mesh"

    pspec = P(None, axis)
    extra = (None,) * (points.x.ndim - 2)

    def body(px, py, pz, sc):
        local = dc.msm(PointJ(px, py, pz), sc)  # (16, *batch)
        gx = jax.lax.all_gather(local.x, axis)  # (n, 16, *batch)
        gy = jax.lax.all_gather(local.y, axis)
        gz = jax.lax.all_gather(local.z, axis)
        parts = PointJ(
            jax.numpy.moveaxis(gx, 0, 1),
            jax.numpy.moveaxis(gy, 0, 1),
            jax.numpy.moveaxis(gz, 0, 1),
        )  # coords (16, n, *batch)
        s = dc.pt_sum(parts, axis=1)
        return (s.x, s.y, s.z)

    sharded = shard_map(
        body,
        mesh=mesh,
        in_specs=(
            P(None, axis, *extra),
            P(None, axis, *extra),
            P(None, axis, *extra),
            P(None, axis, *extra),
        ),
        out_specs=(P(*((None,) + extra)),) * 3,
        check_rep=False,
    )
    out = sharded(points.x, points.y, points.z, scalars)
    return PointJ(*out)
