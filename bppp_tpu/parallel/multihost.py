"""Multi-host process bootstrap (SURVEY.md §2 row 14).

The reference is a single process with no communication backend at all;
the TPU-native equivalent is jax.distributed + a global Mesh whose dp
axis spans every chip of every host. Proof batches are embarrassingly
parallel, so the data path needs NO cross-host collectives — each host
feeds its local shard of the batch (make_array_from_process_local_data)
and reads back its local results; only tp/sp-style sharded MSM or WNLA
folds would put traffic on ICI (intra-slice) / DCN (cross-host).

Untestable on this single-chip dev box; the logic mirrors the standard
jax multi-process recipe and is exercised in dryrun form by the CPU
mesh tests (the Mesh API is identical once initialize() has run).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(coordinator: str | None = None, num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """jax.distributed.initialize with env-based defaults (no-op if the
    runtime already knows its topology, e.g. on Cloud TPU VMs)."""
    kwargs = {}
    if coordinator is not None:
        kwargs = dict(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
        )
    jax.distributed.initialize(**kwargs)


def global_dp_mesh(axis: str = "dp") -> Mesh:
    """One dp axis over every chip of every host."""
    return Mesh(np.asarray(jax.devices()), (axis,))


def shard_local_batch(tree, mesh: Mesh, axis: str = "dp"):
    """Assemble a global batch from per-host local shards: every leaf has
    batch-last layout; each process passes ITS slice of the batch and
    receives a global jax.Array without any cross-host data movement."""

    def put(leaf):
        spec = P(*([None] * (np.ndim(leaf) - 1) + [axis]))
        return jax.make_array_from_process_local_data(
            NamedSharding(mesh, spec), np.asarray(leaf)
        )

    return jax.tree_util.tree_map(put, tree)
