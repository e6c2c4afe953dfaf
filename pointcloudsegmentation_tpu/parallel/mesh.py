"""Device mesh + sharding helpers.

Replaces the reference's in-graph multi-GPU tower replication with CPU
gradient averaging (train_util.py:77-111, train_graph_pool_new.py:95-112)
with a jax.sharding data-parallel design: params replicated, batch sharded
over a 1-D ``data`` mesh axis, gradient all-reduce emitted by XLA over ICI
inside the compiled step (no host roundtrip).

Multi-host DP extends the same mesh over DCN via ``jax.distributed`` — the
mesh helper takes whatever ``jax.devices()`` shows.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              axis_name: str = "data") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Leading-axis (block) sharding for every batch leaf."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh, axis_name: str = "data") -> Any:
    """Place a host batch pytree with the leading axis split across the
    mesh. Leading dim must be divisible by mesh size (the provider pads
    batches to a device multiple, as the reference's
    default_unpack_feats_labels does — provider.py:25-40)."""
    sh = batch_sharding(mesh, axis_name)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sh), batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)
