"""Multi-host data parallelism over DCN.

The reference has no multi-node story (SURVEY.md §2.10: "no multi-node
support, no collectives").  Here multi-host DP is the same mesh design
extended across processes: call ``initialize()`` on every host (jax.distributed),
build the global mesh over all devices, and feed each host its local shard
of the global batch — XLA lays gradient all-reduce over ICI within a slice
and DCN across slices.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """jax.distributed.initialize wrapper; no-op for single-process runs.
    On TPU pods the arguments are auto-detected from the environment."""
    if num_processes is not None and num_processes > 1 or \
            coordinator_address is not None:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes, process_id=process_id)


def global_mesh(axis_name: str = "data") -> Mesh:
    """Mesh over every device of every process."""
    return Mesh(np.asarray(jax.devices()), (axis_name,))


def local_batch_to_global(batch: Dict[str, np.ndarray], mesh: Mesh,
                          axis_name: str = "data") -> Any:
    """Assemble a process-local batch shard into a global sharded array
    (jax.make_array_from_process_local_data): each host contributes its
    local blocks; the global batch axis spans all hosts."""
    sharding = NamedSharding(mesh, P(axis_name))
    return {
        k: jax.make_array_from_process_local_data(sharding, np.asarray(v))
        for k, v in batch.items()
    }
