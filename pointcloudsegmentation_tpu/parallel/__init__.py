"""Device-mesh data parallelism (jax.sharding over ICI)."""
from .mesh import (batch_sharding, make_mesh, replicate, replicated,  # noqa: F401
                   shard_batch)
