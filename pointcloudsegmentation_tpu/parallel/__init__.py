"""Device-mesh data parallelism (jax.sharding over ICI)."""
from .mesh import (batch_sharding, make_mesh, replicate, replicated,  # noqa: F401
                   shard_batch)
from .distributed import (global_mesh, initialize,  # noqa: F401
                          local_batch_to_global)
