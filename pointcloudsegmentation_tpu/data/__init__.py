"""Host data pipeline: batching, augmentation, datasets, prefetch provider."""
from . import batching  # noqa: F401
from . import toy  # noqa: F401
