"""Core TPU-native ops: neighborhoods, segments, voxelization, search,
hierarchy, interpolation, geometry, anchors, Morton sorting."""
from .types import (Neighborhood, Level, Pyramid,  # noqa: F401
                    WindowedNeighborhood)
from . import morton  # noqa: F401
from . import neighbors  # noqa: F401
from . import segments  # noqa: F401
from . import voxelize  # noqa: F401
from . import search  # noqa: F401
from . import hierarchy  # noqa: F401
from . import interpolate  # noqa: F401
from . import geometry  # noqa: F401
from . import anchors  # noqa: F401
