"""Device-mesh parallelism: voxel data-parallel sharding + atom-axis
model parallelism for the exhaustive candidate scan."""

from . import mesh  # noqa: F401
