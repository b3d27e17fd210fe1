from . import se3, pointcloud  # noqa: F401
