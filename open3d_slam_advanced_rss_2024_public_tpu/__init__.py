"""TPU-native LiDAR SLAM framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
``ETHZ-RobotX/open3d_slam_advanced_rss_2024_public`` (open3d_slam +
libpointmatcher + pointmatcher_ros): point-cloud preprocessing, scan-to-map
ICP, submap-based mapping, loop closure, and pose-graph optimization —
engineered for the TPU compilation model (static shapes, masked batches,
fused kernels, mesh sharding) rather than translated from the reference's
C++/ROS architecture.
"""

__version__ = "0.1.0"

from . import ops, models, parallel, utils  # noqa: F401
