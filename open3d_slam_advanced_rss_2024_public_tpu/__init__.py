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

import jax as _jax

# Geometry code is correctness-critical at centimeter scale on maps tens of
# meters across: TPU's default bf16 matmul precision (8 mantissa bits) puts
# ~0.4% relative error on every transform/normal-equation contraction —
# several cm at map scale, which silently stalls GN convergence (measured:
# ICP translation error frozen at the initial-guess error).  All library
# contractions are tiny-k (k=3 point transforms, k=6 normal equations), so
# full-f32 precision costs nothing on the MXU; kernels that *want* bf16
# (ops/pallas_nn's 3-pass decomposition) opt in explicitly and are
# unaffected by this default.
_jax.config.update("jax_default_matmul_precision", "highest")

from . import ops, models, parallel, utils  # noqa: F401,E402
