"""Scan-to-scan LiDAR odometry (optional front end).

TPU-native equivalent of the reference LidarOdometry
(reference: open3d_slam_rsl/.../src/Odometry.cpp:17-136):
  - preprocess = crop -> voxelize -> normals -> random downsample (:22-27),
  - register against the previous scan (:45-55),
  - jump rejection > 0.8 m (:58-63), fitness gate > 0.1 (:66),
  - cumulative pose integration (:83-92),
  - bypassed entirely when an external odometry source feeds the pose
    buffer (:40-43).
"""
from __future__ import annotations

from typing import Optional

import numpy as np
import jax.numpy as jnp

from ..ops import hashgrid
from ..ops.registration import ICPConfig, register
from ..utils.config import SlamParameters
from ..utils.pointcloud import PointCloud
from ..utils.timebuf import TransformInterpolationBuffer
from . import scan_processing

# Magic constants from the reference (magic.hpp / Odometry.cpp:58-66).
ODOMETRY_JUMP_THRESHOLD_M = 0.8
ODOMETRY_MIN_FITNESS = 0.1


class LidarOdometry:
    def __init__(self, params: SlamParameters):
        self.params = params
        op = params.odometry
        minimizer = {
            "PointToPlaneIcp": "point_to_plane",
            "PointToPointIcp": "point_to_point",
            "GeneralizedIcp": "gicp",
        }[op.scan_matching.cloud_registration_type]
        self.icp_cfg = ICPConfig(
            max_iterations=op.scan_matching.icp.max_n_iter,
            max_correspondence_dist=op.scan_matching.icp.max_correspondence_dist,
            minimizer=minimizer,
            use_normal_gate=(minimizer == "point_to_plane"),
        )
        self.prev_cloud: Optional[PointCloud] = None
        self.prev_grid = None
        self.odom_to_range_sensor = np.eye(4, dtype=np.float32)
        self.buffer = TransformInterpolationBuffer()
        self.rejected_jumps = 0
        self.low_fitness = 0

    def set_initial_transform(self, T: np.ndarray) -> None:
        self.odom_to_range_sensor = np.asarray(T, dtype=np.float32).copy()

    def _preprocess(self, raw: PointCloud) -> PointCloud:
        sp = self.params.odometry.scan_processing
        crop = sp.scan_cropping
        return scan_processing.preprocess_scan(
            raw,
            wide_min_radius=crop.cropping_radius_min,
            wide_max_radius=crop.cropping_radius_max,
            voxel_size=sp.voxel_size,
            downsampling_ratio=1.0,
            capacity=sp.point_capacity,
            estimate_scan_normals=True,
        )

    def add_range_scan(self, raw_scan: PointCloud, time: float) -> bool:
        """≙ LidarOdometry::addRangeScan (Odometry.cpp:29-95)."""
        cloud = self._preprocess(raw_scan)
        if self.prev_cloud is None:
            self.prev_cloud = cloud
            self.prev_grid = hashgrid.build(cloud, self.icp_cfg.max_correspondence_dist)
            self.buffer.push(time, self.odom_to_range_sensor)
            return True
        res = register(cloud, self.prev_grid, jnp.eye(4), self.icp_cfg)
        dT = np.asarray(res.transform)
        jump = np.linalg.norm(dT[:3, 3])
        ok = True
        if jump > ODOMETRY_JUMP_THRESHOLD_M:
            self.rejected_jumps += 1
            dT = np.eye(4, dtype=np.float32)
            ok = False
        if float(res.match_ratio) < ODOMETRY_MIN_FITNESS:
            self.low_fitness += 1
            dT = np.eye(4, dtype=np.float32)
            ok = False
        # dT maps current scan into previous-scan frame = sensor motion.
        self.odom_to_range_sensor = (self.odom_to_range_sensor @ dT).astype(np.float32)
        self.buffer.push(time, self.odom_to_range_sensor)
        self.prev_cloud = cloud
        self.prev_grid = hashgrid.build(cloud, self.icp_cfg.max_correspondence_dist)
        return ok
