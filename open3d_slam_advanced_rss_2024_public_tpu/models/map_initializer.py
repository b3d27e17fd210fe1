"""Localization bootstrap: load a prior map + initial pose.

≙ reference SlamMapInitializer (ros/open3d_slam_ros/src/
SlamMapInitializer.cpp:28-200): load a PCD map, install it as the initial
submap, set the initial map->sensor transform (from config pose or an
externally provided alignment), optionally preview-align with a coarse
registration before committing (the non-interactive analogue of the RViz
/initialpose flow).
"""
from __future__ import annotations

from typing import Optional

import numpy as np
import jax.numpy as jnp

from ..models.slam import SlamWrapper
from ..ops import filters
from ..ops.registration import ICPConfig, register_clouds
from ..utils import io as io_utils, se3
from ..utils.config import MapInitializerParameters
from ..utils.pointcloud import PointCloud


def pose_from_config(p) -> np.ndarray:
    """POSE block (x,y,z + roll/pitch/yaw in DEGREES, like the reference's
    Lua schema) -> 4x4."""
    rpy = np.deg2rad([p.roll, p.pitch, p.yaw]).astype(np.float32)
    T = np.asarray(se3.make_transform(
        se3.rpy_to_matrix(jnp.asarray(rpy)),
        jnp.asarray([p.x, p.y, p.z], jnp.float32)))
    return np.asarray(T, dtype=np.float32)


class SlamMapInitializer:
    def __init__(self, slam: SlamWrapper, params: MapInitializerParameters):
        self.slam = slam
        self.params = params

    def initialize(self, map_cloud: Optional[PointCloud] = None,
                   init_pose: Optional[np.ndarray] = None,
                   map_capacity: int = 262144) -> None:
        """≙ SlamMapInitializer::initialize (SlamMapInitializer.cpp:50-80)."""
        if map_cloud is None:
            if not self.params.pcd_file_path:
                raise ValueError("map initializer needs a cloud or pcd_file_path")
            map_cloud = io_utils.load_pcd(self.params.pcd_file_path,
                                          capacity=map_capacity)
        if init_pose is None:
            init_pose = pose_from_config(self.params.init_pose)
        self.slam.set_initial_transform(init_pose)
        self.slam.set_initial_map(map_cloud)

    def align_first_scan(self, scan: PointCloud, rough_pose: np.ndarray,
                         max_correspondence_dist: float = 1.0) -> np.ndarray:
        """Refine a user-provided rough pose against the prior map with ICP
        (the programmatic analogue of the interactive-marker alignment)."""
        map_cloud = self.slam.mapper.submaps.active_submap.map.cloud
        cfg = ICPConfig(max_iterations=40,
                        max_correspondence_dist=max_correspondence_dist)
        scan_ds = filters.voxel_downsample(scan, 0.15, capacity=8192)
        res = register_clouds(scan_ds, map_cloud, jnp.asarray(rough_pose), cfg)
        refined = np.asarray(res.transform)
        self.slam.set_initial_transform(refined)
        return refined
