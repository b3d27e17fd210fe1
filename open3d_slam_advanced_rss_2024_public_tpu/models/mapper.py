"""Scan-to-map mapper — the hot-path owner.

TPU-native equivalent of the reference Mapper
(reference: open3d_slam_rsl/.../src/Mapper.cpp:33-553):
  - initial guess = previous refined pose x odometry motion delta
    (Mapper.cpp:265-300),
  - periodic ICP reference re-initialization every
    reference_cloud_setting_period seconds (Mapper.cpp:349-380) — here a
    voxel-hash grid rebuild over the cropped map patch,
  - scan-to-map ICP (Mapper.cpp:387-394 icp_.compute) — here the jitted
    while-loop ICP program,
  - out-of-order fallback via odometry propagation (Mapper.cpp:196-235),
  - min-motion gating before insertion (Mapper.cpp:483-489),
  - map-merge suppression in localization mode (Mapper.cpp:466-479).

Host/device split: time bookkeeping, buffers, and re-init scheduling stay
in Python; each scan triggers exactly three fused device programs
(preprocess, register, insert) with no other host-device chatter.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np
import jax.numpy as jnp

from ..ops import hashgrid
from ..ops.registration import ICPConfig, ICPResult, register
from ..utils import se3
from ..utils.config import SlamParameters
from ..utils.pointcloud import PointCloud
from ..utils.timebuf import TransformInterpolationBuffer
from . import scan_processing
from .submap_collection import SubmapCollection


def resolve_matcher(name: str) -> str:
    if name != "auto":
        return name
    import jax

    platform = jax.devices()[0].platform
    return "pallas" if platform not in ("cpu", "gpu") else "bruteforce"


def icp_config_from_params(params: SlamParameters) -> ICPConfig:
    reg = params.mapper.mapper_localizer.scan_to_map_registration
    minimizer = {
        "PointToPlaneIcp": "point_to_plane",
        "PointToPointIcp": "point_to_point",
        "GeneralizedIcp": "gicp",
    }[reg.scan_to_map_refinement_type]
    return ICPConfig(
        matcher=resolve_matcher(reg.matcher),
        max_iterations=reg.icp.max_n_iter,
        max_correspondence_dist=reg.icp.max_correspondence_dist,
        trimmed_ratio=reg.trimmed_ratio,
        normal_max_angle=reg.normal_max_angle,
        use_normal_gate=(minimizer == "point_to_plane"),
        min_diff_rot=reg.min_diff_rot,
        min_diff_trans=reg.min_diff_trans,
        smooth_length=reg.smooth_length,
        minimizer=minimizer,
    )


@dataclasses.dataclass
class MapperStats:
    scans_processed: int = 0
    scans_rejected_low_fitness: int = 0
    out_of_order: int = 0
    reference_reinits: int = 0


class Mapper:
    def __init__(self, params: SlamParameters,
                 odom_buffer: Optional[TransformInterpolationBuffer] = None):
        self.params = params
        self.icp_cfg = icp_config_from_params(params)
        self.submaps = SubmapCollection(params.mapper)
        self.odom_buffer = odom_buffer if odom_buffer is not None else TransformInterpolationBuffer()
        self.map_to_range_sensor = np.eye(4, dtype=np.float32)
        self.map_to_range_sensor_prev = np.eye(4, dtype=np.float32)
        self.map_to_range_sensor_buffer = TransformInterpolationBuffer()
        self.best_guess_buffer = TransformInterpolationBuffer()
        self.calibration = np.eye(4, dtype=np.float32)
        self.last_measurement_time: Optional[float] = None
        self.last_insertion_pose = np.eye(4, dtype=np.float32)
        self.last_reference_init_time: Optional[float] = None
        self.ref_grid: Optional[hashgrid.HashGrid] = None
        self.stats = MapperStats()
        self.is_new_value_set = False  # external pose override pending
        self.is_use_initial_map = params.mapper.mapper_localizer.is_use_map_initialization
        self.is_merge_scans_into_map = params.mapper.mapper_localizer.is_merge_scans_into_map
        self.init_time: Optional[float] = None

    # -- external pose interface (≙ setMapToRangeSensor / loopClosureUpdate) --

    def set_map_to_range_sensor(self, T: np.ndarray) -> None:
        self.map_to_range_sensor = np.asarray(T, dtype=np.float32).copy()
        self.is_new_value_set = True

    def loop_closure_update(self, correction: np.ndarray) -> None:
        """≙ Mapper::loopClosureUpdate (Mapper.cpp:92-95): apply the pose-
        graph correction to the current and previous refined pose."""
        c = np.asarray(correction, dtype=np.float32)
        self.map_to_range_sensor = c @ self.map_to_range_sensor
        self.map_to_range_sensor_prev = c @ self.map_to_range_sensor_prev
        self.last_insertion_pose = c @ self.last_insertion_pose
        self.ref_grid = None  # grid is stale after the map moved
        self.last_reference_init_time = None

    # -- preprocessing -------------------------------------------------------

    def _preprocess(self, raw_scan: PointCloud) -> scan_processing.ProcessedScans:
        ml = self.params.mapper.mapper_localizer.scan_to_map_registration
        sp = ml.scan_processing
        crop = sp.scan_cropping
        wide = scan_processing.preprocess_scan(
            raw_scan,
            wide_min_radius=crop.cropping_radius_min,
            wide_max_radius=crop.cropping_radius_max,
            voxel_size=sp.voxel_size,
            downsampling_ratio=1.0,  # deterministic (reference disables it too)
            capacity=sp.point_capacity,
            estimate_scan_normals=True,
        )
        match = scan_processing.narrow_crop(wide, crop.cropping_radius_min,
                                            crop.cropping_radius_max)
        return scan_processing.ProcessedScans(match=match, merge=wide)

    def _maybe_reinit_reference(self, time: float) -> None:
        ml = self.params.mapper.mapper_localizer.scan_to_map_registration
        period = ml.reference_cloud_setting_period
        due = (
            self.ref_grid is None
            or self.last_reference_init_time is None
            or (time - self.last_reference_init_time) >= period
        )
        if not due:
            return
        crop = ml.scan_processing.scan_cropping
        robot_pos = jnp.asarray(self.map_to_range_sensor[:3, 3])
        _, grid = scan_processing.crop_submap_and_index(
            self.submaps.active_submap.map.cloud, robot_pos,
            min_radius=0.0, max_radius=crop.cropping_radius_max,
            match_dist=self.icp_cfg.max_correspondence_dist,
            capacity=ml.map_patch_capacity,
            build_hash=(self.icp_cfg.matcher == "hashgrid"),
        )
        self.ref_grid = grid
        self.last_reference_init_time = time
        self.stats.reference_reinits += 1

    # -- the hot path --------------------------------------------------------

    def add_range_measurement(self, raw_scan: PointCloud, time: float) -> bool:
        """≙ Mapper::addRangeMeasurement (Mapper.cpp:168-505)."""
        ml = self.params.mapper.mapper_localizer

        # First scan: insert directly at the current pose.
        if self.submaps.empty() or self.submaps.active_submap.is_empty():
            processed = self._preprocess(raw_scan)
            merge_map_frame = processed.merge.transform(jnp.asarray(self.map_to_range_sensor))
            self.submaps.insert_scan(merge_map_frame, self.map_to_range_sensor, time)
            self.map_to_range_sensor_prev = self.map_to_range_sensor.copy()
            self.map_to_range_sensor_buffer.push(time, self.map_to_range_sensor)
            self.best_guess_buffer.push(time, self.map_to_range_sensor)
            self.last_measurement_time = time
            self.init_time = time
            self.is_new_value_set = False
            self.stats.scans_processed += 1
            return True

        # Out-of-order: propagate by last odometry motion (Mapper.cpp:196-235).
        if self.last_measurement_time is not None and time <= self.last_measurement_time:
            self.stats.out_of_order += 1
            if len(self.odom_buffer) >= 2:
                t_latest = self.odom_buffer.latest_time()
                delta = self.odom_buffer.relative_motion(self.last_measurement_time, t_latest)
                backup = self.map_to_range_sensor_prev @ delta
                self.map_to_range_sensor = backup.astype(np.float32)
                self.map_to_range_sensor_buffer.push(t_latest, self.map_to_range_sensor)
                self.best_guess_buffer.push(t_latest, self.map_to_range_sensor_prev)
                self.map_to_range_sensor_prev = self.map_to_range_sensor.copy()
            return True

        # Initial guess: previous refined pose x odometry delta (:265-300).
        estimate = self.map_to_range_sensor_prev.copy()
        if not self.odom_buffer.empty and not self.is_new_value_set:
            calib_inv = np.linalg.inv(self.calibration)
            odom_now = self.odom_buffer.get_transform(time) @ calib_inv
            odom_prev = self.odom_buffer.get_transform(
                self.last_measurement_time if self.last_measurement_time is not None else time
            ) @ calib_inv
            motion = np.linalg.inv(odom_prev) @ odom_now
            estimate = (self.map_to_range_sensor_prev @ motion).astype(np.float32)

        processed = self._preprocess(raw_scan)
        self._maybe_reinit_reference(time)

        res: ICPResult = register(processed.match, self.ref_grid,
                                  jnp.asarray(estimate), self.icp_cfg)
        corrected = np.asarray(res.transform)
        fitness = float(res.match_ratio)

        if self.is_new_value_set:
            # External pose was just set; trust it, skip refinement bookkeeping.
            self.map_to_range_sensor_prev = self.map_to_range_sensor.copy()
            self.map_to_range_sensor_buffer.push(time, self.map_to_range_sensor)
            self.best_guess_buffer.push(time, estimate)
            self.is_new_value_set = False
            self.init_time = time
            self.last_measurement_time = time
            return True

        if (not ml.ignore_minimum_refinement_fitness
                and fitness < ml.scan_to_map_registration.min_refinement_fitness):
            # Refinement unreliable (Mapper gate, Parameters min_refinement_
            # fitness): fall back to the odometry-propagated estimate.
            self.stats.scans_rejected_low_fitness += 1
            corrected = estimate

        self.map_to_range_sensor = corrected.astype(np.float32)
        self.map_to_range_sensor_buffer.push(time, self.map_to_range_sensor)
        self.best_guess_buffer.push(time, estimate)

        # Localization mode: suppress merging (Mapper.cpp:466-479).
        merge_suppressed = (
            (self.is_use_initial_map and not self.is_merge_scans_into_map)
            or (self.is_use_initial_map and self.is_merge_scans_into_map
                and self.init_time is not None
                and (time - self.init_time) < ml.map_merge_delay_in_seconds)
        )
        if not merge_suppressed:
            motion = np.linalg.inv(self.last_insertion_pose) @ self.map_to_range_sensor
            moved_enough = (np.linalg.norm(motion[:3, 3])
                            >= ml.min_movement_between_mapping_steps)
            if moved_enough:
                merge_map_frame = processed.merge.transform(jnp.asarray(self.map_to_range_sensor))
                self.submaps.insert_scan(merge_map_frame, self.map_to_range_sensor, time)
                self.last_insertion_pose = self.map_to_range_sensor.copy()

        self.last_measurement_time = time
        self.map_to_range_sensor_prev = self.map_to_range_sensor.copy()
        self.stats.scans_processed += 1
        return True

    def get_assembled_map(self) -> PointCloud:
        """≙ getAssembledMapPointCloud (Mapper.cpp:506-538)."""
        from ..utils.pointcloud import concatenate, empty_cloud

        clouds = [s.map.cloud for s in self.submaps.submaps]
        if not clouds:
            return empty_cloud(1)
        out = clouds[0]
        for c in clouds[1:]:
            out = concatenate(out, c)
        return out
