"""Scan-to-map mapper — the hot-path owner.

TPU-native equivalent of the reference Mapper
(reference: open3d_slam_rsl/.../src/Mapper.cpp:33-553):
  - initial guess = previous refined pose x odometry motion delta
    (Mapper.cpp:265-300),
  - scan-to-map ICP (Mapper.cpp:387-394 icp_.compute),
  - out-of-order fallback via odometry propagation (Mapper.cpp:196-235),
  - min-motion gating before insertion (Mapper.cpp:483-489),
  - map-merge suppression in localization mode (Mapper.cpp:466-479).

Host/device split (round 3 — one hot path): all device work for a scan is
the single fused program ``pipeline.mapper_step`` (preprocess -> map-patch
crop + matcher index -> while-loop ICP -> fitness gate -> voxel fusion into
the ACTIVE submap's table), exactly the program bench.py measures.  The
host keeps time bookkeeping, buffers, the merge-suppression flag (fed to
the device as a traced scalar), and the submap lifecycle
(SubmapCollection.post_insert_update).  The reference's periodic
reference-cloud re-init (Mapper.cpp:349-380) is subsumed: the fused step
re-crops the map patch around the pose estimate every scan — strictly
fresher than the reference's up-to-period-stale kd-tree, at ~1.7 ms on
chip (PROFILE.md).
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np
import jax.numpy as jnp

from ..ops.registration import ICPConfig
from ..utils.config import SlamParameters
from ..utils.pointcloud import PointCloud
from ..utils.timebuf import TransformInterpolationBuffer
from . import pipeline


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


def pipeline_config_from_params(params: SlamParameters) -> pipeline.PipelineConfig:
    """SlamParameters -> the fused step's static config (the one hot path)."""
    ml = params.mapper.mapper_localizer
    reg = ml.scan_to_map_registration
    sp = reg.scan_processing
    crop = sp.scan_cropping
    return pipeline.PipelineConfig(
        icp=icp_config_from_params(params),
        scan_voxel_size=sp.voxel_size,
        scan_capacity=sp.point_capacity,
        crop_min_radius=crop.cropping_radius_min,
        crop_max_radius=crop.cropping_radius_max,
        map_patch_capacity=reg.map_patch_capacity,
        map_voxel_size=params.mapper.map_builder.map_voxel_size,
        min_refinement_fitness=(0.0 if ml.ignore_minimum_refinement_fitness
                                else reg.min_refinement_fitness),
        min_movement_between_steps=ml.min_movement_between_mapping_steps,
    )


@dataclasses.dataclass
class MapperStats:
    scans_processed: int = 0
    scans_rejected_low_fitness: int = 0
    out_of_order: int = 0
    insertions: int = 0


class Mapper:
    def __init__(self, params: SlamParameters,
                 odom_buffer: Optional[TransformInterpolationBuffer] = None):
        from .submap_collection import SubmapCollection

        self.params = params
        self.icp_cfg = icp_config_from_params(params)
        self.pipe_cfg = pipeline_config_from_params(params)
        self.submaps = SubmapCollection(params.mapper)
        self.odom_buffer = odom_buffer if odom_buffer is not None else TransformInterpolationBuffer()
        self.map_to_range_sensor = np.eye(4, dtype=np.float32)
        self.map_to_range_sensor_prev = np.eye(4, dtype=np.float32)
        self.map_to_range_sensor_buffer = TransformInterpolationBuffer()
        self.best_guess_buffer = TransformInterpolationBuffer()
        self.calibration = np.eye(4, dtype=np.float32)
        self.last_measurement_time: Optional[float] = None
        self.last_insertion_pose = np.eye(4, dtype=np.float32)
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

    # -- the hot path --------------------------------------------------------

    def _fused_step(self, raw_scan: PointCloud, estimate: np.ndarray,
                    insert_enable: bool):
        """Run the single fused device program against the active submap."""
        sm = self.submaps.active_submap
        state = pipeline.MapState(
            map=sm.map,
            pose=jnp.asarray(self.map_to_range_sensor),
            last_insertion_pose=jnp.asarray(self.last_insertion_pose),
        )
        new_state, out = pipeline.mapper_step(
            state, raw_scan, jnp.asarray(estimate, jnp.float32), self.pipe_cfg,
            insert_enable)
        sm.map = new_state.map
        return new_state, out

    def add_range_measurement(self, raw_scan: PointCloud, time: float) -> bool:
        """≙ Mapper::addRangeMeasurement (Mapper.cpp:168-505)."""
        ml = self.params.mapper.mapper_localizer

        # First scan: insert directly at the current pose (the fused step's
        # empty-map branch trusts the estimate).
        if self.submaps.empty() or self.submaps.active_submap.is_empty():
            self.submaps.ensure_active(self.map_to_range_sensor, time)
            self._fused_step(raw_scan, self.map_to_range_sensor,
                             insert_enable=True)
            self.submaps.note_fused_insert()
            self.map_to_range_sensor_prev = self.map_to_range_sensor.copy()
            self.map_to_range_sensor_buffer.push(time, self.map_to_range_sensor)
            self.best_guess_buffer.push(time, self.map_to_range_sensor)
            self.last_insertion_pose = self.map_to_range_sensor.copy()
            self.last_measurement_time = time
            self.init_time = time
            self.is_new_value_set = False
            self.stats.scans_processed += 1
            self.stats.insertions += 1
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

        if self.is_new_value_set:
            # External pose was just set; trust it, skip refinement.
            self.map_to_range_sensor_prev = self.map_to_range_sensor.copy()
            self.map_to_range_sensor_buffer.push(time, self.map_to_range_sensor)
            self.best_guess_buffer.push(time, estimate)
            self.is_new_value_set = False
            self.init_time = time
            self.last_measurement_time = time
            return True

        # Localization mode: suppress merging (Mapper.cpp:466-479).  Host
        # flag, traced scalar on-device (no recompile on flips).
        merge_suppressed = (
            (self.is_use_initial_map and not self.is_merge_scans_into_map)
            or (self.is_use_initial_map and self.is_merge_scans_into_map
                and self.init_time is not None
                and (time - self.init_time) < ml.map_merge_delay_in_seconds)
        )

        new_state, out = self._fused_step(raw_scan, estimate,
                                          insert_enable=not merge_suppressed)
        # One host sync per scan (inherent: scan t+1's guess composes on
        # scan t's refined pose — SURVEY §7 hard parts).
        corrected = np.asarray(new_state.pose)
        fitness = float(out.res.match_ratio)
        inserted = bool(out.inserted)

        if (not ml.ignore_minimum_refinement_fitness
                and fitness < ml.scan_to_map_registration.min_refinement_fitness):
            # The device program already fell back to the odometry estimate
            # (fitness gate inside mapper_step); count it here.
            self.stats.scans_rejected_low_fitness += 1

        self.map_to_range_sensor = corrected.astype(np.float32)
        self.map_to_range_sensor_buffer.push(time, self.map_to_range_sensor)
        self.best_guess_buffer.push(time, estimate)

        if inserted:
            self.submaps.post_insert_update(out.merged, self.map_to_range_sensor,
                                            time)
            self.last_insertion_pose = self.map_to_range_sensor.copy()
            self.stats.insertions += 1

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
