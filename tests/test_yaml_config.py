"""Legacy YAML parameter tier (SURVEY §2.2 'legacy yaml io').

Reference: open3d_slam_io/legacy/open3d_slam_yaml_io/src/
parameter_loaders.cpp — the pre-Lua schema with mapping/odometry/
visualization/saving_parameters sections and legacy key spellings.
"""
import pytest

from open3d_slam_advanced_rss_2024_public_tpu.utils.yaml_config import (
    load_legacy_yaml, overrides_from_legacy_yaml)
from open3d_slam_advanced_rss_2024_public_tpu.utils.config import load_parameters

LEGACY = """
mapping:
  is_build_dense_map: false
  is_attempt_loop_closures: true
  min_movement_between_mapping_steps: 0.05
  ignore_minimum_refinement_fitness: false
  dump_submaps_to_file_before_after_lc: false
  is_print_timing_information: false
  is_refine_odometry_constraints_between_submaps: false
  is_use_map_initialization: false
  republish_the_preloaded_map: false
  map_merge_delay_in_seconds: 5.0
  is_carving_enabled: false
  is_merge_scans_into_map: false
  mapping_buffer_size: 1
  scan_to_map_refinement:
    scan_to_map_refinement_type: PointToPlaneIcp
    min_refinement_fitness: 0.4
    icp_parameters:
      knn: 1
      max_correspondence_dist: 0.75
      max_n_iter: 12
    scan_processing:
      voxel_size: 0.2
      downsampling_ratio: 0.5
      point_cloud_buffer_size: 1
      scan_cropping:
        cropping_radius_max: 22.0
        cropping_radius_min: 1.0
        min_z: -10.0
        max_z: 10.0
        cropper_type: MinMaxRadius
  map_builder:
    map_voxel_size: 0.15
    space_carving:
      max_raytracing_length: 15.0
      truncation_distance: 0.2
      carve_space_every_n_scans: 5
      min_dot_product_with_normal: 0.3
    scan_cropping:
      cropping_radius_max: 25.0
      cropping_radius_min: 0.0
      min_z: -10.0
      max_z: 10.0
      cropper_type: MaxRadius
  submaps:
    size: 18.0
    min_num_range_data: 6
    max_num_points: 200000
    adjacency_based_revisiting_min_fitness: 0.4
    min_seconds_between_feature_computation: 2.0
    submaps_num_scan_overlap: 4
  global_optimization:
    edge_prune_threshold: 0.25
    loop_closure_preference: 1.5
    max_correspondence_distance: 500.0
    reference_node: 0
  place_recognition:
    feature_map_normal_estimation_radius: 1.5
    feature_voxel_size: 0.4
    feature_radius: 2.0
    feature_knn: 80
    feature_normal_knn: 15
    ransac_num_iter: 1000000
    ransac_probability: 0.99
    ransac_model_size: 3
    ransac_max_correspondence_dist: 0.8
    ransac_correspondence_checker_distance: 0.7
    ransac_correspondence_checker_edge_length: 0.5
    ransac_min_corresondence_set_size: 20
    max_icp_correspondence_distance: 0.4
    min_icp_refinement_fitness: 0.6
    dump_aligned_place_recognitions_to_file: false
    loop_closure_serach_radius: 25.0
    consistency_check:
      max_drift_roll: 20.0
      max_drift_pitch: 20.0
      max_drift_yaw: 25.0
      max_drift_x: 3.0
      max_drift_y: 3.0
      max_drift_z: 1.5
odometry:
  is_publish_odometry_msgs: false
  use_odometry_topic_instead_of_scan_to_scan: true
  odometry_buffer_size: 2
  scan_matching:
    cloud_registration_type: GeneralizedIcp
    icp_parameters:
      knn: 10
      max_correspondence_dist: 1.0
      max_n_iter: 30
  scan_processing:
    voxel_size: 0.25
    downsampling_ratio: 0.4
    point_cloud_buffer_size: 1
visualization:
  assembled_map_voxel_size: 0.3
  submaps_voxel_size: 0.25
  visualize_every_n_msec: 250.0
saving_parameters:
  save_at_mission_end: true
  save_map: true
  save_submaps: false
  save_dense_submaps: false
motion_compensation:
  is_undistort_scan: false
  is_spinning_clockwise: true
  scan_duration: 0.1
  num_poses_vel_estimation: 3
"""


def test_legacy_yaml_full_document(tmp_path):
    f = tmp_path / "legacy.yaml"
    f.write_text(LEGACY)
    p = load_legacy_yaml(str(f))
    reg = p.mapper.mapper_localizer.scan_to_map_registration
    assert reg.scan_to_map_refinement_type == "PointToPlaneIcp"
    assert reg.min_refinement_fitness == 0.4
    assert reg.icp.max_n_iter == 12
    assert reg.scan_processing.scan_cropping.cropping_radius_max == 22.0
    assert p.mapper.submaps.submap_size == 18.0          # legacy "size"
    assert p.mapper.submaps.max_num_points == 200000
    assert p.mapper.place_recognition.loop_closure_search_radius == 25.0
    assert p.mapper.place_recognition.consistency_check.max_drift_yaw == 25.0
    assert p.mapper.global_optimization.loop_closure_preference == 1.5
    assert p.odometry.scan_matching.cloud_registration_type == "GeneralizedIcp"
    assert p.visualization.visualize_every_n_msec == 250.0
    assert p.saving.save_map is True
    assert p.motion_compensation.num_poses_vel_estimation == 3
    # Untouched defaults survive.
    assert p.mapper.mapper_localizer.pose_readback_lag == 8


def test_legacy_yaml_unknown_key_rejected():
    with pytest.raises(ValueError, match="unknown legacy YAML keys"):
        overrides_from_legacy_yaml({"mapping": {"no_such_thing": 1}})
    with pytest.raises(ValueError, match="unknown legacy YAML keys"):
        overrides_from_legacy_yaml({"mystery_section": {}})


def test_legacy_overrides_compose_with_modern_loader():
    ov = overrides_from_legacy_yaml(
        {"mapping": {"submaps": {"size": 9.0}}})
    p = load_parameters(ov)
    assert p.mapper.submaps.submap_size == 9.0
