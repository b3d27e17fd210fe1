"""Loop-closure proposal: candidate gating, RANSAC, consistency, refinement.

TPU-native equivalent of the reference PlaceRecognition
(reference: open3d_slam_rsl/.../src/PlaceRecognition.cpp:35-287):
  - candidate gating by distance / adjacency / submaps-between-closures
    (:231-285),
  - RANSAC over FPFH correspondences (:79-90) with min correspondence set,
  - drift-consistency check in RPY/XYZ bounds (:92-95, 182-229),
  - overlap-restricted ICP refinement + fitness gate (:97-121),
  - information matrix from point clouds (:148-150).

Also hosts the odometry constraint builder
(≙ constraint_builders.cpp:33-119).
"""
from __future__ import annotations

from typing import List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import hashgrid
from ..ops.registration import ICPConfig, register
from ..ops.registration.ransac import (
    information_matrix_from_point_clouds, register_features)
from ..utils import se3
from ..utils.config import MapperParameters
from .pose_graph import Constraint
from .submap import AdjacencyMatrix, Submap


class PlaceRecognition:
    def __init__(self, params: MapperParameters):
        self.params = params
        pr = params.place_recognition
        self.refine_cfg = ICPConfig(
            max_iterations=40,
            max_correspondence_dist=pr.max_icp_correspondence_distance,
            minimizer="point_to_plane",
        )
        self._rng = np.random.RandomState(7)

    # -- candidate gating (≙ getLoopClosureCandidatesIdxs, :231-285) --------

    def candidate_indices(self, submaps: List[Submap], adjacency: AdjacencyMatrix,
                          query_idx: int, active_idx: int,
                          loop_closure_submaps: set) -> List[int]:
        pr = self.params.place_recognition
        query = submaps[query_idx]
        qc = query.center()
        out = []
        for i, s in enumerate(submaps):
            if i == query_idx or i == active_idx:
                continue
            if s.features is None:
                continue
            if adjacency.is_adjacent(s.submap_id, query.submap_id):
                continue
            if np.linalg.norm(s.center() - qc) > pr.loop_closure_search_radius:
                continue
            # Require graph distance from the nearest loop-closure submap
            # (spacing gate, ≙ AdjacencyMatrix::getDistanceToNearest...).
            if loop_closure_submaps:
                d = adjacency.bfs_distance(query.submap_id,
                                           set(loop_closure_submaps))
                if d < pr.min_submaps_between_loop_closures:
                    continue
            out.append(i)
        return out

    # -- consistency (≙ isRegistrationConsistent, :182-229) ------------------

    def is_consistent(self, T_correction: np.ndarray) -> bool:
        cc = self.params.place_recognition.consistency_check
        rpy = np.rad2deg(np.asarray(se3.matrix_to_rpy(jnp.asarray(T_correction[:3, :3]))))
        t = T_correction[:3, 3]
        return (
            abs(rpy[0]) <= cc.max_drift_roll and abs(rpy[1]) <= cc.max_drift_pitch
            and abs(rpy[2]) <= cc.max_drift_yaw and abs(t[0]) <= cc.max_drift_x
            and abs(t[1]) <= cc.max_drift_y and abs(t[2]) <= cc.max_drift_z
        )

    # -- main entry (≙ buildLoopClosureConstraints, :50-150) -----------------

    def build_loop_closure_constraints(self, submaps: List[Submap],
                                       adjacency: AdjacencyMatrix,
                                       query_idx: int, active_idx: int,
                                       loop_closure_submaps: set) -> List[Constraint]:
        pr = self.params.place_recognition
        query = submaps[query_idx]
        if query.features is None or query.feature_cloud is None:
            return []
        out: List[Constraint] = []
        for cand_idx in self.candidate_indices(submaps, adjacency, query_idx,
                                               active_idx, loop_closure_submaps):
            cand = submaps[cand_idx]
            key = jax.random.PRNGKey(int(self._rng.randint(0, 2**31 - 1)))
            T, n_inliers, _, _, _ = register_features(
                query.feature_cloud.xyz, query.feature_cloud.mask, query.features,
                cand.feature_cloud.xyz, cand.feature_cloud.mask, cand.features,
                key,
                max_correspondence_dist=pr.ransac_max_correspondence_dist,
                checker_distance=pr.ransac_correspondence_checker_distance,
                checker_edge_length=pr.ransac_correspondence_checker_edge_length,
                batch=pr.ransac_batch_size,
            )
            if int(n_inliers) < pr.ransac_min_corresondence_set_size:
                continue
            T_np = np.asarray(T)
            # Drift consistency: the correction this closure implies must be
            # within plausible drift bounds (both clouds live in map frame,
            # so T itself is the correction).
            if not self.is_consistent(T_np):
                continue
            # ICP refinement restricted to overlap.
            cand_grid = hashgrid.build(cand.feature_cloud,
                                       self.refine_cfg.max_correspondence_dist)
            res = register(query.feature_cloud, cand_grid, jnp.asarray(T_np),
                           self.refine_cfg)
            fitness = float(res.match_ratio)
            if fitness < pr.min_icp_refinement_fitness:
                continue
            T_refined = np.asarray(res.transform)
            if not self.is_consistent(T_refined):
                continue
            info, n_matched = information_matrix_from_point_clouds(
                query.feature_cloud.xyz, query.feature_cloud.mask, cand_grid,
                jnp.asarray(T_refined), pr.max_icp_correspondence_distance)
            # Relative constraint between submap frames:
            # T_refined corrects query's map-frame cloud onto cand's; convert
            # to a source(cand)->target(query) relative-pose measurement.
            X_q = query.pose.astype(np.float64)
            X_c = cand.pose.astype(np.float64)
            # Corrected query pose: X_q' = T_refined @ X_q.
            T_rel = np.linalg.inv(X_c) @ (T_refined.astype(np.float64) @ X_q)
            out.append(Constraint(
                source_id=cand.submap_id,
                target_id=query.submap_id,
                T_source_target=T_rel.astype(np.float32),
                information=np.asarray(info, np.float32) / max(float(n_matched), 1.0),
                is_odometry=False,
            ))
        return out


def compute_odometry_constraints(submaps: List[Submap],
                                 finished_ids: List[int]) -> List[Constraint]:
    """Parent->child odometry constraints for finished submaps.

    ≙ computeOdometryConstraints + buildOdometryConstraint
    (reference constraint_builders.cpp:33-119): the relative pose between
    the parent submap frame and the finished submap frame at finish time,
    treated as a certain edge.
    """
    out = []
    for idx in finished_ids:
        sm = submaps[idx]
        if sm.parent_id == sm.submap_id:
            continue
        parent = None
        for s in submaps:
            if s.submap_id == sm.parent_id:
                parent = s
                break
        if parent is None:
            continue
        T_rel = np.linalg.inv(parent.pose.astype(np.float64)) @ sm.pose.astype(np.float64)
        out.append(Constraint(
            source_id=parent.submap_id,
            target_id=sm.submap_id,
            T_source_target=T_rel.astype(np.float32),
            information=np.eye(6, dtype=np.float32) * 1e3,
            is_odometry=True,
        ))
    return out
