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

from functools import partial
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
from ..utils.pointcloud import PointCloud, compact
from .pose_graph import Constraint
from .submap import AdjacencyMatrix, Submap

# ≙ the reference's magic constants (include/open3d_slam/magic.hpp:12-17).
VOXEL_SIZE_IF_MAP_VOXEL_ZERO = 0.04
EXPANSION_FACTOR_OVERLAP = 20.0
EXPANSION_FACTOR_ICP_CORRESPONDENCE = 1.5
RUN_UNTIL_CONVERGENCE_ITERS = 100


def overlap_clouds(a: PointCloud, b: PointCloud, voxel_size: float,
                   capacity: int, T_a: Optional[jnp.ndarray] = None):
    """Restrict two map-frame clouds to their mutual voxel overlap and
    compact to a fixed capacity.  ``T_a`` pre-transforms ``a`` for the
    overlap test only (the returned cloud stays in a's frame).

    ≙ computeIndicesOfOverlappingPoints + SelectByIndex
    (reference helpers.cpp:320-345, constraint_builders.cpp:51-58,
    PlaceRecognition.cpp:100-106).
    """
    a_probe = a if T_a is None else a.transform(T_a)
    in_b = hashgrid.occupancy_lookup(b.xyz, b.mask, a_probe.xyz, a_probe.mask,
                                     voxel_size)
    in_a = hashgrid.occupancy_lookup(a_probe.xyz, a_probe.mask, b.xyz, b.mask,
                                     voxel_size)
    return (compact(a.with_mask(in_b), capacity),
            compact(b.with_mask(in_a), capacity))


# -- fused background-path programs (round 5) -------------------------------
#
# The loop-closure and odometry-constraint builders used to interleave
# device dispatches with host gating (`int(count())`, `float(fitness)` ...)
# — every gate a COLD synchronous small-array readback that serializes
# behind whatever is queued on the chip (measured 750-800 ms per constraint
# on the full system; the device work itself is ~50 ms).  Instead, evaluate
# EVERYTHING for a candidate unconditionally in ONE fused program, pre-issue
# async host copies of the small outputs, and apply all gates on host after
# a single readback round.  ≙ the reference runs these stages on background
# threads (SlamWrapper.cpp:1039-1103); here the discipline is dispatch-then-
# read so the background path never blocks the device pipeline.


@partial(jax.jit, static_argnames=("overlap_capacity", "refine_cfg",
                                   "ransac_batch"))
def _lc_candidate_eval(q_feat_xyz, q_feat_mask, q_feats,
                       c_feat_xyz, c_feat_mask, c_feats,
                       q_map: PointCloud, c_map: PointCloud, key,
                       ransac_max_corr, checker_dist, checker_edge,
                       overlap_voxel, info_max_dist,
                       overlap_capacity: int, refine_cfg: ICPConfig,
                       ransac_batch: int):
    """One loop-closure candidate, fully evaluated on device:
    RANSAC -> overlap restriction -> ICP refinement -> information matrix
    (≙ PlaceRecognition.cpp:79-150 minus the host gates, which the caller
    applies after one batched readback)."""
    T, n_inliers, _, _, _ = register_features(
        q_feat_xyz, q_feat_mask, q_feats, c_feat_xyz, c_feat_mask, c_feats,
        key, max_correspondence_dist=ransac_max_corr,
        checker_distance=checker_dist, checker_edge_length=checker_edge,
        batch=ransac_batch)
    q_ov, c_ov = overlap_clouds(q_map, c_map, overlap_voxel,
                                overlap_capacity, T_a=T)
    # Passthrough (CSR-free) grid: the bruteforce matcher in refine_cfg and
    # the bruteforce info matcher only read points/normals.
    grid = hashgrid.passthrough(c_ov, refine_cfg.max_correspondence_dist)
    res = register(q_ov, grid, T, refine_cfg)
    info, _ = information_matrix_from_point_clouds(
        q_ov.xyz, q_ov.mask, grid, res.transform, info_max_dist,
        matcher="bruteforce")
    return (T, n_inliers, q_ov.count(), c_ov.count(), res.transform,
            res.match_ratio, info)


@partial(jax.jit, static_argnames=("overlap_capacity", "refine_cfg",
                                   "do_refine"))
def _odo_edge_eval(parent_map: PointCloud, child_map: PointCloud,
                   overlap_voxel, icp_max_dist,
                   overlap_capacity: int, refine_cfg: ICPConfig,
                   do_refine: bool):
    """One parent->child odometry edge, fully evaluated on device:
    overlap restriction -> optional ICP refinement -> information matrix
    (≙ constraint_builders.cpp:43-90 minus the host gates)."""
    p_ov, c_ov = overlap_clouds(parent_map, child_map, overlap_voxel,
                                overlap_capacity)
    grid = hashgrid.passthrough(c_ov, icp_max_dist)
    if do_refine:
        T_corr = register(p_ov, grid, jnp.eye(4, dtype=jnp.float32),
                          refine_cfg).transform
    else:
        T_corr = jnp.eye(4, dtype=jnp.float32)
    info, _ = information_matrix_from_point_clouds(
        p_ov.xyz, p_ov.mask, grid, T_corr, icp_max_dist,
        matcher="bruteforce")
    return p_ov.count(), c_ov.count(), T_corr, info


def _async_host_copies(outs) -> None:
    for leaf in jax.tree.leaves(outs):
        if hasattr(leaf, "copy_to_host_async"):
            leaf.copy_to_host_async()


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

    def _map_voxel_size(self) -> float:
        """≙ getMapVoxelSize with the magic fallback when the map is
        unvoxelized (constraint_builders.cpp:34-36)."""
        v = float(self.params.map_builder.map_voxel_size)
        return v if v > 0 else VOXEL_SIZE_IF_MAP_VOXEL_ZERO

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
        # Phase 1 — dispatch: evaluate every candidate's full device
        # pipeline (RANSAC -> overlap -> refinement ICP on overlap-
        # restricted FULL-RESOLUTION map clouds, ≙ PlaceRecognition.cpp:
        # 97-121 -> information matrix) unconditionally, pre-issuing the
        # small-output host copies.  No host gate blocks between stages.
        voxel_for_overlap = EXPANSION_FACTOR_OVERLAP * self._map_voxel_size()
        evals = []
        for cand_idx in self.candidate_indices(submaps, adjacency, query_idx,
                                               active_idx, loop_closure_submaps):
            cand = submaps[cand_idx]
            key = jax.random.PRNGKey(int(self._rng.randint(0, 2**31 - 1)))
            outs = _lc_candidate_eval(
                query.feature_cloud.xyz, query.feature_cloud.mask, query.features,
                cand.feature_cloud.xyz, cand.feature_cloud.mask, cand.features,
                query.map.cloud, cand.map.cloud, key,
                jnp.float32(pr.ransac_max_correspondence_dist),
                jnp.float32(pr.ransac_correspondence_checker_distance),
                jnp.float32(pr.ransac_correspondence_checker_edge_length),
                jnp.float32(voxel_for_overlap),
                jnp.float32(pr.max_icp_correspondence_distance),
                overlap_capacity=pr.overlap_point_capacity,
                refine_cfg=self.refine_cfg,
                ransac_batch=pr.ransac_batch_size)
            _async_host_copies(outs)
            evals.append((cand, outs))
        # Phase 2 — ONE batched readback for every candidate (each
        # separate device_get pays the tunnel's ambient 25-75 ms fresh-
        # result latency), then all gates on host.
        all_vals = jax.device_get([outs for _, outs in evals])
        out: List[Constraint] = []
        for (cand, _), vals in zip(evals, all_vals):
            T, n_inliers, n_q, n_c, T_ref, fitness, info = vals
            if int(n_inliers) < pr.ransac_min_corresondence_set_size:
                continue
            # Drift consistency: the correction this closure implies must be
            # within plausible drift bounds (both clouds live in map frame,
            # so T itself is the correction).
            if not self.is_consistent(np.asarray(T)):
                continue
            if int(n_q) < pr.ransac_min_corresondence_set_size or \
               int(n_c) < pr.ransac_min_corresondence_set_size:
                continue
            if float(fitness) < pr.min_icp_refinement_fitness:
                continue
            T_refined = np.asarray(T_ref)
            if not self.is_consistent(T_refined):
                continue
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
                # Raw correspondence-sum information (Open3D
                # GetInformationMatrixFromPointClouds semantics) so odometry
                # and loop-closure edges carry comparable, data-driven weight.
                information=np.asarray(info, np.float32),
                is_odometry=False,
            ))
        return out


def _odo_edge_dispatch(parent: Submap, child: Submap, map_voxel_size: float,
                       overlap_capacity: int, refine: bool):
    """Dispatch one odometry edge's device evaluation (no blocking)."""
    v = map_voxel_size if map_voxel_size > 0 else VOXEL_SIZE_IF_MAP_VOXEL_ZERO
    icp_max_dist = EXPANSION_FACTOR_ICP_CORRESPONDENCE * v
    cfg = ICPConfig(max_iterations=RUN_UNTIL_CONVERGENCE_ITERS,
                    max_correspondence_dist=icp_max_dist,
                    minimizer="point_to_plane")
    outs = _odo_edge_eval(
        parent.map.cloud, child.map.cloud,
        jnp.float32(EXPANSION_FACTOR_OVERLAP * v), jnp.float32(icp_max_dist),
        overlap_capacity=overlap_capacity, refine_cfg=cfg, do_refine=refine)
    _async_host_copies(outs)
    return outs


def _odo_edge_finish(parent: Submap, child: Submap, vals) -> Constraint:
    """Apply the host gates to one edge's read-back values."""
    n_p, n_c, T_corr_d, info_d = vals
    T_corr = np.eye(4, dtype=np.float64)
    info = np.eye(6, dtype=np.float32)
    if int(n_p) > 10 and int(n_c) > 10:
        T_corr = np.asarray(T_corr_d, np.float64)
        info = np.asarray(info_d, np.float32)
        # Guard: a degenerate overlap yields a singular matrix; keep the
        # edge solvable (the reference relies on Open3D's identity fallback).
        if not np.isfinite(info).all() or np.trace(info) < 1.0:
            info = np.eye(6, dtype=np.float32)
    # The clouds live in the map frame, so T_corr corrects the parent side
    # in map frame; fold it into the relative measurement.
    X_p = T_corr @ parent.pose.astype(np.float64)
    T_rel = np.linalg.inv(X_p) @ child.pose.astype(np.float64)
    return Constraint(
        source_id=parent.submap_id,
        target_id=child.submap_id,
        T_source_target=T_rel.astype(np.float32),
        information=info,
        is_odometry=True,
    )


def build_odometry_constraint(parent: Submap, child: Submap,
                              map_voxel_size: float,
                              overlap_capacity: int = 16384,
                              refine: bool = False) -> Constraint:
    """One parent->child odometry edge with an overlap-computed information
    matrix and optional ICP refinement.

    ≙ buildOdometryConstraint / buildConstraint (reference
    constraint_builders.cpp:33-90): overlap-restricted map clouds (voxel
    20x map voxel), optional point-to-plane ICP run to convergence at
    1.5x-map-voxel correspondence distance, information matrix via
    GetInformationMatrixFromPointClouds on the overlap clouds.  The device
    pipeline runs as ONE fused program with a single readback (see the
    dispatch-then-read note above _lc_candidate_eval).
    """
    outs = _odo_edge_dispatch(parent, child, map_voxel_size,
                              overlap_capacity, refine)
    return _odo_edge_finish(parent, child, jax.device_get(outs))


def compute_odometry_constraints(submaps: List[Submap],
                                 finished_ids: List[int],
                                 map_voxel_size: float = 0.0,
                                 overlap_capacity: int = 16384,
                                 refine: bool = False) -> List[Constraint]:
    """Parent->child odometry constraints for finished submaps.

    ≙ computeOdometryConstraints (reference constraint_builders.cpp:92-119):
    one edge per finished submap from its parent, skipping roots and
    duplicates (dedup happens in OptimizationProblem.insert).  All edges
    dispatch first, then one readback round (axon-tunnel discipline).
    """
    pairs = []
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
        pairs.append((parent, sm,
                      _odo_edge_dispatch(parent, sm, map_voxel_size,
                                         overlap_capacity, refine)))
    all_vals = jax.device_get([o for _, _, o in pairs])
    return [_odo_edge_finish(p, c, v)
            for (p, c, _), v in zip(pairs, all_vals)]
