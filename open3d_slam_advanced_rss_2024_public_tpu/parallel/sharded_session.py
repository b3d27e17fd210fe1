"""Full sharded SLAM session on a device mesh: mapper -> submap rollover ->
features/constraints -> distributed pose-graph solve -> feedback.

Composes the individual sharded pieces (parallel/sharded_slam,
parallel/distributed_pose_graph) into the production control flow the
single-chip SlamWrapper runs (models/slam.py ≙ reference
SlamWrapper.cpp:619-1140), with the map spatially partitioned over the
mesh.  Used by the multi-chip dryrun (__graft_entry__.dryrun_multichip)
and the CPU-mesh parity/scale tests.

Communication volume per component (the scaling-efficiency accounting,
BASELINE.md ≥0.7 target; exact formulas, evaluated by comm_volume()):

  - sharded ICP iteration (ops/registration/icp.py "sharded" matcher):
    one pmin over the packed winner distances f32[Nq] plus two psums over
    the winner payloads f32[Nq, 3] + f32[Nq, 3] (matched point + normal)
    = 7 * 4 * Nq bytes reduced per iteration.  At the production shapes
    (Nq = 8192, <= 15 iterations) that is <= 3.4 MB/scan over ICI — ~2%
    of one v5e ICI link's per-scan budget at 10 Hz (45 GB/s * 0.1 s),
    so the sharded step stays compute-bound and scaling efficiency is
    set by the map-shard balance, not the wire.
  - voxel insertion: owner-partitioned, ZERO inter-chip bytes.
  - distributed pose-graph solve (parallel/distributed_pose_graph.py):
    per LM iteration one psum of the dense block H f32[6N, 6N] + b
    f32[6N] = (36 N^2 + 6 N) * 4 bytes; at N = 64 nodes that is 590 KB
    per iteration, ~6 MB per 10-iteration solve — amortized over the
    once-per-loop-closure cadence (not per scan).
"""
from __future__ import annotations

import dataclasses
from typing import List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..models import pose_graph as pg
from ..models.pipeline import PipelineConfig
from ..ops import fpfh as fpfh_ops
from ..ops import filters, normals as normals_ops, voxel_map
from ..ops.registration import ICPConfig
from ..ops.registration.ransac import register_features
from ..utils.pointcloud import PointCloud, make_cloud
from .distributed_pose_graph import make_distributed_solver
from .mesh import DATA_AXIS
from .sharded_slam import make_sharded_mapper


def comm_volume(n_query: int, icp_iters: int, n_nodes: int,
                lm_iters: int) -> dict:
    """Bytes over ICI for one sharded-ICP scan and one distributed solve
    (see module docstring for the derivation)."""
    icp_bytes = 7 * 4 * n_query * icp_iters
    solve_bytes = (36 * n_nodes * n_nodes + 6 * n_nodes) * 4 * lm_iters
    return {
        "icp_bytes_per_scan": icp_bytes,
        "solve_bytes_per_solve": solve_bytes,
    }


@dataclasses.dataclass
class ShardedSubmap:
    """A closed sharded submap: gathered cloud + pose + features."""

    pose: np.ndarray
    cloud: PointCloud                 # host-gathered, compacted
    feature_cloud: Optional[PointCloud] = None
    features: Optional[jnp.ndarray] = None


def _gather_map_cloud(maps: voxel_map.VoxelMap, capacity: int) -> PointCloud:
    """Host-gather a [D, C]-stacked sharded map into one compact cloud."""
    from ..utils.pointcloud import compact

    acc = np.asarray(maps.acc)          # [D, C, 8]
    occ = np.asarray(maps.ptable) != np.int32(0x7FFFFFFF)
    w = acc[..., 6]
    m = np.logical_and(occ, w > 0)
    denom = np.maximum(w, 1e-9)[..., None]
    xyz = np.where(m[..., None], acc[..., 0:3] / denom, 3.0e7)
    nrm = acc[..., 3:6] / denom
    flat = PointCloud(
        xyz=jnp.asarray(xyz.reshape(-1, 3)),
        normals=jnp.asarray(nrm.reshape(-1, 3)),
        mask=jnp.asarray(m.reshape(-1)))
    return compact(flat, capacity)


def run_sharded_slam_session(
        mesh, gt: List[np.ndarray], scans: List[PointCloud],
        odom_deltas: List[np.ndarray],
        scans_per_submap: int = 6,
        capacity_per_device: int = 4096,
        block_size: float = 4.0,
        scan_capacity: int = 1024,
        feature_capacity: int = 1024,
        map_voxel_size: float = 0.15,
        loop_closure: bool = True):
    """Run the full sharded flow and return a result dict.

    The mapper steps every scan on the mesh; every ``scans_per_submap``
    scans the active sharded map CLOSES (rollover): its cloud is gathered,
    featurized (voxel downsample -> normals -> FPFH, ≙ Submap::
    computeFeatures), and a FRESH sharded map starts at the current pose —
    the multi-chip analogue of SubmapCollection::createNewSubmap.  After
    the trajectory, RANSAC between the first and last submaps' features
    proposes a loop closure; the DISTRIBUTED pose-graph solver (edges
    sharded over the mesh, H/b psum-reduced) solves, and the increments
    apply back to submap poses and the trajectory.
    """
    D = mesh.shape[DATA_AXIS]
    pcfg = PipelineConfig(
        icp=ICPConfig(max_iterations=6, matcher="sharded",
                      max_correspondence_dist=0.6),
        scan_voxel_size=map_voxel_size, scan_capacity=scan_capacity,
        crop_min_radius=0.4, crop_max_radius=18.0,
        map_patch_capacity=2 * scan_capacity, map_voxel_size=map_voxel_size,
        min_refinement_fitness=0.2)
    empty_state, step_fn = make_sharded_mapper(
        mesh, pcfg, capacity_per_device=capacity_per_device,
        block_size=block_size)

    maps = empty_state()
    last_ins = jnp.eye(4, dtype=jnp.float32)
    pose = np.asarray(gt[0], dtype=np.float32)
    submaps: List[ShardedSubmap] = []
    submap_pose = pose.copy()
    scan_submap_ids: List[int] = []
    traj: List[np.ndarray] = []

    def close_submap():
        nonlocal maps, last_ins
        cloud = _gather_map_cloud(maps, 4 * scan_capacity)
        submaps.append(ShardedSubmap(pose=submap_pose.copy(), cloud=cloud))
        maps = empty_state()
        last_ins = jnp.eye(4, dtype=jnp.float32)

    for i, scan in enumerate(scans):
        est = (pose @ odom_deltas[i]).astype(np.float32)
        maps, T, mr, last_ins = step_fn(maps, last_ins, scan,
                                        jnp.asarray(est))
        pose = np.asarray(T, dtype=np.float32)
        traj.append(pose.copy())
        scan_submap_ids.append(len(submaps))
        if (i + 1) % scans_per_submap == 0 and i + 1 < len(scans):
            close_submap()
            submap_pose = pose.copy()
    close_submap()

    # Features per submap (≙ Submap::computeFeatures, Submap.cpp:255-275).
    for sm in submaps:
        fc = filters.voxel_downsample(sm.cloud, 2.0 * map_voxel_size,
                                      capacity=feature_capacity)
        fc = normals_ops.estimate_normals(fc, radius=1.0, k=12,
                                          sensor_origin=sm.pose[:3, 3])
        sm.feature_cloud = fc
        sm.features = fpfh_ops.compute_fpfh(fc, radius=1.5, k=24)

    # Pose graph: odometry edges between consecutive submaps.
    n_nodes = len(submaps)
    cs: List[pg.Constraint] = []
    for a in range(n_nodes - 1):
        T_rel = (np.linalg.inv(submaps[a].pose.astype(np.float64))
                 @ submaps[a + 1].pose.astype(np.float64))
        cs.append(pg.Constraint(a, a + 1, T_rel.astype(np.float32),
                                np.eye(6, dtype=np.float32) * 10.0, True))

    lc_found = False
    if loop_closure and n_nodes >= 3:
        from ..ops import hashgrid as hg
        from ..ops.registration import register

        q, c = submaps[-1], submaps[0]
        T_lc, n_inl, _, _, _ = register_features(
            q.feature_cloud.xyz, q.feature_cloud.mask, q.features,
            c.feature_cloud.xyz, c.feature_cloud.mask, c.features,
            jax.random.PRNGKey(3), max_correspondence_dist=0.6,
            checker_distance=0.8, checker_edge_length=0.5, batch=2048)
        if int(n_inl) >= 10:
            # ICP refinement of the RANSAC proposal on the full submap
            # clouds (≙ PlaceRecognition.cpp:97-121 — the raw feature
            # alignment is ~feature-voxel coarse).
            rcfg = ICPConfig(max_iterations=30, max_correspondence_dist=0.5,
                             minimizer="point_to_plane")
            res = register(q.cloud, hg.passthrough(c.cloud, 0.5),
                           jnp.asarray(np.asarray(T_lc), jnp.float32), rcfg)
            T_ref = np.asarray(res.transform, np.float64)
            # T_ref corrects query's map-frame cloud onto candidate's;
            # source(c) -> target(q) relative measurement (same algebra as
            # models/place_recognition.build_loop_closure_constraints).
            X_q = q.pose.astype(np.float64)
            X_c = c.pose.astype(np.float64)
            T_rel = np.linalg.inv(X_c) @ (T_ref @ X_q)
            cs.append(pg.Constraint(0, n_nodes - 1, T_rel.astype(np.float32),
                                    np.eye(6, dtype=np.float32) * 20.0, False))
            lc_found = True

    # Distributed solve (edges sharded over the mesh).
    max_edges = ((len(cs) + D - 1) // D) * D
    graph = pg.build_arrays([s.pose for s in submaps], cs,
                            max_nodes=n_nodes, max_edges=max_edges)
    solver = make_distributed_solver(mesh, max_nodes=n_nodes,
                                     max_iterations=12)
    X, cost = solver(graph, jnp.int32(0), jnp.float32(2.0))
    X = np.asarray(X)

    # Feedback: per-submap increments onto poses + trajectory
    # (≙ updateSubmapsAndTrajectory, SlamWrapper.cpp:1105-1140).
    incs = [(X[i].astype(np.float64)
             @ np.linalg.inv(submaps[i].pose.astype(np.float64)))
            for i in range(n_nodes)]
    corrected = [(incs[scan_submap_ids[i]] @ traj[i].astype(np.float64))
                 for i in range(len(traj))]
    for i, sm in enumerate(submaps):
        sm.pose = (incs[i] @ sm.pose.astype(np.float64)).astype(np.float32)

    def ate(poses):
        errs = [np.linalg.norm(np.asarray(p)[:3, 3] - gt[i][:3, 3])
                for i, p in enumerate(poses)]
        return float(np.sqrt(np.mean(np.square(errs))))

    total_voxels = 0
    for sm in submaps:
        total_voxels += int(sm.cloud.count())
    return {
        "n_submaps": n_nodes,
        "lc_found": lc_found,
        "ate_before": ate(traj),
        "ate_after": ate(corrected),
        "total_voxels": total_voxels,
        "comm": comm_volume(scan_capacity, pcfg.icp.max_iterations,
                            n_nodes, 12),
        "trajectory": traj,
        "corrected": corrected,
    }
