"""Multi-chip scan-to-map ICP: source points sharded, reductions over ICI.

The reference's hot loop is single-node (libnabo kd-tree + Eigen solve,
SURVEY.md §2.6); this module is the scale-out redesign: the source scan is
sharded across the mesh's data axis, the reference voxel-hash grid is
replicated (it is the small, reused operand — ≙ the ICP reference cloud),
and each GN iteration computes per-shard partial normal equations that are
`psum`-reduced over ICI.  Every device then solves the same tiny 6x6
system, so the pose update stays replicated with zero extra communication
— the classic data-parallel Gauss-Newton layout (one all-reduce of
6x6+6 floats per iteration).

The trimmed-distance outlier filter needs a global distance quantile;
distributing an exact global sort would cost an all-gather of all
distances, so we use the mean of per-shard quantiles (shards are an iid
partition of the scan, making this a consistent estimator — equivalent in
practice to libnabo's epsilon-approximate kNN tolerance).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..ops import bruteforce, hashgrid
from ..ops.registration import minimizers, outliers
from ..ops.registration.icp import ICPConfig, ICPResult
from ..utils import se3
from ..utils.pointcloud import PointCloud
from .mesh import DATA_AXIS

Array = jax.Array


def _local_trimmed_threshold(sq_dists, valid, ratio):
    n = sq_dists.shape[-1]
    d = jnp.where(valid, sq_dists, jnp.inf)
    d_sorted = jnp.sort(d, axis=-1)
    n_valid = jnp.sum(valid.astype(jnp.int32), axis=-1)
    kth = jnp.clip((ratio * n_valid.astype(jnp.float32)).astype(jnp.int32), 0, n - 1)
    return jnp.take_along_axis(d_sorted, kth[..., None], axis=-1)[..., 0]


def make_sharded_register(mesh: Mesh, cfg: ICPConfig):
    """Build a jitted sharded registration step for a fixed mesh + config.

    Returned fn(source: PointCloud [N sharded], grid: HashGrid [replicated],
    init_T [replicated]) -> ICPResult (replicated).
    """

    def _body(src_xyz, src_nrm, src_mask, g_points, g_normals, g_start, g_count,
              g_cell, init_T):
        grid = hashgrid.HashGrid(points=g_points, normals=g_normals,
                                 perm=jnp.zeros((g_points.shape[0],), jnp.int32),
                                 start=g_start, count=g_count, cell=g_cell)
        centroid_num = jnp.sum(jnp.where((jnp.abs(g_points[:, 0]) < 1e7)[:, None],
                                         g_points, 0.0), axis=0)
        centroid_den = jnp.maximum(jnp.sum((jnp.abs(g_points[:, 0]) < 1e7)
                                           .astype(jnp.float32)), 1.0)
        centroid = centroid_num / centroid_den
        smooth = max(cfg.smooth_length, 1)

        def body(carry):
            T, it, ring, _, _ = carry
            src = se3.apply(T, src_xyz)
            nrm = se3.rotate(T, src_nrm)
            if cfg.matcher == "bruteforce":
                idx, d2, found = bruteforce.nn(src, src_mask, grid.points,
                                               cfg.max_correspondence_dist)
            else:
                idx, d2, found = hashgrid.query_nn(grid, src, src_mask,
                                                   cfg.max_correspondence_dist,
                                                   max_per_bucket=cfg.max_per_bucket)
            ref_pts = grid.points[idx]
            ref_nrm = grid.normals[idx]
            # Distributed trimmed threshold: mean of per-shard quantiles.
            local_thresh = _local_trimmed_threshold(d2, found, cfg.trimmed_ratio)
            thresh = jax.lax.pmean(local_thresh, DATA_AXIS)
            w = jnp.logical_and(found, d2 <= thresh).astype(jnp.float32)
            if cfg.use_normal_gate:
                w = w * outliers.surface_normal_weights(nrm, ref_nrm, found,
                                                        cfg.normal_max_angle)
            src_c = jnp.where(found[:, None], src - centroid, 0.0)
            ref_c = jnp.where(found[:, None], ref_pts - centroid, 0.0)
            # Partial normal equations on this shard.
            delta = src_c - ref_c
            r = jnp.sum(delta * ref_nrm, axis=-1)
            g = jnp.concatenate([jnp.cross(src_c, ref_nrm), ref_nrm], axis=-1)
            wg = g * w[:, None]
            A = jax.lax.psum(wg.T @ g, DATA_AXIS)
            b = jax.lax.psum(-(wg.T @ r), DATA_AXIS)
            sq_sum = jax.lax.psum(jnp.sum(w * r * r), DATA_AXIS)
            w_sum = jax.lax.psum(jnp.sum(w), DATA_AXIS)
            found_sum = jax.lax.psum(jnp.sum(found.astype(jnp.float32)), DATA_AXIS)
            mask_sum = jax.lax.psum(jnp.sum(src_mask.astype(jnp.float32)), DATA_AXIS)
            xi = minimizers.solve_6x6(A, b, cfg.damping)
            shift = se3.make_transform(jnp.eye(3, dtype=src.dtype), centroid)
            T_new = shift @ se3.se3_exp(xi) @ se3.inverse(shift) @ T
            ring = jnp.roll(ring, 1, axis=0).at[0].set(
                jnp.stack([jnp.linalg.norm(xi[:3]), jnp.linalg.norm(xi[3:])]))
            match_ratio = found_sum / jnp.maximum(mask_sum, 1.0)
            rmse = jnp.sqrt(sq_sum / jnp.maximum(w_sum, 1e-6))
            return T_new, it + 1, ring, match_ratio, rmse

        def cond(carry):
            _, it, ring, _, _ = carry
            md = jnp.mean(ring, axis=0)
            converged = jnp.logical_and(
                it >= smooth, jnp.logical_and(md[0] < cfg.min_diff_rot,
                                              md[1] < cfg.min_diff_trans))
            return jnp.logical_and(it < cfg.max_iterations, jnp.logical_not(converged))

        ring0 = jnp.full((smooth, 2), jnp.inf, dtype=jnp.float32)
        carry0 = (init_T, jnp.int32(0), ring0, jnp.float32(0.0), jnp.float32(jnp.inf))
        T, it, ring, match_ratio, rmse = jax.lax.while_loop(cond, body, carry0)
        md = jnp.mean(ring, axis=0)
        converged = jnp.logical_and(md[0] < cfg.min_diff_rot, md[1] < cfg.min_diff_trans)
        return T, it, converged, match_ratio, rmse

    sharded = shard_map(
        _body, mesh=mesh,
        in_specs=(P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS),
                  P(), P(), P(), P(), P(), P()),
        out_specs=(P(), P(), P(), P(), P()),
    )

    @jax.jit
    def run(source: PointCloud, grid: hashgrid.HashGrid, init_T: Array) -> ICPResult:
        T, it, conv, mr, rmse = sharded(
            source.xyz, source.normals, source.mask,
            grid.points, grid.normals, grid.start, grid.count, grid.cell,
            jnp.asarray(init_T, jnp.float32))
        return ICPResult(transform=se3.orthonormalize(T), iterations=it,
                         converged=conv, match_ratio=mr, rmse=rmse,
                         diverged=jnp.bool_(False))

    return run
