"""The ICP driver: a jit-compiled fixed-shape registration loop.

TPU-native replacement for libpointmatcher's ICP chain driver
(reference: pointmatcher/ICP.cpp:258-468 — per-iteration: transform
reading -> matcher->findClosests -> outlierFilters.compute ->
errorMinimizer->compute -> transformationCheckers.check) and for the
Open3D registration strategies the SLAM core wraps
(reference: open3d_slam_rsl/.../src/CloudRegistration.cpp:16-121).

Design: the chain stays conceptually modular (match -> weight -> minimize
-> check) but is compiled as one `lax.while_loop` over static-shape masked
arrays, so the whole scan-to-map solve is a single XLA program — no
per-iteration host round-trips (the analogue of the reference's innermost
hot loop, SURVEY.md §3.1).

Conditioning: the solve runs in coordinates de-meaned at the reference
centroid, mirroring ICP.cpp:293-326 ("structuration of the reference
centered at its centroid"), which keeps float32 normal equations healthy.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from ...utils import se3
from ...utils.pointcloud import PointCloud
from .. import bruteforce, hashgrid
from . import minimizers, outliers

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class ICPConfig:
    """Static (hashable) ICP chain configuration.

    Defaults mirror the production chain in the reference's icp.yaml
    (ros/open3d_slam_ros/param/icp.yaml): knn=1 maxDist=0.5, trimmed 0.90,
    normal-angle gate 1.57, differential checker (0.001 rad / 0.01 m,
    smooth 3), counter checker 15 iterations.
    """

    max_iterations: int = 15
    max_correspondence_dist: float = 0.5
    trimmed_ratio: float = 0.90
    normal_max_angle: float = 1.57
    use_normal_gate: bool = True
    min_diff_rot: float = 0.001
    min_diff_trans: float = 0.01
    smooth_length: int = 3
    # point_to_plane | point_to_point | gicp | similarity | identity
    minimizer: str = "point_to_plane"
    # PointToPlane DOF restrictions (reference PointToPlane.cpp:108-156):
    # force4dof = yaw-only rotation; force2d = planar (yaw + xy translation).
    force4dof: bool = False
    force2d: bool = False
    # Matches per reading point (reference KDTreeMatcher knn parameter,
    # MatchersImpl.cpp:118-133).  knn>1 stacks all k matches as
    # correspondences, exactly like ErrorElements assembly.
    knn: int = 1
    # Per-point maximum match distance read from this attr channel
    # (reference KDTreeVarDistMatcher, MatchersImpl.h:119-148: libnabo
    # radius search with per-reading-point maxRadii from the descriptor
    # named ``maxDistField``, default "maxSearchDist").  Applied as a gate
    # after the NN gather; None disables.
    max_dist_field: Optional[str] = None
    robust_kernel: Optional[str] = None  # cauchy/welsch/huber/... or None
    robust_k: float = 0.5
    max_per_bucket: int = 32
    damping: float = 1e-6
    # Explicit outlier-filter chain (overrides the trimmed/normal/robust
    # fields above when set): tuple of (name, *params) entries, composed
    # multiplicatively like libpointmatcher's outlierFilters list
    # (reference ICP.cpp:412 outlierFilters.compute).  Names: trimmed,
    # surface_normal, var_trimmed, median, max_dist, min_dist, robust, null.
    outlier_chain: Optional[tuple] = None
    # BoundTransformationChecker (reference TransformationCheckersImpl.h:
    # 117-141): abort when the accumulated correction exceeds these bounds.
    bound_max_rot: Optional[float] = None
    bound_max_trans: Optional[float] = None
    # Correspondence engine: "bruteforce" (MXU-tiled exact NN — ~500x faster
    # on TPU for in-submap sizes, see ops/bruteforce.py), "hashgrid"
    # (voxel-hash probe — for maps too large to sweep densely), "pallas"
    # (tile-skipping kernel), or "sharded" (each device searches its map
    # shard, winners reduce over ``shard_axis`` with pmin/psum — run inside
    # shard_map; see parallel/sharded_slam.py).
    matcher: str = "bruteforce"
    # Mesh axis name for the "sharded" matcher (must match the enclosing
    # shard_map axis).  Also switches the reference centroid to a psum
    # reduction over the shards.
    shard_axis: Optional[str] = None


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ICPResult:
    """transform: 4x4 mapping source frame -> reference frame.
    match_ratio ≙ errorMinimizer getOverlap / Open3D fitness;
    rmse ≙ inlier RMSE (point-to-plane or point-to-point metric)."""

    transform: Array
    iterations: Array
    converged: Array
    match_ratio: Array
    rmse: Array
    # True when a BoundTransformationChecker aborted the solve (reference
    # throws TransformationCheckersImpl.h:117-141; we flag instead).
    diverged: Array


def _weights(cfg: ICPConfig, sq_dists, found, src_nrm, ref_nrm,
             slot_mask=None, p2plane_sq=None, ref_desc=None):
    """Compose the outlier-filter chain into per-correspondence weights.

    slot_mask = valid reading lanes (x knn) — the quantile basis of the
    reference's getDistsQuantile (includes not-found matches as +inf).
    p2plane_sq = squared point-to-plane residuals, consumed by
    RobustOutlierFilter's distanceType: point2plane.
    ref_desc = matched reference point's 1-D descriptor, consumed by
    GenericDescriptorOutlierFilter (grid built with desc_channel).
    """
    if slot_mask is None:
        slot_mask = found
    if cfg.outlier_chain is not None:
        w = found.astype(jnp.float32)
        for entry in cfg.outlier_chain:
            name, params = entry[0], entry[1:]
            if name == "trimmed":
                w = w * outliers.trimmed_dist_weights(sq_dists, found, *params,
                                                      slot_mask=slot_mask)
            elif name == "surface_normal":
                w = w * outliers.surface_normal_weights(src_nrm, ref_nrm, found, *params)
            elif name == "var_trimmed":
                w = w * outliers.var_trimmed_dist_weights(sq_dists, found, *params)
            elif name == "median":
                w = w * outliers.median_dist_weights(sq_dists, found, *params,
                                                     slot_mask=slot_mask)
            elif name == "max_dist":
                w = w * outliers.max_dist_weights(sq_dists, found, *params)
            elif name == "min_dist":
                w = w * outliers.min_dist_weights(sq_dists, found, *params)
            elif name == "robust":
                kind, tuning, scale_est, dist_type, approx = params
                w = w * outliers.robust_weights(
                    sq_dists, found, kind, tuning, scale_estimator=scale_est,
                    p2plane_sq=p2plane_sq, distance_type=dist_type,
                    approximation=approx)
            elif name == "generic_desc":
                # GenericDescriptorOutlierFilter (reference
                # OutlierFiltersImpl.cpp:304-369): weight from the MATCHED
                # reference point's 1-D descriptor (the reference reads
                # filteredReference for both source settings).  Soft mode
                # uses the descriptor itself, normalized by its max.
                soft, larger, threshold = params
                if ref_desc is None:
                    raise ValueError(
                        "GenericDescriptorOutlierFilter needs a reference "
                        "grid built with desc_channel=<descName>")
                if soft:
                    g = jnp.where(found, ref_desc, 0.0)
                    w = w * g / jnp.maximum(jnp.max(g), 1e-12)
                elif larger:
                    w = w * (ref_desc > threshold).astype(jnp.float32)
                else:
                    w = w * (ref_desc < threshold).astype(jnp.float32)
            elif name == "null":
                pass
            else:
                raise ValueError(f"unknown outlier filter: {name}")
        return w
    w = outliers.trimmed_dist_weights(sq_dists, found, cfg.trimmed_ratio,
                                      slot_mask=slot_mask)
    if cfg.use_normal_gate:
        w = w * outliers.surface_normal_weights(src_nrm, ref_nrm, found, cfg.normal_max_angle)
    if cfg.robust_kernel is not None:
        w = w * outliers.robust_weights(sq_dists, found, cfg.robust_kernel, cfg.robust_k)
    return w


def _match(cfg: ICPConfig, src: Array, src_nrm: Array, mask: Array,
           ref_grid: hashgrid.HashGrid):
    """Correspondence search honoring cfg.matcher and cfg.knn.

    Returns flattened per-correspondence arrays
    (src[N*K,3], src_nrm[N*K,3], slot_mask[N*K], ref_pts[N*K,3],
    ref_nrm[N*K,3], d2[N*K], found[N*K]) plus per_point_found[N] for
    overlap/fitness reporting and ref_desc[N*K] (the matched reference
    point's 1-D descriptor — None unless the grid carries one; consumed by
    GenericDescriptorOutlierFilter).  For knn=1 the arrays pass through
    unflattened (K=1).
    """
    if cfg.knn > 1:
        # knn matching runs on the MXU top-k path; hashgrid/pallas matchers
        # are single-NN engines (reference KDTreeMatcher knn>1 ≙ stacked
        # ErrorElements, MatchersImpl.cpp:118-133 + ErrorMinimizer.cpp).
        idx, d2, ok = bruteforce.knn(src, mask, ref_grid.points,
                                     cfg.max_correspondence_dist, k=cfg.knn)
        per_point_found = jnp.any(ok, axis=-1)
        k = cfg.knn
        flat_idx = idx.reshape(-1)
        return (jnp.repeat(src, k, axis=0), jnp.repeat(src_nrm, k, axis=0),
                jnp.repeat(mask, k), ref_grid.points[flat_idx],
                ref_grid.normals[flat_idx], d2.reshape(-1),
                ok.reshape(-1), per_point_found,
                None if ref_grid.desc is None else ref_grid.desc[flat_idx])
    if cfg.matcher == "sharded":
        # Each device searches its own map shard; the global winner reduces
        # over the mesh axis with one pmin + two psum rounds (the multi-chip
        # replacement for the reference's single kd-tree,
        # MatchersImpl.cpp:108-133 — SURVEY §2.6 halo-free variant: queries
        # replicated, map partitioned).
        assert cfg.shard_axis is not None, "sharded matcher needs shard_axis"
        idx, d2, found = bruteforce.nn(src, mask, ref_grid.points,
                                       cfg.max_correspondence_dist)
        local_pts = ref_grid.points[idx]
        local_nrm = ref_grid.normals[idx]
        d2 = jnp.where(found, d2, jnp.inf)
        best_d2 = jax.lax.pmin(d2, cfg.shard_axis)
        dev = jax.lax.axis_index(cfg.shard_axis).astype(jnp.float32)
        claim = jnp.where(d2 <= best_d2, dev, jnp.inf)
        winner = jax.lax.pmin(claim, cfg.shard_axis)
        is_winner = (claim == winner)[:, None]
        ref_pts = jax.lax.psum(jnp.where(is_winner, local_pts, 0.0), cfg.shard_axis)
        ref_nrm = jax.lax.psum(jnp.where(is_winner, local_nrm, 0.0), cfg.shard_axis)
        ref_desc = None
        if ref_grid.desc is not None:
            ref_desc = jax.lax.psum(
                jnp.where(is_winner[:, 0], ref_grid.desc[idx], 0.0),
                cfg.shard_axis)
        found = jnp.logical_and(mask, jnp.isfinite(best_d2))
        d2 = jnp.where(found, best_d2, jnp.inf)
        return src, src_nrm, mask, ref_pts, ref_nrm, d2, found, found, ref_desc
    if cfg.matcher == "pallas":
        from .. import pallas_nn

        idx, d2 = pallas_nn.nn_pallas(src, ref_grid.points,
                                      cfg.max_correspondence_dist)
        found = jnp.logical_and(mask, d2 <= cfg.max_correspondence_dist**2)
    elif cfg.matcher == "bruteforce":
        idx, d2, found = bruteforce.nn(src, mask, ref_grid.points,
                                       cfg.max_correspondence_dist)
    else:
        idx, d2, found = hashgrid.query_nn(
            ref_grid, src, mask, cfg.max_correspondence_dist,
            max_per_bucket=cfg.max_per_bucket,
        )
    return (src, src_nrm, mask, ref_grid.points[idx], ref_grid.normals[idx],
            d2, found, found,
            None if ref_grid.desc is None else ref_grid.desc[idx])


def _vardist_gate(cfg: ICPConfig, source: PointCloud, d2: Array, found: Array,
                  per_point_found: Array):
    """Per-point maximum match distance (≙ KDTreeVarDistMatcher,
    MatchersImpl.h:119-148): reject matches beyond the radius stored in the
    reading's ``cfg.max_dist_field`` attr channel."""
    if cfg.max_dist_field is None:
        return found, per_point_found
    vd = source.attr(cfg.max_dist_field)  # [N]
    if cfg.knn > 1:
        found = jnp.logical_and(found, d2 <= jnp.repeat(vd * vd, cfg.knn))
        per_point_found = jnp.any(found.reshape(-1, cfg.knn), axis=-1)
    else:
        found = jnp.logical_and(found, d2 <= vd * vd)
        per_point_found = found
    return found, per_point_found


def reference_centroid(ref_grid: hashgrid.HashGrid,
                       shard_axis: Optional[str] = None) -> Array:
    """Centroid of the valid reference points (de-meaned solving frame,
    ≙ ICP.cpp:293-326 centroid re-centering).  With ``shard_axis`` the sums
    reduce over the mesh so every shard solves in the same global frame."""
    ref_valid = (jnp.abs(ref_grid.points[:, 0]) < 1e7)
    nref = jnp.sum(ref_valid.astype(jnp.float32))
    total = jnp.sum(jnp.where(ref_valid[:, None], ref_grid.points, 0.0), axis=0)
    if shard_axis is not None:
        nref = jax.lax.psum(nref, shard_axis)
        total = jax.lax.psum(total, shard_axis)
    return total / jnp.maximum(nref, 1.0)


def iteration_step(cfg: ICPConfig, source: PointCloud, ref_grid: hashgrid.HashGrid,
                   centroid: Array, T: Array):
    """One ICP iteration: match -> weigh -> minimize -> compose.

    Shared by the production ``lax.while_loop`` driver and the
    iteration-dump inspector (inspectors.py ≙ VTKFileInspector), so the
    inspected program is exactly the production program.
    Returns (T_new, rot_delta, trans_delta, match_ratio, rmse).
    """
    src = se3.apply(T, source.xyz)
    src_nrm = se3.rotate(T, source.normals)
    (src, src_nrm, slot_mask, ref_pts, ref_nrm, d2, found, per_point_found,
     ref_desc) = _match(cfg, src, src_nrm, source.mask, ref_grid)
    found, per_point_found = _vardist_gate(cfg, source, d2, found,
                                           per_point_found)
    # Squared point-to-plane residual, consumed by RobustOutlierFilter's
    # distanceType: point2plane (reference OutlierFiltersImpl.cpp:461-494).
    pp = jnp.sum((src - ref_pts) * ref_nrm, axis=-1)
    w = _weights(cfg, d2, found, src_nrm, ref_nrm,
                 slot_mask=slot_mask, p2plane_sq=pp * pp, ref_desc=ref_desc)

    src_c = jnp.where(found[:, None], src - centroid, 0.0)
    ref_c = jnp.where(found[:, None], ref_pts - centroid, 0.0)
    if cfg.minimizer == "point_to_plane":
        xi, mean_sq = minimizers.point_to_plane_step(
            src_c, ref_c, ref_nrm, w, cfg.damping,
            force4dof=cfg.force4dof, force2d=cfg.force2d)
    elif cfg.minimizer == "point_to_point":
        xi, mean_sq = minimizers.point_to_point_step(src_c, ref_c, w)
    elif cfg.minimizer == "similarity":
        # PointToPointSimilarityErrorMinimizer (reference ErrorMinimizers/
        # PointToPointSimilarity.cpp): closed-form Umeyama with scale.
        # The scaled delta composes directly; twist deltas for the
        # differential checker come from the rigid part.
        S, scale_s = minimizers.point_to_point_umeyama(src_c, ref_c, w, with_scale=True)
        xi = jnp.zeros((6,), src.dtype)
        d = src_c - ref_c
        wsum = jnp.maximum(jnp.sum(w), 1e-6)
        mean_sq = jnp.sum(w * jnp.sum(d * d, axis=-1)) / wsum
    elif cfg.minimizer == "identity":
        # IdentityErrorMinimizer: evaluate residuals, step = identity.
        xi = jnp.zeros((6,), src.dtype)
        d = src_c - ref_c
        wsum = jnp.maximum(jnp.sum(w), 1e-6)
        mean_sq = jnp.sum(w * jnp.sum(d * d, axis=-1)) / wsum
    elif cfg.minimizer == "gicp":
        # Plane-disk covariances from normals (the GICP surface model:
        # large in-plane variance, epsilon along the normal), matching
        # Open3D's GeneralizedICP construction the reference wraps.
        eps = 1e-3
        I3 = jnp.eye(3, dtype=src.dtype)

        def disk_cov(n):
            nnT = n[:, :, None] * n[:, None, :]
            return I3[None] - (1.0 - eps) * nnT

        src_cov = disk_cov(src_nrm)
        ref_cov = disk_cov(ref_nrm)
        xi, mean_sq = minimizers.gicp_step(src_c, ref_c, src_cov, ref_cov,
                                           w, cfg.damping)
    else:
        raise ValueError(f"unsupported minimizer in while-loop: {cfg.minimizer}")

    # Compose update (in centered frame): T <- C * dT * C^-1 * T.
    if cfg.minimizer == "similarity":
        dT = S
        rot_delta = se3.rotation_angle(
            se3.make_transform(S[:3, :3] / jnp.maximum(scale_s, 1e-9), S[:3, 3]))
        trans_delta = jnp.linalg.norm(S[:3, 3])
    else:
        dT = se3.se3_exp(xi)
        rot_delta = jnp.linalg.norm(xi[:3])
        trans_delta = jnp.linalg.norm(xi[3:])
    shift = se3.make_transform(jnp.eye(3, dtype=src.dtype), centroid)
    T_new = shift @ dT @ se3.inverse(shift) @ T

    n_valid = jnp.maximum(jnp.sum(source.mask.astype(jnp.float32)), 1.0)
    match_ratio = jnp.sum(per_point_found.astype(jnp.float32)) / n_valid
    return T_new, rot_delta, trans_delta, match_ratio, jnp.sqrt(mean_sq)


@partial(jax.jit, static_argnames=("cfg",))
def register(source: PointCloud, ref_grid: hashgrid.HashGrid, init_T: Array,
             cfg: ICPConfig = ICPConfig()) -> ICPResult:
    """Register ``source`` against a prebuilt reference hash grid.

    init_T is the initial guess mapping source frame into reference frame.
    """
    centroid = reference_centroid(ref_grid, cfg.shard_axis)
    smooth = max(cfg.smooth_length, 1)

    def body(carry):
        T, it, ring, _, _, _ = carry
        T_new, rot_delta, trans_delta, match_ratio, rmse = iteration_step(
            cfg, source, ref_grid, centroid, T)
        # Differential transformation checker ring buffer of per-step deltas.
        ring = jnp.roll(ring, 1, axis=0).at[0].set(jnp.stack([rot_delta, trans_delta]))
        return T_new, it + 1, ring, match_ratio, rmse, jnp.zeros((6,), jnp.float32)

    init_T_arr = jnp.asarray(init_T, jnp.float32)

    def _out_of_bounds(T):
        """BoundTransformationChecker: accumulated correction vs initial guess."""
        if cfg.bound_max_rot is None and cfg.bound_max_trans is None:
            return jnp.bool_(False)
        delta = T @ se3.inverse(init_T_arr)
        bad = jnp.bool_(False)
        if cfg.bound_max_rot is not None:
            bad = jnp.logical_or(bad, se3.rotation_angle(delta) > cfg.bound_max_rot)
        if cfg.bound_max_trans is not None:
            bad = jnp.logical_or(bad, se3.translation_norm(delta) > cfg.bound_max_trans)
        return bad

    def cond(carry):
        T, it, ring, _, _, _ = carry
        mean_deltas = jnp.mean(ring, axis=0)
        converged = jnp.logical_and(
            it >= smooth,
            jnp.logical_and(mean_deltas[0] < cfg.min_diff_rot,
                            mean_deltas[1] < cfg.min_diff_trans),
        )
        keep_going = jnp.logical_and(it < cfg.max_iterations, jnp.logical_not(converged))
        return jnp.logical_and(keep_going, jnp.logical_not(_out_of_bounds(T)))

    ring0 = jnp.full((smooth, 2), jnp.inf, dtype=jnp.float32)
    carry0 = (
        jnp.asarray(init_T, jnp.float32),
        jnp.int32(0),
        ring0,
        jnp.float32(0.0),
        jnp.float32(jnp.inf),
        jnp.zeros((6,), jnp.float32),
    )
    T, it, ring, match_ratio, rmse, _ = jax.lax.while_loop(cond, body, carry0)
    mean_deltas = jnp.mean(ring, axis=0)
    converged = jnp.logical_and(mean_deltas[0] < cfg.min_diff_rot,
                                mean_deltas[1] < cfg.min_diff_trans)
    diverged = _out_of_bounds(T)
    if cfg.minimizer == "similarity":
        # Preserve the estimated scale: factor T = s*R | t, re-orthonormalize
        # R, re-apply s (plain orthonormalize would erase the similarity).
        s = jnp.cbrt(jnp.maximum(jnp.linalg.det(T[:3, :3]), 1e-12))
        T_out = se3.orthonormalize(se3.make_transform(T[:3, :3] / s, T[:3, 3]))
        T_out = se3.make_transform(s * T_out[:3, :3], T_out[:3, 3])
    else:
        T_out = se3.orthonormalize(T)
    return ICPResult(
        transform=T_out,
        iterations=it,
        converged=jnp.logical_and(converged, jnp.logical_not(diverged)),
        match_ratio=match_ratio,
        rmse=rmse,
        diverged=diverged,
    )


@partial(jax.jit, static_argnames=("cfg", "table_size"))
def register_clouds(source: PointCloud, reference: PointCloud, init_T: Array,
                    cfg: ICPConfig = ICPConfig(), table_size: int = 1 << 14) -> ICPResult:
    """Convenience: build the reference grid then register.

    Equivalent of CloudRegistration::registerClouds
    (reference CloudRegistration.cpp:57-61) for one-shot scan-to-scan use;
    the mapper instead keeps a persistent grid (≙ ICP::initReference
    amortization, ICP.cpp:291-326).
    """
    grid = hashgrid.build(reference, cfg.max_correspondence_dist, table_size=table_size)
    return register(source, grid, init_T, cfg)


@partial(jax.jit, static_argnames=("cfg", "sensor_std"))
def register_with_covariance(source: PointCloud, ref_grid: hashgrid.HashGrid,
                             init_T: Array, cfg: ICPConfig = ICPConfig(),
                             sensor_std: float = 0.01):
    """Register and return (ICPResult, 6x6 solution covariance).

    The covariance is evaluated at the converged pose over the final
    correspondence set — the analogue of libpointmatcher's
    PointToPlaneWithCov / PointToPointWithCov minimizers (reference:
    pointmatcher/ErrorMinimizers/PointToPlaneWithCov.cpp) whose covariance
    the SLAM layer consumes as edge information matrices.
    """
    res = register(source, ref_grid, init_T, cfg)
    src = se3.apply(res.transform, source.xyz)
    src_nrm = se3.rotate(res.transform, source.normals)
    # Same matcher selection as the solve loop (cfg.matcher / cfg.knn), so
    # the covariance is evaluated over the correspondence set the solution
    # actually used.
    (src, src_nrm, slot_mask, ref_pts, ref_nrm, d2, found, ppf,
     ref_desc) = _match(cfg, src, src_nrm, source.mask, ref_grid)
    found, _ = _vardist_gate(cfg, source, d2, found, ppf)
    pp = jnp.sum((src - ref_pts) * ref_nrm, axis=-1)
    w = _weights(cfg, d2, found, src_nrm, ref_nrm,
                 slot_mask=slot_mask, p2plane_sq=pp * pp, ref_desc=ref_desc)
    centroid = reference_centroid(ref_grid, cfg.shard_axis)
    src_c = jnp.where(found[:, None], src - centroid, 0.0)
    if cfg.minimizer == "point_to_plane":
        cov = minimizers.point_to_plane_covariance(src_c, ref_nrm, w, sensor_std)
    else:
        cov = minimizers.point_to_point_covariance(src_c, w, sensor_std)
    return res, cov


def evaluate_registration(source: PointCloud, target_grid: hashgrid.HashGrid,
                          T: Array, max_dist: float, max_per_bucket: int = 32):
    """Open3D-style (fitness, inlier_rmse) of a candidate transform.

    (reference: Open3D EvaluateRegistration used by PlaceRecognition
    fitness gates — PlaceRecognition.cpp:117-121.)
    """
    src = se3.apply(T, source.xyz)
    _, d2, found = bruteforce.nn(src, source.mask, target_grid.points, max_dist)
    n_valid = jnp.maximum(jnp.sum(source.mask.astype(jnp.float32)), 1.0)
    fitness = jnp.sum(found.astype(jnp.float32)) / n_valid
    inlier_sq = jnp.sum(jnp.where(found, d2, 0.0)) / jnp.maximum(jnp.sum(found.astype(jnp.float32)), 1.0)
    return fitness, jnp.sqrt(inlier_sq)
