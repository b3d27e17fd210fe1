"""Extended DataPointsFilter parity set.

TPU-native equivalents of the remaining libpointmatcher DataPointsFilters
the production configs and tests exercise (reference: pointmatcher/
Registry.cpp:67-95 and pointmatcher/DataPointsFilters/*.cpp).  Each filter
is a jit-compiled masked transform over fixed-capacity clouds (removal =
masking, like ops/filters.py).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..utils.pointcloud import PointCloud
from . import bruteforce

Array = jax.Array


def shadow_filter(cloud: PointCloud, eps: float = 0.1) -> PointCloud:
    """Drop shadow points: points whose normal is almost orthogonal to the
    observation direction (grazing surfaces produce veil/shadow artifacts).
    ≙ ShadowDataPointsFilter (eps = min |cos| between normal and ray)."""
    ray = cloud.xyz / jnp.maximum(jnp.linalg.norm(cloud.xyz, axis=-1, keepdims=True), 1e-9)
    cosang = jnp.abs(jnp.sum(cloud.normals * ray, axis=-1))
    has_n = jnp.linalg.norm(cloud.normals, axis=-1) > 1e-6
    keep = jnp.where(has_n, cosang > eps, True)
    return cloud.with_mask(keep)


def max_quantile_on_axis(cloud: PointCloud, ratio: float = 0.5, axis: int = 0) -> PointCloud:
    """Keep points below the ``ratio`` quantile along an axis.
    ≙ MaxQuantileOnAxisDataPointsFilter."""
    vals = jnp.where(cloud.mask, cloud.xyz[:, axis], jnp.inf)
    sorted_vals = jnp.sort(vals)
    n_valid = jnp.sum(cloud.mask.astype(jnp.int32))
    kth = jnp.clip((ratio * n_valid.astype(jnp.float32)).astype(jnp.int32), 0,
                   cloud.capacity - 1)
    thresh = sorted_vals[kth]
    return cloud.with_mask(cloud.xyz[:, axis] <= thresh)


def max_density(cloud: PointCloud, key, max_density_pts_per_m3: float = 100.0,
                radius: float = 0.5, k: int = 16) -> PointCloud:
    """Probabilistically thin regions denser than the target density.
    ≙ MaxDensityDataPointsFilter (keeps each point with probability
    target/local density)."""
    _, d2, ok = bruteforce.knn(cloud.xyz, cloud.mask, cloud.xyz, radius, k=k)
    cnt = jnp.sum(ok, axis=-1).astype(jnp.float32)
    vol = 4.0 / 3.0 * jnp.pi * radius**3
    density = cnt / vol
    p_keep = jnp.clip(max_density_pts_per_m3 / jnp.maximum(density, 1e-9), 0.0, 1.0)
    u = jax.random.uniform(key, (cloud.capacity,))
    return cloud.with_mask(u < p_keep)


def fix_step_sampling(cloud: PointCloud, step: int = 2) -> PointCloud:
    """Keep every ``step``-th valid point (deterministic decimation).
    ≙ FixStepSamplingDataPointsFilter."""
    valid_rank = jnp.cumsum(cloud.mask.astype(jnp.int32)) - 1
    return cloud.with_mask(valid_rank % step == 0)


def observation_direction(cloud: PointCloud, sensor=(0.0, 0.0, 0.0)) -> Array:
    """Unit vectors from points toward the sensor (a descriptor in the
    reference; returned as an array here).
    ≙ ObservationDirectionDataPointsFilter."""
    sensor = jnp.asarray(sensor, dtype=jnp.float32)
    v = sensor - cloud.xyz
    v = v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-9)
    return jnp.where(cloud.mask[:, None], v, 0.0)


def orient_normals(cloud: PointCloud, sensor=(0.0, 0.0, 0.0),
                   toward_sensor: bool = True) -> PointCloud:
    """Flip normals to face toward (or away from) the sensor.
    ≙ OrientNormalsDataPointsFilter."""
    direc = observation_direction(cloud, sensor)
    dot = jnp.sum(cloud.normals * direc, axis=-1, keepdims=True)
    sign = 1.0 if toward_sensor else -1.0
    flip = sign * dot < 0
    return cloud.with_normals(jnp.where(flip, -cloud.normals, cloud.normals))


def with_observation_direction(cloud: PointCloud, sensor=(0.0, 0.0, 0.0)) -> PointCloud:
    """Registry entry point for ObservationDirectionDataPointsFilter:
    stores the point->sensor unit direction as descriptor channels
    ``observationDirections_{x,y,z}`` (≙ the reference's
    observationDirections descriptor; geometry unchanged)."""
    d = observation_direction(cloud, sensor)
    for i, ax in enumerate("xyz"):
        cloud = cloud.with_attr(f"observationDirections_{ax}", d[:, i])
    return cloud


def with_incidence_angle(cloud: PointCloud, sensor=(0.0, 0.0, 0.0)) -> PointCloud:
    """Registry entry point for IncidenceAngleDataPointsFilter: stores the
    ``incidenceAngles`` descriptor channel (≙ IncidenceAngle.cpp)."""
    return cloud.with_attr("incidenceAngles", incidence_angle(cloud, sensor))


def with_simple_sensor_noise(cloud: PointCloud, sensor_type: str = "lms",
                             gain: float = 1.0) -> PointCloud:
    """Registry entry point for SimpleSensorNoiseDataPointsFilter: stores the
    ``simpleSensorNoise`` sigma channel (≙ SimpleSensorNoise.cpp)."""
    return cloud.with_attr(
        "simpleSensorNoise", simple_sensor_noise(cloud, sensor_type, gain))


def incidence_angle(cloud: PointCloud, sensor=(0.0, 0.0, 0.0)) -> Array:
    """Per-point incidence angle between the viewing ray and the normal.
    ≙ IncidenceAngleDataPointsFilter (descriptor)."""
    direc = observation_direction(cloud, sensor)
    cosang = jnp.clip(jnp.abs(jnp.sum(cloud.normals * direc, axis=-1)), 0.0, 1.0)
    has_n = jnp.linalg.norm(cloud.normals, axis=-1) > 1e-6
    ang = jnp.where(has_n, jnp.arccos(cosang), 0.0)
    return jnp.where(cloud.mask, ang, 0.0)


def simple_sensor_noise(cloud: PointCloud, sensor_type: str = "lms",
                        gain: float = 1.0) -> Array:
    """Expected range-noise sigma per point (distance-proportional models).
    ≙ SimpleSensorNoiseDataPointsFilter (descriptor)."""
    r = jnp.linalg.norm(jnp.where(cloud.mask[:, None], cloud.xyz, 0.0), axis=-1)
    if sensor_type == "lms":       # SICK LMS-style: a + b*r
        sigma = 0.012 + 0.0019 * r
    elif sensor_type == "hdl":     # Velodyne-style constant-ish
        sigma = 0.02 + 0.0 * r
    else:
        sigma = 0.01 + 0.001 * r
    return jnp.where(cloud.mask, gain * sigma, 0.0)


def normal_space_sampling(cloud: PointCloud, key, target: int,
                          n_bins: int = 26) -> PointCloud:
    """Subsample uniformly over the normal-direction sphere so that flat
    regions don't dominate the constraint set.
    ≙ NormalSpaceDataPointsFilter (used for well-conditioned ICP)."""
    n = cloud.normals
    has_n = jnp.linalg.norm(n, axis=-1) > 1e-6
    # Bin normals by the dominant-axis octant scheme (26 coarse directions).
    az = jnp.arctan2(n[:, 1], n[:, 0])  # [-pi, pi]
    el = jnp.arcsin(jnp.clip(n[:, 2], -1.0, 1.0))  # [-pi/2, pi/2]
    na = int(jnp.sqrt(n_bins))
    az_bin = jnp.clip(((az + jnp.pi) / (2 * jnp.pi) * na).astype(jnp.int32), 0, na - 1)
    el_bin = jnp.clip(((el + jnp.pi / 2) / jnp.pi * na).astype(jnp.int32), 0, na - 1)
    bin_id = az_bin * na + el_bin
    # Random priority within each bin; keep the lowest-rank points per bin
    # until the target budget, approximated by per-bin quota.
    u = jax.random.uniform(key, (cloud.capacity,))
    valid = jnp.logical_and(cloud.mask, has_n)
    # Rank within bin via sorted (bin, u) pairs.
    order = jnp.argsort(jnp.where(valid, bin_id.astype(jnp.float32) + u * 0.999, jnp.inf))
    sorted_bin = bin_id[order]
    new_bin = sorted_bin != jnp.roll(sorted_bin, 1)
    new_bin = new_bin.at[0].set(True)
    rank_in_bin = jnp.arange(cloud.capacity) - jnp.maximum.accumulate(
        jnp.where(new_bin, jnp.arange(cloud.capacity), 0))
    quota = max(target // (na * na), 1)
    keep_sorted = rank_in_bin < quota
    keep = jnp.zeros((cloud.capacity,), bool).at[order].set(keep_sorted)
    return cloud.with_mask(jnp.logical_and(valid, keep))


def covariance_sampling(cloud: PointCloud, target: int) -> PointCloud:
    """Keep the points whose normals contribute most to constraining all 6
    DoF (torque + force balance).  Greedy-score approximation of
    CovarianceSamplingDataPointsFilter."""
    n = cloud.normals
    t = jnp.cross(cloud.xyz, n)
    g = jnp.concatenate([t, n], axis=-1)  # [N,6] constraint rows
    # Score each point by its row norm weighted against the dominant
    # directions (cheap leverage proxy).
    A = jnp.einsum("ni,nj->ij", jnp.where(cloud.mask[:, None], g, 0.0),
                   jnp.where(cloud.mask[:, None], g, 0.0))
    A_inv = jnp.linalg.inv(A + 1e-3 * jnp.eye(6))
    leverage = jnp.einsum("ni,ij,nj->n", g, A_inv, g)
    score = jnp.where(cloud.mask, leverage, -jnp.inf)
    order = jnp.argsort(-score)
    keep = jnp.zeros((cloud.capacity,), bool).at[order[:target]].set(True)
    return cloud.with_mask(keep)


def sampling_surface_normal(cloud: PointCloud, key, ratio: float = 0.5,
                            knn: int = 7, radius: float = 0.5) -> PointCloud:
    """Random subsample + local PCA normals on the kept set.
    ≙ SamplingSurfaceNormalDataPointsFilter (subsample, then estimate
    normals from the neighborhood)."""
    from . import filters as base_filters
    from . import normals as normals_ops

    sub = base_filters.random_sampling(cloud, key, ratio)
    return normals_ops.estimate_normals(sub, radius=radius, k=knn)


def octree_grid(cloud: PointCloud, max_size_by_node: float = 0.2,
                sample_mode: int = 0) -> PointCloud:
    """Octree-leaf subsampling over fixed-capacity arrays.

    ≙ OctreeGridDataPointsFilter (reference: pointmatcher/DataPointsFilters/
    OctreeGrid.cpp — build an octree until leaves are below maxSizeByNode,
    then keep one representative per leaf).  On TPU the terminal octree
    level is a uniform voxel grid at ``max_size_by_node``, so the filter
    reduces to per-voxel representative selection — pointer-free and O(N log N)
    via a single lexicographic sort.

    sample_mode 0/1: first point per leaf (mask-only, points unmoved);
    sample_mode 2/3: leaf centroid (equivalent to voxel averaging).
    """
    from . import filters as base_filters
    from . import hashgrid as hg

    if sample_mode >= 2:
        return base_filters.voxel_downsample(cloud, max_size_by_node, cloud.capacity)
    key3 = hg.voxel_key(cloud.xyz, jnp.float32(max_size_by_node))
    # Invalid lanes sort last (sentinel coords are huge already, but make it
    # explicit); lexicographic sort over the 3 int32 coords with the original
    # index as final tie-break keeps "first point per leaf" deterministic.
    kx = jnp.where(cloud.mask, key3[:, 0], jnp.int32(2**31 - 1))
    ky, kz = key3[:, 1], key3[:, 2]
    idx = jnp.arange(cloud.capacity, dtype=jnp.int32)
    order = jnp.lexsort((idx, kz, ky, kx))
    sk = jnp.stack([kx, ky, kz], axis=-1)[order]
    is_first = jnp.concatenate(
        [jnp.ones((1,), bool), jnp.any(sk[1:] != sk[:-1], axis=-1)])
    keep = jnp.zeros((cloud.capacity,), bool).at[order].set(is_first)
    return cloud.with_mask(keep)


def hidden_point_removal(cloud: PointCloud, sensor=(0.0, 0.0, 0.0),
                         radius_scale: float = 100.0,
                         n_azimuth: int = 256, n_elevation: int = 64) -> PointCloud:
    """Keep points visible from the sensor viewpoint.

    ≙ HiddenPointRemovalDataPointsFilter (reference: pointmatcher/
    DataPointsFilters/HiddenPointRemoval.cpp — Katz et al. spherical flip +
    convex hull).  A convex hull is hostile to fixed-shape TPU execution, so
    this uses the direction-binning visibility approximation: quantize view
    directions into an azimuth x elevation grid and keep the closest point
    per occupied bin — exactly the visibility set for a scanning sensor, and
    the regime where spherical-flip HPR is well-conditioned.  radius_scale
    is accepted for config compatibility.
    """
    del radius_scale
    rel = cloud.xyz - jnp.asarray(sensor, jnp.float32)
    rng = jnp.linalg.norm(rel, axis=-1)
    az = jnp.arctan2(rel[:, 1], rel[:, 0])  # [-pi, pi]
    el = jnp.arcsin(jnp.clip(rel[:, 2] / jnp.maximum(rng, 1e-9), -1.0, 1.0))
    ia = jnp.clip(((az + jnp.pi) / (2 * jnp.pi) * n_azimuth).astype(jnp.int32),
                  0, n_azimuth - 1)
    ie = jnp.clip(((el + jnp.pi / 2) / jnp.pi * n_elevation).astype(jnp.int32),
                  0, n_elevation - 1)
    bin_id = ie * n_azimuth + ia
    # Min-range per bin via scatter-min, then keep points attaining the min.
    big = jnp.float32(3.0e38)
    bin_min = jnp.full((n_azimuth * n_elevation,), big, jnp.float32)
    bin_min = bin_min.at[jnp.where(cloud.mask, bin_id, 0)].min(
        jnp.where(cloud.mask, rng, big))
    keep = rng <= bin_min[bin_id] * 1.0001
    return cloud.with_mask(keep)


def cut_at_descriptor_threshold(cloud: PointCloud, descriptor="incidenceAngles",
                                threshold: float = 0.5,
                                use_larger_than: bool = True,
                                sensor=(0.0, 0.0, 0.0)) -> PointCloud:
    """Mask points by a per-point descriptor threshold.

    ≙ CutAtDescriptorThresholdDataPointsFilter (reference: pointmatcher/
    DataPointsFilters/CutAtDescriptorThreshold.cpp).  ``descriptor`` is a
    name ("incidenceAngles" | "ranges") or a precomputed f32[N] array;
    use_larger_than=True cuts points whose descriptor exceeds the threshold.
    """
    if isinstance(descriptor, str):
        if descriptor == "incidenceAngles":
            desc = incidence_angle(cloud, sensor)
        elif descriptor == "ranges":
            desc = jnp.where(cloud.mask, jnp.linalg.norm(cloud.xyz, axis=-1), 0.0)
        else:
            raise ValueError(f"unknown descriptor name: {descriptor}")
    else:
        desc = descriptor
    keep = desc <= threshold if use_larger_than else desc >= threshold
    return cloud.with_mask(keep)


def remove_sensor_bias(cloud: PointCloud, sensor=(0.0, 0.0, 0.0),
                       angle_threshold: float = 0.785) -> PointCloud:
    """Drop points whose incidence angle is too grazing for reliable range.

    ≙ RemoveSensorBiasDataPointsFilter's rejection stage (reference:
    pointmatcher/DataPointsFilters/RemoveSensorBias.cpp, Laconte et al. —
    points beyond ``angleThreshold`` incidence carry unmodelable range bias
    and are removed; the sensor-specific analytic bias correction is a
    per-device calibration and intentionally not replicated).
    """
    ang = incidence_angle(cloud, sensor)
    has_n = jnp.linalg.norm(cloud.normals, axis=-1) > 1e-6
    keep = jnp.where(has_n, ang <= angle_threshold, True)
    return cloud.with_mask(keep)


# ---------------------------------------------------------------------------
# Surfel-decomposition descriptors (the last two registry entries):
# Elipsoids and Gestalt.
# ---------------------------------------------------------------------------

def _segment_surfels(xyz, mask, knn: int):
    """Spatially-compact fixed-size surfel segments + their moments.

    The reference decomposes space by recursively median-splitting the
    bounding box along its largest axis until <= knn points remain per box
    (Elipsoids.cpp:237-282 buildNew) — data-dependent recursion that does
    not map to XLA.  The TPU-native equivalent: Morton-sort the cloud and
    group consecutive ``knn`` points — consecutive Morton codes are
    spatially compact, giving the same "boxes of ~knn neighbors" semantic
    with one argsort and fixed shapes.

    Returns (order, seg_of_lane, per-segment: n, mean, cov, box_dim,
    max_r2) with S = ceil(N / knn) segments over the SORTED lane order.
    """
    from . import hashgrid as hg

    N = xyz.shape[0]
    code = hg.morton_code(xyz, mask, 0.25)
    order = jnp.argsort(code)
    x = xyz[order]
    m = mask[order]
    S = -(-N // knn)
    pad = S * knn - N
    xs = jnp.pad(x, ((0, pad), (0, 0))).reshape(S, knn, 3)
    ms = jnp.pad(m, (0, pad)).reshape(S, knn)
    w = ms.astype(jnp.float32)
    n = jnp.sum(w, axis=1)                                      # [S]
    mean = jnp.sum(xs * w[..., None], axis=1) / jnp.maximum(
        n, 1.0)[:, None]                                        # [S,3]
    ctr = jnp.where(ms[..., None], xs - mean[:, None, :], 0.0)
    cov = jnp.einsum("ski,skj->sij", ctr, ctr)                  # [S,3,3] = NN·NNᵀ
    big = jnp.float32(3.0e38)
    lo = jnp.min(jnp.where(ms[..., None], xs, big), axis=1)
    hi = jnp.max(jnp.where(ms[..., None], xs, -big), axis=1)
    box_dim = jnp.max(jnp.where(n[:, None] > 0, hi - lo, 0.0), axis=-1)
    max_r2 = jnp.max(jnp.where(ms, jnp.sum(ctr * ctr, axis=-1), 0.0), axis=1)
    return order, n, mean, cov, box_dim, max_r2, S


def elipsoids(cloud: PointCloud, key, ratio: float = 0.5, knn: int = 7,
              sampling_method: int = 0, max_box_dim: float = jnp.inf,
              min_planarity: float = 0.0,
              keep_normals: bool = True, keep_densities: bool = False,
              keep_eigen_values: bool = False, keep_eigen_vectors: bool = False,
              keep_covariances: bool = False, keep_weights: bool = False,
              keep_means: bool = False, keep_shapes: bool = False,
              average_existing_descriptors: bool = True) -> PointCloud:
    """Subsampling surfels (ellipsoids) filter.

    ≙ ElipsoidsDataPointsFilter (reference: pointmatcher/DataPointsFilters/
    Elipsoids.cpp:236-501 — decompose space into boxes of <= knn points;
    per box compute center of mass + eigen-decomposition of the scatter
    matrix; normal = smallest-eigenvalue eigenvector; optional surfel
    descriptors; then either keep original points with probability
    ``ratio`` carrying their box's descriptors (samplingMethod 0) or one
    point per box at the mean (samplingMethod 1); boxes larger than
    ``maxBoxDim`` or flatter than ``minPlanarity`` are dropped as unfit).

    Deviations (documented): box decomposition is Morton-segmented (see
    _segment_surfels); eigenvalues report in ASCENDING order and the
    shape/planarity formulas use descending-sorted normalized eigenvalues
    — the canonical Weinmann definitions the reference's shapeMat encodes
    (its own EigenSolver output order is unspecified, and its unit test is
    disabled upstream as broken, utest/ui/DataFilters.cpp:298-323).
    """
    xyz, mask = cloud.xyz, cloud.mask
    order, n, mean, cov, box_dim, max_r2, S = _segment_surfels(xyz, mask, knn)

    va, ve = jnp.linalg.eigh(cov)             # ascending eigenvalues
    normal = ve[:, :, 0]                      # smallest-eigval eigenvector
    vsum = jnp.maximum(jnp.sum(va, axis=-1), 1e-12)
    vdesc = va[:, ::-1] / vsum[:, None]       # descending, normalized
    planarity = 2.0 * (vdesc[:, 1] - vdesc[:, 2])
    cylindricality = vdesc[:, 0] - vdesc[:, 1]
    sphericality = 3.0 * vdesc[:, 2]
    density = n / jnp.maximum(
        (4.0 / 3.0) * jnp.pi * max_r2 * jnp.sqrt(max_r2), 1e-12)

    fit = n >= 3
    fit = jnp.logical_and(fit, box_dim <= max_box_dim)
    if min_planarity > 0:
        fit = jnp.logical_and(fit, planarity >= min_planarity)

    N = xyz.shape[0]
    lane_seg = jnp.arange(N, dtype=jnp.int32) // knn  # segment of sorted lane
    sorted_cloud = cloud.take(order)
    seg_fit = fit[lane_seg]
    if sampling_method == 0:
        u = jax.random.uniform(key, (N,))
        keep = jnp.logical_and(sorted_cloud.mask,
                               jnp.logical_and(seg_fit, u < ratio))
        out = sorted_cloud.with_mask(keep)
        out_xyz = out.xyz
    else:
        first_of_seg = (jnp.arange(N, dtype=jnp.int32) % knn) == 0
        keep = jnp.logical_and(sorted_cloud.mask,
                               jnp.logical_and(seg_fit, first_of_seg))
        out_xyz = jnp.where(keep[:, None], mean[lane_seg], sorted_cloud.xyz)
        out = dataclasses_replace_xyz(sorted_cloud, out_xyz).with_mask(keep)
        if average_existing_descriptors and cloud.attrs is not None:
            # Per-segment mean of existing descriptor channels.
            a = sorted_cloud.attrs
            w = sorted_cloud.mask.astype(jnp.float32)
            pad = S * knn - N
            aseg = jnp.pad(a * w[:, None], ((0, pad), (0, 0))).reshape(
                S, knn, -1).sum(axis=1)
            aavg = aseg / jnp.maximum(
                jnp.pad(w, (0, pad)).reshape(S, knn).sum(axis=1), 1.0)[:, None]
            out = dataclasses_replace_attrs(out, jnp.where(
                keep[:, None], aavg[lane_seg], a))
    if keep_normals:
        out = dataclasses_replace_normals(
            out, jnp.where(keep[:, None], normal[lane_seg], out.normals))
    # Surfel descriptor channels (single-column names, reference label
    # spans flattened).
    def seg_cols(prefix, vals):
        nonlocal out
        vals = vals.reshape(S, -1)
        for c in range(vals.shape[1]):
            name = prefix if vals.shape[1] == 1 else f"{prefix}{c}"
            out = out.with_attr(name, jnp.where(keep, vals[lane_seg, c], 0.0))
    if keep_densities:
        seg_cols("densities", density)
    if keep_eigen_values:
        seg_cols("eigValues", va)
    if keep_eigen_vectors:
        seg_cols("eigVectors", ve)
    if keep_covariances:
        seg_cols("covariance", cov)
    if keep_weights:
        seg_cols("weights", n)
    if keep_means:
        seg_cols("means", mean)
    if keep_shapes:
        seg_cols("shapes", jnp.stack(
            [planarity, cylindricality, sphericality], axis=-1))
    return out


def dataclasses_replace_xyz(cloud: PointCloud, xyz) -> PointCloud:
    import dataclasses

    return dataclasses.replace(cloud, xyz=xyz)


def dataclasses_replace_normals(cloud: PointCloud, normals) -> PointCloud:
    import dataclasses

    return dataclasses.replace(cloud, normals=normals)


def dataclasses_replace_attrs(cloud: PointCloud, attrs) -> PointCloud:
    import dataclasses

    return dataclasses.replace(cloud, attrs=attrs)


@partial(jax.jit, static_argnames=("max_keypoints", "keep_normals",
                                  "keep_means", "keep_eigen_values",
                                  "keep_eigen_vectors", "keep_covariances",
                                  "keep_gestalt_features"))
def _gestalt_core(xyz, mask, kp_idx, kp_valid, radius,
                  max_keypoints: int, keep_normals: bool, keep_means: bool,
                  keep_eigen_values: bool, keep_eigen_vectors: bool,
                  keep_covariances: bool, keep_gestalt_features: bool):
    """Per-keypoint Gestalt descriptor evaluation (batched over K)."""
    K = max_keypoints
    kp = xyz[kp_idx]                                        # [K,3]
    rel = xyz[None, :, :] - kp[:, None, :]                  # [K,N,3]
    inbox = jnp.all(jnp.abs(rel) <= radius, axis=-1)
    lane = jnp.arange(xyz.shape[0], dtype=jnp.int32)
    not_self = lane[None, :] != kp_idx[:, None]
    w = (inbox & not_self & mask[None, :] & kp_valid[:, None]).astype(
        jnp.float32)                                        # [K,N]
    n = jnp.sum(w, axis=1)
    mean = jnp.einsum("kn,kni->ki", w, rel) / jnp.maximum(n, 1.0)[:, None]
    ctr = rel - mean[:, None, :]
    cov = jnp.einsum("kn,kni,knj->kij", w, ctr, ctr)        # NN·NNᵀ
    va, ve = jnp.linalg.eigh(cov)                           # ascending
    normal = ve[:, :, 0]
    vsum = jnp.maximum(jnp.sum(va, axis=-1), 1e-12)
    # ≙ Gestalt.cpp:434-437 with eigenVaSort ascending: planarity =
    # 2(λmid − λmin)/Σ, cylindricality = (λmax − λmid)/Σ.
    planarity = 2.0 * (va[:, 1] - va[:, 0]) / vsum
    up = jnp.asarray([0.0, 0.0, 1.0], jnp.float32)
    vert_angle = jnp.arccos(jnp.clip(normal @ up, -1.0, 1.0))
    ok = kp_valid & (n > 0)
    if keep_gestalt_features:
        # ≙ Gestalt.cpp:451-462: discard near-planar keypoints and normals
        # within 10 degrees of vertical.
        ok = ok & (planarity <= 0.9) & (vert_angle >= jnp.deg2rad(10.0))

    # Covariance-oriented horizontal basis (≙ Gestalt.cpp:440-449).
    nx = jnp.stack([normal[:, 0], normal[:, 1],
                    jnp.zeros_like(normal[:, 0])], axis=-1)
    nx = nx / jnp.maximum(jnp.linalg.norm(nx, axis=-1, keepdims=True), 1e-9)
    ny = jnp.cross(jnp.broadcast_to(up, nx.shape), nx)
    ny = ny / jnp.maximum(jnp.linalg.norm(ny, axis=-1, keepdims=True), 1e-9)
    ax = jnp.einsum("kni,ki->kn", rel, nx)
    ay = jnp.einsum("kni,ki->kn", rel, ny)
    az = rel[..., 2]
    # Polar binning (≙ calculateAngles/calculateRadii, Gestalt.cpp:598-627:
    # atan2(x, y) wrapped to [0, 2pi), radius in the horizontal plane).
    ang = jnp.arctan2(ax, ay)
    ang = jnp.where(ang < 0, ang + 2 * jnp.pi, ang)
    rad = jnp.sqrt(ax * ax + ay * ay)
    rbin = jnp.clip((rad / (radius / 4.0)).astype(jnp.int32), 0, 3)
    abin = jnp.clip((ang / (jnp.pi / 4.0)).astype(jnp.int32), 0, 7)
    bid = rbin * 8 + abin                                   # [K,N] in [0,32)
    flat = (jnp.arange(K, dtype=jnp.int32)[:, None] * 32 + bid).reshape(-1)
    wf = w.reshape(-1)
    hz = az.reshape(-1)
    cnt = jnp.zeros((K * 32,), jnp.float32).at[flat].add(wf)
    hsum = jnp.zeros((K * 32,), jnp.float32).at[flat].add(wf * hz)
    gmean = jnp.where(cnt > 0, hsum / jnp.maximum(cnt, 1.0), 0.0)
    dev = hz - gmean[flat]
    vsum_b = jnp.zeros((K * 32,), jnp.float32).at[flat].add(wf * dev * dev)
    gmean = gmean.reshape(K, 4, 8)
    gvar = vsum_b.reshape(K, 4, 8)
    cnt = cnt.reshape(K, 4, 8)
    # Normalize variances where populated; propagate empty outer rings
    # from the ring closer to the keypoint (≙ Gestalt.cpp:503-533).
    gvar = gvar.at[:, 0].set(jnp.where(cnt[:, 0] > 0,
                                       gvar[:, 0] / jnp.maximum(cnt[:, 0], 1.0),
                                       gvar[:, 0]))
    for r in range(1, 4):
        empty = gmean[:, r] == 0.0
        norm_var = jnp.where(cnt[:, r] > 0,
                             gvar[:, r] / jnp.maximum(cnt[:, r], 1.0),
                             gvar[:, r])
        gvar = gvar.at[:, r].set(jnp.where(empty, gvar[:, r - 1], norm_var))
        gmean = gmean.at[:, r].set(jnp.where(empty, gmean[:, r - 1],
                                             gmean[:, r]))
    return (kp, ok, n, mean + kp, cov, va, ve, normal,
            gmean.reshape(K, 32), gvar.reshape(K, 32))


def gestalt(cloud: PointCloud, key, ratio: float = 0.1, radius: float = 5.0,
            knn: int = 7, vsize=(1.0, 1.0, 1.0),
            max_keypoints: int = 512,
            keep_normals: bool = True, keep_means: bool = False,
            keep_eigen_values: bool = False, keep_eigen_vectors: bool = False,
            keep_covariances: bool = False,
            keep_gestalt_features: bool = True,
            average_existing_descriptors: bool = True) -> PointCloud:
    """Gestalt descriptors filter (Bosse & Zlot, ICRA 2013).

    ≙ GestaltDataPointsFilter (reference: pointmatcher/DataPointsFilters/
    Gestalt.cpp:214-595): select one keypoint per (vSizeX, vSizeY, vSizeZ)
    voxel, random-subsample keypoints with probability ``ratio``, then for
    each keypoint gather the neighbors in a ±radius box, eigen-decompose
    the scatter matrix (normal, planarity/cylindricality gates, vertical-
    normal gate), re-express neighbors in a covariance-oriented horizontal
    basis, and accumulate the 4-radial x 8-angular Gestalt height
    mean/variance descriptor with inner-ring propagation of empty bins.

    TPU-native reshaping: keypoint selection is first-point-per-voxel via
    one lexicographic sort (deterministic, ≙ the reference's
    Voxel.firstPoint, Gestalt.cpp:280-325; the reference then randomizes
    the representative — determinism is preferred here, SURVEY §7), and
    the per-keypoint neighborhood search is a dense [K, N] box test
    instead of sequential index scans.  ``knn``/``maxBoxDim`` (the
    reference's recursive-split bookkeeping) are accepted by the chain
    wrapper for config compatibility but do not alter the descriptor.
    Output capacity is ``max_keypoints``.
    """
    from . import hashgrid as hg

    N = cloud.capacity
    vs = jnp.asarray(vsize, jnp.float32)
    # First valid point per anisotropic voxel (lexsort, ≙ octree_grid).
    key3 = jnp.floor(cloud.xyz / vs).astype(jnp.int32)
    kx = jnp.where(cloud.mask, key3[:, 0], jnp.int32(2**31 - 1))
    ky, kz = key3[:, 1], key3[:, 2]
    idx = jnp.arange(N, dtype=jnp.int32)
    order = jnp.lexsort((idx, kz, ky, kx))
    sk = jnp.stack([kx, ky, kz], axis=-1)[order]
    is_first = jnp.concatenate(
        [jnp.ones((1,), bool), jnp.any(sk[1:] != sk[:-1], axis=-1)])
    kp_mask = jnp.zeros((N,), bool).at[order].set(is_first)
    kp_mask = jnp.logical_and(kp_mask, cloud.mask)
    # Random keypoint subsample (≙ Gestalt.cpp:328-338).
    u = jax.random.uniform(key, (N,))
    kp_mask = jnp.logical_and(kp_mask, u < ratio)
    # Cap at max_keypoints (stable order).
    sel = jnp.argsort(jnp.logical_not(kp_mask), stable=True)[:max_keypoints]
    kp_valid = kp_mask[sel]

    (kp, ok, n, mean_abs, cov, va, ve, normal, gmeans,
     gvars) = _gestalt_core(
        cloud.xyz, cloud.mask, sel, kp_valid, jnp.float32(radius),
        max_keypoints=max_keypoints, keep_normals=keep_normals,
        keep_means=keep_means, keep_eigen_values=keep_eigen_values,
        keep_eigen_vectors=keep_eigen_vectors,
        keep_covariances=keep_covariances,
        keep_gestalt_features=keep_gestalt_features)

    out = PointCloud(
        xyz=jnp.where(ok[:, None], kp, jnp.full_like(kp, 3.0e7)),
        normals=jnp.where(ok[:, None] if keep_normals else
                          jnp.zeros((max_keypoints, 1), bool),
                          normal, 0.0),
        mask=ok,
    )
    if average_existing_descriptors and cloud.attrs is not None:
        out = dataclasses_replace_attrs(out, cloud.attrs[sel])
        import dataclasses as _dc

        out = _dc.replace(out, attr_names=cloud.attr_names)

    K = max_keypoints

    def cols(prefix, vals):
        nonlocal out
        vals = vals.reshape(K, -1)
        for c in range(vals.shape[1]):
            name = prefix if vals.shape[1] == 1 else f"{prefix}{c}"
            out = out.with_attr(name, jnp.where(ok, vals[:, c], 0.0))

    if keep_means:
        cols("means", mean_abs)
    if keep_eigen_values:
        cols("eigValues", va)
    if keep_eigen_vectors:
        cols("eigVectors", ve)
    if keep_covariances:
        cols("covariance", cov)
    if keep_gestalt_features:
        cols("gestaltMeans", gmeans)
        cols("gestaltVariances", gvars)
    return out
