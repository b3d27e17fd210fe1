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
