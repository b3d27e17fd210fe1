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
