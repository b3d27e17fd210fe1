"""Correspondence outlier weighting — batched, mask-aware.

TPU-native equivalents of libpointmatcher's OutlierFilters
(reference: pointmatcher/OutlierFiltersImpl.{h,cpp}:59-248).  The production
icp.yaml chain uses TrimmedDist(ratio=0.90) + SurfaceNormal(maxAngle=1.57)
(reference: ros/open3d_slam_ros/param/icp.yaml:17-23).  Each filter maps a
match set to per-correspondence weights in [0,1]; weights multiply.

Robust M-estimators mirror RobustOutlierFilter's 8 kernels
(OutlierFiltersImpl.cpp Robust: Cauchy/Welsch/SwitchableConstraint/
GemanMcClure/Tukey/Huber/L1/Student).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def trimmed_dist_weights(sq_dists: Array, valid: Array, ratio: float) -> Array:
    """Keep the best ``ratio`` fraction of valid matches by distance.

    (reference TrimmedDistOutlierFilter — OutlierFiltersImpl.cpp; computes
    the distance quantile and zeroes matches above it.)
    Masked-quantile over a fixed-size array: sort with +inf padding and read
    the element at floor(ratio * n_valid).
    """
    n = sq_dists.shape[-1]
    d = jnp.where(valid, sq_dists, jnp.inf)
    d_sorted = jnp.sort(d, axis=-1)
    n_valid = jnp.sum(valid.astype(jnp.int32), axis=-1)
    kth = jnp.clip((ratio * n_valid.astype(jnp.float32)).astype(jnp.int32), 0, n - 1)
    thresh = jnp.take_along_axis(d_sorted, kth[..., None], axis=-1)[..., 0]
    w = jnp.logical_and(valid, d <= thresh[..., None]).astype(jnp.float32)
    return w


def surface_normal_weights(src_normals: Array, ref_normals: Array, valid: Array,
                           max_angle: float) -> Array:
    """Reject matches whose normals disagree by more than max_angle.

    (reference SurfaceNormalOutlierFilter — OutlierFiltersImpl.cpp:170-193.)
    Points without a normal (zero vector) pass through unweighted, matching
    the reference's behavior when descriptors are missing.
    """
    dot = jnp.abs(jnp.sum(src_normals * ref_normals, axis=-1))
    has_n = (jnp.linalg.norm(src_normals, axis=-1) > 1e-6) & \
            (jnp.linalg.norm(ref_normals, axis=-1) > 1e-6)
    ok = dot >= jnp.cos(max_angle)
    w = jnp.where(has_n, ok, True)
    return jnp.logical_and(valid, w).astype(jnp.float32)


def max_dist_weights(sq_dists: Array, valid: Array, max_dist: float) -> Array:
    return jnp.logical_and(valid, sq_dists <= max_dist**2).astype(jnp.float32)


def min_dist_weights(sq_dists: Array, valid: Array, min_dist: float) -> Array:
    return jnp.logical_and(valid, sq_dists >= min_dist**2).astype(jnp.float32)


def median_dist_weights(sq_dists: Array, valid: Array, factor: float) -> Array:
    """Keep matches below factor * median distance (MedianDistOutlierFilter)."""
    d = jnp.sqrt(jnp.where(valid, sq_dists, jnp.nan))
    med = jnp.nanmedian(d, axis=-1)
    ok = d <= factor * med[..., None]
    return jnp.where(valid, jnp.nan_to_num(ok.astype(jnp.float32)), 0.0)


def var_trimmed_dist_weights(sq_dists: Array, valid: Array,
                             min_ratio: float = 0.05, max_ratio: float = 0.99,
                             lam: float = 0.95) -> Array:
    """Adaptive trimming: pick the ratio minimizing the FRMSD criterion
    (reference VarTrimmedDistOutlierFilter — optimizeInlierRatio)."""
    n = sq_dists.shape[-1]
    d = jnp.where(valid, sq_dists, jnp.inf)
    d_sorted = jnp.sort(d, axis=-1)
    n_valid = jnp.maximum(jnp.sum(valid.astype(jnp.int32), axis=-1), 1)
    ranks = jnp.arange(1, n + 1, dtype=jnp.float32)
    ratios = ranks / n_valid.astype(jnp.float32)[..., None]
    csum = jnp.cumsum(jnp.where(jnp.isfinite(d_sorted), d_sorted, 0.0), axis=-1)
    mse = csum / ranks
    frmsd = jnp.where(
        (ratios >= min_ratio) & (ratios <= max_ratio),
        mse / jnp.power(jnp.clip(ratios, 1e-6, 1.0), 2.0 * lam),
        jnp.inf,
    )
    best = jnp.argmin(frmsd, axis=-1)
    thresh = jnp.take_along_axis(d_sorted, best[..., None], axis=-1)[..., 0]
    return jnp.logical_and(valid, d <= thresh[..., None]).astype(jnp.float32)


# --- Robust M-estimator kernels (RobustOutlierFilter) ---------------------

def robust_weights(sq_dists: Array, valid: Array, kind: str, k: float) -> Array:
    """w(e) for M-estimator ``kind`` with tuning constant ``k`` (distance units)."""
    e2 = sq_dists
    k2 = k * k
    kind = kind.lower()
    if kind == "cauchy":
        w = 1.0 / (1.0 + e2 / k2)
    elif kind == "welsch":
        w = jnp.exp(-e2 / k2)
    elif kind in ("sc", "switchable", "switchableconstraint"):
        w = jnp.where(e2 <= k2, 1.0, 4.0 * k2**2 / jnp.maximum(k2 + e2, 1e-12) ** 2)
    elif kind in ("gm", "gemanmcclure"):
        w = k2 / jnp.maximum(k2 + e2, 1e-12) ** 2 * k2
        w = w / jnp.maximum(jnp.max(w, axis=-1, keepdims=True), 1e-12)
    elif kind == "tukey":
        w = jnp.where(e2 <= k2, (1.0 - e2 / k2) ** 2, 0.0)
    elif kind == "huber":
        e = jnp.sqrt(jnp.maximum(e2, 1e-20))
        w = jnp.where(e <= k, 1.0, k / e)
    elif kind == "l1":
        e = jnp.sqrt(jnp.maximum(e2, 1e-20))
        w = 1.0 / jnp.maximum(e, 1e-6)
        w = w / jnp.maximum(jnp.max(jnp.where(valid, w, 0.0), axis=-1, keepdims=True), 1e-12)
    elif kind == "student":
        dof = 5.0
        w = (dof + 1.0) / (dof + e2 / k2)
        w = w / jnp.max(w)
    else:
        raise ValueError(f"unknown robust kernel: {kind}")
    return jnp.where(valid, w, 0.0).astype(jnp.float32)
