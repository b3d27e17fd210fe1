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


def _kth_smallest_nonneg(d: Array, kth: Array) -> Array:
    """Exact k-th smallest (0-based, per leading batch) of a NON-NEGATIVE
    float array (+inf allowed) — 4x8-bit radix select on the IEEE-754 bit
    pattern, which is monotone for non-negative floats.

    Replaces the full ``jnp.sort`` the trimmed/median quantile filters ran
    EVERY ICP iteration: four histogram passes (each a [..., N, 256]
    one-hot reduction) cost a fraction of an 8k bitonic sort on the VPU
    and return the bit-exact same value as ``sort(d)[kth]``.
    """
    bits = jax.lax.bitcast_convert_type(d, jnp.int32)
    want = kth.astype(jnp.int32)
    prefix = jnp.zeros_like(want)
    pmask = jnp.int32(0)
    bins = jnp.arange(256, dtype=jnp.int32)
    for shift in (24, 16, 8, 0):
        in_prefix = (bits & pmask) == prefix[..., None]
        digit = (bits >> shift) & 255
        oh = jnp.logical_and(digit[..., None] == bins, in_prefix[..., None])
        hist = jnp.sum(oh, axis=-2, dtype=jnp.int32)       # [..., 256]
        cum = jnp.cumsum(hist, axis=-1)
        b = jnp.argmax(cum > want[..., None], axis=-1).astype(jnp.int32)
        below = jnp.where(
            b > 0,
            jnp.take_along_axis(cum, jnp.maximum(b - 1, 0)[..., None],
                                axis=-1)[..., 0],
            0)
        want = want - below
        prefix = prefix | (b << shift)
        pmask = pmask | (jnp.int32(255) << shift)
    return jax.lax.bitcast_convert_type(prefix, jnp.float32)


def _dists_quantile(sq_dists: Array, valid: Array, ratio, slot_mask: Array = None) -> Array:
    """``Matches::getDistsQuantile``: the distance value at floor(ratio * n)
    of the sorted match-distance list.

    The reference's quantile basis counts EVERY match slot of the (filtered)
    reading — including not-found matches whose distance is +inf — so the
    basis is ``slot_mask`` (valid reading lanes x knn), not just found
    matches.  Not-found / padded slots sort as +inf.
    """
    if slot_mask is None:
        slot_mask = valid
    n = sq_dists.shape[-1]
    d = jnp.where(valid, sq_dists, jnp.inf)
    # Padded lanes (beyond the reference's notion of N) sort after real infs
    # is irrelevant — both are +inf; the INDEX basis is what must exclude them.
    n_slots = jnp.sum(slot_mask.astype(jnp.int32), axis=-1)
    kth = jnp.clip((ratio * n_slots.astype(jnp.float32)).astype(jnp.int32), 0, n - 1)
    if jax.default_backend() in ("cpu", "gpu"):
        # CPU/GPU XLA: the bitonic sort beats the histogram passes there
        # (and tests pin CPU).  Same value bit-for-bit either way.
        d_sorted = jnp.sort(d, axis=-1)
        return jnp.take_along_axis(d_sorted, kth[..., None], axis=-1)[..., 0], d
    return _kth_smallest_nonneg(d, kth), d


def trimmed_dist_weights(sq_dists: Array, valid: Array, ratio: float,
                         slot_mask: Array = None) -> Array:
    """Keep matches at or below the ``ratio`` distance quantile.

    (reference TrimmedDistOutlierFilter — OutlierFiltersImpl.cpp:140-148;
    ``dists <= getDistsQuantile(ratio)``.)
    """
    thresh, d = _dists_quantile(sq_dists, valid, ratio, slot_mask)
    return jnp.logical_and(valid, d <= thresh[..., None]).astype(jnp.float32)


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


def median_dist_weights(sq_dists: Array, valid: Array, factor: float,
                        slot_mask: Array = None) -> Array:
    """Keep matches below factor * median sq-distance (MedianDistOutlierFilter:
    ``dists <= factor * getDistsQuantile(0.5)``)."""
    med, d = _dists_quantile(sq_dists, valid, 0.5, slot_mask)
    ok = d <= factor * med[..., None]
    return jnp.logical_and(valid, ok).astype(jnp.float32)


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

def robust_scale(sq_dists: Array, valid: Array, estimator: str) -> Array:
    """Scale estimators of RobustOutlierFilter
    (reference OutlierFiltersImpl.cpp:503-536):
    mad  -> sqrt(median(|d2 - median(d2)|)),
    std  -> sqrt(std(d2)),
    none -> 1.  ('berg' needs the previous-iteration scale and is applied by
    the caller from this same median seed.)

    Estimated over the found matches (the reference's accessors iterate the
    dists matrix whose +inf entries would poison the estimate).
    """
    d = jnp.where(valid, sq_dists, jnp.nan)
    if estimator == "mad":
        med = jnp.nanmedian(d, axis=-1)
        mad = jnp.nanmedian(jnp.abs(d - med[..., None]), axis=-1)
        return jnp.sqrt(jnp.maximum(mad, 1e-12))
    if estimator == "std":
        return jnp.sqrt(jnp.maximum(jnp.nanstd(d, axis=-1), 1e-12))
    if estimator == "berg":
        # First-iteration seed (ICP.cpp runs the filter fresh per compute()):
        # 1.9 * sqrt(median d2); subsequent decay toward the target scale is
        # stateful in the reference and approximated by the seed here.
        med = jnp.nanmedian(d, axis=-1)
        return 1.9 * jnp.sqrt(jnp.maximum(med, 1e-12))
    return jnp.float32(1.0)


def robust_weights(sq_dists: Array, valid: Array, kind: str, k: float,
                   scale_estimator: str = "none",
                   p2plane_sq: Array = None,
                   distance_type: str = "point2point",
                   approximation: float = float("inf")) -> Array:
    """RobustOutlierFilter weights (reference OutlierFiltersImpl.cpp:497-594).

    e2 = dist² / scale² where dist² is the match distance (point2point) or
    the squared point-to-plane residual (distanceType: point2plane); ``k``
    is the tuning constant applied exactly as the reference's formulas.
    Matches beyond ``approximation`` (distance units) are zeroed.
    """
    dists = sq_dists if distance_type == "point2point" else p2plane_sq
    scale = robust_scale(dists, valid, scale_estimator)
    e2 = dists / jnp.maximum(scale * scale, 1e-20)
    k2 = k * k
    kind = kind.lower()
    if kind == "cauchy":
        w = 1.0 / (1.0 + e2 / k2)
    elif kind == "welsch":
        w = jnp.exp(-e2 / k2)
    elif kind in ("sc", "switchable", "switchableconstraint"):
        # reference: w = 1 for e2 < k, else 4k² / (k + e2)².
        w = jnp.where(e2 < k, 1.0, 4.0 * k2 / jnp.maximum(k + e2, 1e-12) ** 2)
    elif kind in ("gm", "gemanmcclure"):
        w = k2 / jnp.maximum(k + e2, 1e-12) ** 2
    elif kind == "tukey":
        w = jnp.where(e2 < k2, (1.0 - e2 / k2) ** 2, 0.0)
    elif kind == "huber":
        e = jnp.sqrt(jnp.maximum(e2, 1e-20))
        w = jnp.where(e2 < k2, 1.0, k / e)
    elif kind == "l1":
        w = 1.0 / jnp.sqrt(jnp.maximum(e2, 1e-12))
    elif kind == "student":
        # reference: p = (1 + e2/k)^(-(k+d)/2), w = p (k+d)/(k+e2), d = 3.
        d_dim = 3.0
        p = jnp.power(1.0 + e2 / k, -(k + d_dim) / 2.0)
        w = p * (k + d_dim) / jnp.maximum(k + e2, 1e-12)
    else:
        raise ValueError(f"unknown robust kernel: {kind}")
    if approximation != float("inf"):
        w = jnp.where(e2 >= approximation * approximation, 0.0, w)
    return jnp.where(valid, w, 0.0).astype(jnp.float32)
