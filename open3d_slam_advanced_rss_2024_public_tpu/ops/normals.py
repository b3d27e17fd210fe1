"""Surface normal estimation via PCA over voxel-hash neighborhoods.

TPU-native equivalent of the reference's two normal estimators:
  - Open3D ``EstimateNormals`` with KNN-hybrid search + orientation toward
    the sensor (reference CloudRegistration.cpp:62-75
    estimateNormalsOrCovariancesIfNeeded),
  - libpointmatcher SurfaceNormalDataPointsFilter / PCA estimator
    (reference pointmatcher/SurfaceNormalEstimatorPCA.cpp — PCA normal plus
    linearity/planarity/curvature descriptors).

Instead of a kd-tree we gather k neighbors from the CSR voxel-hash grid and
run a batched 3x3 symmetric eigen-solve.  The smallest-eigenvector solve is
closed-form (no LAPACK), so the whole pass stays on the VPU and fuses.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..utils.pointcloud import PointCloud
from . import bruteforce, hashgrid

Array = jax.Array


def smallest_eigenvector_3x3(C: Array):
    """Batched closed-form smallest eigenpair of symmetric 3x3 matrices.

    Uses the trigonometric (Cardano) eigenvalue formula followed by a
    cross-product eigenvector extraction — branch-free and VPU-friendly,
    unlike LAPACK eigh.  C: f32[..., 3, 3].
    Returns (eigvec f32[...,3], eigvals_sorted_ascending f32[...,3]).
    """
    q = jnp.trace(C, axis1=-2, axis2=-1) / 3.0
    I = jnp.eye(3, dtype=C.dtype)
    A = C - q[..., None, None] * I
    p2 = jnp.sum(A * A, axis=(-2, -1)) / 6.0
    p = jnp.sqrt(jnp.maximum(p2, 1e-20))
    B = A / p[..., None, None]
    detB = jnp.linalg.det(B)
    phi = jnp.arccos(jnp.clip(detB / 2.0, -1.0, 1.0)) / 3.0
    # Eigenvalues of C: q + 2 p cos(phi + 2k pi / 3), k = 0,1,2.
    e1 = q + 2.0 * p * jnp.cos(phi)
    e3 = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)
    e2 = 3.0 * q - e1 - e3
    evals = jnp.stack([e3, e2, e1], axis=-1)  # ascending

    # Eigenvector for the smallest eigenvalue e3: any nonzero column of
    # (C - e1 I)(C - e2 I) spans it.  Pick the largest column for stability.
    M = (C - e1[..., None, None] * I) @ (C - e2[..., None, None] * I)
    norms = jnp.sum(M * M, axis=-2)
    best = jnp.argmax(norms, axis=-1)
    v = jnp.take_along_axis(M, best[..., None, None].repeat(3, axis=-2), axis=-1)[..., 0]
    # Degenerate case (isotropic / planar-degenerate): fall back to z.
    vn = jnp.linalg.norm(v, axis=-1, keepdims=True)
    fallback = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0], dtype=C.dtype), v.shape)
    v = jnp.where(vn > 1e-12, v / (vn + 1e-20), fallback)
    return v, evals


@partial(jax.jit, static_argnames=("k", "max_per_bucket"))
def estimate_normals(cloud: PointCloud, radius, k: int = 16,
                     sensor_origin=None, max_per_bucket: int = 32,
                     min_neighbors: int = 3) -> PointCloud:
    """PCA normals from up-to-k neighbors within ``radius`` (hybrid search).

    Matches Open3D KDTreeSearchParamHybrid(radius, max_nn) semantics used by
    the reference (CloudRegistration.cpp:62-75).  Normals are oriented
    toward ``sensor_origin`` (default: the cloud frame origin, as the
    reference orients toward the sensor).
    Points with < min_neighbors stay with zero normals.
    """
    idx, d2, ok = bruteforce.knn(cloud.xyz, cloud.mask, cloud.xyz, radius, k=k)
    nbr = cloud.xyz[idx]  # [N, k, 3]
    w = ok.astype(jnp.float32)[..., None]
    cnt = jnp.sum(w, axis=-2)
    mean = jnp.sum(nbr * w, axis=-2) / jnp.maximum(cnt, 1.0)
    d = (nbr - mean[:, None, :]) * w
    C = jnp.einsum("nki,nkj->nij", d, d) / jnp.maximum(cnt[..., None], 1.0)
    n, evals = smallest_eigenvector_3x3(C)
    if sensor_origin is None:
        sensor_origin = jnp.zeros((3,), dtype=jnp.float32)
    else:
        sensor_origin = jnp.asarray(sensor_origin, dtype=jnp.float32)
    to_sensor = sensor_origin - cloud.xyz
    flip = jnp.sum(n * to_sensor, axis=-1, keepdims=True) < 0
    n = jnp.where(flip, -n, n)
    good = jnp.logical_and(cloud.mask, cnt[..., 0] >= min_neighbors)
    return cloud.with_normals(jnp.where(good[:, None], n, 0.0))


@partial(jax.jit, static_argnames=("interpret",))
def estimate_normals_radius(cloud: PointCloud, radius, sensor_origin=None,
                            min_neighbors: int = 3,
                            interpret: bool = False) -> PointCloud:
    """PCA normals over the full r-ball via the MXU moments kernel.

    The production path on TPU (ops/pallas_moments.py): no top_k, no
    gather — count/mean/covariance of every point's radius neighborhood
    accumulate as masked matmuls, then the closed-form 3x3 eigen-solve
    yields the normal.  Direction parity with ``estimate_normals`` (the
    reference's hybrid radius+max-k search, CloudRegistration.cpp:62-75):
    the k-cap there only bounds CPU cost; the plane estimate is the same.
    """
    from . import pallas_moments

    count, C = pallas_moments.radius_moments(cloud.xyz, cloud.mask, radius,
                                             interpret=interpret)
    n, _ = smallest_eigenvector_3x3(C)
    if sensor_origin is None:
        sensor_origin = jnp.zeros((3,), dtype=jnp.float32)
    else:
        sensor_origin = jnp.asarray(sensor_origin, dtype=jnp.float32)
    to_sensor = sensor_origin - cloud.xyz
    flip = jnp.sum(n * to_sensor, axis=-1, keepdims=True) < 0
    n = jnp.where(flip, -n, n)
    good = jnp.logical_and(cloud.mask, count >= min_neighbors)
    return cloud.with_normals(jnp.where(good[:, None], n, 0.0))


@partial(jax.jit, static_argnames=("k", "max_per_bucket"))
def surface_descriptors(cloud: PointCloud, radius, k: int = 16,
                        max_per_bucket: int = 32):
    """Linearity / planarity / curvature descriptors from local PCA.

    (reference SurfaceNormalEstimatorPCA.cpp descriptors; also the basis of
    the SamplingSurfaceNormal filter family.)
    Returns f32[N, 3] = (linearity, planarity, curvature).
    """
    idx, d2, ok = bruteforce.knn(cloud.xyz, cloud.mask, cloud.xyz, radius, k=k)
    nbr = cloud.xyz[idx]
    w = ok.astype(jnp.float32)[..., None]
    cnt = jnp.sum(w, axis=-2)
    mean = jnp.sum(nbr * w, axis=-2) / jnp.maximum(cnt, 1.0)
    d = (nbr - mean[:, None, :]) * w
    C = jnp.einsum("nki,nkj->nij", d, d) / jnp.maximum(cnt[..., None], 1.0)
    _, evals = smallest_eigenvector_3x3(C)  # ascending e0 <= e1 <= e2
    e0, e1, e2 = evals[..., 0], evals[..., 1], evals[..., 2]
    safe = jnp.maximum(e2, 1e-12)
    linearity = (e2 - e1) / safe
    planarity = (e1 - e0) / safe
    curvature = e0 / jnp.maximum(e0 + e1 + e2, 1e-12)
    out = jnp.stack([linearity, planarity, curvature], axis=-1)
    return jnp.where(cloud.mask[:, None], out, 0.0)


@partial(jax.jit, static_argnames=("rows", "cols", "knn"))
def organized_surface_normals(cloud: PointCloud, rows: int, cols: int,
                              knn: int = 5, max_dist=jnp.inf,
                              sensor_origin=None,
                              min_neighbors: int = 3) -> PointCloud:
    """Window-PCA normals + surface descriptors for ORGANIZED clouds.

    ≙ OrganizedCloudSurfaceNormalDataPointsFilter (reference
    DataPointsFilters/OrganizedCloudSurfaceNormal.cpp:95-227): neighbors
    come from the range image's pixel window instead of a spatial search —
    the cloud must be in row-major image order with ``rows*cols`` slots
    (invalid pixels masked).  The per-pixel window gather is a stack of
    2-D shifts — a convolution access pattern XLA fuses well.

    Produces normals plus attr channels densities / linearity / planarity
    / curvature (reference SurfaceNormalEstimatorPCA.cpp:85-148, sqrt-
    eigenvalue spans; utils.h computeDensity: n / (4/3 pi r_max^3)).
    """
    assert cloud.capacity == rows * cols, "cloud must be image-ordered"
    half = knn // 2
    img = jnp.where(cloud.mask[:, None], cloud.xyz, 0.0).reshape(rows, cols, 3)
    msk = cloud.mask.reshape(rows, cols)
    # Pad so every offset [-half, half) resolves (out-of-image -> invalid).
    pad = ((half, half), (half, half))
    img_p = jnp.pad(img, pad + ((0, 0),))
    msk_p = jnp.pad(msk, pad)
    shifts = [(dr, dc) for dr in range(-half, half) for dc in range(-half, half)]
    nbr = jnp.stack([
        jax.lax.dynamic_slice(img_p, (half + dr, half + dc, 0),
                              (rows, cols, 3)) for dr, dc in shifts],
        axis=2)  # [R, C, W, 3]
    ok = jnp.stack([
        jax.lax.dynamic_slice(msk_p, (half + dr, half + dc), (rows, cols))
        for dr, dc in shifts], axis=2)  # [R, C, W]
    d2 = jnp.sum((nbr - img[:, :, None, :]) ** 2, axis=-1)
    ok = jnp.logical_and(ok, d2 <= jnp.asarray(max_dist, jnp.float32) ** 2)
    ok = jnp.logical_and(ok, msk[:, :, None])
    w = ok.astype(jnp.float32)[..., None]
    cnt = jnp.sum(w, axis=2)  # [R, C, 1]
    mean = jnp.sum(nbr * w, axis=2) / jnp.maximum(cnt, 1.0)
    d = (nbr - mean[:, :, None, :]) * w
    C = jnp.einsum("rcki,rckj->rcij", d, d) / jnp.maximum(cnt[..., None], 1.0)
    n, evals = smallest_eigenvector_3x3(C.reshape(-1, 3, 3))
    # Orient toward the sensor.
    origin = (jnp.zeros((3,), jnp.float32) if sensor_origin is None
              else jnp.asarray(sensor_origin, jnp.float32))
    to_sensor = origin - cloud.xyz
    flip = jnp.sum(n * to_sensor, axis=-1, keepdims=True) < 0
    n = jnp.where(flip, -n, n)
    good = jnp.logical_and(cloud.mask, cnt.reshape(-1) >= min_neighbors)
    out = cloud.with_normals(jnp.where(good[:, None], n, 0.0))
    # Descriptors from sqrt-eigenvalue spans (ascending e0 <= e1 <= e2).
    s = jnp.sqrt(jnp.maximum(evals, 0.0))
    s0, s1, s2 = s[..., 0], s[..., 1], s[..., 2]
    safe = jnp.maximum(s2, 1e-12)
    linearity = jnp.where(good, (s2 - s1) / safe, 0.0)
    planarity = jnp.where(good, (s1 - s0) / safe, 0.0)
    curvature = jnp.where(good, s0 / jnp.maximum(s0 + s1 + s2, 1e-12), 0.0)
    r_max2 = jnp.max(jnp.where(ok, d2, 0.0), axis=2).reshape(-1)
    volume = (4.0 / 3.0) * jnp.pi * r_max2 * jnp.sqrt(r_max2)
    densities = jnp.where(good, cnt.reshape(-1) / jnp.maximum(volume, 1e-12),
                          0.0)
    for name, val in (("densities", densities), ("linearity", linearity),
                      ("planarity", planarity), ("curvature", curvature)):
        out = out.with_attr(name, val)
    return out
