"""Error minimizers: batched closed-form / normal-equation solves.

TPU-native equivalents of libpointmatcher's ErrorMinimizers
(reference: pointmatcher/ErrorMinimizers/PointToPlane.cpp:108-240 — builds
G = [p x n; n], h = sum(delta . n), solves (G Gᵀ) tau = -G h with an
SVD→QR robust fallback; PointToPoint.cpp — Umeyama/Kabsch closed form).

The 6x6 normal-equation assembly is one einsum over the weighted
correspondence set — ideal VPU/MXU work.  The tiny 6x6 solve runs in
float32 with Tikhonov guarding; clouds are de-meaned by the ICP driver
(mirroring ICP.cpp:293-326 centroid re-centering) so conditioning stays
healthy without float64.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ...utils import se3

Array = jax.Array


def solve_6x6(A: Array, b: Array, damping: float = 1e-6) -> Array:
    """Solve A x = b for symmetric PSD kxk A with relative Tikhonov damping.

    The reference falls back from SVD to QR on rank deficiency
    (PointToPlane.cpp:158-240); on TPU we instead regularize by a small
    multiple of trace(A)/k, which keeps the solve branch-free.
    """
    k = A.shape[0]
    scale = jnp.trace(A) / k + 1e-12
    A_reg = A + (damping * scale) * jnp.eye(k, dtype=A.dtype)
    L, lower = jax.scipy.linalg.cho_factor(A_reg, lower=True)
    return jax.scipy.linalg.cho_solve((L, lower), b)


def point_to_plane_step(src_xyz: Array, ref_xyz: Array, ref_normals: Array,
                        weights: Array, damping: float = 1e-6,
                        force4dof: bool = False, force2d: bool = False):
    """One weighted point-to-plane Gauss-Newton step.

    Minimizes sum_i w_i (n_i . (p_i + omega x p_i + t - q_i))^2 over the
    twist xi = (omega, t).  Returns (xi f32[6], mean_sq_residual).
    (reference PointToPlane.cpp:108-156.)

    force4dof restricts rotation to yaw: the rotational constraint row
    collapses to (Gamma p).n = p_x n_y - p_y n_x and the solve is 4x4
    (reference PointToPlane.cpp:124-135 matrixGamma).  force2d additionally
    drops the z translation and projects residuals onto the XY plane
    (reference PointToPlane.cpp:246-254 conservativeResize to 2D).
    """
    cross = jnp.cross(src_xyz, ref_normals)  # [N,3]; z-row = px*ny - py*nx
    delta = src_xyz - ref_xyz
    if force2d:
        r = jnp.sum(delta[:, :2] * ref_normals[:, :2], axis=-1)
        g = jnp.concatenate([cross[:, 2:3], ref_normals[:, :2]], axis=-1)  # [N,3]
    elif force4dof:
        r = jnp.sum(delta * ref_normals, axis=-1)
        g = jnp.concatenate([cross[:, 2:3], ref_normals], axis=-1)  # [N,4]
    else:
        r = jnp.sum(delta * ref_normals, axis=-1)  # signed plane residual
        g = jnp.concatenate([cross, ref_normals], axis=-1)  # [N,6]
    wg = g * weights[:, None]
    A = wg.T @ g
    b = -(wg.T @ r)
    x = solve_6x6(A, b, damping)
    if force2d:
        xi = jnp.zeros((6,), src_xyz.dtype).at[2].set(x[0]).at[3].set(x[1]).at[4].set(x[2])
    elif force4dof:
        xi = jnp.zeros((6,), src_xyz.dtype).at[2].set(x[0]).at[3:].set(x[1:])
    else:
        xi = x
    wsum = jnp.maximum(jnp.sum(weights), 1e-6)
    mean_sq = jnp.sum(weights * r * r) / wsum
    return xi, mean_sq


def point_to_point_umeyama(src_xyz: Array, ref_xyz: Array, weights: Array,
                           with_scale: bool = False):
    """Weighted closed-form rigid (or similarity) alignment.

    (reference PointToPoint.cpp / PointToPointSimilarity.cpp — Umeyama.)
    Returns a 4x4 transform mapping src -> ref (and the scale if requested).
    """
    w = weights / jnp.maximum(jnp.sum(weights), 1e-9)
    mu_s = jnp.sum(src_xyz * w[:, None], axis=0)
    mu_r = jnp.sum(ref_xyz * w[:, None], axis=0)
    ds = src_xyz - mu_s
    dr = ref_xyz - mu_r
    S = (dr * w[:, None]).T @ ds  # 3x3 cross-covariance
    U, D, Vt = jnp.linalg.svd(S)
    det = jnp.linalg.det(U @ Vt)
    C = jnp.diag(jnp.array([1.0, 1.0, 1.0], dtype=S.dtype)).at[2, 2].set(det)
    R = U @ C @ Vt
    if with_scale:
        var_s = jnp.sum(w * jnp.sum(ds * ds, axis=-1))
        scale = jnp.sum(D * jnp.diag(C)) / jnp.maximum(var_s, 1e-12)
    else:
        scale = jnp.float32(1.0)
    t = mu_r - scale * (R @ mu_s)
    T = se3.make_transform(scale * R, t) if with_scale else se3.make_transform(R, t)
    return T, scale


def point_to_point_step(src_xyz: Array, ref_xyz: Array, weights: Array):
    """GN-style incremental wrapper around Umeyama so the driver can treat
    point-to-point like point-to-plane: returns (xi, mean_sq_residual)."""
    T, _ = point_to_point_umeyama(src_xyz, ref_xyz, weights)
    xi = se3.se3_log(T)
    d = src_xyz - ref_xyz
    wsum = jnp.maximum(jnp.sum(weights), 1e-6)
    mean_sq = jnp.sum(weights * jnp.sum(d * d, axis=-1)) / wsum
    return xi, mean_sq


def point_to_plane_covariance(src_xyz: Array, ref_normals: Array,
                              weights: Array, sensor_std: float = 0.01) -> Array:
    """6x6 covariance of the point-to-plane solution.

    TPU-native equivalent of PointToPlaneWithCovErrorMinimizer (reference:
    pointmatcher/ErrorMinimizers/PointToPlaneWithCov.cpp — Censi-style
    first-order propagation of sensor noise through the normal equations):
    Sigma = sigma_z^2 (Jᵀ W J)^-1 with J_i = [p_i x n_i ; n_i].
    Expects de-meaned coordinates (same frame the GN step solved in).
    """
    cross = jnp.cross(src_xyz, ref_normals)
    g = jnp.concatenate([cross, ref_normals], axis=-1)  # [N, 6]
    A = (g * weights[:, None]).T @ g
    scale = jnp.trace(A) / 6.0 + 1e-12
    A_reg = A + 1e-6 * scale * jnp.eye(6, dtype=A.dtype)
    return (sensor_std * sensor_std) * jnp.linalg.inv(A_reg)


def point_to_point_covariance(src_xyz: Array, weights: Array,
                              sensor_std: float = 0.01) -> Array:
    """6x6 covariance of the point-to-point solution (PointToPointWithCov).

    J_i = [-[p_i]_x | I] stacked over 3 residual rows per correspondence.
    """
    px = se3.skew(src_xyz)  # [N,3,3]
    J = jnp.concatenate(
        [-px, jnp.broadcast_to(jnp.eye(3, dtype=src_xyz.dtype), px.shape)], axis=-1)
    A = jnp.einsum("nij,nik,n->jk", J, J, weights)
    scale = jnp.trace(A) / 6.0 + 1e-12
    A_reg = A + 1e-6 * scale * jnp.eye(6, dtype=A.dtype)
    return (sensor_std * sensor_std) * jnp.linalg.inv(A_reg)


def gicp_step(src_xyz: Array, ref_xyz: Array, src_cov: Array, ref_cov: Array,
              weights: Array, damping: float = 1e-6):
    """Generalized-ICP step: plane-to-plane metric with combined covariances.

    (reference CloudRegistration.cpp RegistrationGeneralizedIcp path, which
    calls Open3D's GICP.)  M_i = (Cr_i + Cs_i)^-1 weighting of residuals.
    """
    delta = src_xyz - ref_xyz
    M = ref_cov + src_cov  # [N,3,3]
    # Invert batched 3x3 with Tikhonov guard.
    M = M + 1e-6 * jnp.eye(3, dtype=M.dtype)
    Minv = jnp.linalg.inv(M)
    # Jacobian of residual wrt twist: J_i = [ -[p]_x | I ] (3x6).
    px = se3.skew(src_xyz)  # [N,3,3]
    J = jnp.concatenate([-px, jnp.broadcast_to(jnp.eye(3, dtype=src_xyz.dtype), px.shape)], axis=-1)
    WJ = Minv @ J  # [N,3,6]
    A = jnp.einsum("nij,nik,n->jk", J, WJ, weights)
    b = -jnp.einsum("nij,ni,n->j", WJ, delta, weights)
    xi = solve_6x6(A, b, damping)
    wsum = jnp.maximum(jnp.sum(weights), 1e-6)
    mean_sq = jnp.einsum("ni,nij,nj,n->", delta, Minv, delta, weights) / wsum
    return xi, mean_sq
