"""SE(3) / SO(3) utilities — batched, jit-friendly, float32-first.

TPU-native replacement for the reference's Eigen Isometry3d plumbing
(reference: open3d_slam_rsl/open3d_slam/open3d_slam/src/Transform.cpp:16-118 —
interpolation/extrapolation; src/math.cpp — RPY/quaternion conversions).

All transforms are represented as 4x4 homogeneous matrices (float32 by
default).  Rotations internally pass through quaternions (w,x,y,z order) for
interpolation, and through the exponential map for solver updates.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array

_EPS = 1e-9


def identity(dtype=jnp.float32) -> Array:
    return jnp.eye(4, dtype=dtype)


def make_transform(R: Array, t: Array) -> Array:
    """Assemble a 4x4 transform from a 3x3 rotation and 3-translation."""
    T = jnp.zeros(R.shape[:-2] + (4, 4), dtype=R.dtype)
    T = T.at[..., :3, :3].set(R)
    T = T.at[..., :3, 3].set(t)
    T = T.at[..., 3, 3].set(1.0)
    return T


def rotation(T: Array) -> Array:
    return T[..., :3, :3]


def translation(T: Array) -> Array:
    return T[..., :3, 3]


def inverse(T: Array) -> Array:
    R = rotation(T)
    t = translation(T)
    Rt = jnp.swapaxes(R, -1, -2)
    return make_transform(Rt, -jnp.einsum("...ij,...j->...i", Rt, t))


def compose(A: Array, B: Array) -> Array:
    return A @ B


def apply(T: Array, pts: Array) -> Array:
    """Apply SE(3) to points [..., N, 3]."""
    return pts @ jnp.swapaxes(rotation(T), -1, -2) + translation(T)[..., None, :]


def rotate(T: Array, vecs: Array) -> Array:
    """Apply only the rotation part (for normals / directions)."""
    return vecs @ jnp.swapaxes(rotation(T), -1, -2)


# ---------------------------------------------------------------------------
# so(3) / SO(3)
# ---------------------------------------------------------------------------

def skew(w: Array) -> Array:
    """[..., 3] -> [..., 3, 3] cross-product matrix."""
    zeros = jnp.zeros_like(w[..., 0])
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    return jnp.stack(
        [
            jnp.stack([zeros, -wz, wy], axis=-1),
            jnp.stack([wz, zeros, -wx], axis=-1),
            jnp.stack([-wy, wx, zeros], axis=-1),
        ],
        axis=-2,
    )


def so3_exp(w: Array) -> Array:
    """Rodrigues formula, stable near zero angle."""
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(theta2 + _EPS)
    # Taylor-safe coefficients.
    small = theta2 < 1e-3
    A = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    B = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    W = skew(w)
    I = jnp.eye(3, dtype=w.dtype)
    return I + A[..., None, None] * W + B[..., None, None] * (W @ W)


def so3_log(R: Array) -> Array:
    """Rotation matrix -> axis-angle vector (theta * unit_axis).

    AD-safe: arccos has infinite slope at cos(theta)=±1, so the small-angle
    region uses a series in (1-cos) with the unsafe branch's inputs masked
    (double-where trick) — pose-graph Jacobians through this function must
    not produce NaNs at zero-residual edges.
    """
    trace = jnp.trace(R, axis1=-2, axis2=-1)
    c = jnp.clip((trace - 1.0) / 2.0, -1.0, 1.0)
    small = c > 1.0 - 1e-5  # theta < ~4.5e-3
    c_safe = jnp.where(small, 0.0, c)  # masked input => finite branch grads
    theta = jnp.arccos(c_safe)
    # Vector part of the skew-symmetric component.
    v = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )
    sin_theta = jnp.sqrt(jnp.maximum(1.0 - c_safe * c_safe, 1e-12))
    # Near zero: theta^2 ~= 2(1-c); scale = 1/2 + theta^2/12 = 1/2 + (1-c)/6.
    scale_series = 0.5 + (1.0 - c) / 6.0 + (1.0 - c) ** 2 * (7.0 / 90.0)
    scale_exact = theta / (2.0 * sin_theta)
    scale = jnp.where(small, scale_series, scale_exact)
    theta = jnp.where(small, jnp.sqrt(jnp.maximum(2.0 * (1.0 - c), 0.0)), theta)
    w = scale[..., None] * v
    # Near pi the vector part degenerates; use diagonal extraction.
    near_pi = theta > (jnp.pi - 1e-3)
    axis_sq = jnp.clip((jnp.diagonal(R, axis1=-2, axis2=-1) + 1.0) / 2.0, 0.0, 1.0)
    axis = jnp.sqrt(axis_sq)
    # Fix signs from off-diagonal terms (pick the dominant axis as positive).
    sign_ref = jnp.stack(
        [
            jnp.ones_like(theta),
            jnp.sign(R[..., 0, 1] + R[..., 1, 0] + _EPS),
            jnp.sign(R[..., 0, 2] + R[..., 2, 0] + _EPS),
        ],
        axis=-1,
    )
    axis = axis * sign_ref
    axis = axis / (jnp.linalg.norm(axis, axis=-1, keepdims=True) + _EPS)
    w_pi = axis * theta[..., None]
    return jnp.where(near_pi[..., None], w_pi, w)


# ---------------------------------------------------------------------------
# se(3) / SE(3)
# ---------------------------------------------------------------------------

def se3_exp(xi: Array) -> Array:
    """Twist [..., 6] = (omega, v) -> 4x4 transform."""
    w = xi[..., :3]
    v = xi[..., 3:]
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(theta2 + _EPS)
    small = theta2 < 1e-3
    A = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    B = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    C = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0, (1.0 - A) / theta2)
    W = skew(w)
    W2 = W @ W
    I = jnp.eye(3, dtype=xi.dtype)
    R = I + A[..., None, None] * W + B[..., None, None] * W2
    V = I + B[..., None, None] * W + C[..., None, None] * W2
    t = jnp.einsum("...ij,...j->...i", V, v)
    return make_transform(R, t)


def se3_log(T: Array) -> Array:
    w = so3_log(rotation(T))
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(theta2 + _EPS)
    small = theta2 < 1e-3
    A = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    B = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    W = skew(w)
    W2 = W @ W
    I = jnp.eye(3, dtype=T.dtype)
    # V^{-1} = I - W/2 + (1/theta2)(1 - A/(2B)) W^2
    coef = jnp.where(small, 1.0 / 12.0, (1.0 - A / (2.0 * B)) / jnp.where(small, 1.0, theta2))
    Vinv = I - 0.5 * W + coef[..., None, None] * W2
    v = jnp.einsum("...ij,...j->...i", Vinv, translation(T))
    return jnp.concatenate([w, v], axis=-1)


def adjoint(T: Array) -> Array:
    """Adjoint Ad_T [..., 6, 6] for twists ordered (omega, v):

        Ad_T (omega, v) = (R omega, [t]x R omega + R v)
        Ad = [[R, 0], [[t]x R, R]].
    """
    R = rotation(T)
    t = translation(T)
    tR = skew(t) @ R
    Z = jnp.zeros_like(R)
    top = jnp.concatenate([R, Z], axis=-1)
    bottom = jnp.concatenate([tR, R], axis=-1)
    return jnp.concatenate([top, bottom], axis=-2)


def ad(xi: Array) -> Array:
    """Algebra adjoint ad_xi [..., 6, 6] for twists (omega, v):
    ad = [[ŵ, 0], [v̂, ŵ]]."""
    W = skew(xi[..., :3])
    V = skew(xi[..., 3:])
    Z = jnp.zeros_like(W)
    top = jnp.concatenate([W, Z], axis=-1)
    bottom = jnp.concatenate([V, W], axis=-1)
    return jnp.concatenate([top, bottom], axis=-2)


def log_right_jacobian_inv(r: Array) -> Array:
    """Inverse right Jacobian of the SE(3) log at twist r [..., 6]:
    d/dxi log(exp(r̂) exp(xî))|_0 = Jr^{-1}(r).

    Series form Jr^{-1} = I + 1/2 ad(r) + 1/12 ad(r)^2, exact to O(|r|^3) —
    residuals near a pose-graph optimum are small, so this matches the
    autodiff Jacobian to high order while costing two 6x6 matmuls.
    """
    a = ad(r)
    I6 = jnp.eye(6, dtype=r.dtype)
    return I6 + 0.5 * a + (1.0 / 12.0) * (a @ a)


# ---------------------------------------------------------------------------
# Quaternions (w, x, y, z)
# ---------------------------------------------------------------------------

def quat_from_matrix(R: Array) -> Array:
    """Rotation matrix -> quaternion (w,x,y,z), branch-free (Shepperd)."""
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    def mk(w, x, y, z):
        return jnp.stack([w, x, y, z], axis=-1)

    q0 = mk(1.0 + tr, m21 - m12, m02 - m20, m10 - m01)
    q1 = mk(m21 - m12, 1.0 + m00 - m11 - m22, m01 + m10, m02 + m20)
    q2 = mk(m02 - m20, m01 + m10, 1.0 + m11 - m00 - m22, m12 + m21)
    q3 = mk(m10 - m01, m02 + m20, m12 + m21, 1.0 + m22 - m00 - m11)

    # Pick the most numerically stable branch per-element.
    cases = jnp.stack([q0, q1, q2, q3], axis=-2)  # [..., 4 cases, 4]
    mags = jnp.stack([1.0 + tr, 1.0 + m00 - m11 - m22, 1.0 + m11 - m00 - m22, 1.0 + m22 - m00 - m11], axis=-1)
    best = jnp.argmax(mags, axis=-1)
    q = jnp.take_along_axis(cases, best[..., None, None].repeat(4, axis=-1), axis=-2)[..., 0, :]
    q = q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + _EPS)
    # Canonical sign: w >= 0.
    return q * jnp.where(q[..., :1] < 0, -1.0, 1.0)


def quat_to_matrix(q: Array) -> Array:
    q = q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + _EPS)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], axis=-1),
            jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], axis=-1),
            jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], axis=-1),
        ],
        axis=-2,
    )


def quat_slerp(q0: Array, q1: Array, alpha: Array) -> Array:
    """Spherical interpolation, shortest arc, safe for nearly-equal quats."""
    dot = jnp.sum(q0 * q1, axis=-1, keepdims=True)
    q1 = jnp.where(dot < 0, -q1, q1)
    dot = jnp.abs(dot)
    dot = jnp.clip(dot, -1.0, 1.0)
    theta = jnp.arccos(dot)
    sin_theta = jnp.sin(theta)
    small = sin_theta < 1e-5
    w0 = jnp.where(small, 1.0 - alpha, jnp.sin((1.0 - alpha) * theta) / jnp.where(small, 1.0, sin_theta))
    w1 = jnp.where(small, alpha, jnp.sin(alpha * theta) / jnp.where(small, 1.0, sin_theta))
    q = w0 * q0 + w1 * q1
    return q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + _EPS)


def interpolate(T0: Array, T1: Array, alpha: Array) -> Array:
    """Pose interpolation: slerp rotation + lerp translation.

    Mirrors the reference's interpolation semantics
    (reference Transform.cpp:16-60) but batched and jit-compatible.
    """
    q0 = quat_from_matrix(rotation(T0))
    q1 = quat_from_matrix(rotation(T1))
    alpha = jnp.asarray(alpha, dtype=T0.dtype)
    q = quat_slerp(q0, q1, alpha[..., None] if alpha.ndim < q0.ndim - 1 else alpha)
    t = (1.0 - alpha)[..., None] * translation(T0) + alpha[..., None] * translation(T1) \
        if alpha.ndim >= 1 else (1.0 - alpha) * translation(T0) + alpha * translation(T1)
    return make_transform(quat_to_matrix(q), t)


def extrapolate(T0: Array, T1: Array, alpha: Array) -> Array:
    """Extrapolate past T1 by continuing the relative motion T0->T1.

    alpha=0 -> T0, alpha=1 -> T1, alpha=2 -> T1 * (T0^-1 T1) etc.
    (reference Transform.cpp:62-118 — two-point extrapolation used by
    TransformInterpolationBuffer::getTransform for future queries).
    """
    delta = se3_log(compose(inverse(T0), T1))
    return compose(T0, se3_exp(alpha * delta))


def orthonormalize(T: Array) -> Array:
    """Re-project the rotation block onto SO(3) via SVD (accumulation drift fix).

    Analogue of libpointmatcher RigidTransformation::correctParameters
    (reference TransformationsImpl.cpp).
    """
    R = rotation(T)
    U, _, Vt = jnp.linalg.svd(R)
    det = jnp.linalg.det(U @ Vt)
    S = jnp.ones(R.shape[:-2] + (3,), dtype=T.dtype).at[..., -1].set(det)
    Rn = (U * S[..., None, :]) @ Vt
    return make_transform(Rn, translation(T))


def rpy_to_matrix(rpy: Array) -> Array:
    """Roll-pitch-yaw (XYZ extrinsic = ZYX intrinsic) to rotation matrix."""
    r, p, y = rpy[..., 0], rpy[..., 1], rpy[..., 2]
    cr, sr = jnp.cos(r), jnp.sin(r)
    cp, sp = jnp.cos(p), jnp.sin(p)
    cy, sy = jnp.cos(y), jnp.sin(y)
    return jnp.stack(
        [
            jnp.stack([cy * cp, cy * sp * sr - sy * cr, cy * sp * cr + sy * sr], axis=-1),
            jnp.stack([sy * cp, sy * sp * sr + cy * cr, sy * sp * cr - cy * sr], axis=-1),
            jnp.stack([-sp, cp * sr, cp * cr], axis=-1),
        ],
        axis=-2,
    )


def matrix_to_rpy(R: Array) -> Array:
    sp = -R[..., 2, 0]
    sp = jnp.clip(sp, -1.0, 1.0)
    p = jnp.arcsin(sp)
    r = jnp.arctan2(R[..., 2, 1], R[..., 2, 2])
    y = jnp.arctan2(R[..., 1, 0], R[..., 0, 0])
    return jnp.stack([r, p, y], axis=-1)


def rotation_angle(T: Array) -> Array:
    """Geodesic rotation angle of the transform (radians)."""
    trace = jnp.trace(rotation(T), axis1=-2, axis2=-1)
    return jnp.arccos(jnp.clip((trace - 1.0) / 2.0, -1.0, 1.0))


def translation_norm(T: Array) -> Array:
    return jnp.linalg.norm(translation(T), axis=-1)
