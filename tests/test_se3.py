import jax
import jax.numpy as jnp
import numpy as np
import pytest

from open3d_slam_advanced_rss_2024_public_tpu.utils import se3


def random_pose(key, rot_scale=1.0, trans_scale=1.0):
    k1, k2 = jax.random.split(key)
    w = rot_scale * jax.random.normal(k1, (3,))
    t = trans_scale * jax.random.normal(k2, (3,))
    return se3.compose(se3.make_transform(se3.so3_exp(w), t), jnp.eye(4))


def test_so3_exp_log_roundtrip():
    keys = jax.random.split(jax.random.PRNGKey(0), 32)
    for k in keys[:8]:
        w = jax.random.normal(k, (3,)) * 0.8
        R = se3.so3_exp(w)
        w2 = se3.so3_log(R)
        np.testing.assert_allclose(np.asarray(w), np.asarray(w2), atol=2e-3)


def test_so3_orthonormal():
    w = jnp.array([0.3, -0.2, 0.9])
    R = se3.so3_exp(w)
    np.testing.assert_allclose(np.asarray(R @ R.T), np.eye(3), atol=1e-5)
    assert abs(float(jnp.linalg.det(R)) - 1.0) < 1e-5


def test_se3_exp_log_roundtrip():
    xi = jnp.array([0.1, -0.3, 0.25, 1.0, -2.0, 0.5])
    T = se3.se3_exp(xi)
    xi2 = se3.se3_log(T)
    np.testing.assert_allclose(np.asarray(xi), np.asarray(xi2), atol=1e-4)


def test_inverse_compose():
    T = random_pose(jax.random.PRNGKey(1))
    I = se3.compose(T, se3.inverse(T))
    np.testing.assert_allclose(np.asarray(I), np.eye(4), atol=1e-5)


def test_apply_points():
    T = se3.make_transform(se3.so3_exp(jnp.array([0.0, 0.0, jnp.pi / 2])), jnp.array([1.0, 0.0, 0.0]))
    p = jnp.array([[1.0, 0.0, 0.0]])
    out = se3.apply(T, p)
    np.testing.assert_allclose(np.asarray(out), [[1.0, 1.0, 0.0]], atol=1e-5)


def test_quat_matrix_roundtrip():
    keys = jax.random.split(jax.random.PRNGKey(2), 16)
    for k in keys[:6]:
        w = jax.random.normal(k, (3,)) * 2.0
        R = se3.so3_exp(w)
        q = se3.quat_from_matrix(R)
        R2 = se3.quat_to_matrix(q)
        np.testing.assert_allclose(np.asarray(R), np.asarray(R2), atol=1e-5)


def test_interpolate_endpoints_and_midpoint():
    T0 = random_pose(jax.random.PRNGKey(3))
    T1 = random_pose(jax.random.PRNGKey(4))
    np.testing.assert_allclose(np.asarray(se3.interpolate(T0, T1, jnp.float32(0.0))), np.asarray(T0), atol=1e-5)
    np.testing.assert_allclose(np.asarray(se3.interpolate(T0, T1, jnp.float32(1.0))), np.asarray(T1), atol=1e-5)
    Tm = se3.interpolate(T0, T1, jnp.float32(0.5))
    # Midpoint translation is the mean.
    np.testing.assert_allclose(
        np.asarray(se3.translation(Tm)),
        0.5 * (np.asarray(se3.translation(T0)) + np.asarray(se3.translation(T1))),
        atol=1e-5,
    )


def test_extrapolate_constant_velocity():
    T0 = jnp.eye(4)
    T1 = se3.make_transform(jnp.eye(3), jnp.array([1.0, 0.0, 0.0]))
    T2 = se3.extrapolate(T0, T1, jnp.float32(2.0))
    np.testing.assert_allclose(np.asarray(se3.translation(T2)), [2.0, 0.0, 0.0], atol=1e-5)


def test_orthonormalize_fixes_drift():
    T = random_pose(jax.random.PRNGKey(5))
    T_drift = T.at[:3, :3].multiply(1.01)
    T_fixed = se3.orthonormalize(T_drift)
    R = np.asarray(se3.rotation(T_fixed))
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)


def test_rpy_roundtrip():
    rpy = jnp.array([0.1, -0.4, 1.2])
    R = se3.rpy_to_matrix(rpy)
    rpy2 = se3.matrix_to_rpy(R)
    np.testing.assert_allclose(np.asarray(rpy), np.asarray(rpy2), atol=1e-5)
