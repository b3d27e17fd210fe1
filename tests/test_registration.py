import jax
import jax.numpy as jnp
import numpy as np
import pytest

from open3d_slam_advanced_rss_2024_public_tpu.ops import generators, hashgrid, normals
from open3d_slam_advanced_rss_2024_public_tpu.ops.registration import (
    ICPConfig, register, register_clouds, minimizers, outliers,
)
from open3d_slam_advanced_rss_2024_public_tpu.utils import se3


def make_scene(key, n=4000):
    """Structured scene with geometry in all directions (well-conditioned)."""
    k1, k2, k3 = jax.random.split(key, 3)
    room = generators.lidar_room_scan(k1, n=n, room=(8.0, 6.0, 3.0))
    return room


def pose(rot, trans):
    return se3.make_transform(se3.so3_exp(jnp.asarray(rot, jnp.float32)),
                              jnp.asarray(trans, jnp.float32))


def rot_trans_error(T_est, T_true):
    dT = se3.compose(se3.inverse(T_est), T_true)
    return float(se3.rotation_angle(dT)), float(se3.translation_norm(dT))


def test_point_to_plane_step_exact_on_small_motion():
    key = jax.random.PRNGKey(0)
    ref = make_scene(key)
    T_true = pose([0.01, -0.02, 0.015], [0.05, -0.03, 0.02])
    src_xyz = se3.apply(se3.inverse(T_true), ref.xyz)
    w = ref.mask.astype(jnp.float32)
    xi, _ = minimizers.point_to_plane_step(src_xyz, ref.xyz, ref.normals, w)
    T_est = se3.se3_exp(xi)
    r_err, t_err = rot_trans_error(T_est, T_true)
    assert r_err < 2e-3 and t_err < 2e-3


def test_umeyama_exact():
    key = jax.random.PRNGKey(1)
    pts = jax.random.normal(key, (500, 3))
    T_true = pose([0.3, -0.5, 0.8], [1.0, -2.0, 0.5])
    src = se3.apply(se3.inverse(T_true), pts)
    T_est, scale = minimizers.point_to_point_umeyama(src, pts, jnp.ones(500))
    r_err, t_err = rot_trans_error(T_est, T_true)
    assert r_err < 2e-3 and t_err < 2e-3
    assert abs(float(scale) - 1.0) < 1e-4


def test_trimmed_weights_ratio():
    d2 = jnp.arange(100, dtype=jnp.float32)
    valid = jnp.ones(100, bool)
    w = outliers.trimmed_dist_weights(d2, valid, 0.9)
    assert 89 <= int(w.sum()) <= 91
    # Worst matches rejected.
    assert float(w[-1]) == 0.0 and float(w[0]) == 1.0


def test_icp_recovers_perturbation():
    key = jax.random.PRNGKey(2)
    ref = make_scene(key, n=4000)
    T_true = pose([0.02, 0.03, -0.05], [0.2, -0.15, 0.1])
    src = ref.transform(se3.inverse(T_true))
    cfg = ICPConfig(max_iterations=20)
    res = register_clouds(src, ref, jnp.eye(4), cfg)
    r_err, t_err = rot_trans_error(res.transform, T_true)
    assert r_err < 0.005, f"rot err {r_err}"
    assert t_err < 0.01, f"trans err {t_err}"
    assert float(res.match_ratio) > 0.8


def test_icp_with_noise_and_partial_overlap():
    key = jax.random.PRNGKey(3)
    ref = make_scene(key, n=6000)
    src_full = make_scene(jax.random.PRNGKey(4), n=4000)
    src_noisy = generators.add_noise(jax.random.PRNGKey(5), src_full, 0.01)
    T_true = pose([0.0, 0.0, 0.04], [0.15, 0.1, 0.0])
    src = src_noisy.transform(se3.inverse(T_true))
    cfg = ICPConfig(max_iterations=30)
    res = register_clouds(src, ref, jnp.eye(4), cfg)
    r_err, t_err = rot_trans_error(res.transform, T_true)
    assert r_err < 0.02 and t_err < 0.05


def test_icp_identity_stays_identity():
    key = jax.random.PRNGKey(6)
    ref = make_scene(key, n=3000)
    res = register_clouds(ref, ref, jnp.eye(4), ICPConfig())
    r_err, t_err = rot_trans_error(res.transform, jnp.eye(4))
    assert r_err < 1e-3 and t_err < 1e-3
    assert int(res.iterations) <= 5


def test_icp_point_to_point_mode():
    key = jax.random.PRNGKey(7)
    ref = make_scene(key, n=3000)
    T_true = pose([0.0, 0.0, 0.03], [0.1, 0.05, 0.0])
    src = ref.transform(se3.inverse(T_true))
    cfg = ICPConfig(minimizer="point_to_point", max_iterations=30, use_normal_gate=False)
    res = register_clouds(src, ref, jnp.eye(4), cfg)
    r_err, t_err = rot_trans_error(res.transform, T_true)
    assert r_err < 0.01 and t_err < 0.02


def test_icp_gicp_mode():
    key = jax.random.PRNGKey(9)
    ref = make_scene(key, n=3000)
    T_true = pose([0.0, 0.0, 0.03], [0.1, 0.05, 0.0])
    src = ref.transform(se3.inverse(T_true))
    cfg = ICPConfig(minimizer="gicp", max_iterations=30, use_normal_gate=False)
    res = register_clouds(src, ref, jnp.eye(4), cfg)
    r_err, t_err = rot_trans_error(res.transform, T_true)
    assert r_err < 0.01 and t_err < 0.02


def test_icp_converged_flag_and_counter():
    key = jax.random.PRNGKey(8)
    ref = make_scene(key, n=2000)
    res = register_clouds(ref, ref, jnp.eye(4), ICPConfig(max_iterations=15))
    assert bool(res.converged)
    assert int(res.iterations) < 15


def test_radix_select_matches_sort():
    """ADVICE r4: the TPU radix-select quantile (_kth_smallest_nonneg) must
    stay bit-exact vs jnp.sort on EVERY backend — production only selects
    it off-CPU, so without this test the correctness-critical path the
    trimmed/median outlier filters use every ICP iteration had zero CI
    coverage.  Covers +inf tails, exact zeros, duplicates, and batches."""
    import numpy as np

    from open3d_slam_advanced_rss_2024_public_tpu.ops.registration.outliers import (
        _kth_smallest_nonneg)

    rng = np.random.RandomState(3)
    cases = []
    d0 = rng.exponential(1.0, size=(257,)).astype(np.float32)
    d0[::7] = np.inf
    d0[3] = 0.0
    cases.append(d0)
    d1 = np.zeros((64,), np.float32)  # all zeros
    cases.append(d1)
    d2 = np.full((33,), np.inf, np.float32)  # all inf
    d2[5] = 0.25
    cases.append(d2)
    d3 = np.repeat(rng.rand(16).astype(np.float32), 8)  # heavy duplicates
    cases.append(d3)
    for d in cases:
        for k in (0, 1, len(d) // 2, len(d) - 1):
            got = np.asarray(_kth_smallest_nonneg(jnp.asarray(d),
                                                  jnp.int32(k)))
            want = np.sort(d)[k]
            assert got.tobytes() == np.float32(want).tobytes(), (
                f"radix select diverged at k={k}: {got} vs {want}")
    # Batched leading axis.
    db = rng.exponential(1.0, size=(4, 128)).astype(np.float32)
    db[:, ::11] = np.inf
    ks = jnp.asarray([0, 5, 64, 127], jnp.int32)
    got = np.asarray(_kth_smallest_nonneg(jnp.asarray(db), ks))
    want = np.sort(db, axis=-1)[np.arange(4), np.asarray(ks)]
    assert got.tobytes() == want.astype(np.float32).tobytes()
