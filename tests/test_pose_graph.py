import numpy as np
import jax
import jax.numpy as jnp

from open3d_slam_advanced_rss_2024_public_tpu.models.pose_graph import (
    Constraint, OptimizationProblem)
from open3d_slam_advanced_rss_2024_public_tpu.utils import se3


def pose(x=0.0, y=0.0, yaw=0.0):
    T = np.asarray(se3.make_transform(
        se3.so3_exp(jnp.asarray([0.0, 0.0, yaw], jnp.float32)),
        jnp.asarray([x, y, 0.0], jnp.float32)))
    return np.asarray(T, dtype=np.float32)


def rel(a, b):
    return (np.linalg.inv(a.astype(np.float64)) @ b.astype(np.float64)).astype(np.float32)


def test_chain_with_drift_and_loop_closure():
    """5 nodes around a square; odometry accumulates yaw drift; one loop
    closure to the start fixes it."""
    # Ground truth: nodes at corners of a square.
    gt = [pose(0, 0, 0), pose(5, 0, np.pi / 2), pose(5, 5, np.pi),
          pose(0, 5, -np.pi / 2), pose(0, 0.5, 0)]
    # Drifted initial estimates: each odometry edge slightly wrong.
    drift = pose(0.15, 0.05, 0.03)
    est = [gt[0]]
    meas = []
    for i in range(1, len(gt)):
        T_meas = rel(gt[i - 1], gt[i]) @ drift
        meas.append(T_meas)
        est.append((est[-1] @ T_meas).astype(np.float32))

    prob = OptimizationProblem(max_nodes=8, max_edges=16)
    prob.insert_odometry_constraints([
        Constraint(i, i + 1, meas[i], np.eye(6, dtype=np.float32) * 100.0, True)
        for i in range(4)
    ])
    # Loop closure: node 4 -> node 0 with the true relative pose.
    prob.insert_loop_closure_constraints([
        Constraint(4, 0, rel(gt[4], gt[0]), np.eye(6, dtype=np.float32) * 100.0, False)
    ])
    incs = prob.solve(est, max_iterations=40)
    optimized = [incs[i] @ est[i] for i in range(5)]
    # The loop must close: the relative pose between end and start must match
    # the loop-closure measurement much better than before optimization.
    T_lc = rel(gt[4], gt[0])
    gap_before = np.linalg.norm((rel(est[4], est[0]) - T_lc)[:3, 3])
    gap_after = np.linalg.norm((rel(optimized[4], optimized[0]) - T_lc)[:3, 3])
    assert gap_after < 0.35 * gap_before, f"{gap_after} vs {gap_before}"
    # And absolute error at the end node must improve (error gets distributed
    # around the loop, so full recovery is not expected with equal weights).
    err_before = np.linalg.norm(est[4][:3, 3] - gt[4][:3, 3])
    err_after = np.linalg.norm(optimized[4][:3, 3] - gt[4][:3, 3])
    assert err_after < err_before + 1e-3
    # Reference node pinned.
    np.testing.assert_allclose(optimized[0], est[0], atol=1e-4)


def test_outlier_loop_closure_gets_switched_off():
    gt = [pose(i * 2.0, 0, 0) for i in range(5)]
    meas = [rel(gt[i], gt[i + 1]) for i in range(4)]
    prob = OptimizationProblem(max_nodes=8, max_edges=16)
    prob.insert_odometry_constraints([
        Constraint(i, i + 1, meas[i], np.eye(6, dtype=np.float32) * 100.0, True)
        for i in range(4)
    ])
    # A wildly wrong loop closure.
    prob.insert_loop_closure_constraints([
        Constraint(4, 0, pose(3.0, 7.0, 1.5), np.eye(6, dtype=np.float32) * 100.0, False)
    ])
    incs = prob.solve(list(gt), loop_closure_preference=2.0, max_iterations=40)
    # The bogus edge must be down-weighted (switch -> ~0) and the chain must
    # stay near ground truth.
    pruned = prob.pruned_loop_closures(edge_prune_threshold=0.2)
    assert pruned == [0]
    optimized = [incs[i] @ gt[i] for i in range(5)]
    for i in range(5):
        assert np.linalg.norm(optimized[i][:3, 3] - gt[i][:3, 3]) < 0.3


def test_no_constraints_identity():
    prob = OptimizationProblem(max_nodes=4, max_edges=8)
    poses = [pose(0, 0, 0), pose(1, 0, 0)]
    prob.insert_odometry_constraints([
        Constraint(0, 1, rel(poses[0], poses[1]), np.eye(6, dtype=np.float32), True)])
    incs = prob.solve(poses, max_iterations=10)
    for i in range(2):
        np.testing.assert_allclose(incs[i], np.eye(4), atol=1e-3)


def test_serialization_roundtrip():
    prob = OptimizationProblem(max_nodes=4, max_edges=8)
    prob.insert_odometry_constraints([
        Constraint(0, 1, pose(1, 0, 0), np.eye(6, dtype=np.float32) * 5.0, True)])
    prob.insert_loop_closure_constraints([
        Constraint(1, 0, pose(-1, 0, 0), np.eye(6, dtype=np.float32), False)])
    d = prob.to_dict()
    restored = OptimizationProblem.from_dict(d, max_nodes=4, max_edges=8)
    assert len(restored.odometry_constraints) == 1
    assert len(restored.loop_closure_constraints) == 1
    np.testing.assert_allclose(restored.odometry_constraints[0].T_source_target,
                               prob.odometry_constraints[0].T_source_target)


def test_scales_to_512_nodes():
    """Analytic block assembly handles a 512-node loop without ever
    materializing a [6E,6N] Jacobian (the old jacfwd path would build a
    3072x3072-per-edge-row dense matrix and OOM-or-crawl here)."""
    rng = np.random.default_rng(0)
    n = 512
    # Circle trajectory with noisy odometry and a handful of loop closures.
    gt = [pose(50 * np.cos(2 * np.pi * i / n), 50 * np.sin(2 * np.pi * i / n),
               2 * np.pi * i / n) for i in range(n)]
    est = [gt[0]]
    meas = []
    for i in range(1, n):
        noise = pose(*(rng.normal(0, 0.02, 2)), rng.normal(0, 0.002))
        T_meas = rel(gt[i - 1], gt[i]) @ noise
        meas.append(T_meas)
        est.append((est[-1] @ T_meas).astype(np.float32))

    prob = OptimizationProblem(max_nodes=512, max_edges=600)
    prob.insert_odometry_constraints([
        Constraint(i, i + 1, meas[i], np.eye(6, dtype=np.float32) * 100.0, True)
        for i in range(n - 1)
    ])
    prob.insert_loop_closure_constraints([
        Constraint(i, 0, rel(gt[i], gt[0]), np.eye(6, dtype=np.float32) * 100.0, False)
        for i in (n // 4, n // 2, 3 * n // 4, n - 1)
    ])
    incs = prob.solve(est, max_iterations=15)
    optimized = [incs[i] @ est[i] for i in range(n)]
    err_before = np.linalg.norm(est[n - 1][:3, 3] - gt[n - 1][:3, 3])
    err_after = np.linalg.norm(optimized[n - 1][:3, 3] - gt[n - 1][:3, 3])
    assert err_after < 0.5 * err_before, f"{err_after} vs {err_before}"
