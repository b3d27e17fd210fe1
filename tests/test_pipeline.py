"""Direct tests for the fused production hot path (models/pipeline.py):
mapper_step (the ONE program bench.py measures and Mapper runs) and
run_sequence (the lax.scan zero-dispatch driver).

≙ reference Mapper::addRangeMeasurement (Mapper.cpp:168-505) — the
reference has no unit test at this layer; the protocol here mirrors the
synthetic-sequence regressions of test_mapper_slam.py.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from open3d_slam_advanced_rss_2024_public_tpu.frontends import synthetic
from open3d_slam_advanced_rss_2024_public_tpu.models import pipeline
from open3d_slam_advanced_rss_2024_public_tpu.ops.registration import ICPConfig


CFG = pipeline.PipelineConfig(
    icp=ICPConfig(max_iterations=12, matcher="bruteforce",
                  max_correspondence_dist=0.6),
    scan_voxel_size=0.15, scan_capacity=2048,
    crop_min_radius=0.5, crop_max_radius=20.0,
    map_patch_capacity=8192, map_voxel_size=0.1,
    min_refinement_fitness=0.3)


@pytest.fixture(scope="module")
def scene():
    world = synthetic.corridor_world(jax.random.PRNGKey(11), length=30.0)
    n = 12
    gt = synthetic.straight_trajectory(n, step=0.35)
    keys = jax.random.split(jax.random.PRNGKey(5), n)
    scans = [synthetic.render_scan(world, gt[i], keys[i], n_points=2048,
                                   noise=0.003) for i in range(n)]
    return gt, scans


def _deltas(gt):
    return [np.eye(4, dtype=np.float32)] + [
        (np.linalg.inv(gt[i - 1]) @ gt[i]).astype(np.float32)
        for i in range(1, len(gt))]


def test_mapper_step_tracks_trajectory(scene):
    gt, scans = scene
    deltas = _deltas(gt)
    # Drifting initial guesses: a small constant per-step error the ICP
    # must correct away against the accumulated map.
    drift = np.eye(4, dtype=np.float32)
    drift[:3, 3] = [0.02, -0.015, 0.0]
    state = pipeline.init_state(1 << 14, jnp.asarray(gt[0]))
    poses = []
    for i, scan in enumerate(scans):
        est = jnp.asarray(np.asarray(state.pose) @ deltas[i] @ drift)
        state, out = pipeline.mapper_step(state, scan, est, CFG)
        poses.append(np.asarray(state.pose))
    err = [np.linalg.norm(p[:3, 3] - g[:3, 3]) for p, g in zip(poses, gt)]
    assert max(err[1:]) < 0.08, f"per-scan pose err {err}"
    assert int(state.map.count()) > 1000
    # The fused step reports a real fitness on a converged scan.
    assert float(out.res.match_ratio) > 0.5


def test_mapper_step_first_scan_trusts_estimate(scene):
    gt, scans = scene
    state = pipeline.init_state(1 << 14, jnp.asarray(gt[0]))
    est = jnp.asarray(gt[0])
    state, out = pipeline.mapper_step(state, scans[0], est, CFG)
    # Empty map: the estimate passes through untouched and insertion runs.
    np.testing.assert_allclose(np.asarray(state.pose), gt[0], atol=1e-6)
    assert bool(out.inserted)
    assert int(state.map.count()) > 200


def test_mapper_step_insert_enable_gate(scene):
    gt, scans = scene
    state = pipeline.init_state(1 << 14, jnp.asarray(gt[0]))
    state, _ = pipeline.mapper_step(state, scans[0], jnp.asarray(gt[0]), CFG)
    n0 = int(state.map.count())
    # Merge suppression (localization mode): pose still refines, map frozen.
    state, out = pipeline.mapper_step(state, scans[1], jnp.asarray(gt[1]), CFG,
                                      insert_enable=False)
    assert not bool(out.inserted)
    assert int(state.map.count()) == n0
    # Re-enabled: the map grows again.
    state, out = pipeline.mapper_step(state, scans[2], jnp.asarray(gt[2]), CFG)
    assert bool(out.inserted)
    assert int(state.map.count()) > n0


def test_mapper_step_min_motion_gate(scene):
    gt, scans = scene
    import dataclasses

    cfg = dataclasses.replace(CFG, min_movement_between_steps=0.5)
    state = pipeline.init_state(1 << 14, jnp.asarray(gt[0]))
    state, out = pipeline.mapper_step(state, scans[0], jnp.asarray(gt[0]), cfg)
    assert bool(out.inserted)  # empty map always inserts
    n0 = int(state.map.count())
    # Same pose again: under the 0.5 m min-motion threshold -> gated.
    state, out = pipeline.mapper_step(state, scans[1], jnp.asarray(gt[1]), cfg)
    assert not bool(out.inserted)
    assert int(state.map.count()) == n0


def test_run_sequence_matches_per_scan_driver(scene):
    gt, scans = scene
    deltas = jnp.asarray(np.stack(_deltas(gt)))
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *scans)

    # Per-scan host driver.
    state_a = pipeline.init_state(1 << 14, jnp.asarray(gt[0]))
    poses_a = []
    for i in range(len(scans)):
        est = state_a.pose @ deltas[i]
        state_a, _ = pipeline.mapper_step(state_a, scans[i], est, CFG)
        poses_a.append(np.asarray(state_a.pose))

    # lax.scan driver over the identical inputs.
    state_b = pipeline.init_state(1 << 14, jnp.asarray(gt[0]))
    state_b, poses_b = pipeline.run_sequence(state_b, stacked, deltas, CFG)

    # Same math, different compiled programs (scan body vs standalone jit):
    # XLA reassociates float reductions differently, and the difference
    # compounds over the sequence — allow millimeters, not bitwise.
    np.testing.assert_allclose(np.stack(poses_a), np.asarray(poses_b),
                               atol=5e-3)
    na, nb = int(state_a.map.count()), int(state_b.map.count())
    assert abs(na - nb) <= 0.01 * na, (na, nb)
