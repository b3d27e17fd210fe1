"""Pallas NN kernel correctness (interpret mode on CPU).

The kernel contract (round 3): exact NN for every query whose true NN is
within ``max_dist``; unspecified beyond (callers gate on d2) — mirroring
the kd-tree matcher's maxDist semantics (reference MatchersImpl.cpp:
118-133).
"""
import numpy as np
import jax
import jax.numpy as jnp

from open3d_slam_advanced_rss_2024_public_tpu.ops.pallas_nn import (
    N_MAX, TP, TQ, _admissible_lists, _tile_aabbs, nn_pallas)
from open3d_slam_advanced_rss_2024_public_tpu.ops import hashgrid
from open3d_slam_advanced_rss_2024_public_tpu.utils.pointcloud import make_cloud


def brute(q, p):
    d = np.linalg.norm(np.asarray(q)[:, None, :] - np.asarray(p)[None, :, :], axis=-1)
    return d.argmin(1), d.min(1) ** 2


def test_nn_pallas_matches_bruteforce_full_radius():
    # max_dist larger than the extent -> every tile admissible -> the MXU
    # sweep itself must match brute force.
    q = jax.random.uniform(jax.random.PRNGKey(0), (700, 3)) * 30
    p = jax.random.uniform(jax.random.PRNGKey(1), (5000, 3)) * 30
    idx, d2 = nn_pallas(q, p, max_dist=60.0, interpret=True)
    bf_idx, bf_d2 = brute(q, p)
    assert (np.asarray(idx) == bf_idx).mean() > 0.995
    np.testing.assert_allclose(np.asarray(d2), bf_d2, atol=1e-2)


def test_nn_pallas_exact_within_radius():
    # Dense cloud (NNs well inside max_dist): radius-bounded result equals
    # brute force for every in-radius query, even though far tiles are
    # skipped.
    q = jax.random.uniform(jax.random.PRNGKey(0), (600, 3)) * 8
    p = jax.random.uniform(jax.random.PRNGKey(1), (6000, 3)) * 8
    # Morton-sort both sides (the production layout).
    q = hashgrid.morton_sort(make_cloud(q), 0.5).xyz
    p = hashgrid.morton_sort(make_cloud(p), 0.5).xyz
    idx, d2 = nn_pallas(q, p, max_dist=0.5, interpret=True)
    bf_idx, bf_d2 = brute(q, p)
    within = bf_d2 <= 0.5**2
    assert within.mean() > 0.9  # the scenario actually exercises the radius
    assert (np.asarray(idx)[within] == bf_idx[within]).mean() > 0.995
    np.testing.assert_allclose(np.asarray(d2)[within], bf_d2[within], atol=1e-2)


def test_nn_pallas_self_match():
    p = jax.random.uniform(jax.random.PRNGKey(2), (300, 3)) * 10
    idx, d2 = nn_pallas(p, p, max_dist=1.0, interpret=True)
    assert (np.asarray(idx) == np.arange(300)).mean() > 0.99
    assert float(jnp.max(d2)) < 1e-3


def test_nn_pallas_nonmultiple_shapes():
    # Shapes not divisible by the tile sizes must pad correctly.
    q = jax.random.uniform(jax.random.PRNGKey(3), (131, 3)) * 5
    p = jax.random.uniform(jax.random.PRNGKey(4), (777, 3)) * 5
    idx, d2 = nn_pallas(q, p, max_dist=10.0, interpret=True)
    bf_idx, bf_d2 = brute(q, p)
    assert (np.asarray(idx) == bf_idx).mean() > 0.99
    # Indices always in range despite ref padding.
    assert np.asarray(idx).max() < 777


def test_nn_pallas_masked_lanes_keep_boxes_tight():
    # Invalid (sentinel) queries interleaved with valid ones must not blow
    # up tile AABBs or produce in-radius matches.
    q = np.random.RandomState(5).uniform(0, 6, (512, 3)).astype(np.float32)
    mask = np.arange(512) % 3 != 0
    q_sent = np.where(mask[:, None], q, 1.0e8).astype(np.float32)
    p = jax.random.uniform(jax.random.PRNGKey(6), (4096, 3)) * 6
    idx, d2 = nn_pallas(jnp.asarray(q_sent), p, max_dist=0.5, interpret=True)
    bf_idx, bf_d2 = brute(q, np.asarray(p))
    within = (bf_d2 <= 0.25) & mask
    assert (np.asarray(idx)[within] == bf_idx[within]).mean() > 0.99


def test_admissible_lists_are_sparse_for_morton_order():
    # Morton-sorted clouds: most (query-tile, ref-tile) pairs are farther
    # than max_dist, so the per-tile admissible count must be far below the
    # total tile count (this is the whole speedup).
    key = jax.random.PRNGKey(7)
    n_p = 32  # production map-patch scale: 32k refs -> 32 tiles
    p = jax.random.uniform(key, (n_p * TP, 3)) * jnp.asarray([60.0, 60.0, 6.0])
    p = hashgrid.morton_sort(make_cloud(p), 0.5).xyz
    q = p[: 4 * TQ] + 0.05
    q_t = jnp.pad(q, ((0, 0), (0, 5))).T
    p_t = jnp.pad(p, ((0, 0), (0, 5))).T
    q_min, q_max = _tile_aabbs(q_t, jnp.ones(q.shape[0], bool), 4, TQ)
    p_min, p_max = _tile_aabbs(p_t, jnp.ones(p.shape[0], bool), n_p, TP)
    _, count = _admissible_lists(q_min, q_max, p_min, p_max, 0.5)
    # Most tile pairs must be skipped (the speedup); exact threshold is
    # geometry-dependent, so assert a generous 1/3 of the full sweep.
    assert float(jnp.mean(count.astype(jnp.float32))) <= n_p / 3.0
    assert int(jnp.min(count)) >= 1  # queries drawn from refs: never empty
