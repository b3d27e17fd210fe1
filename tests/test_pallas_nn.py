"""Pallas NN kernel correctness (interpret mode on CPU)."""
import numpy as np
import jax
import jax.numpy as jnp

from open3d_slam_advanced_rss_2024_public_tpu.ops.pallas_nn import nn_pallas


def brute(q, p):
    d = np.linalg.norm(np.asarray(q)[:, None, :] - np.asarray(p)[None, :, :], axis=-1)
    return d.argmin(1), d.min(1) ** 2


def test_nn_pallas_matches_bruteforce():
    q = jax.random.uniform(jax.random.PRNGKey(0), (700, 3)) * 30
    p = jax.random.uniform(jax.random.PRNGKey(1), (5000, 3)) * 30
    idx, d2 = nn_pallas(q, p, interpret=True)
    bf_idx, bf_d2 = brute(q, p)
    assert (np.asarray(idx) == bf_idx).mean() > 0.995
    np.testing.assert_allclose(np.asarray(d2), bf_d2, atol=1e-2)


def test_nn_pallas_self_match():
    p = jax.random.uniform(jax.random.PRNGKey(2), (300, 3)) * 10
    idx, d2 = nn_pallas(p, p, interpret=True)
    assert (np.asarray(idx) == np.arange(300)).mean() > 0.99
    assert float(jnp.max(d2)) < 1e-3


def test_nn_pallas_nonmultiple_shapes():
    # Shapes not divisible by the tile sizes must pad correctly.
    q = jax.random.uniform(jax.random.PRNGKey(3), (131, 3)) * 5
    p = jax.random.uniform(jax.random.PRNGKey(4), (777, 3)) * 5
    idx, d2 = nn_pallas(q, p, interpret=True)
    bf_idx, bf_d2 = brute(q, p)
    assert (np.asarray(idx) == bf_idx).mean() > 0.99
    # Indices always in range despite ref padding.
    assert np.asarray(idx).max() < 777
