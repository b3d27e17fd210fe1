"""Global registration: batched-hypothesis RANSAC over feature matches.

TPU-native equivalent of Open3D's RegistrationRANSACBasedOnFeatureMatching
as used for loop-closure proposals (reference: open3d_slam_rsl/.../src/
PlaceRecognition.cpp:79-90 — FPFH correspondences, 3-point model,
edge-length + distance correspondence checkers, max-iteration/probability
criteria, min correspondence set size).

Instead of a sequential hypothesize-and-verify loop, all ``batch``
hypotheses are drawn, solved (closed-form 3-point Umeyama) and scored in
one fused program — RANSAC as a batched reduction, which is how the trick
maps to a vector machine.  Equivalent quality at fixed compute: with
mutual-NN correspondences a few thousand hypotheses dominate Open3D's
early-exit schedule for these problem sizes.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ...utils import se3
from .. import fpfh as fpfh_ops

Array = jax.Array


def _quat_to_rot(q: Array) -> Array:
    """Unit quaternion [B,4] (w,x,y,z) -> rotation matrix [B,3,3]."""
    w, x, y, z = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    return jnp.stack([
        jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z),
                   2 * (x * z + w * y)], -1),
        jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z),
                   2 * (y * z - w * x)], -1),
        jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x),
                   1 - 2 * (x * x + y * y)], -1),
    ], axis=1)


def _kabsch_3pt(src: Array, dst: Array):
    """Closed-form rigid alignment of 3 point pairs.  src,dst: [B,3,3].

    Horn's quaternion formulation with shifted power iteration for the
    dominant eigenvector of the 4x4 profile matrix — a batched 3x3 SVD
    here cost ~30 ms for 4096 hypotheses on TPU (tiny-batched LAPACK-style
    kernels don't vectorize), while 30 power steps of [B,4,4] matvecs are
    pure VPU work.  Degenerate triplets (collinear points, tied
    eigenvalues) yield an arbitrary rotation; the distance checker and
    inlier scoring reject those hypotheses exactly as they reject bad
    SVD-based ones.
    """
    mu_s = jnp.mean(src, axis=1, keepdims=True)
    mu_d = jnp.mean(dst, axis=1, keepdims=True)
    M = jnp.einsum("bki,bkj->bij", src - mu_s, dst - mu_d)  # Σ a bᵀ
    xx, xy, xz = M[:, 0, 0], M[:, 0, 1], M[:, 0, 2]
    yx, yy, yz = M[:, 1, 0], M[:, 1, 1], M[:, 1, 2]
    zx, zy, zz = M[:, 2, 0], M[:, 2, 1], M[:, 2, 2]
    N = jnp.stack([
        jnp.stack([xx + yy + zz, yz - zy, zx - xz, xy - yx], -1),
        jnp.stack([yz - zy, xx - yy - zz, xy + yx, zx + xz], -1),
        jnp.stack([zx - xz, xy + yx, -xx + yy - zz, yz + zy], -1),
        jnp.stack([xy - yx, zx + xz, yz + zy, -xx - yy + zz], -1),
    ], axis=1)                                              # [B,4,4] sym
    # Shift so the max-quaternion eigenvalue dominates in magnitude.
    shift = jnp.sqrt(jnp.sum(M * M, axis=(1, 2)))[:, None, None] * 2.0 + 1e-6
    Ns = N + shift * jnp.broadcast_to(jnp.eye(4), N.shape)
    v = jnp.broadcast_to(
        jnp.asarray([0.5, 0.5, 0.5, 0.5], src.dtype), (N.shape[0], 4))
    for _ in range(30):
        v = jnp.einsum("bij,bj->bi", Ns, v)
        v = v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-12)
    R = _quat_to_rot(v)
    t = mu_d[:, 0, :] - jnp.einsum("bij,bj->bi", R, mu_s[:, 0, :])
    return R, t


@partial(jax.jit, static_argnames=("batch", "score_subset"))
def ransac_from_correspondences(
    src_xyz: Array, dst_xyz: Array, corr_src: Array, corr_dst: Array,
    corr_mask: Array, key,
    max_correspondence_dist: float = 0.75,
    checker_distance: float = 0.8,
    checker_edge_length: float = 0.6,
    batch: int = 4096,
    score_subset: int = 1024,
):
    """RANSAC over a precomputed correspondence set.

    corr_src/corr_dst: int32[M] paired indices; corr_mask: bool[M].
    Returns (T 4x4 src->dst, inlier_count i32, inlier_mask bool[M]).

    Hypothesis RANKING runs against a ``score_subset``-sized random draw of
    the correspondence set (materializing the full [batch, M] distance
    matrix moves ~400 MB of HBM traffic at 4096x8192 — measured as the
    dominant cost of the loop-closure path); inlier proportions on a
    1024-pair draw rank hypotheses equivalently (binomial concentration).
    The returned count and mask for the WINNING hypothesis are computed on
    the full set, so downstream min-correspondence gates are unaffected.
    Pass score_subset=0 to score on the full set.
    """
    M = corr_src.shape[0]
    p = corr_mask.astype(jnp.float32)
    p = p / jnp.maximum(jnp.sum(p), 1.0)
    k_pick, k_sub = jax.random.split(key)
    picks = jax.random.choice(k_pick, M, shape=(batch, 3), p=p)  # [B,3]
    a = src_xyz[corr_src[picks]]  # [B,3,3]
    b = dst_xyz[corr_dst[picks]]

    # Edge-length checker (Open3D CorrespondenceCheckerBasedOnEdgeLength):
    # corresponding triangle edges must have similar lengths.
    def edges(x):
        return jnp.stack([
            jnp.linalg.norm(x[:, 0] - x[:, 1], axis=-1),
            jnp.linalg.norm(x[:, 1] - x[:, 2], axis=-1),
            jnp.linalg.norm(x[:, 2] - x[:, 0], axis=-1),
        ], axis=-1)
    ea, eb = edges(a), edges(b)
    edge_ok = jnp.all(
        (ea > checker_edge_length * eb) & (eb > checker_edge_length * ea), axis=-1)

    R, t = _kabsch_3pt(a, b)
    # Distance checker on the sampled points themselves.
    a_tr = jnp.einsum("bij,bkj->bki", R, a) + t[:, None, :]
    samp_ok = jnp.all(jnp.linalg.norm(a_tr - b, axis=-1) < checker_distance, axis=-1)

    s_all = src_xyz[corr_src]  # [M,3]
    d_all = dst_xyz[corr_dst]
    if 0 < score_subset < M:
        sub = jax.random.choice(k_sub, M, shape=(score_subset,), p=p)
        s_sc, d_sc = s_all[sub], d_all[sub]
        m_sc = corr_mask[sub]
    else:
        s_sc, d_sc, m_sc = s_all, d_all, corr_mask
    s_tr = jnp.einsum("bij,mj->bmi", R, s_sc) + t[:, None, :]  # [B,S,3]
    dist = jnp.linalg.norm(s_tr - d_sc[None], axis=-1)
    inlier_sc = (dist < max_correspondence_dist) & m_sc[None, :]
    score = jnp.sum(inlier_sc, axis=-1) * (edge_ok & samp_ok)
    best = jnp.argmax(score)
    T = se3.make_transform(R[best], t[best])
    # Full-set inliers for the winner only ([M], not [B, M]).
    s_best = jnp.einsum("ij,mj->mi", R[best], s_all) + t[best][None, :]
    best_inliers = (jnp.linalg.norm(s_best - d_all, axis=-1)
                    < max_correspondence_dist) & corr_mask
    n_best = jnp.sum(best_inliers) * (edge_ok[best] & samp_ok[best])
    return T, n_best, best_inliers


@partial(jax.jit, static_argnames=("batch",))
def register_features(src_xyz: Array, src_mask: Array, src_feat: Array,
                      dst_xyz: Array, dst_mask: Array, dst_feat: Array,
                      key,
                      max_correspondence_dist: float = 0.75,
                      checker_distance: float = 0.8,
                      checker_edge_length: float = 0.6,
                      batch: int = 4096):
    """Full pipeline: mutual-NN FPFH correspondences + batched RANSAC.

    Returns (T src->dst, inlier_count, corr_src, corr_dst, inlier_mask).
    """
    ab, ok = fpfh_ops.mutual_nearest_correspondences(src_feat, src_mask, dst_feat, dst_mask)
    corr_src = jnp.arange(src_xyz.shape[0], dtype=jnp.int32)
    T, n_inliers, inlier_mask = ransac_from_correspondences(
        src_xyz, dst_xyz, corr_src, ab, ok, key,
        max_correspondence_dist=max_correspondence_dist,
        checker_distance=checker_distance,
        checker_edge_length=checker_edge_length,
        batch=batch,
    )
    return T, n_inliers, corr_src, ab, inlier_mask


@partial(jax.jit, static_argnames=("matcher",))
def information_matrix_from_point_clouds(src_xyz: Array, src_mask: Array,
                                         ref_grid, T: Array, max_dist,
                                         matcher: str = "hashgrid"):
    """Open3D GetInformationMatrixFromPointClouds equivalent:
    Sigma = sum over matched points of G G^T with G = [p x | I] rows
    (reference PlaceRecognition.cpp:148-150 and constraint_builders
    information matrices).

    ``matcher="bruteforce"`` runs the exact dense NN sweep instead of the
    voxel-hash probe — faster for the ~16k-point overlap clouds the
    constraint builders use (the 27-voxel candidate gather moves ~170 MB
    at that size; the MXU-tiled sweep is compute-bound and cheaper), and
    it works on CSR-free passthrough grids."""
    src = se3.apply(T, src_xyz)
    if matcher == "bruteforce":
        from .. import bruteforce

        idx, d2, found = bruteforce.nn(src, src_mask, ref_grid.points, max_dist)
    else:
        from .. import hashgrid

        idx, d2, found = hashgrid.query_nn(ref_grid, src, src_mask, max_dist)
    q = ref_grid.points[idx]
    w = found.astype(jnp.float32)
    px = se3.skew(q)
    G = jnp.concatenate([-px, jnp.broadcast_to(jnp.eye(3, dtype=q.dtype), px.shape)], axis=-1)
    info = jnp.einsum("nij,nik,n->jk", G, G, w)
    return info, jnp.sum(w)
