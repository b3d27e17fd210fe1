"""Pallas TPU kernel: radius-neighborhood moment accumulation on the MXU.

Surface-normal estimation is the second hot op of scan preprocessing
(reference: Open3D ``EstimateNormals`` with hybrid KNN search,
CloudRegistration.cpp:62-75; libpointmatcher SurfaceNormalEstimatorPCA).
The round-2 implementation gathered k neighbors with ``lax.top_k`` over
full distance rows — measured 8.7 ms for an 8k scan on v5e, all spent in
top_k (PROFILE.md).

This kernel removes the top_k entirely: PCA needs only the *moments* of
the neighborhood, and moments are a matmul.  For each query tile it visits
the admissible ref tiles (same AABB tile lists as ops/pallas_nn.py),
computes the pairwise d2 block on the MXU, thresholds it into an indicator
W in {0,1}, and accumulates

    acc[TQ, 16] += W[TQ, TP] @ feat[TP, 16]
    feat = (1, x, y, z, x2, xy, xz, y2, yz, z2, 0...)

so count / mean / second moments of every point's r-ball arrive in one
pass — no sort, no gather, pure MXU.  The covariance (mean-removed) is
shift-invariant, so coordinates are re-centered on each query tile's
centroid inside the kernel, keeping the f32->bf16 hi/lo split accurate
(values span meters, not the map extent).

Radius-PCA vs the reference's hybrid (radius + max-k) search: identical
plane normals; the k-cap only bounds the reference's CPU cost and is
unnecessary here.  The kNN path (ops/normals.py) remains for parity
consumers.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_nn import TQ, TP, _admissible_lists, _tile_aabbs

Array = jax.Array

_NF = 16  # feature lanes (10 moments + 6 zero pads)


def _moments_kernel(count_ref, list_ref, q_ref, pt_ref, r2_ref, acc_ref):
    i = pl.program_id(0)
    q = q_ref[:]  # [TQ, 8]
    # Re-center on the query tile centroid (invalid lanes are pre-filled
    # with that same centroid by the wrapper, so the mean is representative).
    cx = jnp.mean(q[:, 0])
    cy = jnp.mean(q[:, 1])
    cz = jnp.mean(q[:, 2])
    qs = jnp.concatenate(
        [q[:, 0:1] - cx, q[:, 1:2] - cy, q[:, 2:3] - cz, q[:, 3:8]], axis=1)
    qs_hi = qs.astype(jnp.bfloat16).astype(jnp.float32)
    qs_lo = qs - qs_hi
    q2 = jnp.sum(qs * qs, axis=-1, keepdims=True)  # [TQ, 1]
    r2 = r2_ref[0]

    def visit(s, acc):
        jt = list_ref[i, s]
        pc = pt_ref[:, pl.ds(jt * TP, TP)]  # [8, TP]
        ps = jnp.concatenate(
            [pc[0:1] - cx, pc[1:2] - cy, pc[2:3] - cz, pc[3:8]], axis=0)
        ps_hi = ps.astype(jnp.bfloat16).astype(jnp.float32)
        ps_lo = ps - ps_hi
        f32 = jnp.float32
        dot = (jnp.dot(qs_hi, ps_hi, preferred_element_type=f32)
               + jnp.dot(qs_hi, ps_lo, preferred_element_type=f32)
               + jnp.dot(qs_lo, ps_hi, preferred_element_type=f32))  # [TQ, TP]
        p2 = jnp.sum(ps * ps, axis=0, keepdims=True)  # [1, TP]
        d2 = q2 + p2 - 2.0 * dot
        w = (d2 <= r2).astype(jnp.bfloat16)  # exact in bf16 ({0,1})
        x, y, z = ps[0:1], ps[1:2], ps[2:3]
        ones = jnp.ones_like(x)
        zeros = jnp.zeros((_NF - 10, TP), f32)
        feat_t = jnp.concatenate(
            [ones, x, y, z, x * x, x * y, x * z, y * y, y * z, z * z, zeros],
            axis=0)  # [16, TP]
        f_hi = feat_t.astype(jnp.bfloat16)
        f_lo = (feat_t - f_hi.astype(f32)).astype(jnp.bfloat16)
        dn = (((1,), (1,)), ((), ()))  # contract over TP: W @ feat_t^T
        acc = acc + (jax.lax.dot_general(w, f_hi, dn, preferred_element_type=f32)
                     + jax.lax.dot_general(w, f_lo, dn, preferred_element_type=f32))
        return acc

    cnt = count_ref[i, 0]
    acc = jax.lax.fori_loop(0, cnt, visit,
                            jnp.zeros((TQ, _NF), jnp.float32))
    acc_ref[:] = acc


@functools.partial(jax.jit, static_argnames=("interpret",))
def radius_moments(xyz: Array, mask: Array, radius, interpret: bool = False):
    """Per-point neighborhood moments within ``radius`` (self included).

    xyz f32[M,3] is both query and reference set (self-join); lanes with
    mask False are excluded from the reference side (their own outputs are
    garbage — callers gate on their mask).  Returns
    (count f32[M], cov f32[M,3,3]) — cov is the centered second-moment
    (covariance) matrix of each point's r-ball, which is all PCA needs.
    """
    m = xyz.shape[0]
    valid = jnp.logical_and(mask, jnp.abs(xyz[:, 0]) < 1e7)
    nv = jnp.maximum(jnp.sum(valid.astype(jnp.float32)), 1.0)
    center = jnp.sum(jnp.where(valid[:, None], xyz, 0.0), axis=0) / nv
    x = xyz - center

    pad_m = (-m) % TQ
    q_valid = jnp.pad(valid, (0, pad_m))
    qx = jnp.pad(jnp.where(valid[:, None], x, 0.0), ((0, pad_m), (0, 0)))
    nq = qx.shape[0] // TQ
    qt = qx.reshape(nq, TQ, 3)
    vt = q_valid.reshape(nq, TQ, 1)
    cnt = jnp.maximum(jnp.sum(vt, axis=1, dtype=jnp.float32), 1.0)
    fill = jnp.sum(jnp.where(vt, qt, 0.0), axis=1) / cnt
    qx = jnp.where(vt, qt, fill[:, None, :]).reshape(-1, 3)
    q = jnp.pad(qx, ((0, 0), (0, 5)))

    pad_n = (-m) % TP
    px = jnp.where(valid[:, None], x, 3.0e7)
    p = jnp.pad(jnp.pad(px, ((0, 0), (0, 5))), ((0, pad_n), (0, 0)),
                constant_values=3.0e7)
    p_t = p.T
    np_ = p_t.shape[1] // TP

    q_min, q_max = _tile_aabbs(q.T, q_valid, nq, TQ)
    p_min, p_max = _tile_aabbs(p_t, jnp.abs(p_t[0]) < 1e7, np_, TP)
    tile_list, tile_count = _admissible_lists(q_min, q_max, p_min, p_max, radius)
    r2 = jnp.asarray([jnp.float32(radius) ** 2])

    acc = pl.pallas_call(
        _moments_kernel,
        grid=(nq,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((TQ, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, p_t.shape[1]), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((TQ, _NF), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        # vma: under shard_map the moments vary over the same mesh axes as
        # the coordinates (shard_map vma typing requires this stated).
        out_shape=jax.ShapeDtypeStruct(
            (nq * TQ, _NF), jnp.float32,
            vma=getattr(jax.typeof(q), "vma", frozenset()) or None),
        interpret=interpret,
    )(tile_count, tile_list, q, p_t, r2)

    acc = acc[:m]
    count = acc[:, 0]
    denom = jnp.maximum(count, 1.0)[:, None]
    # acc's coordinates were shifted per query tile INSIDE the kernel; the
    # covariance is shift-invariant, so it reconstructs exactly from the
    # kernel-frame moments.
    mean_s = acc[:, 1:4] / denom
    m2 = jnp.stack([
        jnp.stack([acc[:, 4], acc[:, 5], acc[:, 6]], -1),
        jnp.stack([acc[:, 5], acc[:, 7], acc[:, 8]], -1),
        jnp.stack([acc[:, 6], acc[:, 8], acc[:, 9]], -1),
    ], axis=-2) / denom[..., None]
    cov = m2 - mean_s[:, :, None] * mean_s[:, None, :]
    return count, cov
