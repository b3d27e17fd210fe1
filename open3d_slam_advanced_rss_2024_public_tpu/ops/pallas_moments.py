"""Pallas TPU kernel: radius-neighborhood moment accumulation on the MXU.

Surface-normal estimation is the second hot op of scan preprocessing
(reference: Open3D ``EstimateNormals`` with hybrid KNN search,
CloudRegistration.cpp:62-75; libpointmatcher SurfaceNormalEstimatorPCA).
The round-2 implementation gathered k neighbors with ``lax.top_k`` over
full distance rows — measured 8.7 ms for an 8k scan on v5e, all spent in
top_k (PROFILE.md).

This kernel removes the top_k entirely: PCA needs only the *moments* of
the neighborhood, and moments are a matmul.  The wrapper precomputes the
per-point moment features

    feat[N, 16] = (1, x, y, z, x2, xy, xz, y2, yz, z2, 0...)

in XLA (coordinates de-meaned by the global valid centroid).  For each
query tile the kernel visits the admissible ref tiles (same AABB tile
lists as ops/pallas_nn.py), computes the pairwise d2 block with the
3-pass bf16 hi/lo trick, thresholds it into an indicator W, and runs one
STANDARD f32 MXU matmul per tile pair:

    acc[TQ, 16] += W[TQ, TP] @ feat[TP, 16]

(f32, not bf16: the second moments span (crop_radius)^2 ~ 1e3 while the
reconstructed covariance is ~1e-2 — bf16's 8-bit mantissa would be eaten
by the m2 - mean^2 cancellation; f32 keeps it to <1e-3 relative.  The
matmul is 16 output lanes wide and runs once per scan, so the 4x f32 MXU
cost is irrelevant.)  Count / mean / second moments of every point's
r-ball arrive in one pass — no sort, no gather.

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


def _moments_kernel(count_ref, list_ref, q_ref, pt_ref, feat_ref, r2_ref,
                    acc_ref):
    i = pl.program_id(0)
    q = q_ref[:]  # [TQ, 8]
    q_hi = q.astype(jnp.bfloat16).astype(jnp.float32)
    q_lo = q - q_hi
    q2 = jnp.sum(q * q, axis=-1, keepdims=True)  # [TQ, 1]
    r2 = r2_ref[0]

    def visit(s, acc):
        jt = list_ref[i, s]
        pc = pt_ref[:, pl.ds(jt * TP, TP)]  # [8, TP]
        pc_hi = pc.astype(jnp.bfloat16).astype(jnp.float32)
        pc_lo = pc - pc_hi
        f32 = jnp.float32
        dot = (jnp.dot(q_hi, pc_hi, preferred_element_type=f32)
               + jnp.dot(q_hi, pc_lo, preferred_element_type=f32)
               + jnp.dot(q_lo, pc_hi, preferred_element_type=f32))  # [TQ, TP]
        p2 = jnp.sum(pc * pc, axis=0, keepdims=True)  # [1, TP]
        d2 = q2 + p2 - 2.0 * dot
        w = (d2 <= r2).astype(f32)
        fb = feat_ref[pl.ds(jt * TP, TP), :]  # [TP, 16]
        return acc + jnp.dot(w, fb, preferred_element_type=f32)

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

    # Moment features of the reference side, masked to zero off-cloud so
    # far-sentinel pads can never contaminate a sum even at w rounding.
    xp = jnp.pad(jnp.where(valid[:, None], x, 0.0), ((0, pad_n), (0, 0)))
    ones = jnp.pad(valid.astype(jnp.float32), (0, pad_n))[:, None]
    xx, yy, zz = xp[:, 0:1], xp[:, 1:2], xp[:, 2:3]
    feat = jnp.concatenate(
        [ones, xx, yy, zz, xx * xx, xx * yy, xx * zz, yy * yy, yy * zz,
         zz * zz, jnp.zeros((xp.shape[0], _NF - 10), jnp.float32)], axis=1)

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
            pl.BlockSpec((feat.shape[0], _NF), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((TQ, _NF), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (nq * TQ, _NF), jnp.float32,
            # Propagate the input's varying-manual-axes verbatim: under
            # shard_map with check_vma an EMPTY vma (replicated operand)
            # is valid and must be passed as frozenset(), not None.
            vma=getattr(jax.typeof(q), "vma", frozenset())),
        interpret=interpret,
    )(tile_count, tile_list, q, p_t, feat, r2)

    acc = acc[:m]
    count = acc[:, 0]
    denom = jnp.maximum(count, 1.0)[:, None]
    mean = acc[:, 1:4] / denom
    m2 = jnp.stack([
        jnp.stack([acc[:, 4], acc[:, 5], acc[:, 6]], -1),
        jnp.stack([acc[:, 5], acc[:, 7], acc[:, 8]], -1),
        jnp.stack([acc[:, 6], acc[:, 8], acc[:, 9]], -1),
    ], axis=-2) / denom[..., None]
    cov = m2 - mean[:, :, None] * mean[:, None, :]
    return count, cov
