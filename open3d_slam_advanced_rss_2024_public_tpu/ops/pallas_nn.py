"""Pallas TPU kernel: exact nearest-neighbor via MXU-tiled distance sweep.

The flagship hot-op kernel — the TPU-native replacement for libnabo's
kd-tree correspondence search in the ICP inner loop (reference:
libpointmatcher/pointmatcher/MatchersImpl.cpp:108-133; innermost hot loop
per SURVEY.md §3.1).

Why a hand-written kernel: the XLA formulation (matmul + fused argmin,
ops/bruteforce.py) hits speed-of-light ONLY when the compiler fuses the
argmin into the matmul epilogue; across compiles that fusion is not
guaranteed, and when it misses, the (M x N) distance field materializes in
HBM (~2 GB at production sizes — a measured 50x regression).  This kernel
makes the fusion structural.

Design notes (all measured on TPU v5e):
  * Grid is 1-D over query tiles only; the reference set lives transposed
    ([8, N], N on lanes) and fully resident in VMEM, so the p-tile sweep is
    an in-register fori_loop — a 2-D grid at these tile sizes paid ~4 ms of
    per-step overhead (1024 steps) for 0.05 ms of math.
  * The q·pᵀ term uses a manual 3-pass bf16 decomposition (hi/lo split):
    Mosaic's single-pass bf16 rounding of f32 operands perturbs d2 by O(10)
    at 30 m map scale and flipped 42% of argmins; 3 passes bring the error
    to ~1e-2 m² (Mosaic supports neither Precision.HIGH nor HIGHEST here).
  * argmin uses the packed-min trick: the low 11 mantissa bits of the
    (non-negative) distance are replaced by the lane index, so one f32 min
    reduction yields value and index together (positive-float ordering ==
    bit-pattern ordering).  Exact squared distances are recomputed outside
    from the matched point, so the mantissa truncation never leaves the
    kernel.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

TQ = 256      # query tile rows
TP = 2048     # lanes per inner p-tile
_PAD_K = 8    # xyz padded to 8 sublanes for the dot
# Max reference points resident in VMEM at once ([8, N_MAX] f32 = 4 MB).
N_MAX = 131072
_IDX_BITS = 11  # 2^11 = TP lane indices packed into the mantissa
_IDX_MASK = (1 << _IDX_BITS) - 1


def _nn_kernel(q_ref, pt_ref, aabb_ref, idx_ref, d2_ref):
    n = pt_ref.shape[1]
    n_tiles = n // TP
    q = q_ref[:]  # [TQ, 8]
    q_hi = q.astype(jnp.bfloat16).astype(jnp.float32)
    q_lo = q - q_hi
    q2 = jnp.sum(q * q, axis=-1, keepdims=True)  # [TQ, 1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (TQ, TP), 1)
    # This query tile's AABB (pads use edge mode in the wrapper, so the box
    # stays tight).
    q_min = jnp.min(q[:, :3], axis=0, keepdims=True)  # [1, 3]
    q_max = jnp.max(q[:, :3], axis=0, keepdims=True)

    def visit(jt, carry):
        best_packed, best_tile, worst = carry
        # Block-sparse skip: lower-bound distance between this query tile's
        # AABB and the p-tile's AABB; when it exceeds the worst current best
        # among the tile's queries, the whole p-tile cannot improve anything
        # (the kd-tree branch-and-bound insight, applied per 2048-point
        # tile).  Spatially sorted inputs (voxel-fused clouds are lex-sorted
        # by construction) make most tiles skippable.
        box = aabb_ref[pl.ds(jt, 1), :]  # [1, 8] = (min xyz, max xyz, pad)
        p_min = box[:, 0:3]
        p_max = box[:, 3:6]
        gap = jnp.maximum(jnp.maximum(q_min - p_max, p_min - q_max), 0.0)
        lb2 = jnp.sum(gap * gap)  # scalar
        # worst is the biased-packed worst best (= worst_d2 + 1 up to 2^-12);
        # the 1.001 factor absorbs the packing truncation conservatively.
        skip = (lb2 + 1.0) > worst * 1.001

        def process(carry):
            best_packed, best_tile, _ = carry
            pc = pt_ref[:, pl.ds(jt * TP, TP)]  # [8, TP]
            pc_hi = pc.astype(jnp.bfloat16).astype(jnp.float32)
            pc_lo = pc - pc_hi
            f32 = jnp.float32
            dot = (jnp.dot(q_hi, pc_hi, preferred_element_type=f32)
                   + jnp.dot(q_hi, pc_lo, preferred_element_type=f32)
                   + jnp.dot(q_lo, pc_hi, preferred_element_type=f32))  # [TQ, TP]
            p2 = jnp.sum(pc * pc, axis=0, keepdims=True)  # [1, TP]
            d2 = jnp.maximum(q2 + p2 - 2.0 * dot, 0.0)
            # +1.0 bias keeps the float normal (a zero-distance self-match
            # packs to a denormal whose mantissa — the index! — gets flushed
            # to zero on the VPU); ordering is preserved, exact d2 is
            # recomputed outside.
            bits = pltpu.bitcast(d2 + 1.0, jnp.int32)
            packed = pltpu.bitcast((bits & ~_IDX_MASK) | lane, jnp.float32)
            tile_best = jnp.min(packed, axis=1)  # [TQ]
            better = tile_best < best_packed
            best_packed = jnp.where(better, tile_best, best_packed)
            best_tile = jnp.where(better, jt, best_tile)
            return best_packed, best_tile, jnp.max(best_packed)

        return jax.lax.cond(skip, lambda c: c, process,
                            (best_packed, best_tile, worst))

    i = pl.program_id(0)
    nq = pl.num_programs(0)
    center = (i * n_tiles) // nq

    def body(s, carry):
        # Visit tiles diagonal-outward: sorted queries against sorted refs
        # put the true neighbors near the proportional tile index, so the
        # best distances shrink early and later tiles skip.
        mag = (s + 1) // 2
        off = jnp.where(s % 2 == 1, mag, -mag)
        jt = jax.lax.rem(center + off + n_tiles, n_tiles)
        return visit(jt, carry)

    init = (jnp.full((TQ,), jnp.inf, dtype=jnp.float32),
            jnp.zeros((TQ,), dtype=jnp.int32),
            jnp.float32(jnp.inf))
    best_packed, best_tile, _ = jax.lax.fori_loop(0, n_tiles, body, init)
    pbits = pltpu.bitcast(best_packed.reshape(1, TQ), jnp.int32)  # bitcast needs 2D
    lane_idx = pbits & _IDX_MASK
    d2_trunc = pltpu.bitcast(pbits & ~_IDX_MASK, jnp.float32)
    idx_ref[:] = best_tile.reshape(1, TQ) * TP + lane_idx
    d2_ref[:] = d2_trunc


def _nn_block(q: Array, p_t: Array, interpret: bool):
    """q f32[M,8] (M % TQ == 0), p_t f32[8,N] (N % TP == 0, N <= N_MAX)."""
    M = q.shape[0]
    N = p_t.shape[1]
    n_tiles = N // TP
    # Per-p-tile AABBs for the kernel's branch-and-bound skip.
    tiles = p_t[:3].reshape(3, n_tiles, TP)
    aabb = jnp.concatenate([
        jnp.min(tiles, axis=2).T,  # [n_tiles, 3]
        jnp.max(tiles, axis=2).T,
        jnp.zeros((n_tiles, 2), jnp.float32),
    ], axis=1)  # [n_tiles, 8]
    return pl.pallas_call(
        _nn_kernel,
        grid=(M // TQ,),
        in_specs=[
            pl.BlockSpec((TQ, _PAD_K), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_PAD_K, N), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_tiles, 8), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, TQ), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TQ), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, M), jnp.int32),
            jax.ShapeDtypeStruct((1, M), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=3 * 2 * M * N * _PAD_K,
            bytes_accessed=(M + N) * _PAD_K * 4 + M * 8,
            transcendentals=0),
        interpret=interpret,
    )(q, p_t, aabb)


@functools.partial(jax.jit, static_argnames=("interpret",))
def nn_pallas(query_xyz: Array, ref_xyz: Array, interpret: bool = False):
    """Exact NN indices + squared distances.

    query_xyz f32[M,3], ref_xyz f32[N,3] -> (idx int32[M], d2 f32[M]).
    References beyond N_MAX are swept in VMEM-sized chunks whose partial
    winners are combined exactly.
    """
    m, n = query_xyz.shape[0], ref_xyz.shape[0]
    # De-mean by the reference centroid (sentinel-aware): the kernel's
    # 3-pass bf16 decomposition has relative error, so solving near the
    # origin shrinks the absolute d2 error quadratically with map extent.
    valid = jnp.abs(ref_xyz[:, 0]) < 1e7
    nv = jnp.maximum(jnp.sum(valid.astype(jnp.float32)), 1.0)
    center = jnp.sum(jnp.where(valid[:, None], ref_xyz, 0.0), axis=0) / nv
    query_xyz = query_xyz - center
    ref_xyz = ref_xyz - center
    pad_m = (-m) % TQ
    # Row pads replicate the last query (edge mode) so query-tile AABBs stay
    # tight for the kernel's tile-skipping bound.
    q = jnp.pad(query_xyz.astype(jnp.float32), ((0, pad_m), (0, 0)), mode="edge")
    q = jnp.pad(q, ((0, 0), (0, _PAD_K - 3)))
    # K-dim pad participates in the dot -> zeros; ROW pad must be far away
    # so pad refs never win the argmin (but small enough not to overflow).
    p = jnp.pad(ref_xyz.astype(jnp.float32), ((0, 0), (0, _PAD_K - 3)))
    pad_n = (-n) % TP
    p = jnp.pad(p, ((0, pad_n), (0, 0)), constant_values=3.0e7)
    N = p.shape[0]
    p_t = p.T  # [8, N]

    if N <= N_MAX:
        idx, _ = _nn_block(q, p_t, interpret)
        idx = idx.reshape(-1)
    else:
        n_chunks = -(-N // N_MAX)
        Npad = n_chunks * N_MAX
        p_t = jnp.pad(p_t, ((0, 0), (0, Npad - N)), constant_values=3.0e7)
        chunks = p_t.reshape(_PAD_K, n_chunks, N_MAX).transpose(1, 0, 2)
        idx_c, d2_c = jax.lax.map(lambda pc: _nn_block(q, pc, interpret), chunks)
        # Combine chunk winners exactly: recompute true d2 per chunk winner.
        idx_c = idx_c.reshape(n_chunks, -1)  # [C, M]
        cand = jnp.take_along_axis(
            chunks[:, :3, :], idx_c[:, None, :], axis=2)  # [C, 3, M]
        diff = cand - q.T[None, :3, :]
        d2_exact = jnp.sum(diff * diff, axis=1)  # [C, M]
        best_chunk = jnp.argmin(d2_exact, axis=0)  # [M]
        idx = (jnp.take_along_axis(idx_c, best_chunk[None, :], axis=0)[0]
               + best_chunk * N_MAX)

    idx = jnp.minimum(idx[:m], n - 1)
    # Exact distances from the gathered match (the kernel's packed d2 has
    # truncated mantissa bits).
    diff = query_xyz - ref_xyz[idx]
    d2 = jnp.sum(diff * diff, axis=-1)
    return idx, d2
