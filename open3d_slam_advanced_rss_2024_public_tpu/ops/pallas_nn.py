"""Pallas TPU kernel: radius-bounded NN via tile-sparse MXU distance sweep.

The flagship hot-op kernel — the TPU-native replacement for libnabo's
kd-tree correspondence search in the ICP inner loop (reference:
libpointmatcher/pointmatcher/MatchersImpl.cpp:108-133 — batched kNN with
``maxDist``; innermost hot loop per SURVEY.md §3.1).

Round-3 redesign (per PROFILE.md): admissibility is hoisted OUT of the
kernel.  ICP only consumes matches within ``max_dist`` (0.5 m in the
production icp.yaml), so for every (query-tile, ref-tile) pair XLA computes
the exact AABB-to-AABB lower-bound distance from valid-masked coordinates
and builds a per-query-tile list of admissible ref tiles.  The kernel —
fed those lists through SMEM — loops over exactly the admissible tiles
(typically 1-4 of 16-64 when both sides are Morton-sorted) instead of
branch-and-bounding inside Mosaic, where the round-2 skip never fired:
masked lanes blew up the query AABBs and the `lax.cond` carried predication
cost either way (measured 6.6 ms at 8192x32768 vs ~0.15 ms of matmul —
~6% MXU utilization).

Contract: **nearest neighbor for every query whose NN lies within
``max_dist``, exact up to the packed-mantissa tie-break** — the argmin
packs the lane index into the low 11 mantissa bits of d2+1, so two
candidates within ~2.4e-4 m^2 of each other may resolve to either (the
returned d2 is always the exact distance to the returned candidate;
measured on chip vs float64: 98.7% exact-index, worst d2 excess
2.0e-4 m^2).  The AABB bound (dist(boxes) <= dist(points)) keeps the true
NN's tile always admissible.  Beyond max_dist the returned candidate is
unspecified — callers gate with ``d2 <= max_dist**2`` exactly as they
gate kd-tree misses.

Numerics (measured on v5e):
  * d2 is computed DIRECTLY on the VPU as the exact f32 per-coordinate
    sweep ``sum_c (q_c - p_c)^2`` over the [TQ, TP] tile — no MXU matmul
    and no bf16 decomposition.  (History/rationale: the q²+p²−2q·pᵀ MXU
    formulation ran the 128x128 systolic array at ~6% utilization for
    K=3 and required a 4-pass bf16 hi/lo decomposition to bound rounding
    — bf16's 8-bit mantissa otherwise perturbs d2 by ~1e-2 m² at map
    scale.  The direct VPU sweep is both exact and faster; see PROFILE.md
    round-4 kernel findings.)
  * argmin uses the packed-min trick: the low 11 mantissa bits of the
    (+1-biased) distance hold the lane index, so one f32 min yields value
    and index together.  Exact d2 is recomputed outside from the matched
    point, so mantissa truncation never leaves the kernel.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

TQ = 256      # query tile rows
TP = 1024     # lanes per ref tile (admissibility granularity)
_PAD_K = 8    # xyz padded to 8 sublanes for the dot
# Max reference points resident in VMEM at once ([8, N_MAX] f32 = 4 MB).
N_MAX = 131072
_IDX_BITS = 11  # 2^11 >= TP lane indices packed into the mantissa
_IDX_MASK = (1 << _IDX_BITS) - 1


def _nn_kernel(count_ref, list_ref, q_ref, pt_ref, idx_ref, d2_ref):
    i = pl.program_id(0)
    q = q_ref[:]  # [TQ, 8]
    lane = jax.lax.broadcasted_iota(jnp.int32, (TQ, TP), 1)

    def visit(s, carry):
        best_packed, best_tile = carry
        jt = list_ref[i, s]
        pc = pt_ref[:, pl.ds(jt * TP, TP)]  # [8, TP]
        # Direct VPU distance: sum_c (q_c - p_c)^2, exact f32.  At K=3 the
        # MXU formulation (q2 + p2 - 2 q.p) runs the systolic array at ~6%
        # utilization AND needs a 4-pass bf16 hi/lo decomposition to keep
        # d2 trustworthy (bf16's 8-bit mantissa leaves ~1e-2 m^2 from the
        # dropped lo.lo term at +-25 m extents — measured 3.9% wrong
        # neighbors).  Three broadcast-subtract-FMA sweeps over [TQ, TP]
        # on the VPU are both faster at this K and exactly f32 — no
        # cancellation, no decomposition (round-4 redesign).
        d2 = jnp.zeros((TQ, TP), jnp.float32)
        for c in range(3):
            diff = q[:, c][:, None] - pc[c, :][None, :]
            d2 = d2 + diff * diff
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
        return best_packed, best_tile

    init = (jnp.full((TQ,), jnp.inf, dtype=jnp.float32),
            jnp.zeros((TQ,), dtype=jnp.int32))
    cnt = count_ref[i, 0]
    best_packed, best_tile = jax.lax.fori_loop(0, cnt, visit, init)
    pbits = pltpu.bitcast(best_packed.reshape(1, TQ), jnp.int32)  # bitcast needs 2D
    lane_idx = pbits & _IDX_MASK
    idx_ref[:] = best_tile.reshape(1, TQ) * TP + lane_idx
    d2_ref[:] = pltpu.bitcast(pbits & ~_IDX_MASK, jnp.float32)


def _tile_aabbs(xyz_t: Array, valid: Array, n_tiles: int, tile: int):
    """Per-tile AABBs from valid-masked coordinates.

    xyz_t: f32[3, n_tiles*tile]; valid: bool[n_tiles*tile].
    Returns (mins f32[n_tiles,3], maxs f32[n_tiles,3]); empty tiles get
    (+inf, -inf) and are never admissible.
    """
    t = xyz_t[:3].reshape(3, n_tiles, tile)
    v = valid.reshape(1, n_tiles, tile)
    mins = jnp.min(jnp.where(v, t, jnp.inf), axis=2).T
    maxs = jnp.max(jnp.where(v, t, -jnp.inf), axis=2).T
    return mins, maxs


def _admissible_lists(q_min, q_max, p_min, p_max, max_dist):
    """Exact AABB-pair lower bounds -> (list int32[nq, np], count int32[nq,1]).

    list rows hold the admissible ref-tile ids first (ascending), arbitrary
    ids after ``count`` — the kernel never reads past count.
    """
    gap = jnp.maximum(
        jnp.maximum(q_min[:, None, :] - p_max[None, :, :],
                    p_min[None, :, :] - q_max[:, None, :]), 0.0)
    lb2 = jnp.sum(gap * gap, axis=-1)  # [nq, np]
    adm = lb2 <= jnp.asarray(max_dist, jnp.float32) ** 2
    order = jnp.argsort(jnp.logical_not(adm), axis=1, stable=True)
    count = jnp.sum(adm, axis=1, dtype=jnp.int32)[:, None]
    return order.astype(jnp.int32), count


def _nn_block(q: Array, q_valid: Array, p_t: Array, max_dist, interpret: bool):
    """q f32[M,8] (M % TQ == 0; invalid lanes pre-filled with finite
    stand-ins), p_t f32[8,N] (N % TP == 0, N <= N_MAX)."""
    M = q.shape[0]
    N = p_t.shape[1]
    nq, np_ = M // TQ, N // TP
    q_min, q_max = _tile_aabbs(q.T, q_valid, nq, TQ)
    p_min, p_max = _tile_aabbs(p_t, jnp.abs(p_t[0]) < 1e7, np_, TP)
    tile_list, tile_count = _admissible_lists(q_min, q_max, p_min, p_max, max_dist)
    # Inside shard_map the outputs vary over the same mesh axes as the
    # inputs; shard_map's vma typing requires that stated explicitly.
    # (None outside shard_map — the default single-chip typing.)
    # An EMPTY union (both operands replicated) is valid and must stay
    # frozenset(), not None — check_vma rejects None.
    vma = (getattr(jax.typeof(q), "vma", frozenset())
           | getattr(jax.typeof(p_t), "vma", frozenset()))
    return pl.pallas_call(
        _nn_kernel,
        grid=(nq,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((TQ, _PAD_K), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_PAD_K, N), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, TQ), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TQ), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, M), jnp.int32, vma=vma),
            jax.ShapeDtypeStruct((1, M), jnp.float32, vma=vma),
        ],
        interpret=interpret,
    )(tile_count, tile_list, q, p_t)


@functools.partial(jax.jit, static_argnames=("interpret",))
def nn_pallas(query_xyz: Array, ref_xyz: Array, max_dist=0.5,
              interpret: bool = False):
    """NN indices + exact squared distances, exact within ``max_dist``.

    query_xyz f32[M,3], ref_xyz f32[N,3] -> (idx int32[M], d2 f32[M]).
    Queries/refs with |x| >= 1e7 (the mask sentinel) are treated as
    invalid.  For queries whose true NN is farther than max_dist the
    returned candidate is unspecified (callers gate on d2).  References
    beyond N_MAX are swept in VMEM-sized chunks whose partial winners are
    combined exactly.
    """
    m, n = query_xyz.shape[0], ref_xyz.shape[0]
    # De-mean by the reference centroid (sentinel-aware): the kernel's
    # 3-pass bf16 decomposition has relative error, so solving near the
    # origin shrinks the absolute d2 error quadratically with map extent.
    ref_valid = jnp.abs(ref_xyz[:, 0]) < 1e7
    nv = jnp.maximum(jnp.sum(ref_valid.astype(jnp.float32)), 1.0)
    center = jnp.sum(jnp.where(ref_valid[:, None], ref_xyz, 0.0), axis=0) / nv
    query_xyz = query_xyz - center
    ref_xyz = jnp.where(ref_valid[:, None], ref_xyz - center, 3.0e7)

    pad_m = (-m) % TQ
    q_valid = jnp.pad(jnp.abs(query_xyz[:, 0]) < 1e7, (0, pad_m))
    qx = jnp.pad(query_xyz.astype(jnp.float32), ((0, pad_m), (0, 0)))
    # Replace invalid/padded queries with their tile's valid centroid so
    # tile AABBs stay tight (their results are garbage, masked by callers).
    nq = qx.shape[0] // TQ
    qt = qx.reshape(nq, TQ, 3)
    vt = q_valid.reshape(nq, TQ, 1)
    cnt = jnp.maximum(jnp.sum(vt, axis=1, dtype=jnp.float32), 1.0)
    fill = jnp.sum(jnp.where(vt, qt, 0.0), axis=1) / cnt  # [nq, 3]
    qx = jnp.where(vt, qt, fill[:, None, :]).reshape(-1, 3)
    q = jnp.pad(qx, ((0, 0), (0, _PAD_K - 3)))

    # Ref row pads go far away (never admissible, never winning).
    p = jnp.pad(ref_xyz.astype(jnp.float32), ((0, 0), (0, _PAD_K - 3)))
    pad_n = (-n) % TP
    p = jnp.pad(p, ((0, pad_n), (0, 0)), constant_values=3.0e7)
    N = p.shape[0]
    p_t = p.T  # [8, N]

    if N <= N_MAX:
        idx, _ = _nn_block(q, q_valid, p_t, max_dist, interpret)
        idx = idx.reshape(-1)
    else:
        n_chunks = -(-N // N_MAX)
        Npad = n_chunks * N_MAX
        p_t = jnp.pad(p_t, ((0, 0), (0, Npad - N)), constant_values=3.0e7)
        chunks = p_t.reshape(_PAD_K, n_chunks, N_MAX).transpose(1, 0, 2)
        idx_c, _ = jax.lax.map(
            lambda pc: _nn_block(q, q_valid, pc, max_dist, interpret), chunks)
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
    # truncated mantissa bits; invalid refs sit at 3e7 -> d2 ~ 1e15).
    diff = query_xyz - ref_xyz[idx]
    d2 = jnp.sum(diff * diff, axis=-1)
    return idx, d2
