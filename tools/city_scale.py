"""City-scale multi-session sharded mapping artifact (BASELINE config 5).

Demonstrates, on the 8-device virtual CPU mesh (the same sharding program
that runs on a real TPU pod slice):

  1. SLAM session A: the sharded mapper (registration active, map
     spatially block-partitioned over the mesh) over a city trajectory
     with submap rollovers, asserting ATE.
  2. Dense capacity fill: owner-partitioned insertion of surface-like
     131k-point batches along a long route into ONE persistent sharded
     map until >= 10M occupied voxels, asserting the per-device memory
     bound holds (fixed-capacity tables — no growth, no rehash).
  3. Session B: localization resume — a fresh mapper seeded with the
     saved session-A map (≙ SlamMapInitializer resume,
     SlamMapInitializer.cpp:50-80), asserting it re-localizes.

Writes CITY_SCALE.json at the repo root.

Run:  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \\
      python tools/city_scale.py
"""
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def downtown_surfaces():
    """Dense-downtown surface patches inside the voxel table's ±51.2 m
    addressable cube (0.1 m cells): ground + 12 multi-floor buildings
    (floor slabs + facades) ≈ 115k m² of surface ≈ 11M+ voxels at 0.1 m.

    Each patch is (origin[3], u_axis[3], v_axis[3], u_len, v_len)."""
    import numpy as np

    patches = []

    def rect(o, u, v, lu, lv):
        patches.append((np.asarray(o, np.float32), np.asarray(u, np.float32),
                        np.asarray(v, np.float32), float(lu), float(lv)))

    rect([-45, -45, 0], [1, 0, 0], [0, 1, 0], 90, 90)   # ground
    rng = __import__("numpy").random.RandomState(11)
    for bx in range(4):
        for by in range(3):
            x0 = -42 + bx * 22 + rng.uniform(0, 2)
            y0 = -38 + by * 26 + rng.uniform(0, 2)
            w, d = 18.0, 18.0
            floors = 16
            for f in range(floors):
                z = 2.5 * (f + 1)
                rect([x0, y0, z], [1, 0, 0], [0, 1, 0], w, d)  # slab
            h = 2.5 * floors
            rect([x0, y0, 0], [1, 0, 0], [0, 0, 1], w, h)      # facades
            rect([x0, y0 + d, 0], [1, 0, 0], [0, 0, 1], w, h)
            rect([x0, y0, 0], [0, 1, 0], [0, 0, 1], d, h)
            rect([x0 + w, y0, 0], [0, 1, 0], [0, 0, 1], d, h)
    return patches


def surface_point_stream(patches, batch: int, jitter_seed: int = 3):
    """Yield batches of grid-sampled surface points at 0.095 m spacing
    (slightly finer than the 0.1 m voxel grid -> ~1 point/voxel, with a
    small jitter so fusion exercises the weighted mean)."""
    import numpy as np

    rng = np.random.RandomState(jitter_seed)
    step = 0.095
    buf = []
    n_buf = 0
    for (o, u, v, lu, lv) in patches:
        us = np.arange(0, lu, step, dtype=np.float32)
        vs = np.arange(0, lv, step, dtype=np.float32)
        # Emit the patch in row blocks to bound memory.
        rows_per_chunk = max(1, batch // max(len(us), 1))
        for r0 in range(0, len(vs), rows_per_chunk):
            vv = vs[r0:r0 + rows_per_chunk]
            uu, vvg = np.meshgrid(us, vv)
            pts = (o[None, :] + uu.reshape(-1, 1) * u[None, :]
                   + vvg.reshape(-1, 1) * v[None, :]).astype(np.float32)
            pts += (rng.rand(*pts.shape).astype(np.float32) - 0.5) * 0.02
            buf.append(pts)
            n_buf += len(pts)
            while n_buf >= batch:
                cat = np.concatenate(buf, axis=0)
                yield cat[:batch]
                rest = cat[batch:]
                buf = [rest] if len(rest) else []
                n_buf = len(rest)
    if n_buf:
        pad = np.tile(buf[0][:1] if len(buf[0]) else np.zeros((1, 3), np.float32),
                      (batch - n_buf, 1))
        yield np.concatenate(buf + [pad], axis=0)


def main():
    import os

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import numpy as np
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "cpu")
    n_dev = len(jax.devices())
    assert n_dev >= 8, ("need XLA_FLAGS=--xla_force_host_platform_device_count=8; "
                        f"have {n_dev}")

    from open3d_slam_advanced_rss_2024_public_tpu.frontends import synthetic
    from open3d_slam_advanced_rss_2024_public_tpu.models.pipeline import PipelineConfig
    from open3d_slam_advanced_rss_2024_public_tpu.ops import voxel_map
    from open3d_slam_advanced_rss_2024_public_tpu.ops.registration import ICPConfig
    from open3d_slam_advanced_rss_2024_public_tpu.parallel import make_mesh
    from open3d_slam_advanced_rss_2024_public_tpu.parallel.mesh import DATA_AXIS
    from open3d_slam_advanced_rss_2024_public_tpu.parallel.sharded_map import (
        block_owner, make_sharded_map_ops)
    from open3d_slam_advanced_rss_2024_public_tpu.parallel.sharded_slam import (
        make_sharded_mapper)
    from open3d_slam_advanced_rss_2024_public_tpu.utils.pointcloud import make_cloud

    t_start = time.time()
    mesh = make_mesh(8)
    out = {"devices": 8}

    # ---- 1. SLAM session A: sharded mapper with rollovers ------------------
    S = 30
    world = synthetic.cluttered_world(jax.random.PRNGKey(0), extent=20.0,
                                      n_objects=30)
    gt = synthetic.loop_trajectory(S, radius=5.0, center=(8.0, 0.0), z=1.0)
    keys = jax.random.split(jax.random.PRNGKey(5), S)
    pcfg = PipelineConfig(
        icp=ICPConfig(max_iterations=6, matcher="sharded",
                      max_correspondence_dist=0.6),
        scan_voxel_size=0.15, scan_capacity=2048,
        crop_min_radius=0.4, crop_max_radius=18.0,
        map_patch_capacity=4096, map_voxel_size=0.15,
        min_refinement_fitness=0.2)
    empty_state, step_fn = make_sharded_mapper(mesh, pcfg,
                                               capacity_per_device=8192,
                                               block_size=4.0)
    maps = empty_state()
    last_ins = jnp.eye(4, dtype=jnp.float32)
    pose = np.asarray(gt[0], dtype=np.float32)
    errs = []
    rollovers = 0
    for i in range(S):
        scan = synthetic.render_scan(world, gt[i], keys[i], n_points=2048,
                                     max_range=16.0, noise=0.004)
        delta = np.eye(4, dtype=np.float32) if i == 0 else (
            np.linalg.inv(gt[i - 1]) @ gt[i]).astype(np.float32)
        est = (pose @ delta).astype(np.float32)
        maps, T, mr, last_ins = step_fn(maps, last_ins, scan, jnp.asarray(est))
        pose = np.asarray(T, dtype=np.float32)
        errs.append(float(np.linalg.norm(pose[:3, 3] - gt[i][:3, 3])))
        if (i + 1) % 10 == 0 and i + 1 < S:   # submap rollover
            maps = empty_state()
            last_ins = jnp.eye(4, dtype=jnp.float32)
            rollovers += 1
    ate_a = float(np.sqrt(np.mean(np.square(errs))))
    out["session_a"] = {"scans": S, "rollovers": rollovers,
                        "ate_m": round(ate_a, 4)}
    assert ate_a < 0.30, f"session A ATE too high: {ate_a}"
    session_a_map = maps

    # ---- 2. capacity fill to >= 10M voxels over the mesh -------------------
    # Dense-downtown surfaces INSIDE the table's ±51.2 m addressable cube
    # (the 30-bit packed key bounds any ONE map's extent; spatial reach
    # beyond that is the SUBMAP collection's job — this artifact
    # demonstrates voxel capacity, the submap/pose-graph machinery
    # demonstrates extent).
    CAP_PER_DEV = 1 << 22          # 4M slots x 8 devices = 33.5M slots
    VOXEL = 0.1
    BLOCK = 8.0
    empty_maps, insert_fn, nn_fn, gather_fn = make_sharded_map_ops(
        mesh, capacity_per_device=CAP_PER_DEV, map_voxel_size=VOXEL,
        block_size=BLOCK)
    big = empty_maps()
    B = 1 << 17
    total = 0
    batches = 0
    t0 = time.time()
    # Seed batch spanning the whole scene so every device's packing origin
    # centers its ±51.2 m cube on the downtown, not on the first grid
    # strip it happens to own.
    patches = downtown_surfaces()
    rngs = np.random.RandomState(1)
    seed_pts = []
    per = max(B // len(patches), 1)
    for (o, u, v, lu, lv) in patches:
        uu = rngs.uniform(0, lu, per).astype(np.float32)
        vv = rngs.uniform(0, lv, per).astype(np.float32)
        seed_pts.append(o[None, :] + uu[:, None] * u[None, :]
                        + vv[:, None] * v[None, :])
    seed = np.concatenate(seed_pts, axis=0)[:B]
    seed = np.pad(seed, ((0, B - len(seed)), (0, 0)), mode="edge")
    big = insert_fn(big, make_cloud(jnp.asarray(seed)))
    for pts in surface_point_stream(patches, B):
        big = insert_fn(big, make_cloud(jnp.asarray(pts)))
        batches += 1
        if batches % 25 == 0:
            total = int(np.asarray(jnp.sum(jnp.logical_and(
                big.ptable != np.int32(0x7FFFFFFF), big.weight > 0))))
            print(f"  fill: {batches} batches, {total/1e6:.2f}M voxels, "
                  f"{time.time()-t0:.0f}s", file=sys.stderr)
    total = int(np.asarray(jnp.sum(jnp.logical_and(
        big.ptable != np.int32(0x7FFFFFFF), big.weight > 0))))
    fill_s = time.time() - t0
    # Per-device drop accounting (observability of any capacity pressure).
    dropped = float(np.asarray(jnp.sum(big.dropped)))
    slots = 8 * CAP_PER_DEV
    bytes_per_dev = CAP_PER_DEV * (4 + 32)   # ptable int32 + acc f32[...,8]
    out["capacity_fill"] = {
        "total_voxels": total,
        "batches_131k": batches,
        "points_inserted": batches * B,
        "table_slots": slots,
        "load_factor": round(total / slots, 3),
        "points_dropped": dropped,
        "bytes_per_device": bytes_per_dev,
        "fill_seconds": round(fill_s, 1),
    }
    assert total >= 10_000_000, f"only {total} voxels"
    # Memory bound: fixed-capacity tables — the per-device footprint is
    # constant by construction; assert the leaves really are that size.
    assert big.acc.shape == (8, CAP_PER_DEV, 8)

    # ---- 3. session B: localization resume against session A's map --------
    maps_b = session_a_map      # saved map = the resume seed
    last_ins = jnp.eye(4, dtype=jnp.float32)
    # Re-enter the mapped area with a small initial-pose error and replay
    # the last trajectory segment (≙ SlamMapInitializer set-initial-pose
    # + localization, SlamMapInitializer.cpp:50-80).
    i0 = S - 6
    start = gt[i0].copy()
    start[:3, 3] += [0.15, -0.10, 0.02]
    pose = start.astype(np.float32)
    errs_b = []
    for i in range(i0, S):
        scan = synthetic.render_scan(world, gt[i], jax.random.PRNGKey(100 + i),
                                     n_points=2048, max_range=16.0, noise=0.004)
        delta = np.eye(4, dtype=np.float32) if i == i0 else (
            np.linalg.inv(gt[i - 1]) @ gt[i]).astype(np.float32)
        est = (pose @ delta).astype(np.float32)
        maps_b, T, mr, last_ins = step_fn(maps_b, last_ins, scan,
                                          jnp.asarray(est))
        pose = np.asarray(T, dtype=np.float32)
        errs_b.append(float(np.linalg.norm(pose[:3, 3] - gt[i][:3, 3])))
    out["session_b_resume"] = {
        "initial_offset_m": 0.18,
        "final_err_m": round(errs_b[-1], 4),
    }
    assert errs_b[-1] < 0.15, f"resume failed to localize: {errs_b[-1]} m"

    out["wall_seconds"] = round(time.time() - t_start, 1)
    path = pathlib.Path(__file__).resolve().parents[1] / "CITY_SCALE.json"
    path.write_text(json.dumps(out, indent=1))
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
