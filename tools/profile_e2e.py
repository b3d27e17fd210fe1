"""Per-stage wall-clock breakdown of the e2e SLAM scan (VERDICT r2 item 1a).

Times every stage of pipeline.mapper_step in isolation (same shapes as
bench.py: 8192-pt scans, 128k-voxel map, 32k map patch), plus the raw
per-dispatch host overhead, so the e2e 75 ms/scan can be attributed.

Run on the real chip:  python tools/profile_e2e.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timeit(fn, *args, n=30, name=""):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"{name:44s} {dt:8.3f} ms")
    return dt


def main():
    import jax
    import jax.numpy as jnp

    from open3d_slam_advanced_rss_2024_public_tpu.frontends import synthetic
    from open3d_slam_advanced_rss_2024_public_tpu.models import pipeline, scan_processing
    from open3d_slam_advanced_rss_2024_public_tpu.ops import (
        filters, hashgrid, normals, voxel_map)
    from open3d_slam_advanced_rss_2024_public_tpu.ops import pallas_nn, bruteforce
    from open3d_slam_advanced_rss_2024_public_tpu.ops.registration import ICPConfig, icp

    platform = jax.devices()[0].platform
    print(f"devices: {jax.devices()}", file=sys.stderr)
    matcher = "pallas" if platform not in ("cpu", "gpu") else "bruteforce"

    N_SRC = 8192
    MAP_CAP = 1 << 17
    PATCH = 32768
    key = jax.random.PRNGKey(0)
    world = synthetic.cluttered_world(key, extent=30.0, n_objects=40)

    # Build a realistic mid-trajectory state by running the pipeline 30 scans.
    S = 30
    gt = synthetic.loop_trajectory(100, radius=9.0, center=(15.0, 0.0), z=1.2)
    keys = jax.random.split(jax.random.PRNGKey(7), 100)
    scans = [synthetic.render_scan(world, gt[i], keys[i], n_points=N_SRC,
                                   max_range=25.0, noise=0.004)
             for i in range(S + 1)]
    pcfg = pipeline.PipelineConfig(
        icp=ICPConfig(max_iterations=15, matcher=matcher,
                      max_correspondence_dist=0.5),
        scan_voxel_size=0.1, scan_capacity=N_SRC,
        crop_max_radius=25.0, map_patch_capacity=PATCH,
        map_voxel_size=0.1, min_refinement_fitness=0.3)
    deltas = [np.eye(4, dtype=np.float32)] + [
        (np.linalg.inv(gt[i - 1]) @ gt[i]).astype(np.float32) for i in range(1, S + 1)]
    state = pipeline.init_state(MAP_CAP, jnp.asarray(gt[0]))
    for i in range(S):
        est = jnp.asarray(np.asarray(state.pose) @ deltas[i])
        state, _ = pipeline.mapper_step(state, scans[i], est, pcfg)
    jax.block_until_ready(state.pose)
    print(f"state ready: map={int(state.map.count())} voxels", file=sys.stderr)

    raw = scans[S]
    est = jnp.asarray(np.asarray(state.pose) @ deltas[S])

    # --- dispatch overhead -------------------------------------------------
    trivial = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros((8, 128), jnp.float32)
    timeit(trivial, x, n=100, name="dispatch (trivial jit call)")

    def seq_dispatch(x):
        for _ in range(10):
            x = trivial(x)
        return x
    t = timeit(seq_dispatch, x, n=30, name="10 chained trivial calls")
    print(f"{'  -> per enqueued call':44s} {t/10:8.3f} ms")

    # --- stage: preprocess --------------------------------------------------
    pp = jax.jit(lambda s: scan_processing.preprocess_scan(
        s, wide_min_radius=pcfg.crop_min_radius, wide_max_radius=pcfg.crop_max_radius,
        voxel_size=pcfg.scan_voxel_size, downsampling_ratio=1.0,
        capacity=pcfg.scan_capacity, estimate_scan_normals=True,
        normal_knn=pcfg.normal_knn))
    wide = pp(raw)
    timeit(pp, raw, name="preprocess_scan (crop+voxel+normals)")

    # sub-stage: voxel downsample only
    vd = jax.jit(lambda s: filters.voxel_downsample(
        filters.remove_non_finite(s), pcfg.scan_voxel_size, pcfg.scan_capacity))
    ds = vd(raw)
    timeit(vd, raw, name="  voxel_downsample(8k scan)")
    en = jax.jit(lambda s: normals.estimate_normals(s, radius=0.5, k=pcfg.normal_knn))
    timeit(en, ds, name="  estimate_normals(8k, k=10)")

    # --- stage: map patch crop + grid ----------------------------------------
    crop = jax.jit(lambda mc, p: scan_processing.crop_submap_and_index(
        mc, p, min_radius=0.0, max_radius=pcfg.crop_max_radius,
        match_dist=pcfg.icp.max_correspondence_dist,
        capacity=PATCH, build_hash=False))
    patch, grid = crop(state.map.cloud, est[:3, 3])
    timeit(crop, state.map.cloud, est[:3, 3], name="crop_submap_and_index (128k->32k)")

    # --- stage: single NN call ------------------------------------------------
    match = scan_processing.narrow_crop(wide, pcfg.crop_min_radius, pcfg.crop_max_radius)
    match = jax.block_until_ready(match)
    if matcher == "pallas":
        nn1 = jax.jit(lambda q, p: pallas_nn.nn_pallas(q, p))
        timeit(nn1, match.xyz, grid.points, name="nn_pallas (8192 x 32768), 1 call")
    nnb = jax.jit(lambda q, m, p: bruteforce.nn(q, m, p, 0.5))
    timeit(nnb, match.xyz, match.mask, grid.points, name="bruteforce.nn (8192 x 32768), 1 call")

    # --- stage: ICP -----------------------------------------------------------
    cfg_fixed = ICPConfig(max_iterations=15, matcher=matcher,
                          max_correspondence_dist=0.5,
                          min_diff_rot=0.0, min_diff_trans=0.0)
    reg15 = jax.jit(lambda s, g, T: icp.register(s, g, T, cfg_fixed))
    t15 = timeit(reg15, match, grid, est, name="icp fixed-15 (in-pipeline shapes)")
    print(f"{'  -> per iteration':44s} {t15/15:8.3f} ms")
    reg = jax.jit(lambda s, g, T: icp.register(s, g, T, pcfg.icp))
    res = reg(match, grid, est)
    print(f"  converged iters: {int(res.iterations)}")
    timeit(reg, match, grid, est, name="icp converged")

    # --- stage: voxel insert ----------------------------------------------------
    merged = jax.block_until_ready(wide.transform(res.transform))
    ins = jax.jit(lambda vm, s: voxel_map.insert(vm, s, pcfg.map_voxel_size))
    timeit(ins, state.map, merged, name="voxel_map.insert (128k map + 8k scan)")

    # --- full fused step -------------------------------------------------------
    def full(st, s, e):
        return pipeline.mapper_step(st, s, e, pcfg)
    st2, _ = full(state, raw, est)
    jax.block_until_ready(st2.pose)
    # donation: must re-create state each call -> time a 2-call ping-pong
    def step_pair(st, e):
        st, _ = pipeline.mapper_step(st, scans[S], e, pcfg)
        st, _ = pipeline.mapper_step(st, scans[S], e, pcfg)
        return st
    t = timeit(step_pair, st2, est, n=15, name="mapper_step x2 (fused, no host sync)")
    print(f"{'  -> per step':44s} {t/2:8.3f} ms")


if __name__ == "__main__":
    main()
