"""Round-3 fine-grained profile: preprocess sub-stages, insert sub-stages,
fused mapper_step (properly chained under donation), run_sequence.

Run on the real chip:  python tools/profile3.py
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
    print(f"{name:48s} {dt:8.3f} ms")
    return dt


def main():
    import pathlib

    import jax
    import jax.numpy as jnp

    cache = pathlib.Path(__file__).resolve().parent.parent / ".jax_cache"
    cache.mkdir(exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)

    from open3d_slam_advanced_rss_2024_public_tpu.frontends import synthetic
    from open3d_slam_advanced_rss_2024_public_tpu.models import pipeline, scan_processing
    from open3d_slam_advanced_rss_2024_public_tpu.ops import (
        filters, hashgrid, normals, voxel_map, pallas_moments)
    from open3d_slam_advanced_rss_2024_public_tpu.ops.registration import ICPConfig, icp

    platform = jax.devices()[0].platform
    print(f"devices: {jax.devices()}", file=sys.stderr)
    matcher = "pallas" if platform not in ("cpu", "gpu") else "bruteforce"

    N_SRC = 8192
    MAP_CAP = 1 << 17
    PATCH = 32768
    key = jax.random.PRNGKey(0)
    world = synthetic.cluttered_world(key, extent=30.0, n_objects=40)

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

    # ---- preprocess sub-stages ------------------------------------------
    clean = jax.jit(filters.remove_non_finite)
    c0 = jax.block_until_ready(clean(raw))
    timeit(clean, raw, name="remove_non_finite(8k)")
    vd = jax.jit(lambda s: filters.voxel_downsample(s, pcfg.scan_voxel_size,
                                                    pcfg.scan_capacity))
    ds = jax.block_until_ready(vd(c0))
    timeit(vd, c0, name="voxel_downsample(8k)")
    ms = jax.jit(lambda s: hashgrid.morton_sort(s, 0.5))
    sorted_ds = jax.block_until_ready(ms(ds))
    timeit(ms, ds, name="morton_sort(8k)")
    mom = jax.jit(lambda x, m: pallas_moments.radius_moments(x, m, 0.5))
    timeit(mom, sorted_ds.xyz, sorted_ds.mask, name="radius_moments kernel(8k self-join)")
    enr = jax.jit(lambda s: normals.estimate_normals_radius(s, radius=0.5))
    timeit(enr, sorted_ds, name="estimate_normals_radius(8k) total")
    pp = jax.jit(lambda s: scan_processing.preprocess_scan(
        s, wide_min_radius=pcfg.crop_min_radius, wide_max_radius=pcfg.crop_max_radius,
        voxel_size=pcfg.scan_voxel_size, downsampling_ratio=1.0,
        capacity=pcfg.scan_capacity, estimate_scan_normals=True,
        normal_knn=pcfg.normal_knn,
        normal_engine=scan_processing.resolve_normal_engine("auto")))
    wide = jax.block_until_ready(pp(raw))
    timeit(pp, raw, name="preprocess_scan total (auto engine)")

    # ---- insert sub-stages ----------------------------------------------
    merged = jax.block_until_ready(wide.transform(est))
    from open3d_slam_advanced_rss_2024_public_tpu.ops.voxel_map import (
        _assign_slots, _pack_keys)
    from open3d_slam_advanced_rss_2024_public_tpu.ops.hashgrid import voxel_key
    kk = voxel_key(merged.xyz, jnp.float32(0.1))
    pk, ok = _pack_keys(kk, state.map.origin, merged.mask)
    pk, ok = jax.block_until_ready((pk, ok))
    asg = jax.jit(lambda pt, p, o: _assign_slots(pt, p, o))
    timeit(asg, state.map.ptable, pk, ok,
           name="insert: _assign_slots (probe loop)")
    ins = jax.jit(lambda vm, s: voxel_map.insert(vm, s, pcfg.map_voxel_size))
    timeit(ins, state.map, merged, name="insert: full (131k table + 8k scan)")

    # ---- crop + icp ------------------------------------------------------
    crop = jax.jit(lambda mc, p: scan_processing.crop_submap_and_index(
        mc, p, min_radius=0.0, max_radius=pcfg.crop_max_radius,
        match_dist=pcfg.icp.max_correspondence_dist,
        capacity=PATCH, build_hash=False))
    patch, grid = crop(state.map.cloud, est[:3, 3])
    timeit(crop, state.map.cloud, est[:3, 3], name="crop_submap_and_index (131k->32k)")
    match = scan_processing.narrow_crop(wide, pcfg.crop_min_radius, pcfg.crop_max_radius)
    match = jax.block_until_ready(match)
    reg = jax.jit(lambda s, g, T: icp.register(s, g, T, pcfg.icp))
    res = jax.block_until_ready(reg(match, grid, est))
    print(f"  converged iters: {int(res.iterations)}")
    timeit(reg, match, grid, est, name="icp converged")

    # ---- fused step, chained (donation-safe: each state consumed once) ---
    dlt = jnp.asarray(deltas[S])
    st2, _ = pipeline.mapper_step_delta(state, raw, dlt, pcfg)
    jax.block_until_ready(st2.pose)  # warmup compile of the delta entry
    K = 20
    t0 = time.perf_counter()
    st = st2
    for _ in range(K):
        st, _ = pipeline.mapper_step_delta(st, scans[S], dlt, pcfg)
    jax.block_until_ready(st.pose)
    t = (time.perf_counter() - t0) / K * 1e3
    print(f"{'mapper_step_delta chained, per step':48s} {t:8.3f} ms")

    # ---- run_sequence (lax.scan driver) ---------------------------------
    SS = 16
    stack = jax.tree.map(lambda *xs: jnp.stack(xs), *scans[:SS])
    dstack = jnp.asarray(np.stack(deltas[:SS]))
    seq = jax.jit(lambda st, sc, dl: pipeline.run_sequence(st, sc, dl, pcfg))
    st0 = pipeline.init_state(MAP_CAP, jnp.asarray(gt[0]))
    out = seq(st0, stack, dstack)
    jax.block_until_ready(out[1])
    t0 = time.perf_counter()
    st0 = pipeline.init_state(MAP_CAP, jnp.asarray(gt[0]))
    out = seq(st0, stack, dstack)
    jax.block_until_ready(out[1])
    dt = (time.perf_counter() - t0) / SS * 1e3
    print(f"{'run_sequence (lax.scan) per scan':48s} {dt:8.3f} ms")


if __name__ == "__main__":
    main()
