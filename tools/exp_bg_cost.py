"""Isolated device cost of the fused background-path programs
(_lc_candidate_eval / _odo_edge_eval) on realistic full-system shapes."""
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    cache = pathlib.Path(__file__).resolve().parents[1] / ".jax_cache"
    jax.config.update("jax_compilation_cache_dir", str(cache))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    from open3d_slam_advanced_rss_2024_public_tpu.frontends import synthetic
    from open3d_slam_advanced_rss_2024_public_tpu.models import place_recognition as prm
    from open3d_slam_advanced_rss_2024_public_tpu.ops import fpfh, filters, normals, voxel_map
    from open3d_slam_advanced_rss_2024_public_tpu.ops.registration import ICPConfig

    key = jax.random.PRNGKey(0)
    world = synthetic.cluttered_world(key, extent=30.0, n_objects=40)
    pose = np.eye(4, dtype=np.float32)
    pose[:3, 3] = [12.0, 0.0, 1.0]

    # Build a submap-like voxel table (capacity 2*2^17 = 262144 like the
    # full-system run) with ~40k voxels.
    vm = voxel_map.empty(1 << 18)
    for j in range(6):
        p = pose.copy()
        p[0, 3] += 0.4 * j
        scan = synthetic.render_scan(world, p, jax.random.PRNGKey(j),
                                     n_points=8192, max_range=25.0,
                                     noise=0.004).transform(jnp.asarray(p))
        vm = voxel_map.insert(vm, scan, 0.1)
    map_cloud = vm.cloud
    print("map voxels:", int(vm.count()), file=sys.stderr)

    feat = filters.voxel_downsample(map_cloud, 0.5, capacity=8192)
    feat = normals.estimate_normals(feat, radius=2.0, k=20)
    feats = fpfh.compute_fpfh(feat, radius=2.5, k=48)

    refine_cfg = ICPConfig(max_iterations=40, max_correspondence_dist=0.8,
                           minimizer="point_to_plane")

    def t_ms(fn, n=5):
        out = fn()
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn()
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / n * 1e3

    k = jax.random.PRNGKey(3)
    lc = lambda: prm._lc_candidate_eval(
        feat.xyz, feat.mask, feats, feat.xyz, feat.mask, feats,
        map_cloud, map_cloud, k,
        jnp.float32(0.75), jnp.float32(0.8), jnp.float32(0.6),
        jnp.float32(2.0), jnp.float32(0.8),
        overlap_capacity=16384, refine_cfg=refine_cfg, ransac_batch=4096)
    print(f"lc_candidate_eval: {t_ms(lc):.1f} ms")

    odo_cfg = ICPConfig(max_iterations=100, max_correspondence_dist=0.15,
                        minimizer="point_to_plane")
    odo = lambda: prm._odo_edge_eval(
        map_cloud, map_cloud, jnp.float32(2.0), jnp.float32(0.15),
        overlap_capacity=16384, refine_cfg=odo_cfg, do_refine=True)
    print(f"odo_edge_eval (refine): {t_ms(odo):.1f} ms")

    odo2 = lambda: prm._odo_edge_eval(
        map_cloud, map_cloud, jnp.float32(2.0), jnp.float32(0.15),
        overlap_capacity=16384, refine_cfg=odo_cfg, do_refine=False)
    print(f"odo_edge_eval (no refine): {t_ms(odo2):.1f} ms")

    # Sub-stages:
    from open3d_slam_advanced_rss_2024_public_tpu.ops import hashgrid
    ov = jax.jit(lambda: prm.overlap_clouds(map_cloud, map_cloud,
                                            jnp.float32(2.0), 16384))
    print(f"overlap_clouds (262k x 262k): {t_ms(ov):.1f} ms")
    gb = jax.jit(lambda: hashgrid.build(map_cloud, 0.8))
    print(f"hashgrid.build (262k): {t_ms(gb):.1f} ms")


if __name__ == "__main__" and len(sys.argv) == 1:
    main()


def bisect():
    import jax
    import jax.numpy as jnp
    import numpy as np
    cache = pathlib.Path(__file__).resolve().parents[1] / ".jax_cache"
    jax.config.update("jax_compilation_cache_dir", str(cache))
    from open3d_slam_advanced_rss_2024_public_tpu.frontends import synthetic
    from open3d_slam_advanced_rss_2024_public_tpu.models import place_recognition as prm
    from open3d_slam_advanced_rss_2024_public_tpu.ops import hashgrid, voxel_map
    from open3d_slam_advanced_rss_2024_public_tpu.ops.registration import ICPConfig, register
    from open3d_slam_advanced_rss_2024_public_tpu.ops.registration.ransac import information_matrix_from_point_clouds
    from open3d_slam_advanced_rss_2024_public_tpu.utils.pointcloud import compact
    from functools import partial

    key = jax.random.PRNGKey(0)
    world = synthetic.cluttered_world(key, extent=30.0, n_objects=40)
    pose = np.eye(4, dtype=np.float32)
    pose[:3, 3] = [12.0, 0.0, 1.0]
    vm = voxel_map.empty(1 << 18)
    for j in range(6):
        p = pose.copy()
        p[0, 3] += 0.4 * j
        scan = synthetic.render_scan(world, p, jax.random.PRNGKey(j),
                                     n_points=8192, max_range=25.0,
                                     noise=0.004).transform(jnp.asarray(p))
        vm = voxel_map.insert(vm, scan, 0.1)
    mc = vm.cloud
    jax.block_until_ready(mc.xyz)

    def t_ms(fn, *a, n=5):
        out = fn(*a)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*a)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / n * 1e3

    cfg = ICPConfig(max_iterations=100, max_correspondence_dist=0.15,
                    minimizer="point_to_plane")

    @jax.jit
    def s1(a, b):
        return prm.overlap_clouds(a, b, jnp.float32(2.0), 16384)

    @jax.jit
    def s1a(a, b):
        gb = hashgrid.build(b, jnp.float32(2.0))
        return hashgrid.occupied_voxel_lookup(gb, a.xyz, a.mask)

    @jax.jit
    def s1b(a, m):
        return compact(a.with_mask(m), 16384)

    @jax.jit
    def s2(a, b):
        p, c = prm.overlap_clouds(a, b, jnp.float32(2.0), 16384)
        return hashgrid.build(c, jnp.float32(0.15))

    @partial(jax.jit, static_argnames=("c",))
    def s3(a, b, c):
        p, co = prm.overlap_clouds(a, b, jnp.float32(2.0), 16384)
        g = hashgrid.build(co, jnp.float32(0.15))
        return register(p, g, jnp.eye(4, dtype=jnp.float32), c).transform

    print(f"overlap only (args): {t_ms(s1, mc, mc):.1f} ms")
    m = s1a(mc, mc)
    print(f"  grid+lookup half: {t_ms(s1a, mc, mc):.1f} ms")
    print(f"  compact 262k->16k: {t_ms(s1b, mc, m):.1f} ms")
    print(f"overlap+grid: {t_ms(s2, mc, mc):.1f} ms")
    print(f"overlap+grid+icp100: {t_ms(s3, mc, mc, cfg):.1f} ms")


if __name__ == "__main__" and len(sys.argv) > 1 and sys.argv[1] == "bisect":
    bisect()
