"""Command-line entry point.

≙ reference mapping_node (ros/open3d_slam_ros/src/mapping_node.cpp:16-54 —
load params, pick online vs replay processor, optional map initializer,
start processing) with dataset adapters instead of ROS topics.

Usage examples:
  python -m open3d_slam_advanced_rss_2024_public_tpu.frontends.cli \
      --dataset synthetic --steps 100 --output /tmp/run1
  python -m ... --dataset kitti --kitti-root /data/kitti --sequence 00 \
      --params myparams.json --output /tmp/kitti00
  python -m ... --dataset pcd-dir --pcd-dir scans/ --odometry odom.tum
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np


def build_argparser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(description="TPU-native LiDAR SLAM")
    ap.add_argument("--dataset", choices=["synthetic", "kitti", "pcd-dir", "rosbag"],
                    default="synthetic")
    ap.add_argument("--bag", help="rosbag path (V2.0)")
    ap.add_argument("--cloud-topic", default="/rslidar_points")
    ap.add_argument("--odometry-topic", help="nav_msgs/Odometry topic for "
                    "external-odometry pairing (optional)")
    ap.add_argument("--params", help="parameter file: .lua (reference-compatible "
                    "Lua schema), .yaml (legacy YAML schema) or .json, "
                    "deep-merged onto defaults")
    ap.add_argument("--params-search-dir", action="append", default=[],
                    help="extra include search dirs for .lua params "
                    "(repeatable; ≙ ConfigurationFileResolver)")
    ap.add_argument("--output", default="./slam_output")
    ap.add_argument("--steps", type=int, default=100, help="synthetic: frame count")
    ap.add_argument("--trajectory", default="loop", choices=["loop", "straight"])
    ap.add_argument("--kitti-root")
    ap.add_argument("--sequence", default="00")
    ap.add_argument("--max-frames", type=int)
    ap.add_argument("--pcd-dir")
    ap.add_argument("--odometry", help="TUM-format external odometry file")
    ap.add_argument("--initial-map", help="PCD prior map (localization mode)")
    ap.add_argument("--eval-ate", action="store_true",
                    help="report ATE vs ground truth when available")
    ap.add_argument("--viz-dir", help="write the live visualization bundle "
                    "here during the run (serve it with "
                    "frontends.visualizer_node)")
    ap.add_argument("--viz-every", type=int, default=25,
                    help="publish the bundle every N frames")
    return ap


def main(argv=None) -> int:
    args = build_argparser().parse_args(argv)
    import jax

    from ..utils import io as io_utils
    from ..utils.config import load_parameters, load_parameters_file
    from . import replay as replay_mod

    if args.params and args.params.endswith(".lua"):
        from ..utils.lua_config import load_lua_parameters

        params, warnings = load_lua_parameters(args.params,
                                               search_dirs=args.params_search_dir)
        for w in warnings:
            print(f"[params] {w}", file=sys.stderr)
    elif args.params and args.params.endswith((".yaml", ".yml")):
        from ..utils.yaml_config import load_legacy_yaml

        params = load_legacy_yaml(args.params)
    elif args.params:
        params = load_parameters_file(args.params)
    else:
        params = load_parameters(None)
    runner = replay_mod.ReplayRunner(params, output_dir=args.output,
                                     viz_dir=args.viz_dir,
                                     viz_every=args.viz_every)

    if args.initial_map:
        from ..models.map_initializer import SlamMapInitializer

        SlamMapInitializer(runner.slam, params.mapper.map_initializer).initialize(
            map_cloud=io_utils.load_pcd(args.initial_map, capacity=262144))

    gt = None
    if args.dataset == "synthetic":
        frames = replay_mod.synthetic_sequence(
            jax.random.PRNGKey(0), n_steps=args.steps, trajectory=args.trajectory)
    elif args.dataset == "kitti":
        from . import kitti

        frames = kitti.kitti_sequence(args.kitti_root, args.sequence,
                                      max_frames=args.max_frames,
                                      use_gt_as_odometry=False)
        gt = kitti.kitti_ground_truth(args.kitti_root, args.sequence)
    elif args.dataset == "rosbag":
        from . import rosbag as rosbag_mod

        frames = rosbag_mod.rosbag_sequence(args.bag, args.cloud_topic,
                                            odometry_topic=args.odometry_topic)
    else:
        frames = replay_mod.pcd_directory_sequence(args.pcd_dir,
                                                   trajectory_file=args.odometry)

    slam = runner.run(frames)
    print(f"processed {len(slam.trajectory_poses)} scans, "
          f"{len(slam.mapper.submaps.submaps)} submaps, "
          f"{slam.loop_closure_count} loop closures; "
          f"avg {runner.timer.avg_ms:.1f} ms/scan", file=sys.stderr)
    if args.eval_ate and gt is not None:
        n = min(len(gt), len(slam.trajectory_poses))
        ate = io_utils.ate_rmse(np.stack(slam.trajectory_poses[:n]), gt[:n])
        print(json.dumps({"ate_rmse_m": round(float(ate), 4), "frames": n}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
