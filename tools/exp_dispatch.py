"""Isolate the per-dispatch overhead of the fused step over the axon tunnel.

Variants: (A) full mapper_step_delta (state + StepOutput out),
(B) lean variant returning state only, (C) lean AOT-compiled.
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import pathlib
import numpy as np
import jax
import jax.numpy as jnp

cache = pathlib.Path(__file__).resolve().parent.parent / ".jax_cache"
jax.config.update("jax_compilation_cache_dir", str(cache))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)

from functools import partial
from open3d_slam_advanced_rss_2024_public_tpu.frontends import synthetic
from open3d_slam_advanced_rss_2024_public_tpu.models import pipeline
from open3d_slam_advanced_rss_2024_public_tpu.ops.registration import ICPConfig

S = 31  # S-1 warmup steps build the map; scans[S-1] is the probe step
world = synthetic.cluttered_world(jax.random.PRNGKey(0), extent=30.0, n_objects=40)
gt = synthetic.loop_trajectory(S + 9, radius=9.0, center=(15.0, 0.0), z=1.2)
keys = jax.random.split(jax.random.PRNGKey(7), S + 9)
scans = [synthetic.render_scan(world, gt[i], keys[i], n_points=8192,
                               max_range=25.0, noise=0.004) for i in range(S)]
pcfg = pipeline.PipelineConfig(
    icp=ICPConfig(max_iterations=15, matcher="pallas", max_correspondence_dist=0.5),
    scan_voxel_size=0.1, scan_capacity=8192, crop_max_radius=25.0,
    map_patch_capacity=32768, map_voxel_size=0.1, min_refinement_fitness=0.3)
deltas = [np.eye(4, dtype=np.float32)] + [
    (np.linalg.inv(gt[i - 1]) @ gt[i]).astype(np.float32) for i in range(1, S)]

state = pipeline.init_state(1 << 17, jnp.asarray(gt[0]))
for i in range(S - 1):
    state, _ = pipeline.mapper_step_delta(state, scans[i], jnp.asarray(deltas[i]), pcfg)
jax.block_until_ready(state.pose)
print("state ready", file=sys.stderr)
dlt = jnp.asarray(deltas[S - 1])


@partial(jax.jit, static_argnames=("cfg",), donate_argnames=("state",))
def lean_step(state, raw_scan, odom_delta, cfg):
    st, _ = pipeline._step(state, raw_scan, state.pose @ odom_delta, cfg, True)
    return st


def run(label, stepfn, st, K=20):
    # warmup one call
    r = stepfn(st)
    st = r[0] if isinstance(r, tuple) else r
    jax.block_until_ready(st.pose)
    t0 = time.perf_counter()
    for _ in range(K):
        r = stepfn(st)
        st = r[0] if isinstance(r, tuple) else r
    jax.block_until_ready(st.pose)
    dt = (time.perf_counter() - t0) / K * 1e3
    print(f"{label:44s} {dt:8.3f} ms/step")
    return st


state = run("A: full mapper_step_delta",
            lambda st: pipeline.mapper_step_delta(st, scans[S - 1], dlt, pcfg), state)
state = run("B: lean (state-only output)",
            lambda st: lean_step(st, scans[S - 1], dlt, pcfg), state)

# C: AOT compile the lean step to strip python dispatch overhead.
lowered = lean_step.lower(state, scans[S - 1], dlt, pcfg)
compiled = lowered.compile()
state = run("C: lean AOT-compiled",
            lambda st: compiled(st, scans[S - 1], dlt), state)
