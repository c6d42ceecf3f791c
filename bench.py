"""Benchmark: FULL graph SLAM frames/s on one TPU chip.

Runs the complete production pipeline — batched prefiltering (voxel
downsample + radius outlier removal), fully device-resident fused odometry
(models/odometry_fused.py), and the batched back-end tick (keyframe
admission, loop-closure candidate matching + consistency check + edge
fitness in two `align_pairs` dispatches, then the jitted LM pose-graph
solve) — over synthetic LiDAR scans at production sizes, with loop
closures actually firing, and reports sustained end-to-end frames/s.

The reference publishes no numbers (BASELINE.md); it runs its whole stack
live against a 10 Hz LiDAR (optimization timer alongside streaming scans,
apps/mrg_slam_component.cpp:802). vs_baseline = frames_per_s / 10 — how
many times faster than the sensor the full stack runs.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.
extra carries the front-end-only odometry rate (round-1 headline metric)
and a 1024-node pose-graph solve wall time.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))

import numpy as np

RAW = 32768        # raw scan points fed per frame
FILTERED = 4096    # prefiltered cloud capacity (working size)
N_FRAMES = 120
BLOCK = 20         # frames per device dispatch (~ graph_update_interval)


def build_world_and_scans():
    from mrg_slam_tpu.io.synthetic import SyntheticWorld, circle_trajectory

    world = SyntheticWorld.build(seed=7, extent=45.0, n_ground=120000,
                                 n_pillars=60, n_walls=20,
                                 max_points_per_scan=RAW, noise=0.02)
    traj = circle_trajectory(N_FRAMES, radius=15.0, laps=1.25)
    scans = [world.scan(p, seed=i) for i, p in enumerate(traj)]
    return traj, scans


def stack_scans(scans):
    raw = np.full((len(scans), RAW, 3), 1.0e6, np.float32)
    rmask = np.zeros((len(scans), RAW), bool)
    for i, s in enumerate(scans):
        n = min(len(s), RAW)
        raw[i, :n] = s[:n]
        rmask[i, :n] = True
    return raw, rmask


def main():
    import jax
    import jax.numpy as jnp

    from mrg_slam_tpu.config import (LoopClosureConfig, OptimizerConfig,
                                     PrefilterConfig, RegistrationConfig,
                                     ScanMatchingOdometryConfig, SlamConfig)
    from mrg_slam_tpu.models import odometry_fused as fused
    from mrg_slam_tpu.models.backend import MrgSlam
    from mrg_slam_tpu.ops.cloud import PointCloud
    from mrg_slam_tpu.ops.prefilter import prefilter

    dev = jax.devices()[0]
    print(f"# device: {dev}", file=sys.stderr)

    pre_cfg = PrefilterConfig(downsample_resolution=0.3,
                              capacity_raw_points=RAW,
                              capacity_filtered_points=FILTERED,
                              outlier_removal_method="RADIUS",
                              radius_radius=0.5, radius_min_neighbors=2)
    reg = RegistrationConfig(
        registration_method="SMALL_GICP",
        reg_maximum_iterations=12,
        reg_transformation_epsilon=1e-2,
        reg_covariance_mode="radius", reg_covariance_radius=0.6,
        reg_max_correspondence_distance=2.0)
    odo_cfg = ScanMatchingOdometryConfig(keyframe_delta_translation=1.0,
                                         registration=reg)
    import dataclasses
    slam_cfg = SlamConfig(
        own_name="bench", multi_robot_names=("bench",),
        keyframe_delta_trans=2.0,
        capacity_keyframes=128, capacity_edges=512,
        capacity_keyframe_points=FILTERED,
        registration=dataclasses.replace(reg, reg_maximum_iterations=24),
        optimizer=OptimizerConfig(solver_backend="dense",
                                  g2o_solver_num_iterations=64),
        # fitness_score_max_range gates the acceptance fitness to the
        # correspondence radius. Measured on this workload (BENCH r2 debug):
        # at the reference default inf, capacity-truncated 4096-pt voxel
        # subsets inflate the ungated mean-NN fitness and 0/13 candidate
        # sets pass; at 2.0 m, 8 loops close and SLAM ATE drops 2.19 m ->
        # 0.53 m vs odometry. The reference exposes the param for exactly
        # this gating (loop_detector.cpp:156).
        loop=dataclasses.replace(LoopClosureConfig(), capacity_candidates=4,
                                 fitness_score_max_range=2.0),
        robot_remove_points_radius=0.0)

    traj, scans = build_world_and_scans()
    raw, rmask = stack_scans(scans)
    raw_d, rmask_d = jnp.asarray(raw), jnp.asarray(rmask)
    stamps = jnp.arange(N_FRAMES, dtype=jnp.float32) * 0.1

    @jax.jit
    def prefilter_batch(pts, masks):
        out = jax.vmap(lambda p, m: prefilter(PointCloud(p, m), pre_cfg)
                       )(pts, masks)
        return out.points, out.mask

    def run_full_slam():
        # serial ticks: on one chip the device is the bottleneck, so
        # running the tick on a worker thread (optimization_tick_async)
        # only lets keyframes pile up into bigger candidate batches whose
        # vmapped while_loop pays the slowest pair's iteration count —
        # measured 2x SLOWER than ticking synchronously every block.
        slam = MrgSlam(slam_cfg)
        carry = fused.init_carry(FILTERED)
        for s in range(0, N_FRAMES, BLOCK):
            fpts, fmask = prefilter_batch(raw_d[s:s + BLOCK],
                                          rmask_d[s:s + BLOCK])
            carry, outs = fused.run_batch(odo_cfg, carry, fpts, fmask,
                                          stamps[s:s + BLOCK])
            poses = np.asarray(outs.pose)  # one fetch per block
            for i in range(poses.shape[0]):
                slam.process_scan((s + i) * 0.1, poses[i],
                                  PointCloud(fpts[i], fmask[i]))
            slam.optimization_tick(now=(s + BLOCK) * 0.1)
        return slam

    # warmup / compile (touches every program incl. tick + solve)
    t0 = time.perf_counter()
    slam = run_full_slam()
    print(f"# warmup(+compile) {time.perf_counter() - t0:.1f}s",
          file=sys.stderr)

    t0 = time.perf_counter()
    slam = run_full_slam()
    dt_slam = time.perf_counter() - t0
    fps_slam = N_FRAMES / dt_slam

    n_kf = len(slam.db.keyframes) + len(slam.db.new_keyframes)
    n_loops = sum(1 for e in slam.db.edges if e.type == "loop")
    from mrg_slam_tpu.utils.metrics import ate_rmse
    te = slam.trajectory()
    own = sorted(slam.db.own_keyframes(), key=lambda k: k.stamp)
    idx = [int(round(k.stamp / 0.1)) for k in own]
    ate = ate_rmse(te[:, :3], traj[idx][:, :3])
    odo = np.stack([k.odom for k in own])
    ate_odom = ate_rmse(odo[:, :3], traj[idx][:, :3])
    print(f"# full SLAM: {N_FRAMES} frames in {dt_slam:.3f}s "
          f"({fps_slam:.1f} fps); {n_kf} keyframes, {n_loops} loops, "
          f"ATE {ate:.3f} m (odometry-only {ate_odom:.3f} m)",
          file=sys.stderr)
    ticks = slam.tick_stats
    if ticks:
        lc = sum(t.loop_closure_us for t in ticks) / len(ticks) / 1e3
        op = sum(t.optimization_us for t in ticks) / len(ticks) / 1e3
        it = sum(t.iterations for t in ticks) / len(ticks)
        print(f"# tick breakdown ({len(ticks)} ticks): loop-closure "
              f"{lc:.0f} ms, optimize {op:.0f} ms ({it:.0f} LM iters) avg",
              file=sys.stderr)

    # front-end-only odometry rate (round-1 headline, for continuity)
    carry = fused.init_carry(FILTERED)
    t0 = time.perf_counter()
    last = None
    for s in range(0, N_FRAMES, BLOCK):
        fpts, fmask = prefilter_batch(raw_d[s:s + BLOCK],
                                      rmask_d[s:s + BLOCK])
        carry, outs = fused.run_batch(odo_cfg, carry, fpts, fmask,
                                      stamps[s:s + BLOCK])
        last = outs.pose
    jax.block_until_ready(last)
    fps_odom = N_FRAMES / (time.perf_counter() - t0)

    # 1024-node pose-graph solve wall time on this chip (VERDICT item 6).
    # dense (equilibrated f32 Cholesky on the MXU) measured 6.5x faster
    # than block-Jacobi PCG at this size (412 ms/18 LM iters vs 2.7 s at
    # the 64-iter cap); the cg backend remains the choice for graphs past
    # dense capacity and for the sharded distributed path.
    from mrg_slam_tpu.pipeline.baseline_runs import build_ring_graph
    from mrg_slam_tpu.graph import solve
    gs = build_ring_graph(n_nodes=1024, capacity_nodes=1024,
                          capacity_edges=2048,
                          backend="dense")
    g = gs.snapshot()
    cfg1k = OptimizerConfig(solver_backend="dense",
                            g2o_solver_num_iterations=64)
    res = solve.optimize(g, cfg1k)  # compile
    jax.block_until_ready(res.poses)
    t0 = time.perf_counter()
    res = solve.optimize(g, cfg1k)
    jax.block_until_ready(res.poses)
    dt_solve = time.perf_counter() - t0
    print(f"# 1024-node solve {dt_solve * 1e3:.1f} ms "
          f"(chi2 {float(res.chi2_initial):.1f} -> "
          f"{float(res.chi2_final):.3f}, {int(res.iterations)} iters)",
          file=sys.stderr)

    print(json.dumps({
        "metric": "full_graph_slam_frames_per_s",
        "value": round(fps_slam, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps_slam / 10.0, 3),
        "extra": {
            "scan_matching_odometry_frames_per_s": round(fps_odom, 2),
            "keyframes": n_kf, "loops": n_loops,
            "ate_m": round(ate, 3), "ate_odometry_only_m": round(ate_odom, 3),
            "solve_1024_node_ms": round(dt_solve * 1e3, 1),
        },
    }))


if __name__ == "__main__":
    main()
