"""Benchmark: FULL graph SLAM frames/s on one TPU chip.

Runs the complete production pipeline — batched prefiltering (voxel
downsample + radius outlier removal), fully device-resident fused odometry
(models/odometry_fused.py), and the batched back-end tick (keyframe
admission, loop-closure candidate matching + consistency check + edge
fitness in one `align_pairs` dispatch, then the jitted LM pose-graph
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
    # transform thresholding catches inlier-rich-but-aliased registrations
    # (repetitive pillar structure can pull a solve tens of meters in one
    # frame); ~1 m/frame motion here, so 2.5 m / 0.5 rad is a loose gate
    odo_cfg = ScanMatchingOdometryConfig(keyframe_delta_translation=1.0,
                                         registration=reg,
                                         enable_transform_thresholding=True,
                                         max_acceptable_translation=2.5,
                                         max_acceptable_angle=0.5)
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

    # two-robot full SLAM: overlapping circle windows, odom + slam-pose
    # broadcasts, on-demand delta-graph exchange (PublishGraph service),
    # joint optimization with inter-robot loop closures — the reference's
    # headline multi-robot deployment (apps/mrg_slam_component.cpp:517-683)
    # measured end-to-end on the chip. Robots BATCH on the chip: full
    # frame blocks run both odometry chains in one vmapped dispatch
    # (odometry_fused.run_batch_multi), and the back-end ticks share one
    # dispatch chain (models/coordinator.py SharedTick) — R robots pay the
    # device cost of one.
    def init_pose_of(p):
        yaw = 2.0 * np.arctan2(p[6], p[3])
        return (float(p[0]), float(p[1]), float(p[2]), float(yaw), 0.0, 0.0)

    from mrg_slam_tpu.models.coordinator import SharedTick

    windows = {"alpha": (0, 72), "bravo": (54, 120)}
    names = list(windows)
    def run_multirobot():
        slams, peers = {}, {}
        for name, (lo, _) in windows.items():
            cfg_r = dataclasses.replace(
                slam_cfg, own_name=name,
                multi_robot_names=("alpha", "bravo"),
                init_pose=init_pose_of(np.asarray(traj[lo])))
            slams[name] = MrgSlam(cfg_r)
        peers["alpha"], peers["bravo"] = slams["bravo"], slams["alpha"]
        ticker = SharedTick([slams[n] for n in names])
        carries = jax.tree.map(lambda *x: jnp.stack(x),
                               *[fused.init_carry(FILTERED) for _ in names])

        def request_fn_for(requester):
            return lambda peer, req: peers[requester].handle_publish_graph(req)

        def ingest(name, s, fpts, fmask):
            slam = slams[name]
            poses = np.asarray(fused_outs[name])
            for i in range(poses.shape[0]):
                bc = slam.process_scan((s + i) * 0.1, poses[i],
                                       PointCloud(fpts[i], fmask[i]))
                peers[name].on_odom_broadcast(bc)

        n_local = max(hi - lo for lo, hi in windows.values())
        for s in range(0, n_local, BLOCK):
            spans = {n: (windows[n][0] + s,
                         min(windows[n][0] + s + BLOCK, windows[n][1]))
                     for n in names if s < windows[n][1] - windows[n][0]}
            fused_outs = {}
            if (len(spans) == len(names)
                    and all(b - a == BLOCK for a, b in spans.values())):
                # full blocks for every robot: ONE prefilter + ONE vmapped
                # odometry dispatch + ONE pose fetch for all of them
                fpts, fmask = prefilter_batch(
                    jnp.concatenate([raw_d[a:b] for a, b in spans.values()]),
                    jnp.concatenate([rmask_d[a:b] for a, b in spans.values()]))
                R = len(names)
                fpts = fpts.reshape(R, BLOCK, *fpts.shape[1:])
                fmask = fmask.reshape(R, BLOCK, *fmask.shape[1:])
                st2 = jnp.broadcast_to(stamps[s:s + BLOCK], (R, BLOCK))
                carries, outs = fused.run_batch_multi(odo_cfg, carries,
                                                      fpts, fmask, st2)
                all_poses = np.asarray(outs.pose)  # (R, B, 7): one fetch
                for r, name in enumerate(names):
                    fused_outs[name] = all_poses[r]
                    ingest(name, s, fpts[r], fmask[r])
            else:
                # ragged window tails fall back to per-robot blocks
                for r, name in enumerate(names):
                    if name not in spans:
                        continue
                    a, b = spans[name]
                    fpts, fmask = prefilter_batch(raw_d[a:b], rmask_d[a:b])
                    c_r = jax.tree.map(lambda x: x[r], carries)
                    c_r, outs = fused.run_batch(odo_cfg, c_r, fpts, fmask,
                                                stamps[s:s + (b - a)])
                    carries = jax.tree.map(lambda f, n: f.at[r].set(n),
                                           carries, c_r)
                    fused_outs[name] = outs.pose
                    ingest(name, s, fpts, fmask)
            now = (s + BLOCK) * 0.1
            ticker.tick_all(now=now)  # ONE dispatch chain for all robots
            for name in slams:
                sp = slams[name].slam_pose_broadcast(now)
                if sp is not None:
                    peers[name].on_slam_pose_broadcast(
                        sp, now=now,
                        request_fn=request_fn_for(peers[name].own_name))
        ticker.tick_all(now=n_local * 0.1)
        return slams

    slams = run_multirobot()  # warmup (graph-merge paths compile here)
    t0 = time.perf_counter()
    slams = run_multirobot()
    dt_mr = time.perf_counter() - t0
    n_scans = sum(hi - lo for lo, hi in windows.values())
    fps_mr = n_scans / dt_mr
    mr_ates, n_remote = [], 0
    for name, (lo, hi) in windows.items():
        own = sorted(slams[name].db.own_keyframes(), key=lambda k: k.stamp)
        est = np.stack([k.estimate(slams[name].db.graph) for k in own])
        gt = traj[[lo + int(round(k.stamp / 0.1)) for k in own]]
        mr_ates.append(ate_rmse(est[:, :3], np.asarray(gt)[:, :3]))
        n_remote += sum(1 for k in slams[name].db.keyframes
                        + slams[name].db.new_keyframes
                        if k.robot_name != name)
    xbytes = sum(sum(s.received_graph_bytes) for s in slams.values())
    print(f"# two-robot SLAM: {n_scans} scans in {dt_mr:.3f}s "
          f"({fps_mr:.1f} scans/s); ATE {max(mr_ates):.3f} m worst robot, "
          f"{n_remote} merged remote keyframes, "
          f"{xbytes / 1e6:.2f} MB exchanged", file=sys.stderr)

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
    # median of 3 reps, each on slightly perturbed translations: a rerun on
    # byte-identical inputs has been observed to return in ~8 ms through
    # the remote tunnel (result memoization), 50x below the honest solve
    # wall — distinct inputs defeat it
    reps = []
    for k in range(3):
        gk = g._replace(poses=g.poses.at[:, :3].add(1e-4 * (k + 1)))
        jax.block_until_ready(gk.poses)
        t0 = time.perf_counter()
        res = solve.optimize(gk, cfg1k)
        jax.block_until_ready(res.poses)
        reps.append(time.perf_counter() - t0)
    dt_solve = sorted(reps)[1]
    print(f"# 1024-node solve {dt_solve * 1e3:.1f} ms "
          f"(reps {[round(r * 1e3, 1) for r in reps]}; "
          f"chi2 {float(res.chi2_initial):.1f} -> "
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
            "two_robot_scans_per_s": round(fps_mr, 2),
            "two_robot_worst_ate_m": round(max(mr_ates), 3),
            "two_robot_merged_remote_keyframes": n_remote,
            "two_robot_exchanged_mb": round(xbytes / 1e6, 2),
        },
    }))


if __name__ == "__main__":
    main()
