"""Scratch profiler: attribute the two-robot SLAM tick cost end-to-end.

Replicates bench.py's run_multirobot with phase timers. Run on the TPU:
    python profile_mr.py
"""

import dataclasses
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))

import numpy as np

import bench

RAW, FILTERED = bench.MR_RAW, bench.MR_FILTERED
N_FRAMES, BLOCK = bench.MR_FRAMES, bench.MR_BLOCK

T = defaultdict(float)
C = defaultdict(int)


class timer:
    def __init__(self, key):
        self.key = key

    def __enter__(self):
        self.t0 = time.perf_counter()

    def __exit__(self, *a):
        T[self.key] += time.perf_counter() - self.t0
        C[self.key] += 1


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
    from mrg_slam_tpu.models.coordinator import SharedTick

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
                                         registration=reg,
                                         enable_transform_thresholding=True,
                                         max_acceptable_translation=2.5,
                                         max_acceptable_angle=0.5)
    slam_cfg = SlamConfig(
        own_name="bench", multi_robot_names=("bench",),
        keyframe_delta_trans=2.0,
        capacity_keyframes=128, capacity_edges=512,
        capacity_keyframe_points=FILTERED,
        registration=dataclasses.replace(reg, reg_maximum_iterations=24),
        optimizer=OptimizerConfig(solver_backend="dense",
                                  g2o_solver_num_iterations=64),
        loop=dataclasses.replace(LoopClosureConfig(), capacity_candidates=4,
                                 fitness_score_max_range=2.0),
        robot_remove_points_radius=0.0)

    traj, scans = bench.build_world_and_scans()
    raw, rmask = bench.stack_scans(scans, RAW)
    raw_d, rmask_d = jnp.asarray(raw), jnp.asarray(rmask)
    stamps = jnp.arange(N_FRAMES, dtype=jnp.float32) * 0.1

    @jax.jit
    def prefilter_batch(pts, masks):
        out = jax.vmap(lambda p, m: prefilter(PointCloud(p, m), pre_cfg)
                       )(pts, masks)
        return out.points, out.mask

    def init_pose_of(p):
        yaw = 2.0 * np.arctan2(p[6], p[3])
        return (float(p[0]), float(p[1]), float(p[2]), float(yaw), 0.0, 0.0)

    windows = {"alpha": (0, 72), "bravo": (54, 120)}
    names = list(windows)

    def run_multirobot(record=False):
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
            def fn(peer, req):
                with timer("exchange.handle_publish_graph"):
                    return peers[requester].handle_publish_graph(req)
            return fn

        def ingest(name, s, fpts, fmask):
            slam = slams[name]
            with timer("ingest.pose_fetch"):
                poses = np.asarray(fused_outs[name])
            for i in range(poses.shape[0]):
                with timer("ingest.process_scan"):
                    bc = slam.process_scan((s + i) * 0.1, poses[i],
                                           PointCloud(fpts[i], fmask[i]))
                with timer("ingest.on_odom_broadcast"):
                    peers[name].on_odom_broadcast(bc)

        n_local = max(hi - lo for lo, hi in windows.values())
        for s in range(0, n_local, BLOCK):
            spans = {n: (windows[n][0] + s,
                         min(windows[n][0] + s + BLOCK, windows[n][1]))
                     for n in names if s < windows[n][1] - windows[n][0]}
            fused_outs = {}
            if (len(spans) == len(names)
                    and all(b - a == BLOCK for a, b in spans.values())):
                with timer("odometry.batched"):
                    fpts, fmask = prefilter_batch(
                        jnp.concatenate([raw_d[a:b] for a, b in spans.values()]),
                        jnp.concatenate([rmask_d[a:b] for a, b in spans.values()]))
                    R = len(names)
                    fpts = fpts.reshape(R, BLOCK, *fpts.shape[1:])
                    fmask = fmask.reshape(R, BLOCK, *fmask.shape[1:])
                    st2 = jnp.broadcast_to(stamps[s:s + BLOCK], (R, BLOCK))
                    carries, outs = fused.run_batch_multi(odo_cfg, carries,
                                                          fpts, fmask, st2)
                    all_poses = np.asarray(outs.pose)
                for r, name in enumerate(names):
                    fused_outs[name] = all_poses[r]
                    ingest(name, s, fpts[r], fmask[r])
            else:
                for r, name in enumerate(names):
                    if name not in spans:
                        continue
                    a, b = spans[name]
                    with timer("odometry.ragged"):
                        fpts, fmask = prefilter_batch(raw_d[a:b], rmask_d[a:b])
                        c_r = jax.tree.map(lambda x: x[r], carries)
                        c_r, outs = fused.run_batch(odo_cfg, c_r, fpts, fmask,
                                                    stamps[s:s + (b - a)])
                        carries = jax.tree.map(lambda f, n: f.at[r].set(n),
                                               carries, c_r)
                        fused_outs[name] = outs.pose
                    ingest(name, s, fpts, fmask)
            now = (s + BLOCK) * 0.1
            with timer("tick_all"):
                stats = ticker.tick_all(now=now)
            if record:
                for n2, st in stats.items():
                    if st is not None:
                        T["tick.loop_closure"] += st.loop_closure_us / 1e6 / 2
                        T["tick.optimize"] += st.optimization_us / 1e6 / 2
            for name in slams:
                with timer("broadcast.slam_pose"):
                    sp = slams[name].slam_pose_broadcast(now)
                if sp is not None:
                    with timer("broadcast.on_slam_pose"):
                        peers[name].on_slam_pose_broadcast(
                            sp, now=now,
                            request_fn=request_fn_for(peers[name].own_name))
        with timer("tick_all"):
            ticker.tick_all(now=n_local * 0.1)
        return slams

    # fine-grained tick instrumentation via wrappers
    from mrg_slam_tpu.models.loop_detector import LoopDetector
    from mrg_slam_tpu.models.pair_runner import PairRunner
    from mrg_slam_tpu.models import coordinator as coord
    from mrg_slam_tpu.graph import builder as gb

    def wrap(cls, name, key):
        orig = getattr(cls, name)

        def timed(*a, **kw):
            with timer(key):
                return orig(*a, **kw)
        setattr(cls, name, timed)

    wrap(MrgSlam, "_tick_begin", "tickd.begin(flushes)")
    wrap(MrgSlam, "_tick_insert", "tickd.insert")
    wrap(MrgSlam, "_tick_post", "tickd.post")
    wrap(LoopDetector, "build_requests", "tickd.build_requests")
    wrap(LoopDetector, "resolve", "tickd.resolve")
    wrap(PairRunner, "run", "tickd.pair_run")
    orig_om = gb.optimize_many

    def timed_om(graphs):
        with timer("tickd.optimize_many"):
            return orig_om(graphs)
    gb.optimize_many = timed_om
    coord.optimize_many = timed_om

    nreq = []
    orig_run = PairRunner.run

    def counting_run(self, requests):
        nreq.append(len(requests))
        return orig_run(self, requests)
    # PairRunner.run already wrapped; count inside build batch via runner
    t0 = time.perf_counter()
    run_multirobot()  # warmup
    print(f"# warmup {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    T.clear(); C.clear()
    t0 = time.perf_counter()
    slams = run_multirobot(record=True)
    total = time.perf_counter() - t0
    n_scans = sum(hi - lo for lo, hi in windows.values())
    print(f"# total {total:.3f}s ({n_scans / total:.1f} scans/s)")
    for k in sorted(T, key=lambda k: -T[k]):
        print(f"  {k:35s} {T[k] * 1e3:9.1f} ms  x{C[k]}")
    acc = sum(v for k, v in T.items() if not k.startswith("tick."))
    print(f"  {'(accounted)':35s} {acc * 1e3:9.1f} ms")


if __name__ == "__main__":
    main()
