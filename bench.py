"""Benchmark: scan-matching odometry frames/s on one TPU chip.

Runs the full per-scan pipeline (prefilter -> GICP source prep -> batched
Gauss-Newton alignment against the current keyframe target) on synthetic
LiDAR scans at production sizes, and reports sustained frames/s.

The reference publishes no numbers (BASELINE.md), so vs_baseline is
measured against the real-time sensor rate the reference must sustain:
10 Hz LiDAR (KITTI/Nebula). vs_baseline = frames_per_s / 10.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
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


def main():
    import jax
    import jax.numpy as jnp

    from mrg_slam_tpu.config import PrefilterConfig, RegistrationConfig
    from mrg_slam_tpu.io.synthetic import SyntheticWorld, circle_trajectory
    from mrg_slam_tpu.ops import registration as reg
    from mrg_slam_tpu.ops.cloud import PointCloud
    from mrg_slam_tpu.ops.prefilter import prefilter
    from mrg_slam_tpu.utils import se3

    dev = jax.devices()[0]
    print(f"# device: {dev}", file=sys.stderr)

    RAW = 32768         # raw scan points fed per frame
    FILTERED = 8192     # prefiltered cloud capacity (odometry working size)
    N_FRAMES = 60

    pre_cfg = PrefilterConfig(downsample_resolution=0.2,
                              capacity_raw_points=RAW,
                              capacity_filtered_points=FILTERED,
                              outlier_removal_method="RADIUS",
                              radius_radius=0.5, radius_min_neighbors=2)
    params = RegistrationConfig(registration_method="SMALL_GICP",
                                reg_maximum_iterations=24,
                                reg_transformation_epsilon=1e-3,
                                reg_correspondence_randomness=10,
                                reg_max_correspondence_distance=2.0)

    world = SyntheticWorld.build(seed=7, extent=45.0, n_ground=120000,
                                 n_pillars=60, n_walls=20,
                                 max_points_per_scan=RAW, noise=0.02)
    traj = circle_trajectory(N_FRAMES, radius=15.0, laps=0.35)
    scans = [world.scan(p, seed=i) for i, p in enumerate(traj)]

    # Stage-wise jits: the remote TPU compile service handles the three
    # moderate programs far better than one mega-fused scan pipeline, and
    # intermediate results stay on device either way.
    @jax.jit
    def stage_prefilter(raw_pts, raw_mask):
        return prefilter(PointCloud(raw_pts, raw_mask), pre_cfg)

    @jax.jit
    def stage_source(cloud):
        return reg.make_source(cloud, params)

    @jax.jit
    def stage_align(source, target, prev_rel):
        res = reg.align(params, source, target, prev_rel)
        return res.pose, res.num_inliers

    def frame_step(raw_pts, raw_mask, target, prev_rel):
        cloud = stage_prefilter(raw_pts, raw_mask)
        source = stage_source(cloud)
        pose, n_in = stage_align(source, target, prev_rel)
        return pose, n_in, cloud

    def to_dev(scan):
        pts = np.full((RAW, 3), 1.0e6, np.float32)
        pts[: len(scan)] = scan[:RAW]
        mask = np.zeros(RAW, bool)
        mask[: len(scan)] = True
        return jnp.asarray(pts), jnp.asarray(mask)

    # build initial keyframe target
    pts0, mask0 = to_dev(scans[0])
    kf_cloud = prefilter(PointCloud(pts0, mask0), pre_cfg)
    target = reg.make_target(kf_cloud, params)
    ident = jnp.asarray(np.asarray(se3.pose_identity()))

    # device-resident scans (exclude host transfer from the hot loop, as the
    # reference excludes DDS deserialization from its matching timer)
    dev_scans = [to_dev(s) for s in scans]

    # warmup / compile
    pose, n_in, _ = frame_step(dev_scans[1][0], dev_scans[1][1], target, ident)
    pose.block_until_ready()
    t_target = time.perf_counter()
    target2 = reg.make_target(kf_cloud, params)
    jax.block_until_ready(target2)
    print(f"# keyframe target prep: {(time.perf_counter()-t_target)*1e3:.1f} ms",
          file=sys.stderr)

    # timed loop: every frame matches against the keyframe target; keyframe
    # switch cadence is emulated every 20 frames (re-prep target)
    t0 = time.perf_counter()
    prev = ident
    for i in range(1, N_FRAMES):
        pose, n_in, cloud = frame_step(dev_scans[i][0], dev_scans[i][1],
                                       target, prev)
        prev = pose
        if i % 20 == 0:
            target = reg.make_target(cloud, params)
    jax.block_until_ready(pose)
    dt = time.perf_counter() - t0
    fps = (N_FRAMES - 1) / dt

    print(f"# {N_FRAMES-1} frames in {dt:.3f}s, inliers last={int(n_in)}",
          file=sys.stderr)
    print(json.dumps({
        "metric": "scan_matching_odometry_frames_per_s",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 10.0, 3),
    }))


if __name__ == "__main__":
    main()
