"""Benchmark: scan-matching odometry frames/s on one TPU chip.

Runs the production odometry path — batched prefiltering (voxel downsample
+ radius outlier removal) and the fully device-resident fused odometry
(GICP alignment + on-device keyframe switching, models/odometry_fused.py)
— over synthetic LiDAR scans at production sizes, and reports sustained
frames/s.

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

    from mrg_slam_tpu.config import (PrefilterConfig, RegistrationConfig,
                                     ScanMatchingOdometryConfig)
    from mrg_slam_tpu.io.synthetic import SyntheticWorld, circle_trajectory
    from mrg_slam_tpu.models import odometry_fused as fused
    from mrg_slam_tpu.ops.cloud import PointCloud
    from mrg_slam_tpu.ops.prefilter import prefilter

    dev = jax.devices()[0]
    print(f"# device: {dev}", file=sys.stderr)

    RAW = 32768        # raw scan points fed per frame
    FILTERED = 8192    # prefiltered cloud capacity (odometry working size)
    N_FRAMES = 60
    BLOCK = 20         # frames per device dispatch

    pre_cfg = PrefilterConfig(downsample_resolution=0.2,
                              capacity_raw_points=RAW,
                              capacity_filtered_points=FILTERED,
                              outlier_removal_method="RADIUS",
                              radius_radius=0.5, radius_min_neighbors=2)
    cfg = ScanMatchingOdometryConfig(
        keyframe_delta_translation=1.0,
        registration=RegistrationConfig(
            registration_method="SMALL_GICP",
            reg_maximum_iterations=12,
            reg_transformation_epsilon=1e-2,
            reg_covariance_mode="radius", reg_covariance_radius=0.6,
            reg_max_correspondence_distance=2.0))

    world = SyntheticWorld.build(seed=7, extent=45.0, n_ground=120000,
                                 n_pillars=60, n_walls=20,
                                 max_points_per_scan=RAW, noise=0.02)
    traj = circle_trajectory(N_FRAMES, radius=15.0, laps=0.35)
    scans = [world.scan(p, seed=i) for i, p in enumerate(traj)]

    def to_dev(scan):
        pts = np.full((RAW, 3), 1.0e6, np.float32)
        pts[: len(scan)] = scan[:RAW]
        mask = np.zeros(RAW, bool)
        mask[: len(scan)] = True
        return pts, mask

    raw = np.stack([to_dev(s)[0] for s in scans])
    rmask = np.stack([to_dev(s)[1] for s in scans])
    raw_d = jnp.asarray(raw)
    rmask_d = jnp.asarray(rmask)
    stamps = jnp.arange(N_FRAMES, dtype=jnp.float32) * 0.1

    @jax.jit
    def prefilter_batch(pts, masks):
        out = jax.vmap(lambda p, m: prefilter(PointCloud(p, m), pre_cfg)
                       )(pts, masks)
        return out.points, out.mask

    # warmup / compile
    fpts, fmask = prefilter_batch(raw_d[:BLOCK], rmask_d[:BLOCK])
    carry = fused.init_carry(FILTERED)
    carry_w, outs = fused.run_batch(cfg, carry, fpts, fmask, stamps[:BLOCK])
    jax.block_until_ready(outs.pose)

    # timed run: full pipeline, one dispatch chain, sync once
    t0 = time.perf_counter()
    carry = fused.init_carry(FILTERED)
    all_poses = []
    for s in range(0, N_FRAMES, BLOCK):
        fpts, fmask = prefilter_batch(raw_d[s:s + BLOCK],
                                      rmask_d[s:s + BLOCK])
        carry, outs = fused.run_batch(cfg, carry, fpts, fmask,
                                      stamps[s:s + BLOCK])
        all_poses.append(outs.pose)
    jax.block_until_ready(all_poses[-1])
    dt = time.perf_counter() - t0
    fps = N_FRAMES / dt

    poses = np.concatenate([np.asarray(p) for p in all_poses])
    kf = sum(int(np.asarray(o.is_new_keyframe).sum()) for o in [outs])
    print(f"# {N_FRAMES} frames in {dt:.3f}s; last-block keyframes {kf}; "
          f"traj end {np.round(poses[-1][:3], 2)}", file=sys.stderr)
    print(json.dumps({
        "metric": "scan_matching_odometry_frames_per_s",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 10.0, 3),
    }))


if __name__ == "__main__":
    main()
