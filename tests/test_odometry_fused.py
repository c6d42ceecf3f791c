"""Fused device-resident odometry vs the host-orchestrated version."""

import numpy as np
import jax.numpy as jnp
import pytest

from mrg_slam_tpu.config import (PrefilterConfig, RegistrationConfig,
                                 ScanMatchingOdometryConfig)
from mrg_slam_tpu.io.synthetic import SyntheticWorld, circle_trajectory
from mrg_slam_tpu.models import odometry_fused as fused
from mrg_slam_tpu.ops.cloud import PointCloud
from mrg_slam_tpu.ops.prefilter import prefilter
from mrg_slam_tpu.utils.metrics import ate_rmse

CFG = ScanMatchingOdometryConfig(
    keyframe_delta_translation=2.0,
    registration=RegistrationConfig(
        reg_transformation_epsilon=1e-3, reg_maximum_iterations=32,
        reg_covariance_mode="radius", reg_covariance_radius=1.0))
PRE = PrefilterConfig(downsample_resolution=0.4,
                      capacity_filtered_points=1024,
                      outlier_removal_method="NONE")


def make_frames(n=40):
    world = SyntheticWorld.build(seed=9, extent=30.0, n_ground=20000,
                                 max_points_per_scan=4096, noise=0.02)
    traj = circle_trajectory(n, radius=12.0, laps=0.5)
    pts, masks = [], []
    for i, p in enumerate(traj):
        pc = prefilter(PointCloud.from_array(world.scan(p, seed=i),
                                             capacity=4096), PRE)
        pts.append(pc.points)
        masks.append(pc.mask)
    return traj, jnp.stack(pts), jnp.stack(masks)


def test_fused_odometry_stepwise():
    traj, pts, masks = make_frames(30)
    carry = fused.init_carry(pts.shape[1])
    poses, n_kf = [], 0
    for i in range(pts.shape[0]):
        carry, out = fused.odometry_step(CFG, carry, pts[i], masks[i],
                                         jnp.float32(i * 0.1))
        poses.append(np.asarray(out.pose))
        n_kf += int(out.is_new_keyframe)
    est = np.stack(poses)
    ate = ate_rmse(est[:, :3], traj[:30, :3])
    assert ate < 0.3, ate
    assert n_kf >= 3


def test_fused_batch_matches_stepwise():
    traj, pts, masks = make_frames(20)
    stamps = jnp.arange(20, dtype=jnp.float32) * 0.1

    carry = fused.init_carry(pts.shape[1])
    step_poses = []
    for i in range(20):
        carry, out = fused.odometry_step(CFG, carry, pts[i], masks[i],
                                         stamps[i])
        step_poses.append(np.asarray(out.pose))

    carry2 = fused.init_carry(pts.shape[1])
    _, outs = fused.run_batch(CFG, carry2, pts, masks, stamps)
    batch_poses = np.asarray(outs.pose)
    np.testing.assert_allclose(batch_poses, np.stack(step_poses), atol=1e-5)


def test_fused_no_inlier_keeps_last_and_recovers():
    """A scan with zero correspondences (e.g. total occlusion / sensor
    glitch) must NOT poison the odometry: the step keeps the last relative
    pose instead of adopting the registration's garbage running estimate
    (which previously spiralled into a permanent keyframe-sized ping-pong
    via the constant-velocity guess), and the next good scan re-locks."""
    traj, pts, masks = make_frames(12)
    carry = fused.init_carry(pts.shape[1])
    poses = []
    far = pts[5] + 1000.0  # valid mask, hopelessly out of range
    for i in range(12):
        p = far if i == 5 else pts[i]
        carry, out = fused.odometry_step(CFG, carry, p, masks[i],
                                         jnp.float32(i * 0.1))
        poses.append(np.asarray(out.pose))
        if i == 5:
            assert not bool(out.converged)
            assert int(out.num_inliers) == 0
    est = np.stack(poses)
    steps = np.linalg.norm(np.diff(est[:, :3], axis=0), axis=1)
    # nominal motion is ~3.1 m/frame here; the glitch frame must produce a
    # zero step (keep-last) and recovery stays bounded — no 1000 m jump,
    # no ping-pong
    assert steps[4] < 1e-3, steps
    assert steps.max() < 6.0, steps
    # post-glitch frames keep tracking the circle
    ate = ate_rmse(est[6:, :3], traj[6:, :3])
    assert ate < 1.0, ate


def test_fused_jump_rejection_blocks_alias():
    """enable_transform_thresholding: an inlier-rich but wildly wrong
    relative pose is rejected (keep-last) until max_consecutive_rejections
    forces re-acceptance — scan_matching_odometry_component.cpp:278-315."""
    import dataclasses

    traj, pts, masks = make_frames(10)
    cfg = dataclasses.replace(CFG, enable_transform_thresholding=True,
                              max_acceptable_translation=0.05,
                              max_acceptable_angle=0.05,
                              max_consecutive_rejections=3)
    carry = fused.init_carry(pts.shape[1])
    carry, _ = fused.odometry_step(cfg, carry, pts[0], masks[0],
                                   jnp.float32(0.0))
    # frame 1 moves ~0.9 m -> exceeds the (absurdly tight) gate -> rejected
    carry, out1 = fused.odometry_step(cfg, carry, pts[1], masks[1],
                                      jnp.float32(0.1))
    assert np.linalg.norm(np.asarray(out1.pose)[:3]) < 0.05
    assert int(carry.rejections) == 1
    # after max_consecutive_rejections the gate force-accepts
    for i in (2, 3, 4):
        carry, out = fused.odometry_step(cfg, carry, pts[i], masks[i],
                                         jnp.float32(i * 0.1))
    assert np.linalg.norm(np.asarray(out.pose)[:3]) > 0.5


def test_fused_covs_seed_backend_cache():
    """OdomStepOut.covs must equal the backend's own make_source
    covariances for the same cloud (covariance_compatible contract), so
    process_scan(source_covs=...) seeds a byte-equivalent pair-program
    cache and the tick's covariance prefetch is skipped."""
    import numpy as np
    import jax.numpy as jnp

    from mrg_slam_tpu.config import (RegistrationConfig,
                                     ScanMatchingOdometryConfig)
    from mrg_slam_tpu.models import odometry_fused as fused
    from mrg_slam_tpu.ops import registration as reg
    from mrg_slam_tpu.ops.cloud import PointCloud

    rng = np.random.default_rng(0)
    cap, F = 512, 4
    pts = rng.uniform(-10, 10, size=(F, cap, 3)).astype(np.float32)
    pts[..., 2] = 0.1 * np.sin(pts[..., 0])
    masks = np.ones((F, cap), bool)
    r = RegistrationConfig(reg_covariance_mode="radius",
                           reg_covariance_radius=1.0,
                           reg_maximum_iterations=8)
    cfg = ScanMatchingOdometryConfig(registration=r)
    carry = fused.init_carry(cap)
    carry, outs = fused.run_batch(cfg, carry, jnp.asarray(pts),
                                  jnp.asarray(masks),
                                  jnp.arange(F, dtype=jnp.float32))
    assert outs.covs.shape == (F, cap, 3, 3)
    # compatible config -> identical covariances to make_source
    assert reg.covariance_compatible(r, r)
    want = reg.make_source(PointCloud(jnp.asarray(pts[2]),
                                      jnp.asarray(masks[2])), r)
    np.testing.assert_allclose(np.asarray(outs.covs[2]),
                               np.asarray(want.covs), atol=1e-5)
    # incompatible settings are rejected by the gate
    import dataclasses
    other = dataclasses.replace(r, reg_covariance_radius=2.0)
    assert not reg.covariance_compatible(r, other)
    assert not reg.covariance_compatible(
        r, dataclasses.replace(r, registration_method="NDT"))
