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
