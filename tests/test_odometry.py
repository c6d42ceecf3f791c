"""End-to-end scan-matching odometry on the synthetic world."""

import numpy as np
import pytest

from mrg_slam_tpu.config import (PrefilterConfig, RegistrationConfig,
                                 ScanMatchingOdometryConfig)
from mrg_slam_tpu.io.synthetic import (SyntheticWorld, circle_trajectory,
                                       straight_trajectory)
from mrg_slam_tpu.models.odometry import ScanMatchingOdometry
from mrg_slam_tpu.ops.cloud import PointCloud
from mrg_slam_tpu.ops.prefilter import prefilter
from mrg_slam_tpu.utils.metrics import ate_rmse


def run_odometry(world, traj, cfg, pre_cfg, n_capacity=4096):
    odom = ScanMatchingOdometry(cfg)
    est = []
    for i, pose in enumerate(traj):
        scan = world.scan(pose, seed=i)
        pc = PointCloud.from_array(scan, capacity=n_capacity)
        pc = prefilter(pc, pre_cfg)
        out = odom.step(pc, stamp=i * 0.1)
        est.append(out.pose)
    return np.stack(est)


@pytest.fixture(scope="module")
def world():
    return SyntheticWorld.build(seed=3, extent=40.0, n_ground=30000,
                                max_points_per_scan=4096, noise=0.01)


def make_cfgs(method="SMALL_GICP"):
    pre = PrefilterConfig(downsample_resolution=0.4,
                          capacity_filtered_points=2048,
                          outlier_removal_method="NONE",
                          distance_far_thresh=35.0)
    cfg = ScanMatchingOdometryConfig(
        keyframe_delta_translation=2.0,
        registration=RegistrationConfig(
            registration_method=method,
            reg_transformation_epsilon=1e-3,
            reg_maximum_iterations=48,
            reg_max_correspondence_distance=2.0,
            reg_correspondence_randomness=10,
        ))
    return cfg, pre

def test_straight_line_odometry(world):
    traj = straight_trajectory(20, speed=0.5)
    cfg, pre = make_cfgs()
    est = run_odometry(world, traj, cfg, pre)
    # drift over 10 m should be small
    ate = ate_rmse(est[:, :3], traj[:, :3], align=True)
    assert ate < 0.15, f"ATE {ate}"


def test_circle_odometry_with_keyframe_switching(world):
    traj = circle_trajectory(60, radius=12.0, laps=0.5)
    cfg, pre = make_cfgs()
    odom = ScanMatchingOdometry(cfg)
    est, n_kf = [], 0
    for i, pose in enumerate(traj):
        scan = world.scan(pose, seed=100 + i)
        pc = prefilter(PointCloud.from_array(scan, capacity=4096), pre)
        out = odom.step(pc, stamp=i * 0.1)
        est.append(out.pose)
        n_kf += int(out.is_new_keyframe)
    est = np.stack(est)
    assert n_kf > 3  # traveled ~38 m with 2 m keyframe gate
    ate = ate_rmse(est[:, :3], traj[:, :3], align=True)
    assert ate < 0.5, f"ATE {ate} with {n_kf} keyframes"
