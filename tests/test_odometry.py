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


def test_imu_frontend_initial_guess(world):
    """enable_imu_frontend: the MSF pose delta seeds the registration
    (scan_matching_odometry_component.cpp:210-223). A 3 m jump between
    scans exceeds reg_max_correspondence_distance, so the constant-velocity
    guess (identity at startup) cannot recover it — the MSF delta can."""
    import dataclasses

    from mrg_slam_tpu.io.synthetic import straight_trajectory

    cfg, pre = make_cfgs()
    cfg = dataclasses.replace(cfg, enable_imu_frontend=True,
                              keyframe_delta_translation=10.0)
    traj = straight_trajectory(3, speed=3.0)
    odom = ScanMatchingOdometry(cfg)
    est = []
    for i, pose in enumerate(traj):
        scan = world.scan(pose, seed=100 + i)
        pc = prefilter(PointCloud.from_array(scan, capacity=4096), pre)
        # msf stream: the true world pose, noised a little
        stamp = i * 0.1
        odom.msf_pose_callback(stamp - 0.001, est[-1] if False else
                               np.asarray(traj[max(i - 1, 0)], np.float32),
                               after_update=True)
        odom.msf_pose_callback(stamp, np.asarray(pose, np.float32),
                               after_update=False)
        out = odom.step(pc, stamp=stamp)
        est.append(out.pose)
        if i > 0:
            assert out.status.prediction_labels == ("imu",)
    est = np.stack(est)
    # each step recovered the 3 m advance
    np.testing.assert_allclose(np.linalg.norm(np.diff(est[:, :3], axis=0),
                                              axis=1), 3.0, atol=0.2)


def test_robot_odometry_init_guess(world):
    """enable_robot_odometry_init_guess: deltas of a secondary odometry
    stream seed the registration (:225-263)."""
    import dataclasses

    from mrg_slam_tpu.io.synthetic import straight_trajectory

    cfg, pre = make_cfgs()
    cfg = dataclasses.replace(cfg, enable_robot_odometry_init_guess=True,
                              keyframe_delta_translation=10.0)
    traj = straight_trajectory(3, speed=3.0)
    odom = ScanMatchingOdometry(cfg)
    est = []
    for i, pose in enumerate(traj):
        scan = world.scan(pose, seed=200 + i)
        pc = prefilter(PointCloud.from_array(scan, capacity=4096), pre)
        odom.robot_odom_callback(np.asarray(pose, np.float32))
        out = odom.step(pc, stamp=i * 0.1)
        est.append(out.pose)
        if i > 0:
            assert out.status.prediction_labels == ("odometry",)
    est = np.stack(est)
    np.testing.assert_allclose(np.linalg.norm(np.diff(est[:, :3], axis=0),
                                              axis=1), 3.0, atol=0.2)


def test_zero_overlap_keeps_last_pose(world):
    """A scan with NO overlap with the keyframe (all correspondences lost)
    must not move the odometry estimate: the registration returns its
    garbage running pose, and accepting it would poison the
    constant-velocity guess (the fused path gates identically,
    models/odometry_fused.py). Matches the reference's keep-last on
    non-convergence (scan_matching_odometry_component.cpp:270-273)."""
    cfg, pre = make_cfgs()
    odom = ScanMatchingOdometry(cfg)
    scan = world.scan(np.asarray([0, 0, 0, 1, 0, 0, 0], np.float32), seed=7)
    pc = prefilter(PointCloud.from_array(scan, capacity=4096), pre)
    out0 = odom.step(pc, stamp=0.0)
    out1 = odom.step(pc, stamp=0.1)  # same scan: pose holds trivially
    # a far-away cluster: every point >> reg_max_correspondence_distance
    # from the keyframe cloud
    rng = np.random.default_rng(0)
    far = (rng.uniform(-1, 1, (512, 3)) + [[1e4, 1e4, 0.0]]).astype(np.float32)
    pc_far = PointCloud.from_array(far, capacity=4096)
    out2 = odom.step(pc_far, stamp=0.2)
    assert not out2.status.has_converged
    np.testing.assert_allclose(out2.pose, out1.pose, atol=1e-6)
