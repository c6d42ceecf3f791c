"""Shared fixtures/helpers for the cross-robot coordinator tests.

Split across two test files (test_coordinator.py, test_coordinator_scale.py)
so xdist's per-file scheduling can spread the long SharedTick drives over
workers; the synthetic two-robot input set is built once per process.
"""

import dataclasses
import functools

import numpy as np

from mrg_slam_tpu.config import (LoopClosureConfig, OptimizerConfig,
                                 PrefilterConfig, RegistrationConfig,
                                 ScanMatchingOdometryConfig, SlamConfig)
from mrg_slam_tpu.io.synthetic import SyntheticWorld, circle_trajectory
from mrg_slam_tpu.models.backend import MrgSlam
from mrg_slam_tpu.ops.cloud import PointCloud
from mrg_slam_tpu.ops.prefilter import prefilter

ODO_CFG = ScanMatchingOdometryConfig(
    keyframe_delta_translation=2.0,
    registration=RegistrationConfig(
        reg_transformation_epsilon=1e-3, reg_maximum_iterations=16,
        reg_covariance_mode="radius", reg_covariance_radius=1.0))
PRE = PrefilterConfig(downsample_resolution=0.4,
                      capacity_filtered_points=1024,
                      outlier_removal_method="NONE")
REG = RegistrationConfig(registration_method="SMALL_GICP",
                         reg_transformation_epsilon=1e-3,
                         reg_maximum_iterations=32,
                         reg_correspondence_randomness=10,
                         reg_max_correspondence_distance=2.0)


def slam_config(name, robots):
    return SlamConfig(
        own_name=name, multi_robot_names=tuple(robots),
        keyframe_delta_trans=2.0,
        capacity_keyframes=128, capacity_edges=512,
        capacity_keyframe_points=1024,
        registration=REG,
        optimizer=OptimizerConfig(solver_backend="dense",
                                  g2o_solver_num_iterations=64),
        loop=dataclasses.replace(LoopClosureConfig(), capacity_candidates=4,
                                 fitness_score_thresh=1.25),
        robot_remove_points_radius=0.0)


def drive_two(scans_a, scans_b, traj_a, traj_b, ticker):
    """Feed ground-truth odometry + prefiltered clouds to two robots,
    ticking through `ticker(slams, now)` every 10 frames."""
    a = MrgSlam(slam_config("atlas", ("atlas", "bestla")))
    b = MrgSlam(slam_config("bestla", ("atlas", "bestla")))
    slams = [a, b]
    rng = np.random.default_rng(3)
    n = max(len(scans_a), len(scans_b))
    for i in range(n):
        for slam, scans, traj in ((a, scans_a, traj_a), (b, scans_b, traj_b)):
            if i >= len(scans):
                continue
            noise = np.zeros(7, np.float32)
            noise[:3] = rng.normal(scale=0.01, size=3)
            odom = traj[i].astype(np.float32) + noise
            odom[3:] /= np.linalg.norm(odom[3:])
            slam.process_scan(i * 0.1, odom, scans[i])
        if (i + 1) % 10 == 0:
            ticker(slams, i * 0.1)
    ticker(slams, n * 0.1)
    return a, b


@functools.lru_cache(maxsize=1)
def two_robot_inputs():
    """(scans_a, scans_b, traj_a, traj_b): two self-closing laps on the same
    circle with different scan seeds, built once per worker process."""
    world = SyntheticWorld.build(seed=5, extent=30.0, n_ground=25000,
                                 n_pillars=25, n_walls=10,
                                 max_points_per_scan=4096, noise=0.02)
    traj = circle_trajectory(75, radius=12.0, laps=1.25)
    traj_a, traj_b = traj, traj[: 65]
    scans_a = [prefilter(PointCloud.from_array(world.scan(p, seed=i),
                                               capacity=4096), PRE)
               for i, p in enumerate(traj_a)]
    scans_b = [prefilter(PointCloud.from_array(world.scan(p, seed=500 + i),
                                               capacity=4096), PRE)
               for i, p in enumerate(traj_b)]
    return scans_a, scans_b, traj_a, traj_b
