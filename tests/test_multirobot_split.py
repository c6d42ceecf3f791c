"""Multi-robot split harness + backend service-equivalents + profiling."""

import dataclasses

import numpy as np
import pytest

from mrg_slam_tpu.config import (EngineConfig, LoopClosureConfig,
                                 OptimizerConfig, PrefilterConfig,
                                 RegistrationConfig,
                                 ScanMatchingOdometryConfig, SlamConfig)
from mrg_slam_tpu.io.synthetic import SyntheticWorld, circle_trajectory
from mrg_slam_tpu.pipeline.multirobot_split import (run_multirobot_split,
                                                    split_frames,
                                                    split_windows)


def test_split_windows():
    w = split_windows(100, 2, overlap_fraction=0.2)
    assert w[0][0] == 0 and w[-1][1] == 100
    assert w[0][1] > w[1][0]  # overlap
    assert split_windows(100, 1) == [(0, 100)]


def test_split_frames_reversed(rng):
    frames = [(i * 0.1, np.full((4, 3), i, np.float32)) for i in range(20)]
    parts = split_frames(frames, 2, reversed_robots=[1])
    # robot 1's scans run backwards but stamps stay increasing
    scans = [int(f[1][0, 0]) for f in parts[1]]
    stamps = [f[0] for f in parts[1]]
    assert scans == sorted(scans, reverse=True)
    assert stamps == sorted(stamps)


def small_cfg():
    reg = RegistrationConfig(reg_transformation_epsilon=1e-3,
                             reg_maximum_iterations=24,
                             reg_correspondence_randomness=10)
    return EngineConfig(
        prefilter=PrefilterConfig(downsample_resolution=0.4,
                                  capacity_raw_points=4096,
                                  capacity_filtered_points=1024,
                                  outlier_removal_method="NONE"),
        odometry=ScanMatchingOdometryConfig(keyframe_delta_translation=2.0,
                                            registration=reg),
        slam=SlamConfig(keyframe_delta_trans=2.0, capacity_keyframes=64,
                        capacity_edges=256, capacity_keyframe_points=1024,
                        registration=reg,
                        optimizer=OptimizerConfig(solver_backend="dense"),
                        loop=dataclasses.replace(LoopClosureConfig(),
                                                 capacity_candidates=4),
                        robot_remove_points_radius=0.0))


def test_run_multirobot_split_two_robots():
    world = SyntheticWorld.build(seed=4, extent=30.0, n_ground=15000,
                                 max_points_per_scan=4096, noise=0.02)
    traj = circle_trajectory(60, radius=12.0, laps=1.0)
    frames = [(i * 0.1, world.scan(p, seed=i)) for i, p in enumerate(traj)]

    def ip(p):
        yaw = 2.0 * np.arctan2(p[6], p[3])
        return (float(p[0]), float(p[1]), float(p[2]), float(yaw), 0.0, 0.0)

    windows = split_frames(frames, 2, overlap_fraction=0.3)
    results = run_multirobot_split(
        small_cfg(), frames, ["atlas", "bestla"],
        init_poses={"atlas": ip(traj[0]),
                    "bestla": ip(traj[len(windows[1]) and
                                      (len(frames) - len(windows[1]))])},
        overlap_fraction=0.3, tick_every=10)
    assert set(results) == {"atlas", "bestla"}
    for name, res in results.items():
        assert len(res.trajectory) > 10


def test_backend_services():
    from mrg_slam_tpu.models.backend import MrgSlam
    from mrg_slam_tpu.ops.cloud import PointCloud

    rng = np.random.default_rng(0)
    slam = MrgSlam(small_cfg().slam)
    slam.set_init_pose(np.asarray([1, 2, 0, 1, 0, 0, 0], np.float32))
    for i in range(4):
        cloud = PointCloud.from_array(
            rng.normal(size=(64, 3)).astype(np.float32), capacity=1024)
        slam.process_scan(i * 0.5, np.asarray([i * 2.0, 0, 0, 1, 0, 0, 0],
                                              np.float32), cloud)
    slam.optimization_tick(now=2.0)
    kf_uuids, edge_uuids = slam.get_graph_uuids()
    assert len(kf_uuids) >= 4 and len(edge_uuids) >= 3
    # init pose honored: first keyframe sits at (1,2)
    first = min(slam.db.own_keyframes(), key=lambda k: k.stamp)
    np.testing.assert_allclose(first.estimate(slam.db.graph)[:2], [1, 2],
                               atol=0.2)


def test_stage_timer(tmp_path):
    from mrg_slam_tpu.utils.profiling import StageTimer

    t = StageTimer()
    with t.stage("a"):
        pass
    with t.stage("a"):
        pass
    s = t.summary()
    assert s["a"]["count"] == 2
    t.dump(tmp_path / "timing.txt")
    assert "a count 2" in (tmp_path / "timing.txt").read_text()


def test_imu_deskew_hookup():
    """Robot.add_imu feeds deskew (prefilter) and the IMU processor."""
    import dataclasses as dc
    from mrg_slam_tpu.pipeline.replay import Robot

    cfg = small_cfg()
    cfg = dc.replace(cfg, prefilter=dc.replace(cfg.prefilter,
                                               enable_deskewing=True),
                     slam=dc.replace(cfg.slam, imu=dc.replace(
                         cfg.slam.imu, enable_imu_orientation=True)))
    robot = Robot(cfg)
    rng = np.random.default_rng(1)
    for i in range(3):
        robot.add_imu(i * 0.1, ang_vel=[0.0, 0.0, 0.3],
                      acc=[0, 0, 9.81], quat=[1, 0, 0, 0])
        robot.step(i * 0.1, rng.normal(scale=5.0,
                                       size=(512, 3)).astype(np.float32))
    robot.slam.optimization_tick(now=0.3)
    # IMU orientation priors attached to the flushed keyframes
    assert len(robot.slam.db.graph._priors) >= 1
