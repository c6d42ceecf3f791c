"""PCD IO, TUM IO, save/load graph round trip, replay harness."""

import dataclasses

import numpy as np
import pytest

from mrg_slam_tpu.io.pcd import load_pcd, save_pcd
from mrg_slam_tpu.utils.tum import load_tum, save_tum
from mrg_slam_tpu.utils import se3
import jax.numpy as jnp


def test_pcd_roundtrip(tmp_path, rng):
    pts = rng.normal(size=(500, 3)).astype(np.float32)
    for binary in (True, False):
        p = tmp_path / f"t_{binary}.pcd"
        save_pcd(p, pts, binary=binary)
        back = load_pcd(p)
        np.testing.assert_allclose(back, pts, atol=1e-5)


def test_tum_roundtrip(tmp_path, rng):
    poses = np.asarray(se3.pose_exp(jnp.asarray(
        rng.normal(size=(20, 6)).astype(np.float32))))
    stamps = np.arange(20) * 0.1
    f = tmp_path / "traj.txt"
    save_tum(f, stamps, poses)
    s2, p2 = load_tum(f)
    np.testing.assert_allclose(s2, stamps, atol=1e-6)
    np.testing.assert_allclose(p2[:, :3], poses[:, :3], atol=1e-5)
    dots = np.abs(np.sum(p2[:, 3:7] * poses[:, 3:7], axis=1))
    np.testing.assert_allclose(dots, 1.0, atol=1e-5)


def test_save_load_graph_roundtrip(tmp_path, rng):
    from mrg_slam_tpu.models.persistence import load_graph, save_graph
    from mrg_slam_tpu.config import (EngineConfig, LoopClosureConfig,
                                     OptimizerConfig, PrefilterConfig,
                                     RegistrationConfig, SlamConfig,
                                     ScanMatchingOdometryConfig)
    from mrg_slam_tpu.io.synthetic import SyntheticWorld, circle_trajectory
    from mrg_slam_tpu.pipeline.replay import Robot, replay

    reg = RegistrationConfig(reg_transformation_epsilon=1e-3,
                             reg_maximum_iterations=24,
                             reg_correspondence_randomness=10)
    cfg = EngineConfig(
        prefilter=PrefilterConfig(downsample_resolution=0.4,
                                  capacity_raw_points=4096,
                                  capacity_filtered_points=1024,
                                  outlier_removal_method="NONE"),
        odometry=ScanMatchingOdometryConfig(keyframe_delta_translation=2.0,
                                            registration=reg),
        slam=SlamConfig(own_name="saver", multi_robot_names=("saver",),
                        keyframe_delta_trans=2.0, capacity_keyframes=64,
                        capacity_edges=256, capacity_keyframe_points=1024,
                        registration=reg,
                        optimizer=OptimizerConfig(solver_backend="dense"),
                        loop=dataclasses.replace(LoopClosureConfig(),
                                                 capacity_candidates=4),
                        robot_remove_points_radius=0.0))
    world = SyntheticWorld.build(seed=2, extent=25.0, n_ground=15000,
                                 max_points_per_scan=4096, noise=0.02)
    traj = circle_trajectory(30, radius=10.0, laps=0.6)
    frames = [(i * 0.1, world.scan(p, seed=i)) for i, p in enumerate(traj)]
    robot = Robot(cfg)
    replay(robot, frames, tick_every=10)

    n_saved = save_graph(robot.slam, tmp_path / "g")
    assert n_saved >= 5
    assert (tmp_path / "g" / "graph.g2o").exists()
    g2o_text = (tmp_path / "g" / "graph.g2o").read_text()
    assert "VERTEX_SE3:QUAT" in g2o_text and "EDGE_SE3:QUAT" in g2o_text

    # load into a FRESH slam instance; merge on next tick
    robot2 = Robot(dataclasses.replace(
        cfg, slam=dataclasses.replace(cfg.slam, own_name="loader")))
    from mrg_slam_tpu.models.persistence import load_graph as lg
    n_loaded = lg(robot2.slam, tmp_path / "g")
    assert n_loaded == n_saved
    robot2.slam.optimization_tick(now=0.0)
    merged = [k for k in (robot2.slam.db.keyframes
                          + robot2.slam.db.new_keyframes)]
    assert len(merged) == n_saved
    # uuid dedup: loading again adds nothing
    lg(robot2.slam, tmp_path / "g")
    robot2.slam.optimization_tick(now=1.0)
    merged2 = [k for k in (robot2.slam.db.keyframes
                           + robot2.slam.db.new_keyframes)]
    assert len(merged2) == n_saved


def test_run_synthetic_demo_smoke():
    from mrg_slam_tpu.pipeline.replay import run_synthetic_demo

    res = run_synthetic_demo(n_frames=40, verbose=False)
    assert res.ate is not None and res.ate < 1.0
    assert len(res.trajectory) == 40
