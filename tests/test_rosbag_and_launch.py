"""Rosbag sqlite/CDR round trip + launch CLI smoke test."""

import json
import subprocess
import sys

import numpy as np
import pytest

from mrg_slam_tpu.io.rosbag import (BagReader, parse_pointcloud2,
                                    serialize_pointcloud2, write_bag)


def test_pointcloud2_cdr_roundtrip(rng):
    pts = rng.normal(size=(777, 3)).astype(np.float32)
    payload = serialize_pointcloud2(12.5, "velodyne", pts)
    msg = parse_pointcloud2(payload)
    assert msg.frame_id == "velodyne"
    assert abs(msg.stamp - 12.5) < 1e-6
    assert msg.width == 777 and msg.point_step == 12
    np.testing.assert_allclose(msg.xyz(), pts, atol=0)


def test_bag_write_read(tmp_path, rng):
    clouds = [(i * 0.1, rng.normal(size=(100, 3)).astype(np.float32))
              for i in range(5)]
    bag = tmp_path / "test.db3"
    write_bag(str(bag), "/husky1/velodyne_points", clouds)
    r = BagReader(str(bag))
    assert r.topics() == {
        "/husky1/velodyne_points": "sensor_msgs/msg/PointCloud2"}
    got = list(r.pointclouds("/husky1/velodyne_points"))
    assert len(got) == 5
    for (ts, pts), (gts, gpts) in zip(clouds, got):
        assert abs(ts - gts) < 1e-6
        np.testing.assert_allclose(gpts, pts, atol=0)
    r.close()


def test_launch_cli_synthetic(tmp_path):
    from mrg_slam_tpu import launch

    # kept deliberately small: this test covers CLI parsing, param
    # overrides, and the output-file contract — accuracy/loop coverage
    # lives in test_slam_backend. 1024-pt clouds at 30 frames cost ~10 min
    # of brute-force NN on the CPU mesh. distance_far_thresh=12 keeps the
    # voxelized scan under the 512-point capacity — truncated voxel
    # subsets under-register and stall the keyframe gate.
    rc = launch.main([
        "--dataset", "synthetic", "--frames", "16", "--tick-every", "8",
        "--laps", "0.15",
        "--output", str(tmp_path / "out"),
        "keyframe_delta_trans:=1.0", "downsample_resolution:=1.0",
        "distance_far_thresh:=12.0",
        "capacity_keyframes:=64", "capacity_edges:=256",
        "capacity_raw_points:=8192", "capacity_filtered_points:=512",
        "capacity_keyframe_points:=512", "outlier_removal_method:=NONE",
        "reg_maximum_iterations:=16",
    ])
    assert rc == 0
    summary = json.loads((tmp_path / "out" / "summary.json").read_text())
    assert summary["frames"] == 16
    assert summary["keyframes"] >= 3
    assert (tmp_path / "out" / "trajectory_tum.txt").exists()
    assert (tmp_path / "out" / "map.pcd").exists()
    assert (tmp_path / "out" / "graph" / "graph.g2o").exists()


def test_launch_cli_reference_yaml(tmp_path):
    """The reference's own config file must drive the CLI."""
    from mrg_slam_tpu import launch

    rc = launch.main([
        "--config", "/root/reference/config/mrg_slam.yaml",
        "--dataset", "synthetic", "--frames", "12", "--tick-every", "6",
        "--output", str(tmp_path / "out2"),
        # shrink capacities so the smoke test stays fast on CPU
        "capacity_keyframes:=64", "capacity_edges:=256",
        "capacity_raw_points:=8192", "capacity_filtered_points:=1024",
        "capacity_keyframe_points:=1024", "outlier_removal_method:=NONE",
        "reg_maximum_iterations:=16",
    ])
    assert rc == 0


def test_replay_fused_matches_per_frame():
    """The device-batched replay must track the per-frame replay on
    identical inputs: same keyframe count, matching trajectories (both
    paths run the same registration; the fused path batches dispatches,
    it does not change the math)."""
    import dataclasses as dc

    from mrg_slam_tpu.config import (EngineConfig, LoopClosureConfig,
                                     OptimizerConfig, PrefilterConfig,
                                     RegistrationConfig, SlamConfig,
                                     ScanMatchingOdometryConfig)
    from mrg_slam_tpu.io.synthetic import SyntheticWorld, circle_trajectory
    from mrg_slam_tpu.pipeline.replay import Robot, replay, replay_fused

    reg = RegistrationConfig(reg_transformation_epsilon=1e-3,
                             reg_maximum_iterations=24,
                             reg_correspondence_randomness=10)
    cfg = EngineConfig(
        prefilter=PrefilterConfig(downsample_resolution=0.5,
                                  capacity_raw_points=4096,
                                  capacity_filtered_points=512,
                                  distance_far_thresh=14.0,
                                  outlier_removal_method="NONE"),
        odometry=ScanMatchingOdometryConfig(keyframe_delta_translation=2.0,
                                            registration=reg),
        slam=SlamConfig(own_name="f", multi_robot_names=("f",),
                        keyframe_delta_trans=2.0, capacity_keyframes=64,
                        capacity_edges=256, capacity_keyframe_points=512,
                        registration=reg,
                        optimizer=OptimizerConfig(solver_backend="dense",
                                                  g2o_solver_num_iterations=64),
                        loop=dc.replace(LoopClosureConfig(),
                                        capacity_candidates=4),
                        robot_remove_points_radius=0.0))
    world = SyntheticWorld.build(seed=13, extent=25.0, n_ground=15000,
                                 max_points_per_scan=4096, noise=0.02)
    traj = circle_trajectory(24, radius=10.0, laps=0.5)
    frames = [(i * 0.1, world.scan(p, seed=i)) for i, p in enumerate(traj)]

    r1 = Robot(cfg)
    res1 = replay(r1, frames, tick_every=8, gt_xyz=traj[:, :3])
    r2 = Robot(cfg)
    res2 = replay_fused(r2, frames, tick_every=8, gt_xyz=traj[:, :3])

    k1 = len(r1.slam.db.keyframes) + len(r1.slam.db.new_keyframes)
    k2 = len(r2.slam.db.keyframes) + len(r2.slam.db.new_keyframes)
    assert k2 == k1, (k1, k2)
    assert res2.trajectory.shape == res1.trajectory.shape
    np.testing.assert_allclose(res2.trajectory[:, :3],
                               res1.trajectory[:, :3], atol=0.05)
    assert abs(res2.ate - res1.ate) < 0.05


def test_replay_fused_falls_back_with_floor():
    """Floor detection forces the per-frame path (host feedback loop)."""
    from mrg_slam_tpu.config import EngineConfig, FloorDetectionConfig
    from mrg_slam_tpu.pipeline import replay as rp

    cfg = EngineConfig(floor=FloorDetectionConfig(
        enable_floor_detection=True))
    robot = rp.Robot(cfg)
    called = {}
    orig = rp.replay

    def spy(*a, **k):
        called["yes"] = True
        return orig(*a, **k)

    rp.replay, token = spy, None
    try:
        rp.replay_fused(robot, [], tick_every=4)
    finally:
        rp.replay = orig
    assert called.get("yes")


def test_fleet_from_bag_end_to_end(tmp_path):
    """VERDICT r4 #6: multi-robot SLAM driven from ONE rosbag — two
    namespaced PointCloud2 topics written with the serializer, read back
    per robot, full fleet replay with graph exchange, inter-robot loop
    closures > 0 (the nebula_multirobot_processor.py path)."""
    import dataclasses

    from mrg_slam_tpu.io.rosbag import write_multi_bag
    from mrg_slam_tpu.io.synthetic import SyntheticWorld, circle_trajectory
    from mrg_slam_tpu.pipeline.bagfleet import (read_fleet_frames,
                                                run_fleet_from_bag)
    from mrg_slam_tpu.pipeline.baseline_runs import _base_cfg

    world = SyntheticWorld.build(seed=21, extent=35.0, n_ground=30000,
                                 n_pillars=30, n_walls=12,
                                 max_points_per_scan=8192, noise=0.02)
    n = 80
    traj = circle_trajectory(n, radius=14.0, laps=1.0)
    frames = [(i * 0.1, world.scan(p, seed=i)) for i, p in enumerate(traj)]
    start_b = 32
    bag = str(tmp_path / "fleet.db3")
    write_multi_bag(bag, {"/atlas/velodyne_points": frames[:48],
                          "/bestla/velodyne_points": frames[start_b:]})

    got = read_fleet_frames(bag, ["atlas", "bestla"])
    assert len(got["atlas"]) == 48 and len(got["bestla"]) == 48
    np.testing.assert_allclose(got["atlas"][0][1], frames[0][1], atol=1e-6)

    cfg = _base_cfg()
    cfg = dataclasses.replace(cfg, slam=dataclasses.replace(
        cfg.slam,
        exchange=dataclasses.replace(cfg.slam.exchange,
                                     graph_request_min_time_delay=0.5,
                                     graph_request_min_accum_dist=1.0)))

    def ip(p):
        yaw = 2.0 * np.arctan2(p[6], p[3])
        return (float(p[0]), float(p[1]), float(p[2]), float(yaw), 0.0, 0.0)

    robots, results = run_fleet_from_bag(
        cfg, bag, ["atlas", "bestla"], tick_every=8,
        init_poses={"atlas": ip(traj[0]), "bestla": ip(traj[start_b])})

    inter_total = 0
    for name, robot in robots.items():
        db = robot.slam.db
        own = [k for k in db.keyframes + db.new_keyframes
               if k.robot_name == name]
        remote = [k for k in db.keyframes + db.new_keyframes
                  if k.robot_name != name]
        assert len(own) >= 5, name
        assert len(remote) > 0, f"{name}: graph exchange must merge peers"
        inter_total += sum(
            1 for e in db.edges if e.type == "loop"
            and db.uuid_keyframe_map[e.from_uuid].robot_name
            != db.uuid_keyframe_map[e.to_uuid].robot_name)
    assert inter_total > 0, "overlap window must close inter-robot loops"
