"""End-to-end SLAM backend tests: keyframes, loops, optimization, exchange."""

import dataclasses

import numpy as np
import pytest

from mrg_slam_tpu.config import (LoopClosureConfig, OptimizerConfig,
                                 PrefilterConfig, RegistrationConfig,
                                 ScanMatchingOdometryConfig, SlamConfig)
from mrg_slam_tpu.io.synthetic import SyntheticWorld, circle_trajectory
from mrg_slam_tpu.models.backend import MrgSlam
from mrg_slam_tpu.models.odometry import ScanMatchingOdometry
from mrg_slam_tpu.ops.cloud import PointCloud
from mrg_slam_tpu.ops.prefilter import prefilter
from mrg_slam_tpu.utils.metrics import ate_rmse


REG = RegistrationConfig(registration_method="SMALL_GICP",
                         reg_transformation_epsilon=1e-3,
                         reg_maximum_iterations=32,
                         reg_correspondence_randomness=10,
                         reg_max_correspondence_distance=2.0)
PRE = PrefilterConfig(downsample_resolution=0.4, capacity_filtered_points=1024,
                      outlier_removal_method="NONE")


def slam_config(name="atlas", robots=("atlas",)):
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
        robot_remove_points_radius=0.0,
    )


def drive(world, traj, slam, seed0=0, tick_every=10):
    odom = ScanMatchingOdometry(ScanMatchingOdometryConfig(
        keyframe_delta_translation=2.0, registration=REG))
    est_odom = []
    for i, pose in enumerate(traj):
        scan = world.scan(pose, seed=seed0 + i)
        pc = prefilter(PointCloud.from_array(scan, capacity=4096), PRE)
        out = odom.step(pc, stamp=i * 0.1)
        est_odom.append(out.pose)
        slam.process_scan(i * 0.1, out.pose, pc)
        if (i + 1) % tick_every == 0:
            slam.optimization_tick(now=i * 0.1)
    slam.optimization_tick(now=len(traj) * 0.1)
    return np.stack(est_odom)


@pytest.fixture(scope="module")
def world():
    return SyntheticWorld.build(seed=5, extent=30.0, n_ground=25000,
                                n_pillars=25, n_walls=10,
                                max_points_per_scan=4096, noise=0.02)


def test_full_slam_closes_loop(world):
    # 1.2 laps around a circle: revisits the start -> loop closures
    traj = circle_trajectory(110, radius=12.0, laps=1.2)
    slam = MrgSlam(slam_config())
    est_odom = drive(world, traj, slam)

    n_kf = len(slam.db.keyframes) + len(slam.db.new_keyframes)
    assert n_kf >= 30, f"only {n_kf} keyframes"
    n_loops = sum(1 for e in slam.db.edges if e.type == "loop")
    assert n_loops >= 1, "no loop closures found"

    slam_traj = slam.trajectory()
    own = sorted(slam.db.own_keyframes(), key=lambda k: k.stamp)
    # ground truth at keyframe stamps
    stamps = [k.stamp for k in own]
    idx = [int(round(s / 0.1)) for s in stamps]
    gt = traj[idx][:, :3]
    ate_slam = ate_rmse(slam_traj[:, :3], gt)
    # odometry-only ATE at the same frames
    ate_odo = ate_rmse(est_odom[idx][:, :3], traj[idx][:, :3])
    assert ate_slam < 0.6, f"SLAM ATE {ate_slam}"
    assert ate_slam <= ate_odo * 1.5, (ate_slam, ate_odo)
    # chi2 decreased over ticks
    assert slam.tick_stats[-1].chi2_after <= slam.tick_stats[-1].chi2_before


def test_map_generation(world):
    traj = circle_trajectory(40, radius=12.0, laps=0.5)
    slam = MrgSlam(slam_config())
    drive(world, traj, slam)
    m = slam.generate_map()
    assert m.shape[0] > 1000
    # map points lie near world structure: z range sane
    assert m[:, 2].min() > -4.0 and m[:, 2].max() < 10.0


def test_two_robot_graph_exchange(world):
    """Two robots, overlapping halves of the circle; exchange + joint solve."""
    traj = circle_trajectory(80, radius=12.0, laps=1.0)
    traj_a, traj_b = traj[:48], traj[36:]

    def init_pose_of(p):
        yaw = 2.0 * np.arctan2(p[6], p[3])
        return (float(p[0]), float(p[1]), float(p[2]), float(yaw), 0.0, 0.0)

    cfg_a = dataclasses.replace(slam_config("atlas", ("atlas", "bestla")),
                                init_pose=init_pose_of(traj_a[0]))
    cfg_b = dataclasses.replace(slam_config("bestla", ("atlas", "bestla")),
                                init_pose=init_pose_of(traj_b[0]))
    a, b = MrgSlam(cfg_a), MrgSlam(cfg_b)

    odom_cfg = ScanMatchingOdometryConfig(keyframe_delta_translation=2.0,
                                          registration=REG)
    odoms = {"atlas": ScanMatchingOdometry(odom_cfg),
             "bestla": ScanMatchingOdometry(odom_cfg)}
    robots = {"atlas": (a, traj_a, 0), "bestla": (b, traj_b, 500)}
    peers = {"atlas": b, "bestla": a}

    def request_fn_for(requester_name):
        def request(peer_name, req):
            return peers[requester_name].handle_publish_graph(req)
        return request

    steps = max(len(traj_a), len(traj_b))
    for i in range(steps):
        for name, (slam, tr, seed0) in robots.items():
            if i >= len(tr):
                continue
            # bestla's odometry runs in its own odom frame; its world pose
            # offset is handled via init (both start where their traj starts)
            scan = world.scan(tr[i], seed=seed0 + i)
            pc = prefilter(PointCloud.from_array(scan, capacity=4096), PRE)
            out = odoms[name].step(pc, stamp=i * 0.1)
            bc = slam.process_scan(i * 0.1, out.pose, pc)
            # odom broadcast to the peer
            peers[name].on_odom_broadcast(bc)
        if (i + 1) % 10 == 0:
            for name, (slam, tr, _) in robots.items():
                slam.optimization_tick(now=i * 0.1)
                sp = slam.slam_pose_broadcast(i * 0.1)
                if sp is not None:
                    peers[name].on_slam_pose_broadcast(
                        sp, now=i * 0.1, request_fn=request_fn_for(
                            peers[name].own_name))
    a.optimization_tick(now=99.0)
    b.optimization_tick(now=99.0)

    # atlas must have merged bestla keyframes (or vice versa)
    a_remote = [k for k in a.db.keyframes + a.db.new_keyframes
                if k.robot_name == "bestla"]
    b_remote = [k for k in b.db.keyframes + b.db.new_keyframes
                if k.robot_name == "atlas"]
    assert a_remote or b_remote, "no keyframes exchanged"
    assert a.received_graph_bytes or b.received_graph_bytes


def test_async_tick_concurrent_ingest(world):
    """optimization_tick_async runs on a worker thread while scans stream
    in (the reference's optimization-timer-vs-cloud-callback concurrency);
    no keyframe may be lost to the flush/append race and the final graph
    must match what the synchronous path builds."""
    traj = circle_trajectory(40, radius=12.0, laps=0.9)
    odom = ScanMatchingOdometry(ScanMatchingOdometryConfig(
        keyframe_delta_translation=2.0, registration=REG))
    slam = MrgSlam(slam_config())
    futures = []
    for i, pose in enumerate(traj):
        scan = world.scan(pose, seed=i)
        pc = prefilter(PointCloud.from_array(scan, capacity=4096), PRE)
        out = odom.step(pc, stamp=i * 0.1)
        slam.process_scan(i * 0.1, out.pose, pc)
        if (i + 1) % 8 == 0:
            futures.append(slam.optimization_tick_async(now=i * 0.1))
    for f in futures:
        f.result(timeout=600)
    slam.optimization_tick(now=len(traj) * 0.1)  # drain

    n_admitted = slam.db.odom_keyframe_counter
    in_graph = len([k for k in slam.db.keyframes + slam.db.new_keyframes
                    if k.node_id is not None])
    assert in_graph == n_admitted  # nothing lost, everything flushed
    assert len(slam.db.keyframe_queue) == 0
    assert slam.db.graph.chi2_final <= slam.db.graph.chi2_initial + 1e-6
