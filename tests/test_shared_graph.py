"""Shared-graph co-hosting (models/shared_graph.py): one store, R chains.

Covers the GraphDatabase multi-chain substrate directly, single-robot
parity with the classic MrgSlam backend, and a two-robot drive where
inter-robot loop closures must arise from the shared store without any
exchange protocol.
"""

import dataclasses

import numpy as np

from mrg_slam_tpu.models.backend import MrgSlam
from mrg_slam_tpu.models.graph_database import GraphDatabase
from mrg_slam_tpu.models.keyframe import EDGE_ANCHOR, EDGE_LOOP, EDGE_ODOM
from mrg_slam_tpu.models.shared_graph import SharedGraphSlam
from mrg_slam_tpu.ops.cloud import PointCloud
from mrg_slam_tpu.utils import se3np
from mrg_slam_tpu.utils.metrics import ate_rmse

from coordutil import slam_config, two_robot_inputs


def _mk_cloud(rng, n=64):
    return PointCloud.from_array(
        rng.uniform(-5, 5, size=(n, 3)).astype(np.float32), capacity=64)


def test_graph_database_multichain():
    """Two chains in one store: independent counters, per-robot anchors,
    odometry edges only within each chain, per-robot odom2map applied."""
    cfg = slam_config("alpha", ("alpha", "bravo"))
    cfg = dataclasses.replace(cfg, inf_matrix=dataclasses.replace(
        cfg.inf_matrix, use_const_inf_matrix=True))
    db = GraphDatabase(cfg)
    rng = np.random.default_rng(0)
    uuid_a, uuid_b = "slam-a", "slam-b"
    for i in range(3):
        pose = se3np.pose_identity()
        pose[0] = float(i)
        db.add_odom_keyframe(i * 0.1, pose, float(i), _mk_cloud(rng),
                             robot_name="alpha", slam_uuid=uuid_a)
        pose_b = se3np.pose_identity()
        pose_b[1] = float(i)
        db.add_odom_keyframe(i * 0.1, pose_b, float(i), _mk_cloud(rng),
                             robot_name="bravo", slam_uuid=uuid_b)
    o2m_b = se3np.pose_identity()
    o2m_b[0] = 10.0
    db.flush_keyframe_queue({"alpha": se3np.pose_identity(),
                             "bravo": o2m_b})

    # independent counters and chain heads
    assert db._odom_counters == {"alpha": 3, "bravo": 3}
    assert db.prev_keyframe_of("alpha").robot_name == "alpha"
    assert db.prev_keyframe_of("bravo").robot_name == "bravo"
    # one anchor per robot, each chaining to that robot's first keyframe
    anchors = [e for e in db.edges if e.type == EDGE_ANCHOR]
    assert len(anchors) == 2
    # odometry edges stay within each chain
    odo = [e for e in db.edges if e.type == EDGE_ODOM]
    assert len(odo) == 4
    for e in odo:
        a = db.uuid_keyframe_map[e.from_uuid]
        b = db.uuid_keyframe_map[e.to_uuid]
        assert a.robot_name == b.robot_name
        assert a.slam_uuid == b.slam_uuid
    # bravo's odom2map offset shows in its node estimates
    kf_b0 = next(k for k in db.new_keyframes
                 if k.robot_name == "bravo" and k.odom_counter == 0)
    est = kf_b0.estimate(db.graph)
    assert abs(est[0] - 10.0) < 1e-5


def _drive_shared(names, scans_by, traj_by, group):
    rng = np.random.default_rng(3)
    n = max(len(scans_by[k]) for k in names)
    for i in range(n):
        for name in names:
            scans, traj = scans_by[name], traj_by[name]
            if i >= len(scans):
                continue
            noise = np.zeros(7, np.float32)
            noise[:3] = rng.normal(scale=0.01, size=3)
            odom = traj[i].astype(np.float32) + noise
            odom[3:] /= np.linalg.norm(odom[3:])
            group.process_scan(name, i * 0.1, odom, scans[i])
        if (i + 1) % 10 == 0:
            group.optimization_tick(now=i * 0.1)
    group.optimization_tick(now=n * 0.1)


def test_shared_graph_single_robot_matches_mrgslam():
    """R=1 shared-graph degrades exactly to the classic per-robot backend:
    same admissions, same edges, same optimized trajectory."""
    scans_a, _, traj_a, _ = two_robot_inputs()
    cfg = slam_config("atlas", ("atlas",))

    classic = MrgSlam(cfg)
    rng = np.random.default_rng(3)
    for i, (scan, pose) in enumerate(zip(scans_a, traj_a)):
        noise = np.zeros(7, np.float32)
        noise[:3] = rng.normal(scale=0.01, size=3)
        odom = pose.astype(np.float32) + noise
        odom[3:] /= np.linalg.norm(odom[3:])
        classic.process_scan(i * 0.1, odom, scan)
        if (i + 1) % 10 == 0:
            classic.optimization_tick(now=i * 0.1)
    classic.optimization_tick(now=len(scans_a) * 0.1)

    shared = SharedGraphSlam(cfg, ["atlas"])
    _drive_shared(["atlas"], {"atlas": scans_a}, {"atlas": traj_a}, shared)

    t_classic = classic.trajectory()
    t_shared = shared.trajectory("atlas")
    assert t_classic.shape == t_shared.shape
    assert len(classic.db.edges) == len(shared.db.edges)
    n_loops_c = sum(1 for e in classic.db.edges if e.type == EDGE_LOOP)
    n_loops_s = sum(1 for e in shared.db.edges if e.type == EDGE_LOOP)
    assert n_loops_c == n_loops_s
    np.testing.assert_allclose(t_classic[:, :3], t_shared[:, :3], atol=1e-2)


def test_shared_graph_two_robot_inter_loops():
    """Two robots on one circle: the shared store must close inter-robot
    loops (different slam_uuids) with zero exchange, keep per-robot
    anchors/odom2map, and land both trajectories near ground truth."""
    scans_a, scans_b, traj_a, traj_b = two_robot_inputs()
    cfg = slam_config("atlas", ("atlas", "bestla"))
    group = SharedGraphSlam(cfg, ["atlas", "bestla"])
    _drive_shared(["atlas", "bestla"],
                  {"atlas": scans_a, "bestla": scans_b},
                  {"atlas": traj_a, "bestla": traj_b}, group)

    anchors = [e for e in group.db.edges if e.type == EDGE_ANCHOR]
    assert len(anchors) == 2

    loops = [e for e in group.db.edges if e.type == EDGE_LOOP]
    inter = []
    for e in loops:
        a = group.db.uuid_keyframe_map[e.from_uuid]
        b = group.db.uuid_keyframe_map[e.to_uuid]
        if a.robot_name != b.robot_name:
            inter.append(e)
    assert loops, "no loop closures at all"
    assert inter, "no inter-robot loop closures from the shared store"

    for name, traj in (("atlas", traj_a), ("bestla", traj_b)):
        own = sorted(group.robot_keyframes(name), key=lambda k: k.stamp)
        assert len(own) >= 10
        est = np.stack([k.estimate(group.db.graph) for k in own])
        gt = traj[[int(round(k.stamp / 0.1)) for k in own]]
        assert ate_rmse(est[:, :3], np.asarray(gt)[:, :3]) < 0.5

    # per-robot odom2map transforms were re-estimated independently
    o2m_a = group.views["atlas"].trans_odom2map
    o2m_b = group.views["bestla"].trans_odom2map
    assert np.isfinite(o2m_a).all() and np.isfinite(o2m_b).all()
