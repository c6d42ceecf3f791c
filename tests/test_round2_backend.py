"""Round-2 back-end behaviors: numpy pose mirrors, converged-gate
rejection, others_odom2map frame handling, per-tick snapshots/marginals."""

import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

from mrg_slam_tpu.config import (InformationMatrixConfig, LoopClosureConfig,
                                 OptimizerConfig, RegistrationConfig,
                                 SlamConfig)
from mrg_slam_tpu.models.backend import MrgSlam
from mrg_slam_tpu.models.keyframe import new_uuid
from mrg_slam_tpu.ops.cloud import PointCloud
from mrg_slam_tpu.parallel.messages import GraphMsg, KeyFrameMsg, PoseWithName
from mrg_slam_tpu.utils import se3, se3np


# ---------------------------------------------------------------------------
# se3np golden tests vs the jax implementation
# ---------------------------------------------------------------------------

def _rand_pose(rng):
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    if q[0] < 0:
        q = -q
    return np.concatenate([rng.uniform(-10, 10, 3), q]).astype(np.float32)


def test_se3np_matches_jax():
    rng = np.random.default_rng(0)
    for _ in range(10):
        a, b = _rand_pose(rng), _rand_pose(rng)
        np.testing.assert_allclose(
            se3np.pose_compose(a, b),
            np.asarray(se3.pose_compose(jnp.asarray(a), jnp.asarray(b))),
            atol=1e-5)
        np.testing.assert_allclose(
            se3np.pose_inverse(a),
            np.asarray(se3.pose_inverse(jnp.asarray(a))), atol=1e-5)
        np.testing.assert_allclose(
            se3np.pose_between(a, b),
            np.asarray(se3.pose_between(jnp.asarray(a), jnp.asarray(b))),
            atol=1e-5)
        x = rng.uniform(-5, 5, 3).astype(np.float32)
        np.testing.assert_allclose(
            se3np.pose_apply(a, x),
            np.asarray(se3.pose_apply(jnp.asarray(a), jnp.asarray(x))),
            atol=1e-4)
        assert abs(se3np.rotation_angle(a[3:])
                   - float(se3.rotation_angle(jnp.asarray(a[3:])))) < 1e-4
    np.testing.assert_allclose(
        se3np.rpy_to_quat(0.3, -0.2, 1.1),
        np.asarray(se3.rpy_to_quat(jnp.float32(0.3), jnp.float32(-0.2),
                                   jnp.float32(1.1))), atol=1e-6)


# ---------------------------------------------------------------------------
# converged gate: divergent candidates must be rejected
# ---------------------------------------------------------------------------

def _structured_cloud(rng, n=256, cap=512, offset=(0.0, 0.0)):
    """A small wall+ground corner so GICP has something to lock onto."""
    g = np.stack([rng.uniform(-4, 4, n // 2) + offset[0],
                  rng.uniform(-4, 4, n // 2) + offset[1],
                  np.zeros(n // 2)], axis=1)
    w = np.stack([rng.uniform(-4, 4, n // 2) + offset[0],
                  np.full(n // 2, 4.0) + offset[1],
                  rng.uniform(0, 2, n // 2)], axis=1)
    pts = np.concatenate([g, w]).astype(np.float32)
    pts += rng.normal(scale=0.01, size=pts.shape).astype(np.float32)
    return PointCloud.from_array(pts, capacity=cap)


def _loop_cfg(**kw):
    reg = RegistrationConfig(reg_transformation_epsilon=1e-3,
                             reg_maximum_iterations=24,
                             reg_correspondence_randomness=10,
                             reg_max_correspondence_distance=2.0)
    return SlamConfig(
        own_name="atlas", multi_robot_names=("atlas", "bestla"),
        keyframe_delta_trans=0.5, capacity_keyframes=32, capacity_edges=128,
        capacity_keyframe_points=512, registration=reg,
        optimizer=OptimizerConfig(solver_backend="dense",
                                  g2o_solver_num_iterations=32),
        loop=dataclasses.replace(
            LoopClosureConfig(), capacity_candidates=4,
            accum_distance_thresh_same_robot=3.0,
            enable_loop_closure_consistency_check=False),
        robot_remove_points_radius=0.0, **kw)


def _feed_chain(slam, cloud_fn, poses):
    """Admit a chain of keyframes; tick before the last keyframe so the
    earlier ones graduate into loop-candidate eligibility (the detector
    only scans flushed-and-graduated keyframes, loop_detector.cpp:44)."""
    for i, p in enumerate(poses[:-1]):
        slam.db.add_odom_keyframe(i * 1.0, np.asarray(p, np.float32),
                                  accum_distance=float(i),
                                  cloud=cloud_fn(i))
    slam.optimization_tick(now=float(len(poses)))
    i = len(poses) - 1
    slam.db.add_odom_keyframe(i * 1.0, np.asarray(poses[-1], np.float32),
                              accum_distance=float(i), cloud=cloud_fn(i))
    slam.optimization_tick(now=float(len(poses) + 1))


def test_divergent_candidate_rejected():
    """A candidate whose cloud shares no overlap with the new keyframe must
    not become a loop: with zero correspondences the zero-update "epsilon
    hit" does not count as convergence
    (loop_detector.cpp:150-155 rejects !hasConverged())."""
    rng = np.random.default_rng(3)
    cfg = _loop_cfg()
    slam = MrgSlam(cfg)

    # keyframes 0..5 carry clouds 100 m up in z; the revisit keyframe sees
    # ground-level structure -> no correspondences within
    # reg_max_correspondence_distance for any candidate pair
    def cloud(i):
        pts = rng.uniform(-4, 4, size=(256, 3)).astype(np.float32)
        if i < 6:
            pts[:, 2] += 100.0
        return PointCloud.from_array(pts, capacity=512)

    poses = [[i * 1.0, 0, 0, 1, 0, 0, 0] for i in range(6)]
    poses.append([0.2, 0.1, 0, 1, 0, 0, 0])
    _feed_chain(slam, cloud, poses)
    n_loops = sum(1 for e in slam.db.edges if e.type == "loop")
    assert n_loops == 0


def test_good_candidate_accepted():
    """Same layout but with a shared structured scene: the loop closes."""
    rng = np.random.default_rng(4)
    cfg = _loop_cfg()
    slam = MrgSlam(cfg)
    world_cloud = _structured_cloud(np.random.default_rng(7))

    def view(pose7):
        # transform world points into the sensor frame at pose7
        inv = se3np.pose_inverse(np.asarray(pose7, np.float32))
        pts = np.asarray(world_cloud.points)[np.asarray(world_cloud.mask)]
        local = se3np.quat_rotate(inv[3:7], pts) + inv[:3]
        return PointCloud.from_array(local.astype(np.float32), capacity=512)

    poses = [[i * 1.0, 0, 0, 1, 0, 0, 0] for i in range(6)]
    poses.append([0.2, 0.1, 0, 1, 0, 0, 0])
    clouds = [view(np.asarray(p, np.float32)) for p in poses]
    _feed_chain(slam, lambda i: clouds[i], poses)
    n_loops = sum(1 for e in slam.db.edges if e.type == "loop")
    assert n_loops >= 1


def test_single_dispatch_tick_closes_loop_with_consistency_check():
    """The tick's ENTIRE pair workload — candidate registrations,
    speculative consistency checks, deferred-edge fitness — is ONE
    PairRunner dispatch, and the speculative rows still accept a genuine
    revisit (loop_detector.cpp:190-303 runs its checks serially after
    selection; here they ride the same batch)."""
    cfg = _loop_cfg()
    cfg = dataclasses.replace(cfg, loop=dataclasses.replace(
        cfg.loop, enable_loop_closure_consistency_check=True))
    slam = MrgSlam(cfg)
    world_cloud = _structured_cloud(np.random.default_rng(7))

    def view(pose7):
        inv = se3np.pose_inverse(np.asarray(pose7, np.float32))
        pts = np.asarray(world_cloud.points)[np.asarray(world_cloud.mask)]
        local = se3np.quat_rotate(inv[3:7], pts) + inv[:3]
        return PointCloud.from_array(local.astype(np.float32), capacity=512)

    poses = [[i * 1.0, 0, 0, 1, 0, 0, 0] for i in range(6)]
    poses.append([0.2, 0.1, 0, 1, 0, 0, 0])
    clouds = [view(np.asarray(p, np.float32)) for p in poses]

    batches = []
    orig_run = slam.loop_detector.runner.run
    slam.loop_detector.runner.run = (
        lambda reqs: (batches.append(len(reqs)), orig_run(reqs))[1])
    _feed_chain(slam, lambda i: clouds[i], poses)
    # one dispatch per tick — no separate phase-2 consistency dispatch
    assert len(batches) == 2
    # the revisit tick's batch carries the speculative check rows on top of
    # its 1 deferred odometry edge: >= 1 candidate + its prev/next checks
    assert batches[-1] >= 1 + 1 + 1
    # ... and the winner (never a first keyframe, find_candidates skips
    # them) was accepted through those precomputed rows
    n_loops = sum(1 for e in slam.db.edges if e.type == "loop")
    assert n_loops >= 1


# ---------------------------------------------------------------------------
# others_odom2map: other robots' odom frames differ from ours
# ---------------------------------------------------------------------------

def _fake_remote_graph(t_b_odom2map, n_kf=3):
    """Build bestla's delta graph: keyframe estimates live in the shared
    map frame; bestla's own odometry frame is offset by t_b_odom2map."""
    kmsgs = []
    slam_uuid = new_uuid()
    world_poses = [np.asarray([5.0 + i, 8.0, 0, 1, 0, 0, 0], np.float32)
                   for i in range(n_kf)]
    for i, wp in enumerate(world_poses):
        kmsgs.append(KeyFrameMsg(
            robot_name="bestla", uuid=new_uuid(), slam_uuid=slam_uuid,
            stamp=float(i), odom_counter=i, first_keyframe=False,
            static_keyframe=False, accum_distance=float(i), estimate=wp,
            cloud=PointCloud.empty(512)))
    latest_odom = se3np.pose_compose(se3np.pose_inverse(t_b_odom2map),
                                     world_poses[-1])
    return GraphMsg(robot_name="bestla",
                    latest_keyframe_uuid=kmsgs[-1].uuid,
                    latest_keyframe_odom=latest_odom,
                    keyframes=kmsgs, edges=[]), world_poses


def test_others_odom2map_estimated_and_applied():
    cfg = dataclasses.replace(
        _loop_cfg(), robot_remove_points_radius=2.0,
        inf_matrix=InformationMatrixConfig(use_const_inf_matrix=True),
        loop=dataclasses.replace(_loop_cfg().loop,
                                 candidate_max_xy_distance=0.0))
    slam = MrgSlam(cfg)
    # own chain along x
    for i in range(3):
        slam.db.add_odom_keyframe(
            float(i), np.asarray([i * 1.0, 0, 0, 1, 0, 0, 0], np.float32),
            accum_distance=float(i), cloud=PointCloud.empty(512))
    slam.optimization_tick(now=3.0)

    # bestla's odom frame is rotated+translated vs the map
    t_b = np.concatenate([[2.0, -1.0, 0.0],
                          se3np.rpy_to_quat(0, 0, 0.7)]).astype(np.float32)
    msg, world_poses = _fake_remote_graph(t_b)
    slam.db.add_graph_msg(msg)
    slam.optimization_tick(now=4.0)

    got = slam.others_odom2map.get("bestla")
    assert got is not None
    np.testing.assert_allclose(got[:3], t_b[:3], atol=1e-3)
    assert se3np.rotation_angle(se3np.pose_between(got, t_b)[3:]) < 1e-3

    # an odom broadcast from bestla lands in OUR map frame through it
    o_b = np.asarray([1.0, 2.0, 0, 1, 0, 0, 0], np.float32)
    slam.on_odom_broadcast(PoseWithName("bestla", 5.0, o_b, 9.0))
    expect = se3np.pose_compose(t_b, o_b)
    np.testing.assert_allclose(slam.others_map_poses["bestla"][:3],
                               expect[:3], atol=1e-3)
    arr = slam.others_poses_in_map(5.0)
    assert len(arr) == 1 and arr[0].robot_name == "bestla"

    # point removal: a scan point at bestla's position (map frame) must be
    # masked; scans are taken at our odom pose [0,0,0]
    own_odom = np.asarray([0, 0, 0, 1, 0, 0, 0], np.float32)
    own_map = se3np.pose_compose(slam.trans_odom2map, own_odom)
    b_in_base = se3np.pose_apply(se3np.pose_inverse(own_map), expect[:3])
    far_pt = b_in_base + np.asarray([10.0, 10.0, 0.0], np.float32)
    cloud = PointCloud.from_array(
        np.stack([b_in_base, far_pt]).astype(np.float32), capacity=512)
    filtered = slam._remove_other_robot_points(own_odom, cloud)
    kept = np.asarray(filtered.points)[np.asarray(filtered.mask)]
    assert len(kept) == 1
    np.testing.assert_allclose(kept[0], far_pt, atol=1e-4)


def test_unknown_robot_not_removed():
    """Before any merge, another robot's odom broadcast cannot be placed in
    our map frame — no points may be removed for it (reference gates on
    others_odom2map_, mrg_slam_component.cpp:660-683)."""
    cfg = dataclasses.replace(_loop_cfg(), robot_remove_points_radius=2.0)
    slam = MrgSlam(cfg)
    slam.on_odom_broadcast(
        PoseWithName("bestla", 0.0,
                     np.asarray([0, 0, 0, 1, 0, 0, 0], np.float32), 0.0))
    cloud = PointCloud.from_array(np.zeros((1, 3), np.float32), capacity=64)
    filtered = slam._remove_other_robot_points(
        np.asarray([0, 0, 0, 1, 0, 0, 0], np.float32), cloud)
    assert int(np.asarray(filtered.mask).sum()) == 1


# ---------------------------------------------------------------------------
# per-tick snapshots + marginals
# ---------------------------------------------------------------------------

def test_save_keyframe_poses_per_tick(tmp_path):
    cfg = dataclasses.replace(
        _loop_cfg(), result_dir=str(tmp_path),
        inf_matrix=InformationMatrixConfig(use_const_inf_matrix=True))
    slam = MrgSlam(cfg)
    for tick in range(3):
        for i in range(2):
            j = tick * 2 + i
            slam.db.add_odom_keyframe(
                float(j), np.asarray([j * 1.0, 0, 0, 1, 0, 0, 0],
                                     np.float32),
                accum_distance=float(j), cloud=PointCloud.empty(512))
        slam.optimization_tick(now=float(tick))
    files = sorted((tmp_path / "atlas").glob("atlas_*.txt"))
    assert len(files) == 3
    # TUM rows: stamp + 7 numbers; last snapshot has all 6 keyframes
    rows = [l.split() for l in files[-1].read_text().splitlines()]
    assert len(rows) == 6 and all(len(r) == 8 for r in rows)


def test_per_tick_marginals_attached():
    cfg = dataclasses.replace(
        _loop_cfg(),
        inf_matrix=InformationMatrixConfig(use_const_inf_matrix=True))
    slam = MrgSlam(cfg)
    for i in range(3):
        slam.db.add_odom_keyframe(
            float(i), np.asarray([i * 1.0, 0, 0, 1, 0, 0, 0], np.float32),
            accum_distance=float(i), cloud=PointCloud.empty(512))
    slam.optimization_tick(now=3.0)
    cov = slam.db.graph.last_marginals
    assert cov is not None and cov.shape[1:] == (6, 6)
    # free nodes have positive variance; diagonal blocks PSD-ish
    free = [k.node_id for k in slam.db.own_keyframes()]
    d = np.diagonal(cov[free], axis1=1, axis2=2)
    assert (d > 0).all()


def test_per_tick_marginals_cg_mode_matches_exact():
    """mode 'cg' (matrix-free selected inverse) == mode 'exact' blocks."""
    cfg = dataclasses.replace(
        _loop_cfg(),
        inf_matrix=InformationMatrixConfig(use_const_inf_matrix=True))
    slam = MrgSlam(cfg)
    for i in range(4):
        slam.db.add_odom_keyframe(
            float(i), np.asarray([i * 1.0, 0, 0.1 * i, 1, 0, 0, 0],
                                 np.float32),
            accum_distance=float(i), cloud=PointCloud.empty(512))
    slam.optimization_tick(now=4.0)  # flushes the queue into the graph
    slam.db.graph.optimize(marginals_mode="exact")
    cov_exact = slam.db.graph.last_marginals.copy()
    slam.db.graph.optimize(marginals_mode="cg")
    cov_cg = slam.db.graph.last_marginals
    assert cov_cg.shape == cov_exact.shape
    np.testing.assert_allclose(cov_cg, cov_exact, rtol=0.05, atol=1e-4)
