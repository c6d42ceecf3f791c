"""Persistence fidelity (VERDICT round-1 item 4): attachments, kernels,
anchor re-attachment, .g2o import, byte-identical save->load->save."""

import dataclasses
import filecmp
from pathlib import Path

import numpy as np

from mrg_slam_tpu.config import (InformationMatrixConfig, LoopClosureConfig,
                                 OptimizerConfig, RegistrationConfig,
                                 SlamConfig)
from mrg_slam_tpu.models.backend import MrgSlam
from mrg_slam_tpu.models.persistence import load_g2o, load_graph, save_graph
from mrg_slam_tpu.ops.cloud import PointCloud
from mrg_slam_tpu.utils import se3np


def _cfg(name="saver"):
    reg = RegistrationConfig(reg_transformation_epsilon=1e-3,
                             reg_maximum_iterations=16,
                             reg_correspondence_randomness=10)
    return SlamConfig(
        own_name=name, multi_robot_names=(name,),
        keyframe_delta_trans=0.5, capacity_keyframes=32, capacity_edges=128,
        capacity_keyframe_points=256, registration=reg,
        optimizer=OptimizerConfig(solver_backend="dense",
                                  g2o_solver_num_iterations=16),
        inf_matrix=InformationMatrixConfig(use_const_inf_matrix=True),
        loop=dataclasses.replace(LoopClosureConfig(), capacity_candidates=2,
                                 candidate_max_xy_distance=0.0),
        odometry_edge_robust_kernel="Huber",
        odometry_edge_robust_kernel_size=0.7,
        robot_remove_points_radius=0.0)


def _small_run(rng, n=5):
    """A tiny chain with sensor attachments on some keyframes."""
    slam = MrgSlam(_cfg())
    for i in range(n):
        pts = rng.uniform(-2, 2, size=(64, 3)).astype(np.float32)
        kf = slam.db.add_odom_keyframe(
            float(i), np.asarray([i * 1.0, 0, 0, 1, 0, 0, 0], np.float32),
            accum_distance=float(i),
            cloud=PointCloud.from_array(pts, capacity=256))
        if i == 1:
            kf.floor_coeffs = np.asarray([0, 0, 1, -0.2], np.float32)
            kf.utm_coord = np.asarray([453000.1, 5428000.5, 110.25],
                                      np.float32)
        if i == 2:
            kf.acceleration = np.asarray([0.1, 0.0, 9.81], np.float32)
            kf.orientation = se3np.rpy_to_quat(0.0, 0.05, 0.2)
    slam.optimization_tick(now=float(n))
    return slam


def test_roundtrip_byte_identical(tmp_path, rng=None):
    rng = np.random.default_rng(11)
    slam = _small_run(rng)
    d1, d2 = tmp_path / "g1", tmp_path / "g2"
    n1 = save_graph(slam, d1)
    assert n1 == 5

    # fresh instance; flush the loaded graph WITHOUT optimizing so the
    # estimates stay exactly the saved values
    slam2 = MrgSlam(_cfg("loader"))
    n_loaded = load_graph(slam2, d1)
    assert n_loaded == n1
    slam2.db.flush_loaded_graph(slam2.loop_detector.loop_manager)
    n2 = save_graph(slam2, d2)
    assert n2 == n1

    # keyframes/ and edges/ trees must be byte-identical (uuids, poses,
    # attachments, kernels, clouds all survive the round trip)
    for sub in ("keyframes", "edges"):
        dirs1 = sorted(p.name for p in (d1 / sub).iterdir())
        dirs2 = sorted(p.name for p in (d2 / sub).iterdir())
        assert dirs1 == dirs2
        for name in dirs1:
            for f in sorted(p.name for p in (d1 / sub / name).iterdir()):
                a, b = d1 / sub / name / f, d2 / sub / name / f
                assert filecmp.cmp(a, b, shallow=False), f"{sub}/{name}/{f}"


def test_attachments_and_kernels_restored(tmp_path):
    rng = np.random.default_rng(12)
    slam = _small_run(rng)
    save_graph(slam, tmp_path / "g")

    slam2 = MrgSlam(_cfg("loader"))
    load_graph(slam2, tmp_path / "g")
    slam2.db.flush_loaded_graph(slam2.loop_detector.loop_manager)
    kfs = sorted(slam2.db.new_keyframes + slam2.db.keyframes,
                 key=lambda k: k.stamp)
    assert kfs[1].floor_coeffs is not None
    np.testing.assert_allclose(kfs[1].utm_coord,
                               [453000.1, 5428000.5, 110.25], rtol=1e-6)
    assert kfs[2].acceleration is not None and kfs[2].orientation is not None
    odom_edges = [e for e in slam2.db.edges if e.type == "odom"]
    assert odom_edges and all(e.robust_kernel == "Huber"
                              and abs(e.robust_kernel_size - 0.7) < 1e-9
                              for e in odom_edges)
    # anchor edge re-attached to the loader's own anchor node
    anchor_edges = [e for e in slam2.db.edges if e.type == "anchor"]
    assert len(anchor_edges) == 1
    assert slam2.db.anchor_kf is not None
    assert slam2.db.anchor_kf.node_id is not None


def test_special_nodes_floor_id(tmp_path):
    rng = np.random.default_rng(13)
    slam = _small_run(rng)
    # simulate a floor plane node having been created
    slam.floor_processor.plane_node_id = slam.db.graph.add_plane_node(
        [0, 0, 1, 0], fixed=True)
    save_graph(slam, tmp_path / "g")
    text = (tmp_path / "g" / "special_nodes.csv").read_text()
    rows = dict(line.split(",") for line in text.splitlines())
    assert int(rows["floor_node"]) == slam.floor_processor.plane_node_id
    assert int(rows["anchor_node"]) >= 0


def test_g2o_import(tmp_path):
    rng = np.random.default_rng(14)
    slam = _small_run(rng)
    save_graph(slam, tmp_path / "g")
    gs = load_g2o(tmp_path / "g" / "graph.g2o",
                  tmp_path / "g" / "graph.g2o.kernels")
    # anchor + 5 keyframes; anchor edge + 4 odom edges
    assert gs.num_nodes == slam.db.graph.num_nodes
    assert gs.num_edges == slam.db.graph.num_edges
    assert gs.fixed.any()  # the anchor FIX line survived
    # kernels sidecar applied: odometry edges carry Huber(0.7)
    from mrg_slam_tpu.graph.types import KERNEL_IDS
    kern = gs._se3.arrays["kernel"][: gs.num_edges]
    assert (kern == KERNEL_IDS["Huber"]).sum() >= 4
    # poses survive the xyzw<->wxyz conversion
    np.testing.assert_allclose(np.sort(gs.poses[:, 0]),
                               np.sort(slam.db.graph.poses[:, 0]), atol=1e-6)


def test_g2o_parses_like_reference_tooling(tmp_path):
    """The emitted graph.g2o must parse through the reference's
    g2o_to_pose_file.py logic (python_scripts/g2o_to_pose_file.py:30-60):
    VERTEX_SE3:QUAT tokens split to id + 7 floats, EDGE lines ignored."""
    rng = np.random.default_rng(15)
    slam = _small_run(rng)
    save_graph(slam, tmp_path / "g")
    poses = []
    for line in (tmp_path / "g" / "graph.g2o").read_text().splitlines():
        parts = line.split()
        if parts[0] == "VERTEX_SE3:QUAT":
            assert len(parts) == 9
            vid = int(parts[1])
            vals = [float(v) for v in parts[2:]]
            poses.append((vid, vals))
        elif parts[0] == "EDGE_SE3:QUAT":
            assert len(parts) == 3 + 7 + 21
        else:
            assert parts[0] == "FIX"
    assert len(poses) == slam.db.graph.num_nodes


def test_inspect_graph_dir_and_kitti(tmp_path):
    """pipeline/inspect: the kitti/nebula-inspector equivalent produces
    stats + plots from a saved graph and a dataset tree."""
    from mrg_slam_tpu.pipeline.inspect import inspect_graph_dir, inspect_kitti

    rng = np.random.default_rng(21)
    slam = _small_run(rng)
    save_graph(slam, tmp_path / "g")
    stats = inspect_graph_dir(tmp_path / "g")
    assert stats["keyframes"] == 5
    assert stats["edge_types"].get("odom") == 4
    assert stats["keyframes_with_gps"] == 1
    assert stats["keyframes_with_imu"] == 1
    assert (tmp_path / "g" / "inspection.json").exists()
    assert (tmp_path / "g" / "trajectory.png").exists()

    data = Path(__file__).parent / "data" / "kitti_mini"
    kstats = inspect_kitti(data, "00", out_dir=tmp_path / "k")
    assert kstats["scans"] == 3
    assert abs(kstats["gt_path_length_m"] - 2.0) < 1e-6
    assert (tmp_path / "k" / "inspection.json").exists()


def test_inspect_compare_runs(tmp_path):
    """pipeline/inspect compare: run-vs-run report (the reference
    inspectors' result-comparison role, kitti_inspector.py) — count
    deltas, common-stamp trajectory RMSE, per-edge-type chi2 breakdown,
    overlay plot."""
    from mrg_slam_tpu.pipeline.inspect import compare_graph_dirs

    rng = np.random.default_rng(33)
    slam = _small_run(rng)
    save_graph(slam, tmp_path / "a")
    save_graph(slam, tmp_path / "b")
    # perturb run B: shift one keyframe estimate by 0.5 m in x
    kdir = sorted((tmp_path / "b" / "keyframes").iterdir())[2]
    lines = (kdir / "data.txt").read_text().splitlines()
    for i, line in enumerate(lines):
        if line.startswith("estimate "):
            vals = [float(v) for v in line.split()[1:]]
            vals[0] += 0.5
            lines[i] = "estimate " + " ".join(f"{v:.9f}" for v in vals)
    (kdir / "data.txt").write_text("\n".join(lines) + "\n")

    rep = compare_graph_dirs(str(tmp_path / "a"), str(tmp_path / "b"),
                             out_dir=str(tmp_path / "cmp"))
    assert rep["summary_a"]["keyframes"] == rep["summary_b"]["keyframes"]
    ca = rep["summary_a"]["chi2_by_edge_type"]
    cb = rep["summary_b"]["chi2_by_edge_type"]
    assert ca["odom"]["count"] == 4
    # the perturbed estimate must show up both in the trajectory delta
    # and as increased odom chi2 in run B
    robot = next(iter(rep["per_robot_delta"].values()))
    assert robot["common_stamps"] == 5
    assert 0.1 < robot["rmse_raw_m"] < 0.5
    assert cb["odom"]["chi2_total"] > ca["odom"]["chi2_total"] + 0.5
    assert (tmp_path / "cmp" / "comparison.json").exists()
    assert (tmp_path / "cmp" / "comparison.png").exists()


def test_se3np_pose_log_matches_jax():
    from mrg_slam_tpu.utils import se3, se3np

    rng = np.random.default_rng(5)
    for _ in range(20):
        xi = rng.normal(scale=1.2, size=6).astype(np.float32)
        p = np.asarray(se3.pose_exp(xi))
        np.testing.assert_allclose(se3np.pose_log(p),
                                   np.asarray(se3.pose_log(p)),
                                   atol=1e-5)
        a = np.asarray(se3.pose_exp(rng.normal(scale=0.8, size=6)
                                    .astype(np.float32)))
        b = np.asarray(se3.pose_exp(rng.normal(scale=0.8, size=6)
                                    .astype(np.float32)))
        m = np.asarray(se3.pose_exp(rng.normal(scale=0.3, size=6)
                                    .astype(np.float32)))
        np.testing.assert_allclose(
            se3np.pose_error(m, a, b),
            np.asarray(se3.pose_error(m, a, b)), atol=1e-4)
