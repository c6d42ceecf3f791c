"""Ground fill, markers export, socket channel, g2o tooling."""

import json

import numpy as np
import pytest

from mrg_slam_tpu.ops.cloud import PointCloud
from mrg_slam_tpu.ops.ground_fill import (fill_ground_plane_ransac,
                                          fill_ground_plane_simple)
from mrg_slam_tpu.parallel.channel import (InProcessBus, SocketClient,
                                           SocketServer)
from mrg_slam_tpu.utils import se3


def test_fill_ground_plane_simple(rng):
    base = np.asarray([0, 0, 0.5, 1, 0, 0, 0], np.float32)
    cloud = PointCloud.from_array(
        rng.normal(size=(50, 3)).astype(np.float32), capacity=64)
    out = fill_ground_plane_simple(cloud, base, radius=2.0, resolution=0.5)
    pts = out.to_numpy()
    assert len(pts) > 50
    ring = pts[50:]
    np.testing.assert_allclose(ring[:, 2], 0.5, atol=1e-5)  # disc at base z
    assert np.linalg.norm(ring[:, :2], axis=1).max() <= 2.01


def test_fill_ground_plane_ransac(rng):
    n = 400
    ground = np.stack([rng.uniform(-3, 3, n), rng.uniform(-3, 3, n),
                       np.full(n, -1.0)], axis=1).astype(np.float32)
    cloud = PointCloud.from_array(ground, capacity=512)
    out = fill_ground_plane_ransac(cloud, radius=3.0, resolution=0.5)
    pts = out.to_numpy()
    assert len(pts) > n
    np.testing.assert_allclose(pts[n:, 2], -1.0, atol=0.1)


def test_in_process_bus():
    bus = InProcessBus()
    got = []
    bus.subscribe("t", got.append)
    bus.publish("t", 42)
    assert got == [42]
    bus.advertise("svc", lambda x: x * 2)
    assert bus.call("svc", 21) == 42
    assert bus.call("missing", 0) is None


def test_socket_channel_roundtrip():
    srv = SocketServer()
    srv.advertise("echo", lambda req: {"got": req, "arr": np.arange(5)})
    cli = SocketClient(srv.address, timeout=5.0)
    out = cli.call("echo", {"hello": np.ones(3, np.float32)})
    assert out["got"]["hello"].sum() == 3.0
    np.testing.assert_array_equal(out["arr"], np.arange(5))
    assert cli.call("nope", 1) is None
    cli.close()
    srv.close()


def test_markers_and_g2o_tools(tmp_path, rng):
    import dataclasses
    from mrg_slam_tpu.config import (OptimizerConfig, RegistrationConfig,
                                     SlamConfig, LoopClosureConfig)
    from mrg_slam_tpu.models.backend import MrgSlam
    from mrg_slam_tpu.models.markers import export_ply, graph_summary
    from mrg_slam_tpu.models.persistence import save_graph
    from mrg_slam_tpu.pipeline.tools import (evaluate_tum, g2o_to_tum,
                                             g2o_to_poses)
    from mrg_slam_tpu.utils.tum import save_tum

    cfg = SlamConfig(own_name="m", multi_robot_names=("m",),
                     capacity_keyframes=32, capacity_edges=64,
                     capacity_keyframe_points=64,
                     optimizer=OptimizerConfig(solver_backend="dense"),
                     robot_remove_points_radius=0.0)
    slam = MrgSlam(cfg)
    for i in range(6):
        pose = np.asarray([i * 2.0, 0, 0, 1, 0, 0, 0], np.float32)
        cloud = PointCloud.from_array(
            rng.normal(size=(32, 3)).astype(np.float32), capacity=64)
        slam.process_scan(i * 0.5, pose, cloud)
    slam.optimization_tick(now=3.0)

    s = graph_summary(slam, with_marginals=True)
    assert len(s["nodes"]) >= 3
    assert any(e["type"] == "odom" for e in s["edges"])
    assert "ellipsoids" in s and len(s["ellipsoids"]) == len(s["nodes"])
    json.dumps(s)  # must be serializable

    ply = tmp_path / "graph.ply"
    export_ply(slam, ply)
    assert ply.read_bytes().startswith(b"ply")

    save_graph(slam, tmp_path / "g")
    n = g2o_to_tum(tmp_path / "g" / "graph.g2o", tmp_path / "est.tum")
    assert n == len(s["nodes"])
    poses = g2o_to_poses(tmp_path / "g" / "graph.g2o")
    # ground truth = the same poses -> ATE 0
    save_tum(tmp_path / "gt.tum", np.arange(len(poses)) * 0.1, poses)
    res = evaluate_tum(tmp_path / "est.tum", tmp_path / "gt.tum")
    assert res.ate_rmse < 1e-4


def test_graph_exchange_over_sockets(rng):
    """Full delta-graph exchange through the TCP channel: robot B serves
    publish_graph behind a SocketServer; robot A pulls through a client."""
    import dataclasses
    from mrg_slam_tpu.config import OptimizerConfig, SlamConfig
    from mrg_slam_tpu.models.backend import MrgSlam

    def mk(name):
        return MrgSlam(SlamConfig(
            own_name=name, multi_robot_names=("alpha", "beta"),
            capacity_keyframes=32, capacity_edges=64,
            capacity_keyframe_points=64,
            optimizer=OptimizerConfig(solver_backend="dense"),
            exchange=dataclasses.replace(
                SlamConfig().exchange, graph_request_min_time_delay=0.0,
                graph_request_min_accum_dist=0.0)))

    a, b = mk("alpha"), mk("beta")
    for i in range(4):
        cloud = PointCloud.from_array(
            rng.normal(size=(32, 3)).astype(np.float32), capacity=64)
        pose = np.asarray([i * 2.0, 0, 0, 1, 0, 0, 0], np.float32)
        a.process_scan(i * 0.5, pose, cloud)
        b.process_scan(i * 0.5, pose + np.asarray([0, 1, 0, 0, 0, 0, 0],
                                                  np.float32), cloud)
    a.optimization_tick(now=2.0)
    b.optimization_tick(now=2.0)

    srv = SocketServer()
    srv.advertise("publish_graph", b.handle_publish_graph)
    cli = SocketClient(srv.address, timeout=10.0)

    def request_fn(peer_name, req):
        return cli.call("publish_graph", req)

    sp = b.slam_pose_broadcast(2.0)
    assert sp is not None
    did = a.on_slam_pose_broadcast(sp, now=2.0, request_fn=request_fn)
    assert did, "exchange did not trigger"
    a.optimization_tick(now=3.0)
    merged = [k for k in a.db.keyframes + a.db.new_keyframes
              if k.robot_name == "beta"]
    assert len(merged) >= 3
    cli.close()
    srv.close()


def test_in_process_bus_timeout_honored():
    """InProcessBus.call must honor its timeout like SocketClient (VERDICT
    r2 weak #6): a slow service returns None at expiry instead of blocking
    the caller; timeout=None calls inline."""
    import time as _time

    bus = InProcessBus()
    bus.advertise("slow", lambda req: (_time.sleep(0.8), "late")[1])
    t0 = _time.perf_counter()
    assert bus.call("slow", None, timeout=0.1) is None
    assert _time.perf_counter() - t0 < 0.6
    bus.advertise("fast", lambda req: req + 1)
    assert bus.call("fast", 1) == 2
    assert bus.call("fast", 1, timeout=None) == 2
    assert bus.call("missing", 1) is None


def test_cpu_cache_dir_is_host_stable(tmp_path):
    """Per-host XLA:CPU cache pinning: stable on one host, nested under
    the base dir (mrg_slam_tpu/utils/hostcache.py)."""
    from mrg_slam_tpu.utils.hostcache import cpu_cache_dir, host_fingerprint

    fp1, fp2 = host_fingerprint(), host_fingerprint()
    assert fp1 == fp2 and len(fp1) == 12
    d = cpu_cache_dir(str(tmp_path))
    assert d.startswith(str(tmp_path)) and fp1 in d
    import os
    assert os.path.isdir(d)

    # identical `flags` but differing `bugs`/`microcode` must hash apart:
    # XLA derives +prefer-no-gather from the gather-data-sampling
    # mitigation, which never shows in the flags line (round-3 AOT
    # machine-feature mismatch root cause)
    base = ("vendor_id : GenuineIntel\nmodel name : Xeon\nstepping : 2\n"
            "flags : sse sse2 avx avx2\n")
    a = tmp_path / "cpuinfo_a"
    b = tmp_path / "cpuinfo_b"
    a.write_text(base + "microcode : 0x1\nbugs : spectre_v1\n\n")
    b.write_text(base + "microcode : 0x2d000603\n"
                 "bugs : spectre_v1 gather_data_sampling\n\n")
    assert host_fingerprint(str(a)) != host_fingerprint(str(b))
    # second processor block must not perturb the hash
    a2 = tmp_path / "cpuinfo_a2"
    a2.write_text(a.read_text().rstrip() + "\n\nflags : different\n")
    assert host_fingerprint(str(a2)) == host_fingerprint(str(a))

    # byte-identical /proc/cpuinfo but differing KERNEL mitigation state
    # must hash apart: XLA's +prefer-no-gather AOT pseudo-feature tracks
    # the gather_data_sampling mitigation status, which two VMs with equal
    # cpuinfo disagreed on (MULTICHIP_r03 tail — the surviving collision
    # after the bugs/microcode fix)
    v1 = tmp_path / "vuln1"
    v2 = tmp_path / "vuln2"
    v1.mkdir()
    v2.mkdir()
    (v1 / "gather_data_sampling").write_text("Not affected\n")
    (v2 / "gather_data_sampling").write_text("Mitigation: Microcode\n")
    for v in (v1, v2):
        (v / "spectre_v2").write_text("Mitigation: Enhanced IBRS\n")
    fa = host_fingerprint(str(a), vuln_dir=str(v1))
    fb = host_fingerprint(str(a), vuln_dir=str(v2))
    assert fa != fb
    assert fa == host_fingerprint(str(a), vuln_dir=str(v1))
