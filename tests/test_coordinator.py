"""Cross-robot batching: shared-dispatch ticks and the vmapped multi-graph
solve must match the per-robot serial paths (models/coordinator.py,
graph/builder.py optimize_many, odometry_fused.run_batch_multi)."""

import copy
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mrg_slam_tpu.config import (LoopClosureConfig, OptimizerConfig,
                                 PrefilterConfig, RegistrationConfig,
                                 ScanMatchingOdometryConfig, SlamConfig)
from mrg_slam_tpu.graph.builder import optimize_many
from mrg_slam_tpu.io.synthetic import SyntheticWorld, circle_trajectory
from mrg_slam_tpu.models import odometry_fused as fused
from mrg_slam_tpu.models.backend import MrgSlam
from mrg_slam_tpu.models.coordinator import SharedTick
from mrg_slam_tpu.ops.cloud import PointCloud
from mrg_slam_tpu.ops.prefilter import prefilter
from mrg_slam_tpu.pipeline.baseline_runs import build_ring_graph
from mrg_slam_tpu.utils.metrics import ate_rmse


# ---------------------------------------------------------------------------
# optimize_many
# ---------------------------------------------------------------------------

def test_optimize_many_matches_single():
    """Three same-capacity ring graphs with different noise: the batched
    vmapped solve must land where three separate solves land, including
    chi2 bookkeeping and the per-tick marginals write-back."""
    gs = [build_ring_graph(n_nodes=48, capacity_nodes=64, capacity_edges=128,
                           backend="dense", seed=s) for s in (0, 1, 2)]
    singles = [copy.deepcopy(g) for g in gs]
    for g in singles:
        g.optimize()
    optimize_many(gs)
    for g_m, g_s in zip(gs, singles):
        assert np.isfinite(g_m.chi2_final)
        # same start, same numerics: the vmapped lockstep loop freezes
        # finished graphs, so each lands where its solo solve lands
        np.testing.assert_allclose(g_m.poses, g_s.poses, atol=5e-3)
        assert g_m.chi2_final <= g_s.chi2_final * 1.1 + 1e-3
        # per-graph iteration counters freeze at each graph's own early
        # stop (the exact count differs from solo by vmap float noise)
        assert 0 < g_m.last_iterations <= 512
        assert g_m.last_marginals is not None
        np.testing.assert_allclose(g_m.last_marginals,
                                   g_s.last_marginals, atol=1e-3)


def test_optimize_many_mixed_capacity_levels_up():
    """Auto-growth desyncs co-hosted capacities; optimize_many reserves
    the smaller graph up to the larger so the batch survives instead of
    silently degrading to sequential solves."""
    g1 = build_ring_graph(n_nodes=16, capacity_nodes=32, capacity_edges=64,
                          backend="dense", seed=0)
    g2 = build_ring_graph(n_nodes=16, capacity_nodes=64, capacity_edges=64,
                          backend="dense", seed=1)
    optimize_many([g1, g2])
    assert g1.cap["nodes"] == g2.cap["nodes"] == 64
    assert g1.chi2_final < g1.chi2_initial
    assert g2.chi2_final < g2.chi2_initial
    assert g1.num_nodes == 16  # live rows untouched by the reserve


def test_optimize_many_mixed_config_falls_back():
    import dataclasses as dc

    g1 = build_ring_graph(n_nodes=16, capacity_nodes=32, capacity_edges=64,
                          backend="dense", seed=0)
    g2 = build_ring_graph(n_nodes=16, capacity_nodes=32, capacity_edges=64,
                          backend="cg", seed=1)
    g2.cfg = dc.replace(g2.cfg, solver_backend="cg")
    optimize_many([g1, g2])  # differing solver configs -> sequential
    assert g1.chi2_final < g1.chi2_initial
    assert g2.chi2_final < g2.chi2_initial


# ---------------------------------------------------------------------------
# run_batch_multi
# ---------------------------------------------------------------------------

ODO_CFG = ScanMatchingOdometryConfig(
    keyframe_delta_translation=2.0,
    registration=RegistrationConfig(
        reg_transformation_epsilon=1e-3, reg_maximum_iterations=16,
        reg_covariance_mode="radius", reg_covariance_radius=1.0))
PRE = PrefilterConfig(downsample_resolution=0.4,
                      capacity_filtered_points=1024,
                      outlier_removal_method="NONE")


def _frames(world, traj, seed0):
    pts, masks = [], []
    for i, p in enumerate(traj):
        pc = prefilter(PointCloud.from_array(world.scan(p, seed=seed0 + i),
                                             capacity=4096), PRE)
        pts.append(pc.points)
        masks.append(pc.mask)
    return jnp.stack(pts), jnp.stack(masks)


def test_run_batch_multi_matches_per_robot():
    world = SyntheticWorld.build(seed=9, extent=30.0, n_ground=20000,
                                 max_points_per_scan=4096, noise=0.02)
    traj = circle_trajectory(24, radius=12.0, laps=0.4)
    blocks = [_frames(world, traj[:12], 0), _frames(world, traj[12:], 100)]
    stamps = jnp.arange(12, dtype=jnp.float32) * 0.1

    # per-robot
    singles = []
    for pts, masks in blocks:
        carry = fused.init_carry(pts.shape[1])
        _, out = fused.run_batch(ODO_CFG, carry, pts, masks, stamps)
        singles.append(np.asarray(out.pose))

    # robot-stacked
    carries = jax.tree.map(lambda *x: jnp.stack(x),
                           *[fused.init_carry(blocks[0][0].shape[1])
                             for _ in blocks])
    pts = jnp.stack([b[0] for b in blocks])
    masks = jnp.stack([b[1] for b in blocks])
    _, out = fused.run_batch_multi(ODO_CFG, carries, pts, masks,
                                   jnp.stack([stamps, stamps]))
    multi = np.asarray(out.pose)
    for r in range(2):
        np.testing.assert_allclose(multi[r], singles[r], atol=1e-4)


# ---------------------------------------------------------------------------
# SharedTick
# ---------------------------------------------------------------------------

REG = RegistrationConfig(registration_method="SMALL_GICP",
                         reg_transformation_epsilon=1e-3,
                         reg_maximum_iterations=32,
                         reg_correspondence_randomness=10,
                         reg_max_correspondence_distance=2.0)


def _slam_config(name, robots):
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


def _drive_two(world, scans_a, scans_b, traj_a, traj_b, ticker):
    """Feed ground-truth odometry + prefiltered clouds to two robots,
    ticking through `ticker(slams, now)` every 10 frames."""
    a = MrgSlam(_slam_config("atlas", ("atlas", "bestla")))
    b = MrgSlam(_slam_config("bestla", ("atlas", "bestla")))
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


@pytest.fixture(scope="module")
def two_robot_inputs():
    world = SyntheticWorld.build(seed=5, extent=30.0, n_ground=25000,
                                 n_pillars=25, n_walls=10,
                                 max_points_per_scan=4096, noise=0.02)
    # both robots drive self-closing laps (same circle, different scan
    # seeds) so each accrues its own loop closures without graph exchange
    traj = circle_trajectory(75, radius=12.0, laps=1.25)
    traj_a, traj_b = traj, traj[: 65]
    scans_a = [prefilter(PointCloud.from_array(world.scan(p, seed=i),
                                               capacity=4096), PRE)
               for i, p in enumerate(traj_a)]
    scans_b = [prefilter(PointCloud.from_array(world.scan(p, seed=500 + i),
                                               capacity=4096), PRE)
               for i, p in enumerate(traj_b)]
    return scans_a, scans_b, traj_a, traj_b


def test_shared_tick_matches_serial(two_robot_inputs):
    """The coordinated tick must be semantically equivalent to serial
    per-robot ticks on identical inputs: same keyframes, loops found on
    both paths, and matching trajectories."""
    scans_a, scans_b, traj_a, traj_b = two_robot_inputs

    def serial(slams, now):
        for s in slams:
            s.optimization_tick(now=now)

    ticker_state = {}

    def shared(slams, now):
        st = ticker_state.setdefault("st", SharedTick(slams))
        st.tick_all(now=now)

    a1, b1 = _drive_two(None, scans_a, scans_b, traj_a, traj_b, serial)
    a2, b2 = _drive_two(None, scans_a, scans_b, traj_a, traj_b, shared)

    for s1, s2 in ((a1, a2), (b1, b2)):
        k1 = len(s1.db.keyframes) + len(s1.db.new_keyframes)
        k2 = len(s2.db.keyframes) + len(s2.db.new_keyframes)
        assert k1 == k2, (k1, k2)
        l1 = sum(1 for e in s1.db.edges if e.type == "loop")
        l2 = sum(1 for e in s2.db.edges if e.type == "loop")
        assert l2 >= 1 and l2 >= l1 - 1, (l1, l2)
        t1, t2 = s1.trajectory(), s2.trajectory()
        assert t1.shape == t2.shape
        np.testing.assert_allclose(t1[:, :3], t2[:, :3], atol=0.1)
        # coordinated tick produced the same stats surface
        assert s2.tick_stats and s2.tick_stats[-1].chi2_after <= (
            s2.tick_stats[-1].chi2_before + 1e-6)
        # per-tick marginals still flow in the batched solve
        assert s2.db.graph.last_marginals is not None


def test_shared_tick_single_robot(two_robot_inputs):
    """SharedTick over one robot degrades to the plain tick."""
    scans_a, _, traj_a, _ = two_robot_inputs
    slam = MrgSlam(_slam_config("atlas", ("atlas",)))
    st = SharedTick([slam])
    for i, (scan, pose) in enumerate(zip(scans_a, traj_a)):
        slam.process_scan(i * 0.1, pose.astype(np.float32), scan)
        if (i + 1) % 10 == 0:
            out = st.tick_all(now=i * 0.1)
            assert set(out) == {"atlas"}
    assert len(slam.db.keyframes) + len(slam.db.new_keyframes) >= 8


def test_shared_tick_three_robots(two_robot_inputs):
    """R>2: three co-hosted robots tick through one coordinator; each
    closes its own loops and the batched solve handles the 3-graph stack."""
    scans_a, scans_b, traj_a, traj_b = two_robot_inputs
    names = ("r0", "r1", "r2")
    slams = [MrgSlam(_slam_config(n, names)) for n in names]
    st = SharedTick(slams)
    feeds = [(scans_a, traj_a), (scans_b, traj_b),
             (scans_a[:50], traj_a[:50])]
    n = max(len(s) for s, _ in feeds)
    for i in range(n):
        for slam, (scans, traj) in zip(slams, feeds):
            if i < len(scans):
                slam.process_scan(i * 0.1, traj[i].astype(np.float32),
                                  scans[i])
        if (i + 1) % 10 == 0:
            out = st.tick_all(now=i * 0.1)
            assert set(out) == set(names)
    st.tick_all(now=n * 0.1)
    for slam, (scans, _) in zip(slams, feeds):
        k = len(slam.db.keyframes) + len(slam.db.new_keyframes)
        assert k >= len(scans) // 10, (slam.own_name, k)
        assert slam.db.graph.chi2_final <= slam.db.graph.chi2_initial + 1e-6
    # the two full-lap robots close loops
    for slam in slams[:2]:
        assert sum(1 for e in slam.db.edges if e.type == "loop") >= 1
