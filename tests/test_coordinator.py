"""Cross-robot batching: the vmapped multi-graph solve, the robot-stacked
fused odometry, and single-robot SharedTick degradation must match the
per-robot serial paths (models/coordinator.py, graph/builder.py
optimize_many, odometry_fused.run_batch_multi). The long two/three-robot
SharedTick drives live in test_coordinator_scale.py (helpers in
tests/coordutil.py)."""

import copy
import dataclasses as dc

import numpy as np
import jax
import jax.numpy as jnp

from mrg_slam_tpu.graph.builder import optimize_many
from mrg_slam_tpu.io.synthetic import SyntheticWorld, circle_trajectory
from mrg_slam_tpu.models import odometry_fused as fused
from mrg_slam_tpu.models.backend import MrgSlam
from mrg_slam_tpu.models.coordinator import SharedTick
from mrg_slam_tpu.ops.cloud import PointCloud
from mrg_slam_tpu.ops.prefilter import prefilter
from mrg_slam_tpu.pipeline.baseline_runs import build_ring_graph

from coordutil import ODO_CFG, PRE, slam_config, two_robot_inputs


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
        # exact (dense H^-1) marginals evaluated at optima that may differ
        # by the pose atol above — compare with a matching relative band
        np.testing.assert_allclose(g_m.last_marginals,
                                   g_s.last_marginals, atol=2e-3, rtol=0.05)


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
# SharedTick (single robot; the long drives are in test_coordinator_scale)
# ---------------------------------------------------------------------------

def test_shared_tick_single_robot():
    """SharedTick over one robot degrades to the plain tick."""
    scans_a, _, traj_a, _ = two_robot_inputs()
    slam = MrgSlam(slam_config("atlas", ("atlas",)))
    st = SharedTick([slam])
    for i, (scan, pose) in enumerate(zip(scans_a, traj_a)):
        slam.process_scan(i * 0.1, pose.astype(np.float32), scan)
        if (i + 1) % 10 == 0:
            out = st.tick_all(now=i * 0.1)
            assert set(out) == {"atlas"}
    assert len(slam.db.keyframes) + len(slam.db.new_keyframes) >= 8
