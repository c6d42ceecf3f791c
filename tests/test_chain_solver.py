"""Chain backend: segmented block-tridiagonal Cholesky + Woodbury
(graph/chain_solver.py) — the large-graph exact solver replacing g2o's
sparse cholmod path (graph_slam.cpp:28-30,353)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mrg_slam_tpu.config import OptimizerConfig
from mrg_slam_tpu.graph import chain_solver as C
from mrg_slam_tpu.graph import solve as S
from mrg_slam_tpu.graph.builder import GraphSLAM
from mrg_slam_tpu.utils import se3np


def build_mixed_graph(rng, n=64, with_planes=True):
    """Noisy ring + loop chords + priors (+ all plane families)."""
    gs = GraphSLAM(OptimizerConfig(), capacity_nodes=n,
                   capacity_edges=2 * n, capacity_priors=16,
                   capacity_planes=4 if with_planes else 0,
                   capacity_plane_edges=16 if with_planes else 0,
                   capacity_plane_priors=4 if with_planes else 0,
                   capacity_plane_plane=4 if with_planes else 0)
    info = np.diag([100.0] * 3 + [400.0] * 3).astype(np.float32)
    poses = []
    for i in range(n):
        ang = 2 * np.pi * i / n
        p = np.asarray([15 * np.cos(ang), 15 * np.sin(ang),
                        0.05 * rng.normal(),
                        *se3np.rpy_to_quat(0, 0, ang)], np.float32)
        p[:3] += 0.1 * rng.normal(size=3)
        poses.append(p)
        gs.add_se3_node(p, fixed=(i == 0))
    for i in range(1, n):
        rel = se3np.pose_between(poses[i - 1], poses[i])
        gs.add_se3_edge(i - 1, i, rel, info, kernel="Huber",
                        kernel_delta=2.0)
    for i in range(0, n - n // 2, 7):
        j = i + n // 2
        rel = se3np.pose_between(poses[i], poses[j])
        gs.add_se3_edge(i, j, rel, info * 0.3, kernel="Cauchy",
                        kernel_delta=1.0)
    for i in range(0, n, 16):
        gs.add_se3_prior_xyz_edge(i, poses[i][:3] + 0.05, np.eye(3) * 25.0)
        gs.add_se3_prior_quat_edge(i, poses[i][3:7], np.eye(3) * 4.0)
    if with_planes:
        pl = gs.add_plane_node([0, 0, 1, 0], fixed=True)
        for i in range(0, n, 8):
            gs.add_se3_plane_edge(i, pl, [0, 0, 1, 0], np.eye(3) * 10.0)
        pl2 = gs.add_plane_node([0.05, 0.02, 0.99, 0.1])
        gs.add_plane_prior_normal_edge(pl2, [0, 0, 1], np.eye(3) * 5.0)
        gs.add_plane_prior_distance_edge(pl2, 0.0, 5.0)
        gs.add_plane_identity_edge(pl, pl2, [0, 0, 0, 0], np.eye(4) * 2.0)
    return gs


def aux_of(gs):
    return C.classify(gs._se3.arrays["from_idx"], gs._se3.arrays["to_idx"],
                      gs._se3.mask(), gs._pl_edges.capacity,
                      gs._pl_pl.capacity, pl_mask=gs._pl_edges.mask(),
                      qq_mask=gs._pl_pl.mask())


@pytest.mark.parametrize("with_planes", [False, True])
@pytest.mark.parametrize("K", [8, 16, 64])
def test_chain_step_matches_dense_step(rng, with_planes, K):
    """One damped Newton step: T+UUᵀ Woodbury == equilibrated dense
    Cholesky, all edge families, fixed nodes, robust IRLS weights."""
    gs = build_mixed_graph(rng, with_planes=with_planes)
    g = gs.snapshot()
    lam = jnp.float32(1e-3)
    with jax.default_matmul_precision("highest"):
        lin = S.linearize(g)
        H, b, free = S.assemble_dense(g, lin)
        x_dense, pred_d, gn_d = S.dense_delta(H, b, free, lam)
        dx_n, dx_p, pred_c, gn_c = C.chain_delta(g, lin, lam, aux_of(gs), K)
    n = g.n_nodes
    xd_n = np.asarray(x_dense[:6 * n]).reshape(n, 6)
    scale = max(float(np.abs(xd_n).max()), 1.0)
    np.testing.assert_allclose(np.asarray(dx_n), xd_n, atol=1e-4 * scale)
    if with_planes:
        xd_p = np.asarray(x_dense[6 * n:]).reshape(-1, 3)
        np.testing.assert_allclose(np.asarray(dx_p), xd_p,
                                   atol=1e-4 * scale)
    np.testing.assert_allclose(float(pred_c), float(pred_d), rtol=1e-3)
    np.testing.assert_allclose(float(gn_c), float(gn_d), rtol=1e-5)


def test_chain_lm_matches_dense_chi2(rng):
    """Full LM through the chain backend reaches the dense backend's chi2
    (VERDICT r2 #3 acceptance shape, scaled down for CPU)."""
    gs = build_mixed_graph(rng, n=256, with_planes=False)
    g = gs.snapshot()
    rd = S.optimize(g, OptimizerConfig(solver_backend="dense",
                                       g2o_solver_num_iterations=64))
    rc = S.optimize(g, OptimizerConfig(solver_backend="chain",
                                       g2o_solver_num_iterations=64))
    cd, cc = float(rd.chi2_final), float(rc.chi2_final)
    assert abs(cc - cd) / max(cd, 1e-9) < 1e-3, (cd, cc)
    assert float(rc.chi2_initial) == pytest.approx(float(rd.chi2_initial))


def test_chain_via_builder_backend(rng):
    """GraphSLAM.optimize with solver_backend='chain' end-to-end (aux from
    the host staging buffers) — the production entry path."""
    gs = build_mixed_graph(rng, n=64, with_planes=True)
    gs.cfg = OptimizerConfig(solver_backend="chain",
                             g2o_solver_num_iterations=64)
    chi2 = gs.optimize()
    assert np.isfinite(chi2)
    # this graph's measurements are built FROM the noisy poses, so the
    # start is already near the optimum (dense lands at 1.1697 from 1.7417)
    assert chi2 < gs.chi2_initial
    assert chi2 < 1.2
    # anchored node held
    assert np.abs(gs.poses[0][:3] - [15, 0, 0]).max() < 0.5


def test_chain_pure_chain_no_coupling(rng):
    """A pure odometry chain (zero coupling columns) exercises the
    Woodbury-free path."""
    n = 32
    gs = GraphSLAM(OptimizerConfig(solver_backend="chain",
                                   g2o_solver_num_iterations=32),
                   capacity_nodes=n, capacity_edges=2 * n,
                   capacity_priors=0, capacity_planes=0,
                   capacity_plane_edges=0, capacity_plane_priors=0,
                   capacity_plane_plane=0)
    info = np.eye(6, dtype=np.float32) * 100.0
    prev = None
    for i in range(n):
        noise = 0.05 * rng.normal() if i else 0.0  # node 0 is fixed: exact
        p = np.asarray([i * 1.0 + noise, 0, 0, 1, 0, 0, 0], np.float32)
        nid = gs.add_se3_node(p, fixed=(i == 0))
        if prev is not None:
            gs.add_se3_edge(prev, nid, [1, 0, 0, 1, 0, 0, 0], info)
        prev = nid
    chi2 = gs.optimize()
    assert chi2 < 1e-3
    np.testing.assert_allclose(gs.poses[:, 0], np.arange(n, dtype=np.float32),
                               atol=1e-3)


def test_auto_backend_resolution(rng):
    """solver_backend='auto': dense while the Hessian is small, chain past
    ~2k nodes — the unbounded-growth deployment choice."""
    from mrg_slam_tpu.graph.solve import resolve_backend

    assert resolve_backend("auto", 64) == "dense"
    assert resolve_backend("auto", 2048) == "dense"
    assert resolve_backend("auto", 2049) == "chain"
    assert resolve_backend("auto", 8192) == "chain"
    assert resolve_backend("dense", 8192) == "dense"  # explicit wins
    # end-to-end through the builder at small scale (resolves dense)
    gs = build_mixed_graph(rng, n=32, with_planes=False)
    gs.cfg = OptimizerConfig(solver_backend="auto",
                             g2o_solver_num_iterations=32)
    chi2 = gs.optimize()
    assert np.isfinite(chi2) and chi2 <= gs.chi2_initial


def test_live_growth_crosses_dense_wall():
    """An unbounded MrgSlam run under the DEFAULT "auto" solver backend
    must cross the dense->chain switchover transparently through
    optimization_tick as its store doubles — no OOM, no config
    intervention (g2o cholmod's any-size envelope, graph_slam.cpp:28-30).
    The switchover threshold is lowered so the wall sits at CPU scale;
    the resolution mechanism exercised is the deployed one."""
    import dataclasses

    from mrg_slam_tpu.config import (InformationMatrixConfig,
                                     OptimizerConfig, SlamConfig)
    from mrg_slam_tpu.graph import builder as gb
    from mrg_slam_tpu.models.backend import MrgSlam
    from mrg_slam_tpu.ops.cloud import PointCloud

    # wall at 128 nodes: capacity doubles 64 -> 128 (dense) -> 256 (chain)
    cfg = SlamConfig(
        own_name="grow", multi_robot_names=("grow",),
        keyframe_delta_trans=2.0,
        capacity_keyframes=64, capacity_edges=128,
        capacity_keyframe_points=64,
        optimizer=OptimizerConfig(auto_dense_max_dofs=6 * 128,
                                  g2o_solver_num_iterations=16),
        inf_matrix=InformationMatrixConfig(use_const_inf_matrix=True),
        robot_remove_points_radius=0.0)
    assert cfg.optimizer.solver_backend == "auto"  # the shipped default

    resolved = []
    orig = gb.solve.resolve_backend

    def spy(backend, n_nodes, n_planes=0, max_dofs=12288):
        out = orig(backend, n_nodes, n_planes, max_dofs)
        resolved.append((n_nodes, out))
        return out

    rng = np.random.default_rng(0)
    base = rng.uniform(-3, 3, size=(48, 3)).astype(np.float32)
    slam = MrgSlam(cfg)
    gb.solve.resolve_backend = spy
    try:
        for i in range(200):
            pose = np.asarray([2.5 * i, 0, 0, 1, 0, 0, 0], np.float32)
            pts = base + np.asarray([[2.5 * i, 0, 0]], np.float32)
            slam.process_scan(i * 0.1, pose,
                              PointCloud.from_array(pts, capacity=64))
            if (i + 1) % 32 == 0:
                slam.optimization_tick(now=i * 0.1)
        slam.optimization_tick(now=20.0)
    finally:
        gb.solve.resolve_backend = orig

    # the store crossed the wall and the auto resolution actually switched
    assert slam.db.graph.cap["nodes"] >= 256
    assert ("dense" in {b for _, b in resolved}
            and "chain" in {b for _, b in resolved}), resolved
    # the run stayed healthy across the switch
    assert np.isfinite(slam.db.graph.chi2_final)
    traj = slam.trajectory()
    assert traj.shape[0] >= 190
    np.testing.assert_allclose(traj[:, 0],
                               2.5 * np.arange(traj.shape[0]), atol=0.2)


def test_chain_marginals_match_dense(rng):
    """chain_marginals (T+UU^T selected inverse) must reproduce the dense
    H^-1 diagonal blocks on a 512-node ring with loops + priors — the
    exact-marginals-past-dense-capacity path (graph_slam.cpp:401-425)."""
    from mrg_slam_tpu.graph import solve
    from mrg_slam_tpu.graph.chain_solver import chain_marginals_jit, classify
    from mrg_slam_tpu.pipeline.baseline_runs import build_ring_graph
    from mrg_slam_tpu.utils import se3np

    n = 512
    gs = build_ring_graph(n_nodes=n, capacity_nodes=n, capacity_edges=2 * n,
                          backend="chain", seed=0)
    info = np.diag([100.0] * 3 + [400.0] * 3).astype(np.float32)
    for i in range(0, n - n // 2, 32):
        j = i + n // 2
        rel = se3np.pose_between(gs.poses[i], gs.poses[j])
        gs.add_se3_edge(i, j, rel, info * 0.25)
    for i in range(0, n, 64):
        gs.add_se3_prior_xyz_edge(i, gs.poses[i][:3], np.eye(3) * 25.0)
    gs.optimize()

    g = gs.snapshot()
    aux = classify(gs._se3.arrays["from_idx"], gs._se3.arrays["to_idx"],
                   gs._se3.mask(), gs._pl_edges.capacity,
                   gs._pl_pl.capacity, pl_mask=gs._pl_edges.mask(),
                   qq_mask=gs._pl_pl.mask())
    cov_chain = np.asarray(chain_marginals_jit(g, aux, solve._chain_K(n)))
    cov_dense = np.asarray(solve.marginals(g, exact=True))

    assert cov_chain.shape == (n, 6, 6)
    # node 0 is fixed: zero covariance on both paths
    assert np.abs(cov_chain[0]).max() == 0.0
    # free nodes: agree with the dense inverse (the chain path's 1e-6
    # relative ridge vs dense's 1e-9 absolute allows a small gap)
    scale = np.abs(cov_dense[1:]).max()
    np.testing.assert_allclose(cov_chain[1:], cov_dense[1:],
                               atol=0.02 * scale, rtol=0.05)
