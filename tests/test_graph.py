"""Pose-graph optimizer tests: loop correction, priors, planes, robust."""

import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

from mrg_slam_tpu.config import OptimizerConfig
from mrg_slam_tpu.graph.builder import GraphSLAM
from mrg_slam_tpu.utils import se3


def info66(t_std, r_std):
    return np.diag([1 / t_std**2] * 3 + [1 / r_std**2] * 3).astype(np.float32)


def make_noisy_loop(rng, n=12, backend="dense", drift=0.05):
    """Square loop with odometry drift + one loop-closure edge."""
    cfg = OptimizerConfig(solver_backend=backend, g2o_solver_num_iterations=64)
    gs = GraphSLAM(cfg, capacity_nodes=64, capacity_edges=128)
    # ground truth: walk around a circle
    gt = []
    for i in range(n):
        th = 2 * np.pi * i / n
        gt.append(np.asarray(se3.pose_exp(jnp.asarray(
            [10 * np.cos(th), 10 * np.sin(th), 0, 0, 0, th],
            dtype=jnp.float32))))
    gt = np.stack(gt)
    # noisy odometry chain
    est = [gt[0]]
    ids = [gs.add_se3_node(gt[0], fixed=True)]
    for i in range(1, n):
        rel = np.asarray(se3.pose_between(jnp.asarray(gt[i - 1]),
                                          jnp.asarray(gt[i])))
        noise = np.asarray(se3.pose_exp(jnp.asarray(
            rng.normal(scale=drift, size=6).astype(np.float32))))
        rel_noisy = np.asarray(se3.pose_compose(jnp.asarray(rel),
                                                jnp.asarray(noise)))
        est.append(np.asarray(se3.pose_compose(jnp.asarray(est[-1]),
                                               jnp.asarray(rel_noisy))))
        ids.append(gs.add_se3_node(est[-1]))
        gs.add_se3_edge(ids[i - 1], ids[i], rel_noisy, info66(0.1, 0.05))
    # loop closure: last node to first with true relative pose
    rel_loop = np.asarray(se3.pose_between(jnp.asarray(gt[-1]),
                                           jnp.asarray(gt[0])))
    gs.add_se3_edge(ids[-1], ids[0], rel_loop, info66(0.01, 0.01))
    return gs, gt, np.stack(est)


@pytest.mark.parametrize("backend", ["dense", "cg"])
def test_loop_closure_reduces_error(rng, backend):
    gs, gt, est0 = make_noisy_loop(rng, backend=backend)
    err_before = np.linalg.norm(gs.poses[:, :3] - gt[:, :3], axis=1).mean()
    chi2 = gs.optimize()
    err_after = np.linalg.norm(gs.poses[:, :3] - gt[:, :3], axis=1).mean()
    assert gs.chi2_initial > gs.chi2_final
    assert err_after < err_before * 0.5, (err_before, err_after)
    # the fixed first node must not move
    np.testing.assert_allclose(gs.poses[0], gt[0], atol=1e-5)


def test_xyz_prior_pins_node(rng):
    gs = GraphSLAM(OptimizerConfig(solver_backend="dense"),
                   capacity_nodes=16, capacity_edges=16)
    a = gs.add_se3_node(se3.pose_identity())
    b = gs.add_se3_node(np.array([1.2, 0, 0, 1, 0, 0, 0], np.float32))
    gs.add_se3_edge(a, b, np.array([1, 0, 0, 1, 0, 0, 0], np.float32),
                    info66(0.1, 0.1))
    gs.add_se3_prior_xyz_edge(a, [0, 0, 0], np.eye(3) * 1e4)
    gs.add_se3_prior_xyz_edge(b, [1, 0.5, 0], np.eye(3) * 1e4)
    gs.optimize()
    np.testing.assert_allclose(gs.poses[0, :3], [0, 0, 0], atol=1e-2)
    np.testing.assert_allclose(gs.poses[1, :3], [1, 0.5, 0], atol=1e-2)


def test_quat_prior(rng):
    gs = GraphSLAM(OptimizerConfig(solver_backend="dense"),
                   capacity_nodes=16, capacity_edges=16)
    a = gs.add_se3_node(se3.pose_identity())
    target_q = np.asarray(se3.rpy_to_quat(jnp.float32(0.0), jnp.float32(0.0),
                                          jnp.float32(0.3)))
    gs.add_se3_prior_quat_edge(a, target_q, np.eye(3) * 100)
    gs.optimize()
    got = gs.poses[0, 3:7]
    assert abs(abs(np.dot(got, target_q)) - 1) < 1e-3


def test_vec_prior_gravity(rng):
    """Gravity alignment: tilted node pulled upright."""
    gs = GraphSLAM(OptimizerConfig(solver_backend="dense"),
                   capacity_nodes=16, capacity_edges=16)
    tilted = np.asarray(se3.pose_exp(jnp.asarray([0, 0, 0, 0.2, 0.1, 0.0],
                                                 dtype=jnp.float32)))
    a = gs.add_se3_node(tilted)
    # measured acceleration in body frame says +z is straight up
    gs.add_se3_prior_vec_edge(a, [0, 0, 1], [0, 0, 1], np.eye(3) * 100)
    gs.optimize()
    R = np.asarray(se3.quat_to_mat(jnp.asarray(gs.poses[0, 3:7])))
    np.testing.assert_allclose(R.T @ np.array([0, 0, 1.0]), [0, 0, 1],
                               atol=1e-2)


def test_plane_edge_flattens(rng):
    """Nodes with z-offsets constrained to a common floor plane z=0."""
    gs = GraphSLAM(OptimizerConfig(solver_backend="dense"),
                   capacity_nodes=16, capacity_edges=16)
    plane = gs.add_plane_node([0, 0, 1, 0], fixed=True)
    ids = []
    for i in range(4):
        p = np.array([i * 1.0, 0, 0.3 * (i % 2), 1, 0, 0, 0], np.float32)
        ids.append(gs.add_se3_node(p, fixed=(i == 0)))
        if i:
            rel = np.array([1, 0, 0, 1, 0, 0, 0], np.float32)
            gs.add_se3_edge(ids[i - 1], ids[i], rel, info66(0.5, 0.5))
        # sensor sees the floor as z=0 locally
        gs.add_se3_plane_edge(ids[i], plane, [0, 0, 1, 0], np.eye(3) * 100)
    gs.optimize()
    np.testing.assert_allclose(gs.poses[:4, 2], 0.0, atol=5e-3)


def test_robust_kernel_rejects_outlier(rng):
    """A wildly wrong loop edge with Huber vs without."""
    def build(kernel):
        gs, gt, _ = make_noisy_loop(rng, n=10, drift=0.02)
        # bogus edge pulling node 5 two meters sideways
        bogus = np.array([2.0, 2.0, 0, 1, 0, 0, 0], np.float32)
        gs.add_se3_edge(0, 5, bogus, info66(0.05, 0.05), kernel=kernel,
                        kernel_delta=1.0)
        gs.optimize()
        return np.linalg.norm(gs.poses[:10, :3] - gt[:, :3], axis=1).mean()
    err_huber = build("Huber")
    err_none = build("NONE")
    assert err_huber < err_none


def test_marginals_shape_and_sanity(rng):
    gs, gt, _ = make_noisy_loop(rng, n=8)
    gs.optimize()
    cov = gs.compute_marginals(exact=True)
    assert cov.shape == (8, 6, 6)
    # fixed node has (near) zero covariance; free nodes positive diag
    assert np.abs(cov[0]).max() < 1e-4
    assert (np.diagonal(cov[1:], axis1=1, axis2=2) > 0).all()


def test_marginals_selected_matches_dense(rng):
    """Matrix-free selected-inverse marginals == exact dense blocks."""
    from mrg_slam_tpu.graph import solve

    gs, gt, _ = make_noisy_loop(rng, n=8)
    gs.optimize()
    g = gs.snapshot()
    cov_dense = np.asarray(solve.marginals(g, exact=True))
    sel = jnp.asarray([0, 3, 7], jnp.int32)
    cov_sel = np.asarray(solve.marginals_selected(g, sel))
    assert cov_sel.shape == (3, 6, 6)
    np.testing.assert_allclose(cov_sel, cov_dense[np.asarray(sel)],
                               rtol=0.05, atol=1e-4)
    # fixed node (0) zero; free nodes positive diagonal
    assert np.abs(cov_sel[0]).max() < 1e-6
    assert (np.diagonal(cov_sel[1:], axis1=1, axis2=2) > 0).all()


def test_chi2_zero_on_perfect_graph(rng):
    gs = GraphSLAM(OptimizerConfig(), capacity_nodes=16, capacity_edges=16)
    a = gs.add_se3_node(se3.pose_identity(), fixed=True)
    b = gs.add_se3_node(np.array([1, 0, 0, 1, 0, 0, 0], np.float32))
    gs.add_se3_edge(a, b, np.array([1, 0, 0, 1, 0, 0, 0], np.float32),
                    info66(0.1, 0.1))
    chi2 = gs.optimize()
    assert chi2 < 1e-8


def test_chordal_init_enters_lm_basin(rng):
    """Chordal relaxation (graph/chordal.py) must (1) cut a cold ring
    graph's chi2 by orders of magnitude before LM runs, (2) produce
    orthonormal rotations, (3) leave fixed nodes untouched, and (4) let LM
    reach the same optimum in far fewer iterations."""
    from mrg_slam_tpu.graph import solve
    from mrg_slam_tpu.graph.chordal import chordal_init
    from mrg_slam_tpu.pipeline.baseline_runs import build_ring_graph

    gs = build_ring_graph(n_nodes=256, backend="dense", noise_scale=0.05)
    g = gs.snapshot()
    chi2_raw = float(solve.chi2_only(g))
    poses = chordal_init(g)
    g2 = g._replace(poses=poses)
    chi2_chordal = float(solve.chi2_only(g2))
    assert chi2_chordal < chi2_raw / 50

    n = gs.num_nodes
    R = np.stack([np.asarray(se3.quat_to_mat(jnp.asarray(p[3:7])))
                  for p in np.asarray(poses)[:n]])
    ortho = np.einsum("nab,ncb->nac", R, R)
    np.testing.assert_allclose(ortho, np.broadcast_to(np.eye(3), ortho.shape),
                               atol=1e-4)
    # node 0 is fixed -> exactly preserved
    np.testing.assert_array_equal(np.asarray(poses)[0],
                                  np.asarray(g.poses)[0])

    cfg = OptimizerConfig(solver_backend="dense",
                          g2o_solver_num_iterations=64)
    r_raw = solve.optimize(g, cfg)
    r_ch = solve.optimize(g2, cfg)
    assert abs(float(r_ch.chi2_final) - float(r_raw.chi2_final)) < 0.5
    assert int(r_ch.iterations) < int(r_raw.iterations)

    # config-level wiring: optimize(chordal_init=True) converges too
    gs2 = build_ring_graph(n_nodes=64, backend="dense", noise_scale=0.05)
    gs2.cfg = dataclasses.replace(gs2.cfg, chordal_init=True)
    chi2 = gs2.optimize()
    assert chi2 < 10.0


@pytest.mark.parametrize("backend", ["dense", "cg"])
def test_zero_capacity_aux_families_elided(rng, backend):
    """A pose-only graph with ZERO-capacity prior/plane tables (the static
    elision path, graph/solve.py `_has`) must optimize to exactly where a
    graph with padded-but-empty aux tables lands — and growing a family
    from zero afterwards must work."""
    cfg = OptimizerConfig(solver_backend=backend,
                          g2o_solver_num_iterations=64)
    lean = GraphSLAM(cfg, capacity_nodes=32, capacity_edges=64,
                     capacity_planes=0, capacity_priors=0,
                     capacity_plane_edges=0, capacity_plane_priors=0,
                     capacity_plane_plane=0)
    padded = GraphSLAM(cfg, capacity_nodes=32, capacity_edges=64,
                       capacity_planes=4, capacity_priors=16,
                       capacity_plane_edges=16, capacity_plane_priors=4,
                       capacity_plane_plane=4)
    for gs in (lean, padded):
        r = np.random.default_rng(11)
        ids = [gs.add_se3_node([0, 0, 0, 1, 0, 0, 0], fixed=True)]
        for i in range(1, 12):
            t = r.normal(scale=0.05, size=3)
            pose = np.asarray([i + t[0], t[1], t[2], 1, 0, 0, 0], np.float32)
            pose[3:] /= np.linalg.norm(pose[3:])
            ids.append(gs.add_se3_node(pose))
            gs.add_se3_edge(ids[i - 1], ids[i], [1, 0, 0, 1, 0, 0, 0],
                            info66(0.1, 0.05))
        gs.add_se3_edge(ids[-1], ids[0], [-11, 0, 0, 1, 0, 0, 0],
                        info66(0.01, 0.01))
        gs.optimize()
    np.testing.assert_allclose(lean.poses, padded.poses, atol=1e-5)
    assert abs(lean.chi2_final - padded.chi2_final) < 1e-3
    # marginals ride the elided program too
    cov = lean.compute_marginals(exact=True)
    assert cov.shape == (12, 6, 6) and (np.diagonal(
        cov[1:], axis1=1, axis2=2) > 0).all()
    # growth from zero: a prior and a plane arriving later must still work
    lean.add_se3_prior_xyz_edge(ids[3], [3, 0, 0], np.eye(3) * 25.0)
    p = lean.add_plane_node([0, 0, 1, 0], fixed=True)
    lean.add_se3_plane_edge(ids[1], p, [0, 0, 1, 0], np.eye(3) * 10.0)
    chi2 = lean.optimize()
    assert np.isfinite(chi2) and lean.chi2_initial >= chi2


def test_capacity_growth_matches_preallocated(rng):
    """Stores double on overflow: a graph built with tiny initial
    capacities must land exactly where a comfortably preallocated one
    lands (same nodes/edges, same solve numerics), instead of dying on
    the old capacity ValueError."""
    rng2 = np.random.default_rng(7)
    small = GraphSLAM(OptimizerConfig(solver_backend="dense",
                                      g2o_solver_num_iterations=64),
                      capacity_nodes=4, capacity_edges=4,
                      capacity_planes=1, capacity_priors=1)
    big = GraphSLAM(OptimizerConfig(solver_backend="dense",
                                    g2o_solver_num_iterations=64),
                    capacity_nodes=64, capacity_edges=128,
                    capacity_planes=4, capacity_priors=8)
    n = 24
    for gs in (small, big):
        r = np.random.default_rng(7)
        ids = [gs.add_se3_node([0, 0, 0, 1, 0, 0, 0], fixed=True)]
        for i in range(1, n):
            t = r.normal(scale=0.05, size=3)
            pose = np.asarray([i + t[0], t[1], t[2], 1, 0, 0, 0], np.float32)
            pose[3:] /= np.linalg.norm(pose[3:])
            ids.append(gs.add_se3_node(pose))
            gs.add_se3_edge(ids[i - 1], ids[i],
                            [1, 0, 0, 1, 0, 0, 0], info66(0.1, 0.05))
        gs.add_se3_edge(ids[-1], ids[0],
                        [-(n - 1), 0, 0, 1, 0, 0, 0], info66(0.01, 0.01))
        gs.add_se3_prior_xyz_edge(ids[2], [2, 0, 0], np.eye(3) * 25.0)
        p = gs.add_plane_node([0, 0, 1, 0], fixed=True)
        gs.add_plane_node([0, 0, 1, 0.1])
        gs.add_se3_plane_edge(ids[1], p, [0, 0, 1, 0], np.eye(3) * 10.0)
        gs.optimize()
    assert small.cap["nodes"] >= n and small.num_nodes == n
    assert small.num_edges == big.num_edges == n
    assert small._n_planes == 2
    np.testing.assert_allclose(small.poses, big.poses, atol=1e-5)
    assert abs(small.chi2_final - big.chi2_final) < 1e-3
