"""Plane-prior and plane-plane edge families (registered g2o type parity)."""

import numpy as np
import pytest

from mrg_slam_tpu.config import OptimizerConfig
from mrg_slam_tpu.graph.builder import GraphSLAM


@pytest.mark.parametrize("backend", ["dense", "cg"])
def test_plane_prior_normal_and_distance(backend):
    gs = GraphSLAM(OptimizerConfig(solver_backend=backend),
                   capacity_nodes=8, capacity_edges=8)
    # start tilted and offset; priors pull to n=(0,0,1), d=-2
    p = gs.add_plane_node([0.3, 0.0, 0.95, 0.0])
    gs.add_plane_prior_normal_edge(p, [0, 0, 1], np.eye(3) * 100)
    gs.add_plane_prior_distance_edge(p, -2.0, 100.0)
    gs.optimize()
    got = gs.planes[p]
    np.testing.assert_allclose(got[:3], [0, 0, 1], atol=1e-2)
    np.testing.assert_allclose(got[3], -2.0, atol=1e-2)


def test_plane_identity_edge():
    gs = GraphSLAM(OptimizerConfig(solver_backend="dense"),
                   capacity_nodes=8, capacity_edges=8)
    a = gs.add_plane_node([0, 0, 1, 0], fixed=True)
    b = gs.add_plane_node([0.2, 0, 0.98, 0.5])
    gs.add_plane_identity_edge(a, b, [0, 0, 0, 0], np.eye(4) * 100)
    gs.optimize()
    np.testing.assert_allclose(gs.planes[b], gs.planes[a], atol=1e-2)


def test_plane_parallel_edge():
    gs = GraphSLAM(OptimizerConfig(solver_backend="dense"),
                   capacity_nodes=8, capacity_edges=8)
    a = gs.add_plane_node([0, 0, 1, 0], fixed=True)
    b = gs.add_plane_node([0.3, 0.1, 0.95, 1.0])
    gs.add_plane_parallel_edge(a, b, [0, 0, 0], np.eye(3) * 100)
    gs.optimize()
    # normals align; distance untouched
    np.testing.assert_allclose(gs.planes[b][:3], [0, 0, 1], atol=1e-2)
    np.testing.assert_allclose(gs.planes[b][3], 1.0, atol=5e-3)


def test_plane_perpendicular_edge():
    gs = GraphSLAM(OptimizerConfig(solver_backend="dense"),
                   capacity_nodes=8, capacity_edges=8)
    a = gs.add_plane_node([0, 0, 1, 0], fixed=True)
    # nearly parallel plane forced perpendicular
    b = gs.add_plane_node([0.7, 0.0, 0.714, 0.0])
    gs.add_plane_perpendicular_edge(a, b, meas_dot=0.0, info1=100.0)
    gs.optimize()
    dot = float(np.dot(gs.planes[a][:3], gs.planes[b][:3]))
    assert abs(dot) < 0.05, dot
