"""Host-side graph construction: the `GraphSLAM` API surface.

Mirrors include/mrg_slam/graph_slam.hpp:34-174 (add_se3_node, add_*_edge,
add_robust_kernel, optimize, compute_marginals, save/load) as an
incremental builder over numpy staging buffers that snapshots into the
device-side `PoseGraphData` pytree for each solve. Node/edge ids are dense
ints; uuid bookkeeping lives a level up in models/graph_database.py.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..config import OptimizerConfig
from . import solve
from .types import (KERNEL_IDS, PLANE_PLANE_IDENTITY, PLANE_PLANE_PARALLEL,
                    PLANE_PLANE_PERPENDICULAR, PLANE_PRIOR_DISTANCE,
                    PLANE_PRIOR_NORMAL, PRIOR_QUAT, PRIOR_VEC, PRIOR_XYZ,
                    PlaneEdges, PlanePlaneEdges, PlanePriorEdges,
                    PoseGraphData, PriorEdges, SE3Edges)


class GraphSLAM:
    """Incremental pose-graph builder + optimizer frontend."""

    def __init__(self, cfg: Optional[OptimizerConfig] = None,
                 capacity_nodes: int = 2048, capacity_edges: int = 8192,
                 capacity_planes: int = 8, capacity_priors: int = 1024,
                 capacity_plane_edges: int = 2048):
        self.cfg = cfg or OptimizerConfig()
        self.cap = dict(nodes=capacity_nodes, edges=capacity_edges,
                        planes=capacity_planes, priors=capacity_priors,
                        plane_edges=capacity_plane_edges)
        self.poses = np.zeros((0, 7), np.float32)
        self.fixed: list[bool] = []
        self.planes = np.zeros((0, 4), np.float32)
        self.plane_fixed: list[bool] = []
        self._se3 = []        # (from, to, meas7, info66, kernel, delta)
        self._priors = []     # (node, ptype, meas8, info33, kernel, delta)
        self._pl_edges = []   # (node, plane, meas4, info33, kernel, delta)
        self._pl_priors = []  # (plane, ptype, meas4, info44, kernel, delta)
        self._pl_pl = []      # (from, to, ptype, meas4, info44, kernel, delta)
        self.chi2_initial = 0.0
        self.chi2_final = 0.0
        self.last_iterations = 0

    # -- nodes ----------------------------------------------------------
    def add_se3_node(self, pose, fixed: bool = False) -> int:
        pose = np.asarray(pose, np.float32).reshape(7)
        self.poses = np.concatenate([self.poses, pose[None]], 0)
        self.fixed.append(fixed)
        return self.poses.shape[0] - 1

    def add_plane_node(self, coeffs, fixed: bool = False) -> int:
        c = np.asarray(coeffs, np.float32).reshape(4)
        n = np.linalg.norm(c[:3])
        c = c / max(n, 1e-12)
        self.planes = np.concatenate([self.planes, c[None]], 0)
        self.plane_fixed.append(fixed)
        return self.planes.shape[0] - 1

    def set_fixed(self, node_id: int, fixed: bool = True) -> None:
        self.fixed[node_id] = fixed

    # -- edges ----------------------------------------------------------
    def add_se3_edge(self, from_id: int, to_id: int, meas_pose, info,
                     kernel: str = "NONE", kernel_delta: float = 1.0) -> int:
        self._se3.append((from_id, to_id,
                          np.asarray(meas_pose, np.float32).reshape(7),
                          np.asarray(info, np.float32).reshape(6, 6),
                          KERNEL_IDS[kernel], float(kernel_delta)))
        return len(self._se3) - 1

    def _add_prior(self, node_id, ptype, meas8, info33, kernel, delta):
        self._priors.append((node_id, ptype, meas8, info33,
                             KERNEL_IDS[kernel], float(delta)))
        return len(self._priors) - 1

    def add_se3_prior_xyz_edge(self, node_id: int, xyz, info3,
                               kernel: str = "NONE", kernel_delta: float = 1.0):
        meas = np.zeros(8, np.float32)
        meas[:3] = np.asarray(xyz, np.float32)
        return self._add_prior(node_id, PRIOR_XYZ, meas,
                               np.asarray(info3, np.float32).reshape(3, 3),
                               kernel, kernel_delta)

    def add_se3_prior_xy_edge(self, node_id: int, xy, info2,
                              kernel: str = "NONE", kernel_delta: float = 1.0):
        """XY prior == XYZ prior with zero information on z
        (include/g2o/edge_se3_priorxy.hpp)."""
        meas = np.zeros(8, np.float32)
        meas[:2] = np.asarray(xy, np.float32)
        info = np.zeros((3, 3), np.float32)
        info[:2, :2] = np.asarray(info2, np.float32).reshape(2, 2)
        return self._add_prior(node_id, PRIOR_XYZ, meas, info, kernel,
                               kernel_delta)

    def add_se3_prior_quat_edge(self, node_id: int, quat_wxyz, info3,
                                kernel: str = "NONE",
                                kernel_delta: float = 1.0):
        meas = np.zeros(8, np.float32)
        meas[:4] = np.asarray(quat_wxyz, np.float32)
        return self._add_prior(node_id, PRIOR_QUAT, meas,
                               np.asarray(info3, np.float32).reshape(3, 3),
                               kernel, kernel_delta)

    def add_se3_prior_vec_edge(self, node_id: int, dir_world, measured,
                               info3, kernel: str = "NONE",
                               kernel_delta: float = 1.0):
        meas = np.zeros(8, np.float32)
        meas[:3] = np.asarray(dir_world, np.float32)
        meas[3:6] = np.asarray(measured, np.float32)
        return self._add_prior(node_id, PRIOR_VEC, meas,
                               np.asarray(info3, np.float32).reshape(3, 3),
                               kernel, kernel_delta)

    def add_se3_plane_edge(self, node_id: int, plane_id: int, plane_local,
                           info3, kernel: str = "NONE",
                           kernel_delta: float = 1.0) -> int:
        c = np.asarray(plane_local, np.float32).reshape(4)
        c = c / max(np.linalg.norm(c[:3]), 1e-12)
        self._pl_edges.append((node_id, plane_id, c,
                               np.asarray(info3, np.float32).reshape(3, 3),
                               KERNEL_IDS[kernel], float(kernel_delta)))
        return len(self._pl_edges) - 1

    # -- plane priors / plane-plane edges -------------------------------
    def add_plane_prior_normal_edge(self, plane_id: int, normal, info3,
                                    kernel: str = "NONE",
                                    kernel_delta: float = 1.0) -> int:
        meas = np.zeros(4, np.float32)
        meas[:3] = np.asarray(normal, np.float32)
        info = np.zeros((4, 4), np.float32)
        info[:3, :3] = np.asarray(info3, np.float32).reshape(3, 3)
        self._pl_priors.append((plane_id, PLANE_PRIOR_NORMAL, meas, info,
                                KERNEL_IDS[kernel], float(kernel_delta)))
        return len(self._pl_priors) - 1

    def add_plane_prior_distance_edge(self, plane_id: int, distance: float,
                                      info1: float, kernel: str = "NONE",
                                      kernel_delta: float = 1.0) -> int:
        meas = np.zeros(4, np.float32)
        meas[0] = distance
        info = np.zeros((4, 4), np.float32)
        info[0, 0] = float(info1)
        self._pl_priors.append((plane_id, PLANE_PRIOR_DISTANCE, meas, info,
                                KERNEL_IDS[kernel], float(kernel_delta)))
        return len(self._pl_priors) - 1

    def _add_plane_plane(self, a, b, ptype, meas4, info44, kernel, delta):
        self._pl_pl.append((a, b, ptype, meas4, info44, KERNEL_IDS[kernel],
                            float(delta)))
        return len(self._pl_pl) - 1

    def add_plane_identity_edge(self, a: int, b: int, meas4, info4,
                                kernel: str = "NONE",
                                kernel_delta: float = 1.0) -> int:
        return self._add_plane_plane(
            a, b, PLANE_PLANE_IDENTITY, np.asarray(meas4, np.float32),
            np.asarray(info4, np.float32).reshape(4, 4), kernel, kernel_delta)

    def add_plane_parallel_edge(self, a: int, b: int, meas3, info3,
                                kernel: str = "NONE",
                                kernel_delta: float = 1.0) -> int:
        meas = np.zeros(4, np.float32)
        meas[:3] = np.asarray(meas3, np.float32)
        info = np.zeros((4, 4), np.float32)
        info[:3, :3] = np.asarray(info3, np.float32).reshape(3, 3)
        return self._add_plane_plane(a, b, PLANE_PLANE_PARALLEL, meas, info,
                                     kernel, kernel_delta)

    def add_plane_perpendicular_edge(self, a: int, b: int,
                                     meas_dot: float = 0.0,
                                     info1: float = 1.0,
                                     kernel: str = "NONE",
                                     kernel_delta: float = 1.0) -> int:
        meas = np.zeros(4, np.float32)
        meas[0] = meas_dot
        info = np.zeros((4, 4), np.float32)
        info[0, 0] = float(info1)
        return self._add_plane_plane(a, b, PLANE_PLANE_PERPENDICULAR, meas,
                                     info, kernel, kernel_delta)

    # -- solve ----------------------------------------------------------
    @property
    def num_nodes(self) -> int:
        return self.poses.shape[0]

    @property
    def num_edges(self) -> int:
        return len(self._se3)

    def snapshot(self) -> PoseGraphData:
        """Pack staging buffers into the padded device pytree."""
        cap = self.cap
        n, p = self.num_nodes, self.planes.shape[0]
        if n > cap["nodes"] or len(self._se3) > cap["edges"]:
            raise ValueError("graph capacity exceeded; raise capacities")
        g = PoseGraphData.empty(cap["nodes"], cap["edges"], cap["planes"],
                                cap["priors"], cap["plane_edges"])

        def fill(dst, rows, dtype=np.float32):
            arr = np.asarray(dst)
            out = np.array(arr)
            if rows:
                stacked = np.stack([np.asarray(r, dtype) for r in rows])
                out[: len(rows)] = stacked
            return jnp.asarray(out)

        poses = np.array(np.asarray(g.poses))
        poses[:n] = self.poses
        node_mask = np.zeros(cap["nodes"], bool)
        node_mask[:n] = True
        node_fixed = np.zeros(cap["nodes"], bool)
        node_fixed[:n] = np.asarray(self.fixed, bool)
        planes = np.array(np.asarray(g.planes))
        planes[:p] = self.planes
        plane_mask = np.zeros(cap["planes"], bool)
        plane_mask[:p] = True
        plane_fixed = np.zeros(cap["planes"], bool)
        plane_fixed[:p] = np.asarray(self.plane_fixed, bool)

        def table(rows, empty, fields):
            out = {}
            ne = len(rows)
            for i, (name, shape, dtype) in enumerate(fields):
                buf = np.array(np.asarray(getattr(empty, name)))
                if ne:
                    buf[:ne] = np.stack(
                        [np.asarray(r[i], dtype).reshape(shape) for r in rows])
                out[name] = jnp.asarray(buf)
            m = np.zeros(buf.shape[0], bool)
            m[:ne] = True
            out["mask"] = jnp.asarray(m)
            return out

        se3_t = table(self._se3, g.se3, [
            ("from_idx", (), np.int32), ("to_idx", (), np.int32),
            ("meas", (7,), np.float32), ("info", (6, 6), np.float32),
            ("kernel", (), np.int32), ("delta", (), np.float32)])
        pr_t = table(self._priors, g.priors, [
            ("node_idx", (), np.int32), ("ptype", (), np.int32),
            ("meas", (8,), np.float32), ("info", (3, 3), np.float32),
            ("kernel", (), np.int32), ("delta", (), np.float32)])
        pl_t = table(self._pl_edges, g.plane_edges, [
            ("node_idx", (), np.int32), ("plane_idx", (), np.int32),
            ("meas", (4,), np.float32), ("info", (3, 3), np.float32),
            ("kernel", (), np.int32), ("delta", (), np.float32)])
        pp_t = table(self._pl_priors, g.plane_priors, [
            ("plane_idx", (), np.int32), ("ptype", (), np.int32),
            ("meas", (4,), np.float32), ("info", (4, 4), np.float32),
            ("kernel", (), np.int32), ("delta", (), np.float32)])
        qq_t = table(self._pl_pl, g.plane_plane, [
            ("from_idx", (), np.int32), ("to_idx", (), np.int32),
            ("ptype", (), np.int32),
            ("meas", (4,), np.float32), ("info", (4, 4), np.float32),
            ("kernel", (), np.int32), ("delta", (), np.float32)])

        return PoseGraphData(
            poses=jnp.asarray(poses), node_mask=jnp.asarray(node_mask),
            node_fixed=jnp.asarray(node_fixed), planes=jnp.asarray(planes),
            plane_mask=jnp.asarray(plane_mask),
            plane_fixed=jnp.asarray(plane_fixed),
            se3=SE3Edges(**se3_t), priors=PriorEdges(**pr_t),
            plane_edges=PlaneEdges(**pl_t),
            plane_priors=PlanePriorEdges(**pp_t),
            plane_plane=PlanePlaneEdges(**qq_t))

    def optimize(self, num_iterations: Optional[int] = None) -> float:
        """Run LM; writes optimized estimates back into the staging buffers.

        Returns final chi2 (graph_slam.cpp:353-395 semantics: chi2 before
        and after are retained on the object)."""
        cfg = self.cfg
        if num_iterations is not None:
            import dataclasses
            cfg = dataclasses.replace(cfg,
                                      g2o_solver_num_iterations=num_iterations)
        g = self.snapshot()
        res = solve.optimize(g, cfg)
        n, p = self.num_nodes, self.planes.shape[0]
        self.poses = np.asarray(res.poses)[:n]
        if p:
            self.planes = np.asarray(res.planes)[:p]
        self.chi2_initial = float(res.chi2_initial)
        self.chi2_final = float(res.chi2_final)
        self.last_iterations = int(res.iterations)
        return self.chi2_final

    def compute_marginals(self, exact: bool = True) -> np.ndarray:
        """(num_nodes, 6, 6) covariance blocks (graph_slam.cpp:401-425)."""
        g = self.snapshot()
        cov = solve.marginals(g, exact=exact)
        return np.asarray(cov)[: self.num_nodes]
