"""Pose-graph data layout: fixed-capacity typed edge tables.

The g2o SparseOptimizer of the reference (src/mrg_slam/graph_slam.cpp)
becomes a pytree of padded arrays. Node state lives in two pools — SE(3)
poses (6 dof) and planes (3 dof) — and each edge family used by the live
pipeline gets its own table:

- SE3-SE3 edges: odometry / loop / anchor (g2o EdgeSE3)
- unary SE3 priors: XYZ (covers XY via zero z-information), Quat, Vec
  (include/g2o/edge_se3_priorxyz.hpp etc.)
- SE3-Plane edges: floor constraints (include/g2o/edge_se3_plane.hpp)

All tables are masked; capacities are static. Indices are int32 into the
node pools.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..utils import se3

# prior edge types
PRIOR_XYZ = 0
PRIOR_QUAT = 1
PRIOR_VEC = 2

# plane-prior edge types (include/g2o/edge_plane_prior.hpp)
PLANE_PRIOR_NORMAL = 0
PLANE_PRIOR_DISTANCE = 1

# plane-plane edge types (include/g2o/edge_plane_identity.hpp, _parallel.hpp)
PLANE_PLANE_IDENTITY = 0
PLANE_PLANE_PARALLEL = 1
PLANE_PLANE_PERPENDICULAR = 2

# robust kernel ids (graph/robust.py implements the rho' weights)
KERNEL_NONE = 0
KERNEL_HUBER = 1
KERNEL_CAUCHY = 2
KERNEL_DCS = 3
KERNEL_FAIR = 4
KERNEL_GEMAN_MCCLURE = 5
KERNEL_PSEUDO_HUBER = 6
KERNEL_SATURATED = 7
KERNEL_TUKEY = 8
KERNEL_WELSCH = 9

KERNEL_IDS = {
    "NONE": KERNEL_NONE,
    "Huber": KERNEL_HUBER,
    "Cauchy": KERNEL_CAUCHY,
    "DCS": KERNEL_DCS,
    "Fair": KERNEL_FAIR,
    "GemanMcClure": KERNEL_GEMAN_MCCLURE,
    "PseudoHuber": KERNEL_PSEUDO_HUBER,
    "Saturated": KERNEL_SATURATED,
    "Tukey": KERNEL_TUKEY,
    "Welsch": KERNEL_WELSCH,
}


class SE3Edges(NamedTuple):
    from_idx: jnp.ndarray  # (E,) i32
    to_idx: jnp.ndarray    # (E,) i32
    meas: jnp.ndarray      # (E,7) measured relative pose T_from^-1 T_to
    info: jnp.ndarray      # (E,6,6) information (rho-first twist order)
    kernel: jnp.ndarray    # (E,) i32
    delta: jnp.ndarray     # (E,) robust kernel width
    mask: jnp.ndarray      # (E,) bool

    @staticmethod
    def empty(capacity: int) -> "SE3Edges":
        return SE3Edges(
            from_idx=jnp.zeros(capacity, jnp.int32),
            to_idx=jnp.zeros(capacity, jnp.int32),
            meas=jnp.tile(se3.pose_identity(), (capacity, 1)),
            info=jnp.zeros((capacity, 6, 6), jnp.float32),
            kernel=jnp.zeros(capacity, jnp.int32),
            delta=jnp.ones(capacity, jnp.float32),
            mask=jnp.zeros(capacity, bool),
        )


class PriorEdges(NamedTuple):
    node_idx: jnp.ndarray  # (E,) i32
    ptype: jnp.ndarray     # (E,) i32 in {PRIOR_XYZ, PRIOR_QUAT, PRIOR_VEC}
    meas: jnp.ndarray      # (E,8): XYZ->[xyz,...]; QUAT->[wxyz,...];
    #                         VEC->[dir_world(3), measured(3), ...]
    info: jnp.ndarray      # (E,3,3)
    kernel: jnp.ndarray
    delta: jnp.ndarray
    mask: jnp.ndarray

    @staticmethod
    def empty(capacity: int) -> "PriorEdges":
        return PriorEdges(
            node_idx=jnp.zeros(capacity, jnp.int32),
            ptype=jnp.zeros(capacity, jnp.int32),
            meas=jnp.zeros((capacity, 8), jnp.float32),
            info=jnp.zeros((capacity, 3, 3), jnp.float32),
            kernel=jnp.zeros(capacity, jnp.int32),
            delta=jnp.ones(capacity, jnp.float32),
            mask=jnp.zeros(capacity, bool),
        )


class PlaneEdges(NamedTuple):
    """SE3 node <-> plane node: measured plane in the SE3 node's frame."""

    node_idx: jnp.ndarray   # (E,) i32 SE3 node
    plane_idx: jnp.ndarray  # (E,) i32 plane node
    meas: jnp.ndarray       # (E,4) local plane (nx,ny,nz,d), n.x + d = 0
    info: jnp.ndarray       # (E,3,3)
    kernel: jnp.ndarray
    delta: jnp.ndarray
    mask: jnp.ndarray

    @staticmethod
    def empty(capacity: int) -> "PlaneEdges":
        return PlaneEdges(
            node_idx=jnp.zeros(capacity, jnp.int32),
            plane_idx=jnp.zeros(capacity, jnp.int32),
            meas=jnp.tile(jnp.asarray([0., 0., 1., 0.], jnp.float32),
                          (capacity, 1)),
            info=jnp.zeros((capacity, 3, 3), jnp.float32),
            kernel=jnp.zeros(capacity, jnp.int32),
            delta=jnp.ones(capacity, jnp.float32),
            mask=jnp.zeros(capacity, bool),
        )


class PlanePriorEdges(NamedTuple):
    """Unary priors on plane nodes: normal direction or distance
    (EdgePlanePriorNormal / EdgePlanePriorDistance). 4-dim padded residual:
    NORMAL uses dims 0-2, DISTANCE uses dim 0; the information matrix
    carries the selection."""

    plane_idx: jnp.ndarray  # (E,) i32
    ptype: jnp.ndarray      # (E,) i32
    meas: jnp.ndarray       # (E,4): NORMAL->[nx,ny,nz,_]; DISTANCE->[d,...]
    info: jnp.ndarray       # (E,4,4)
    kernel: jnp.ndarray
    delta: jnp.ndarray
    mask: jnp.ndarray

    @staticmethod
    def empty(capacity: int) -> "PlanePriorEdges":
        return PlanePriorEdges(
            plane_idx=jnp.zeros(capacity, jnp.int32),
            ptype=jnp.zeros(capacity, jnp.int32),
            meas=jnp.zeros((capacity, 4), jnp.float32),
            info=jnp.zeros((capacity, 4, 4), jnp.float32),
            kernel=jnp.zeros(capacity, jnp.int32),
            delta=jnp.ones(capacity, jnp.float32),
            mask=jnp.zeros(capacity, bool),
        )


class PlanePlaneEdges(NamedTuple):
    """Binary plane-plane constraints (EdgePlaneIdentity / Parallel /
    Perpendicular). 4-dim padded residual: IDENTITY uses all 4, PARALLEL
    dims 0-2 (normal difference), PERPENDICULAR dim 0 (normal dot)."""

    from_idx: jnp.ndarray  # (E,) i32 plane node
    to_idx: jnp.ndarray    # (E,) i32 plane node
    ptype: jnp.ndarray     # (E,) i32
    meas: jnp.ndarray      # (E,4)
    info: jnp.ndarray      # (E,4,4)
    kernel: jnp.ndarray
    delta: jnp.ndarray
    mask: jnp.ndarray

    @staticmethod
    def empty(capacity: int) -> "PlanePlaneEdges":
        return PlanePlaneEdges(
            from_idx=jnp.zeros(capacity, jnp.int32),
            to_idx=jnp.zeros(capacity, jnp.int32),
            ptype=jnp.zeros(capacity, jnp.int32),
            meas=jnp.zeros((capacity, 4), jnp.float32),
            info=jnp.zeros((capacity, 4, 4), jnp.float32),
            kernel=jnp.zeros(capacity, jnp.int32),
            delta=jnp.ones(capacity, jnp.float32),
            mask=jnp.zeros(capacity, bool),
        )


class PoseGraphData(NamedTuple):
    """The full graph state crossing the jit boundary."""

    poses: jnp.ndarray       # (N,7)
    node_mask: jnp.ndarray   # (N,) bool
    node_fixed: jnp.ndarray  # (N,) bool
    planes: jnp.ndarray      # (P,4)
    plane_mask: jnp.ndarray  # (P,) bool
    plane_fixed: jnp.ndarray  # (P,) bool
    se3: SE3Edges
    priors: PriorEdges
    plane_edges: PlaneEdges
    plane_priors: PlanePriorEdges
    plane_plane: PlanePlaneEdges

    @staticmethod
    def empty(n_nodes: int, n_edges: int, n_planes: int = 4,
              n_priors: int = 256, n_plane_edges: int = 512,
              n_plane_priors: int = 8, n_plane_plane: int = 8
              ) -> "PoseGraphData":
        return PoseGraphData(
            poses=jnp.tile(se3.pose_identity(), (n_nodes, 1)),
            node_mask=jnp.zeros(n_nodes, bool),
            node_fixed=jnp.zeros(n_nodes, bool),
            planes=jnp.tile(jnp.asarray([0., 0., 1., 0.], jnp.float32),
                            (n_planes, 1)),
            plane_mask=jnp.zeros(n_planes, bool),
            plane_fixed=jnp.zeros(n_planes, bool),
            se3=SE3Edges.empty(n_edges),
            priors=PriorEdges.empty(n_priors),
            plane_edges=PlaneEdges.empty(n_plane_edges),
            plane_priors=PlanePriorEdges.empty(n_plane_priors),
            plane_plane=PlanePlaneEdges.empty(n_plane_plane),
        )

    @property
    def n_nodes(self) -> int:
        return self.poses.shape[0]

    @property
    def n_planes(self) -> int:
        return self.planes.shape[0]


def plane_basis(n: jnp.ndarray) -> jnp.ndarray:
    """(…,3) unit normal -> (…,3,2) orthonormal tangent basis (smooth a.e.)."""
    # pick the axis least aligned with n to build the first tangent
    ref = jnp.where(jnp.abs(n[..., 0:1]) < 0.9,
                    jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0], n.dtype),
                                     n.shape),
                    jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0], n.dtype),
                                     n.shape))
    b1 = jnp.cross(n, ref)
    b1 = b1 / jnp.maximum(jnp.linalg.norm(b1, axis=-1, keepdims=True), 1e-12)
    b2 = jnp.cross(n, b1)
    return jnp.stack([b1, b2], axis=-1)


def plane_retract(pi: jnp.ndarray, delta: jnp.ndarray) -> jnp.ndarray:
    """Minimal 3-dof plane update: rotate normal in its tangent plane, shift d."""
    n = pi[..., 0:3]
    B = plane_basis(n)
    n_new = n + jnp.einsum("...ij,...j->...i", B, delta[..., 0:2])
    n_new = n_new / jnp.maximum(
        jnp.linalg.norm(n_new, axis=-1, keepdims=True), 1e-12)
    return jnp.concatenate([n_new, pi[..., 3:4] + delta[..., 2:3]], axis=-1)
