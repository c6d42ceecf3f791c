"""Edge residuals and Jacobians (autodiff on manifold charts, vmapped).

Each edge family linearizes around the current estimate with right-
multiplicative local charts: SE(3) nodes use pose_retract (T * exp(xi)),
plane nodes use plane_retract (tangent-basis normal + distance). Jacobians
come from `jax.jacfwd` of the residual through the chart — exact at the
linearization point, batch-evaluated with `vmap`, no hand-derived formulas
to get wrong.

Residual conventions mirror the g2o types the reference registers
(graph_slam.cpp:33-42):
- EdgeSE3:          log(meas^-1 T_i^-1 T_j)
- EdgeSE3PriorXYZ:  t - meas            (XY variant: zero z information)
- EdgeSE3PriorQuat: sign-aligned q.vec - meas.vec
- EdgeSE3PriorVec:  R^T dir_world - measured_local
- EdgeSE3Plane:     [B(n_m)^T n_local, d_local - d_m] (3-dof tangent
  residual; g2o's Plane3D::ominus azimuth/elevation form differs by a
  smooth reparameterization near alignment)
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..utils import se3
from .types import (PLANE_PLANE_IDENTITY, PLANE_PLANE_PARALLEL,
                    PLANE_PLANE_PERPENDICULAR,
                    PLANE_PRIOR_NORMAL, PRIOR_QUAT, PRIOR_VEC, PRIOR_XYZ,
                    PlaneEdges, PlanePlaneEdges, PlanePriorEdges,
                    PriorEdges, SE3Edges, plane_basis, plane_retract)


# ---------------------------------------------------------------------------
# SE3 - SE3
# ---------------------------------------------------------------------------

def _se3_one(pose_i, pose_j, meas):
    def f(xi):
        return se3.pose_error(
            meas,
            se3.pose_retract(pose_i, xi[:6]),
            se3.pose_retract(pose_j, xi[6:]),
        )
    z = jnp.zeros(12, pose_i.dtype)
    r = f(z)
    J = jax.jacfwd(f)(z)  # (6, 12)
    return r, J[:, :6], J[:, 6:]


def se3_edge_terms(poses: jnp.ndarray, edges: SE3Edges
                   ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """-> r (E,6), J_from (E,6,6), J_to (E,6,6)."""
    return jax.vmap(_se3_one)(poses[edges.from_idx], poses[edges.to_idx],
                              edges.meas)


# ---------------------------------------------------------------------------
# unary SE3 priors
# ---------------------------------------------------------------------------

def _prior_one(pose, ptype, meas):
    def f(xi):
        p = se3.pose_retract(pose, xi)
        t, q = p[0:3], p[3:7]
        r_xyz = t - meas[0:3]
        mq = meas[0:4]
        s = jnp.sign(jnp.sum(q * mq) + 1e-12)
        r_quat = jax.lax.stop_gradient(s) * q[1:4] - mq[1:4]
        dir_world = meas[0:3]
        measured = meas[3:6]
        r_vec = se3.quat_rotate(se3.quat_conjugate(q), dir_world) - measured
        return jnp.select(
            [ptype == PRIOR_XYZ, ptype == PRIOR_QUAT, ptype == PRIOR_VEC],
            [r_xyz, r_quat, r_vec])
    z = jnp.zeros(6, pose.dtype)
    return f(z), jax.jacfwd(f)(z)  # (3,), (3,6)


def prior_edge_terms(poses: jnp.ndarray, edges: PriorEdges
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    return jax.vmap(_prior_one)(poses[edges.node_idx], edges.ptype, edges.meas)


# ---------------------------------------------------------------------------
# SE3 - plane
# ---------------------------------------------------------------------------

def _plane_one(pose, plane, meas):
    Bm = plane_basis(meas[0:3])  # (3,2) tangent basis of measured normal

    def f(x):
        p = se3.pose_retract(pose, x[:6])
        pi = plane_retract(plane, x[6:9])
        R = se3.quat_to_mat(p[3:7])
        n_l = R.T @ pi[0:3]
        d_l = pi[3] + jnp.dot(pi[0:3], p[0:3])
        return jnp.concatenate([Bm.T @ n_l, (d_l - meas[3])[None]])
    z = jnp.zeros(9, pose.dtype)
    r = f(z)
    J = jax.jacfwd(f)(z)  # (3,9)
    return r, J[:, :6], J[:, 6:9]


def plane_edge_terms(poses: jnp.ndarray, planes: jnp.ndarray,
                     edges: PlaneEdges
                     ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    return jax.vmap(_plane_one)(poses[edges.node_idx],
                                planes[edges.plane_idx], edges.meas)


# ---------------------------------------------------------------------------
# plane priors and plane-plane edges (registered by the reference's
# GraphSLAM, graph_slam.cpp:33-42; unused by the live pipeline but part of
# the public edge-type surface)
# ---------------------------------------------------------------------------

def _plane_prior_one(plane, ptype, meas):
    def f(delta):
        pi = plane_retract(plane, delta)
        r_normal = jnp.concatenate([pi[0:3] - meas[0:3],
                                    jnp.zeros(1, plane.dtype)])
        r_dist = jnp.concatenate([pi[3:4] - meas[0:1],
                                  jnp.zeros(3, plane.dtype)])
        return jnp.where(ptype == PLANE_PRIOR_NORMAL, r_normal, r_dist)
    z = jnp.zeros(3, plane.dtype)
    return f(z), jax.jacfwd(f)(z)  # (4,), (4,3)


def plane_prior_terms(planes: jnp.ndarray, edges: PlanePriorEdges):
    return jax.vmap(_plane_prior_one)(planes[edges.plane_idx], edges.ptype,
                                      edges.meas)


def _plane_plane_one(p1, p2, ptype, meas):
    def f(x):
        a = plane_retract(p1, x[0:3])
        b = plane_retract(p2, x[3:6])
        r_ident = (b - a) - meas
        r_par = jnp.concatenate([(b[0:3] - a[0:3]) - meas[0:3],
                                 jnp.zeros(1, p1.dtype)])
        r_perp = jnp.concatenate([
            (jnp.dot(a[0:3], b[0:3]) - meas[0])[None],
            jnp.zeros(3, p1.dtype)])
        return jnp.select(
            [ptype == PLANE_PLANE_IDENTITY, ptype == PLANE_PLANE_PARALLEL,
             ptype == PLANE_PLANE_PERPENDICULAR],
            [r_ident, r_par, r_perp])
    z = jnp.zeros(6, p1.dtype)
    r = f(z)
    J = jax.jacfwd(f)(z)  # (4, 6)
    return r, J[:, 0:3], J[:, 3:6]


def plane_plane_terms(planes: jnp.ndarray, edges: PlanePlaneEdges):
    return jax.vmap(_plane_plane_one)(planes[edges.from_idx],
                                      planes[edges.to_idx], edges.ptype,
                                      edges.meas)


def transform_plane(pose: jnp.ndarray, plane_world: jnp.ndarray) -> jnp.ndarray:
    """World plane (n, d) with n.x + d = 0 into the frame of `pose`."""
    R = se3.quat_to_mat(pose[..., 3:7])
    n_l = jnp.einsum("...ji,...j->...i", R, plane_world[..., 0:3])
    d_l = plane_world[..., 3] + jnp.einsum(
        "...j,...j->...", plane_world[..., 0:3], pose[..., 0:3])
    return jnp.concatenate([n_l, d_l[..., None]], axis=-1)
