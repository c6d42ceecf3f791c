"""Manifold Levenberg-Marquardt for the pose graph, dense or matrix-free PCG.

TPU re-design of the reference's g2o backend (graph_slam.cpp:353-425 wraps
sparse LM + cholmod). Two interchangeable linear solvers behind one jitted
LM loop:

- "dense":  scatter 6x6/3x3 blocks into a (D, D) Hessian and Cholesky-solve.
  D = 6*N + 3*P stays modest for keyframe graphs (KITTI 00 ~ 1k keyframes ->
  D ~ 6k, a 144 MB f32 matrix — MXU fodder). Also yields exact marginals.
- "cg":     block-Jacobi preconditioned conjugate gradients with matrix-free
  Hessian-vector products (gather -> per-edge 6x6 mults -> segment_sum
  scatter). O(E) memory; the building block the distributed multi-host
  solver shards over the device mesh (parallel/dist_solver.py).

Robust kernels enter as IRLS weights re-evaluated at every linearization.
Fixed nodes (anchor, graph_database.cpp:84-112) and padding lanes are
projected out of the update.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..config import OptimizerConfig
from ..utils import se3
from . import edges as E
from .robust import robust_rho_and_weight
from .types import PoseGraphData, plane_retract


class LinearizedGraph(NamedTuple):
    chi2: jnp.ndarray
    # se3 edges
    r_se3: jnp.ndarray
    Ji: jnp.ndarray
    Jj: jnp.ndarray
    W_se3: jnp.ndarray
    # priors
    r_pr: jnp.ndarray
    Jp: jnp.ndarray
    W_pr: jnp.ndarray
    # plane edges
    r_pl: jnp.ndarray
    Jpl_pose: jnp.ndarray
    Jpl_plane: jnp.ndarray
    W_pl: jnp.ndarray
    # plane priors
    r_pp: jnp.ndarray
    Jpp: jnp.ndarray
    W_pp: jnp.ndarray
    # plane-plane edges
    r_qq: jnp.ndarray
    Jqq_a: jnp.ndarray
    Jqq_b: jnp.ndarray
    W_qq: jnp.ndarray


class OptimizeResult(NamedTuple):
    poses: jnp.ndarray
    planes: jnp.ndarray
    chi2_initial: jnp.ndarray
    chi2_final: jnp.ndarray
    iterations: jnp.ndarray
    lambda_final: jnp.ndarray


def _weighted(info, r, kernel, delta, mask):
    """IRLS effective information and robust chi2 contribution."""
    e = jnp.einsum("ei,eij,ej->e", r, info, r)
    rho, w = robust_rho_and_weight(e, kernel, delta)
    m = mask.astype(jnp.float32)
    W = info * (w * m)[:, None, None]
    return W, jnp.sum(rho * m)


def _psum_if(x, axis_name):
    return jax.lax.psum(x, axis_name) if axis_name else x


def _has(table) -> bool:
    """Static (shape-level) emptiness test for an edge-family table.

    Solve cost on small graphs is op-count x per-op overhead, not FLOPs
    (every LM iteration re-runs the whole edge sweep inside a while_loop),
    so a family whose table has ZERO capacity must contribute zero HLO:
    each consumer below skips the family's residuals/Jacobians/reductions
    entirely and substitutes zero-size placeholders. GraphDatabase sizes
    the prior/plane tables to 0 when the corresponding processors are
    disabled (the common pose-only deployment), which cuts the per-
    iteration edge work of a pose-only solve to just the SE3 sweep."""
    return table.mask.shape[0] > 0


def linearize(g: PoseGraphData, axis_name=None) -> LinearizedGraph:
    """When `axis_name` is set, the edge tables of `g` are shard_map shards
    over that mesh axis and the scalar chi2 is psum-reduced (the per-edge
    terms stay local to their shard). Zero-capacity families are elided
    statically (see `_has`)."""
    z = jnp.zeros
    chi2 = jnp.float32(0.0)
    if _has(g.se3):
        r_se3, Ji, Jj = E.se3_edge_terms(g.poses, g.se3)
        W_se3, c = _weighted(g.se3.info, r_se3, g.se3.kernel, g.se3.delta,
                             g.se3.mask)
        chi2 += c
    else:
        r_se3, Ji, Jj = z((0, 6)), z((0, 6, 6)), z((0, 6, 6))
        W_se3 = z((0, 6, 6))
    if _has(g.priors):
        r_pr, Jp = E.prior_edge_terms(g.poses, g.priors)
        W_pr, c = _weighted(g.priors.info, r_pr, g.priors.kernel,
                            g.priors.delta, g.priors.mask)
        chi2 += c
    else:
        r_pr, Jp, W_pr = z((0, 3)), z((0, 3, 6)), z((0, 3, 3))
    if _has(g.plane_edges):
        r_pl, Jpl_pose, Jpl_plane = E.plane_edge_terms(g.poses, g.planes,
                                                       g.plane_edges)
        W_pl, c = _weighted(g.plane_edges.info, r_pl, g.plane_edges.kernel,
                            g.plane_edges.delta, g.plane_edges.mask)
        chi2 += c
    else:
        r_pl, Jpl_pose = z((0, 3)), z((0, 3, 6))
        Jpl_plane, W_pl = z((0, 3, 3)), z((0, 3, 3))
    if _has(g.plane_priors):
        r_pp, Jpp = E.plane_prior_terms(g.planes, g.plane_priors)
        W_pp, c = _weighted(g.plane_priors.info, r_pp, g.plane_priors.kernel,
                            g.plane_priors.delta, g.plane_priors.mask)
        chi2 += c
    else:
        r_pp, Jpp, W_pp = z((0, 4)), z((0, 4, 3)), z((0, 4, 4))
    if _has(g.plane_plane):
        r_qq, Jqq_a, Jqq_b = E.plane_plane_terms(g.planes, g.plane_plane)
        W_qq, c = _weighted(g.plane_plane.info, r_qq, g.plane_plane.kernel,
                            g.plane_plane.delta, g.plane_plane.mask)
        chi2 += c
    else:
        r_qq, Jqq_a = z((0, 4)), z((0, 4, 3))
        Jqq_b, W_qq = z((0, 4, 3)), z((0, 4, 4))
    return LinearizedGraph(chi2=_psum_if(chi2, axis_name),
                           r_se3=r_se3, Ji=Ji, Jj=Jj,
                           W_se3=W_se3, r_pr=r_pr, Jp=Jp, W_pr=W_pr,
                           r_pl=r_pl, Jpl_pose=Jpl_pose,
                           Jpl_plane=Jpl_plane, W_pl=W_pl,
                           r_pp=r_pp, Jpp=Jpp, W_pp=W_pp,
                           r_qq=r_qq, Jqq_a=Jqq_a, Jqq_b=Jqq_b, W_qq=W_qq)


def chi2_only(g: PoseGraphData, axis_name=None) -> jnp.ndarray:
    chi2 = jnp.float32(0.0)
    if _has(g.se3):
        r_se3 = jax.vmap(se3.pose_error)(
            g.se3.meas, g.poses[g.se3.from_idx], g.poses[g.se3.to_idx])
        _, c = _weighted(g.se3.info, r_se3, g.se3.kernel, g.se3.delta,
                         g.se3.mask)
        chi2 += c
    if _has(g.priors):
        r_pr, _ = E.prior_edge_terms(g.poses, g.priors)
        _, c = _weighted(g.priors.info, r_pr, g.priors.kernel,
                         g.priors.delta, g.priors.mask)
        chi2 += c
    if _has(g.plane_edges):
        r_pl, _, _ = E.plane_edge_terms(g.poses, g.planes, g.plane_edges)
        _, c = _weighted(g.plane_edges.info, r_pl, g.plane_edges.kernel,
                         g.plane_edges.delta, g.plane_edges.mask)
        chi2 += c
    if _has(g.plane_priors):
        r_pp, _ = E.plane_prior_terms(g.planes, g.plane_priors)
        _, c = _weighted(g.plane_priors.info, r_pp, g.plane_priors.kernel,
                         g.plane_priors.delta, g.plane_priors.mask)
        chi2 += c
    if _has(g.plane_plane):
        r_qq, _, _ = E.plane_plane_terms(g.planes, g.plane_plane)
        _, c = _weighted(g.plane_plane.info, r_qq, g.plane_plane.kernel,
                         g.plane_plane.delta, g.plane_plane.mask)
        chi2 += c
    return _psum_if(chi2, axis_name)


# ---------------------------------------------------------------------------
# matrix-free machinery
# ---------------------------------------------------------------------------

def _free_masks(g: PoseGraphData):
    fn = (g.node_mask & ~g.node_fixed).astype(jnp.float32)[:, None]
    fp = (g.plane_mask & ~g.plane_fixed).astype(jnp.float32)[:, None]
    return fn, fp


def gradient(g: PoseGraphData, lin: LinearizedGraph, axis_name=None):
    """-(J^T W r) stacked per node pool, free dofs only; psum over the
    edge-shard axis when distributed."""
    n, p = g.n_nodes, g.n_planes
    g_n = jnp.zeros((n, 6), jnp.float32)
    g_p = jnp.zeros((p, 3), jnp.float32)
    if _has(g.se3):
        Wr = jnp.einsum("eij,ej->ei", lin.W_se3, lin.r_se3)
        g_n += jax.ops.segment_sum(jnp.einsum("eai,ea->ei", lin.Ji, Wr),
                                   g.se3.from_idx, num_segments=n)
        g_n += jax.ops.segment_sum(jnp.einsum("eai,ea->ei", lin.Jj, Wr),
                                   g.se3.to_idx, num_segments=n)
    if _has(g.priors):
        Wr_pr = jnp.einsum("eij,ej->ei", lin.W_pr, lin.r_pr)
        g_n += jax.ops.segment_sum(jnp.einsum("eai,ea->ei", lin.Jp, Wr_pr),
                                   g.priors.node_idx, num_segments=n)
    if _has(g.plane_edges):
        Wr_pl = jnp.einsum("eij,ej->ei", lin.W_pl, lin.r_pl)
        g_n += jax.ops.segment_sum(
            jnp.einsum("eai,ea->ei", lin.Jpl_pose, Wr_pl),
            g.plane_edges.node_idx, num_segments=n)
        g_p += jax.ops.segment_sum(
            jnp.einsum("eai,ea->ei", lin.Jpl_plane, Wr_pl),
            g.plane_edges.plane_idx, num_segments=p)
    if _has(g.plane_priors):
        Wr_pp = jnp.einsum("eij,ej->ei", lin.W_pp, lin.r_pp)
        g_p += jax.ops.segment_sum(jnp.einsum("eai,ea->ei", lin.Jpp, Wr_pp),
                                   g.plane_priors.plane_idx, num_segments=p)
    if _has(g.plane_plane):
        Wr_qq = jnp.einsum("eij,ej->ei", lin.W_qq, lin.r_qq)
        g_p += jax.ops.segment_sum(jnp.einsum("eai,ea->ei", lin.Jqq_a, Wr_qq),
                                   g.plane_plane.from_idx, num_segments=p)
        g_p += jax.ops.segment_sum(jnp.einsum("eai,ea->ei", lin.Jqq_b, Wr_qq),
                                   g.plane_plane.to_idx, num_segments=p)
    fn, fp = _free_masks(g)
    return _psum_if(g_n, axis_name) * fn, _psum_if(g_p, axis_name) * fp


def block_diagonal(g: PoseGraphData, lin: LinearizedGraph, axis_name=None):
    """Per-node 6x6 and per-plane 3x3 diagonal blocks of H."""
    n, p = g.n_nodes, g.n_planes
    D_n = jnp.zeros((n, 6, 6), jnp.float32)
    D_p = jnp.zeros((p, 3, 3), jnp.float32)
    if _has(g.se3):
        WJi = jnp.einsum("eab,ebj->eaj", lin.W_se3, lin.Ji)
        WJj = jnp.einsum("eab,ebj->eaj", lin.W_se3, lin.Jj)
        D_n += jax.ops.segment_sum(jnp.einsum("eai,eaj->eij", lin.Ji, WJi),
                                   g.se3.from_idx, num_segments=n)
        D_n += jax.ops.segment_sum(jnp.einsum("eai,eaj->eij", lin.Jj, WJj),
                                   g.se3.to_idx, num_segments=n)
    if _has(g.priors):
        WJp = jnp.einsum("eab,ebj->eaj", lin.W_pr, lin.Jp)
        D_n += jax.ops.segment_sum(jnp.einsum("eai,eaj->eij", lin.Jp, WJp),
                                   g.priors.node_idx, num_segments=n)
    if _has(g.plane_edges):
        WJpl = jnp.einsum("eab,ebj->eaj", lin.W_pl, lin.Jpl_pose)
        D_n += jax.ops.segment_sum(
            jnp.einsum("eai,eaj->eij", lin.Jpl_pose, WJpl),
            g.plane_edges.node_idx, num_segments=n)
        WJpp = jnp.einsum("eab,ebj->eaj", lin.W_pl, lin.Jpl_plane)
        D_p += jax.ops.segment_sum(
            jnp.einsum("eai,eaj->eij", lin.Jpl_plane, WJpp),
            g.plane_edges.plane_idx, num_segments=p)
    if _has(g.plane_priors):
        WJprior = jnp.einsum("eab,ebj->eaj", lin.W_pp, lin.Jpp)
        D_p += jax.ops.segment_sum(
            jnp.einsum("eai,eaj->eij", lin.Jpp, WJprior),
            g.plane_priors.plane_idx, num_segments=p)
    if _has(g.plane_plane):
        WJa = jnp.einsum("eab,ebj->eaj", lin.W_qq, lin.Jqq_a)
        WJb = jnp.einsum("eab,ebj->eaj", lin.W_qq, lin.Jqq_b)
        D_p += jax.ops.segment_sum(jnp.einsum("eai,eaj->eij", lin.Jqq_a, WJa),
                                   g.plane_plane.from_idx, num_segments=p)
        D_p += jax.ops.segment_sum(jnp.einsum("eai,eaj->eij", lin.Jqq_b, WJb),
                                   g.plane_plane.to_idx, num_segments=p)
    return _psum_if(D_n, axis_name), _psum_if(D_p, axis_name)


def make_hvp(g: PoseGraphData, lin: LinearizedGraph, axis_name=None):
    """Matrix-free H @ v over (v_nodes (N,6), v_planes (P,3)).

    Distributed: v is replicated across devices, each shard contributes its
    edges' products, one psum yields the replicated result — the ICI
    collective at the heart of the multi-host Gauss-Newton."""
    n, p = g.n_nodes, g.n_planes
    fn, fp = _free_masks(g)

    def hvp(v_n, v_p):
        v_n = v_n * fn
        v_p = v_p * fp
        out_n = jnp.zeros((n, 6), jnp.float32)
        out_p = jnp.zeros((p, 3), jnp.float32)
        if _has(g.se3):
            u = (jnp.einsum("eai,ei->ea", lin.Ji, v_n[g.se3.from_idx])
                 + jnp.einsum("eai,ei->ea", lin.Jj, v_n[g.se3.to_idx]))
            Wu = jnp.einsum("eab,eb->ea", lin.W_se3, u)
            out_n += jax.ops.segment_sum(
                jnp.einsum("eai,ea->ei", lin.Ji, Wu),
                g.se3.from_idx, num_segments=n)
            out_n += jax.ops.segment_sum(
                jnp.einsum("eai,ea->ei", lin.Jj, Wu),
                g.se3.to_idx, num_segments=n)
        if _has(g.priors):
            up = jnp.einsum("eai,ei->ea", lin.Jp, v_n[g.priors.node_idx])
            Wup = jnp.einsum("eab,eb->ea", lin.W_pr, up)
            out_n += jax.ops.segment_sum(
                jnp.einsum("eai,ea->ei", lin.Jp, Wup),
                g.priors.node_idx, num_segments=n)
        if _has(g.plane_edges):
            upl = (jnp.einsum("eai,ei->ea", lin.Jpl_pose,
                              v_n[g.plane_edges.node_idx])
                   + jnp.einsum("eai,ei->ea", lin.Jpl_plane,
                                v_p[g.plane_edges.plane_idx]))
            Wupl = jnp.einsum("eab,eb->ea", lin.W_pl, upl)
            out_n += jax.ops.segment_sum(
                jnp.einsum("eai,ea->ei", lin.Jpl_pose, Wupl),
                g.plane_edges.node_idx, num_segments=n)
            out_p += jax.ops.segment_sum(
                jnp.einsum("eai,ea->ei", lin.Jpl_plane, Wupl),
                g.plane_edges.plane_idx, num_segments=p)
        if _has(g.plane_priors):
            upp = jnp.einsum("eai,ei->ea", lin.Jpp,
                             v_p[g.plane_priors.plane_idx])
            Wupp = jnp.einsum("eab,eb->ea", lin.W_pp, upp)
            out_p += jax.ops.segment_sum(
                jnp.einsum("eai,ea->ei", lin.Jpp, Wupp),
                g.plane_priors.plane_idx, num_segments=p)
        if _has(g.plane_plane):
            uqq = (jnp.einsum("eai,ei->ea", lin.Jqq_a,
                              v_p[g.plane_plane.from_idx])
                   + jnp.einsum("eai,ei->ea", lin.Jqq_b,
                                v_p[g.plane_plane.to_idx]))
            Wuqq = jnp.einsum("eab,eb->ea", lin.W_qq, uqq)
            out_p += jax.ops.segment_sum(
                jnp.einsum("eai,ea->ei", lin.Jqq_a, Wuqq),
                g.plane_plane.from_idx, num_segments=p)
            out_p += jax.ops.segment_sum(
                jnp.einsum("eai,ea->ei", lin.Jqq_b, Wuqq),
                g.plane_plane.to_idx, num_segments=p)
        return _psum_if(out_n, axis_name) * fn, _psum_if(out_p, axis_name) * fp

    return hvp


def _inv_sym(blocks: jnp.ndarray, ridge: float = 1e-8) -> jnp.ndarray:
    d = blocks.shape[-1]
    eye = jnp.eye(d, dtype=blocks.dtype)
    return jnp.linalg.solve(blocks + ridge * eye,
                            jnp.broadcast_to(eye, blocks.shape))


def pcg_solve(hvp, b_n, b_p, M_n, M_p, lam, d_n, d_p, max_iters: int,
              tol: float):
    """Block-Jacobi PCG on (H + lam*diag) x = b."""

    def A(v_n, v_p):
        h_n, h_p = hvp(v_n, v_p)
        return (h_n + (lam * d_n + 1e-6) * v_n,
                h_p + (lam * d_p + 1e-6) * v_p)

    def Minv(v_n, v_p):
        return (jnp.einsum("nij,nj->ni", M_n, v_n),
                jnp.einsum("nij,nj->ni", M_p, v_p))

    def dot(a, b):
        return jnp.sum(a[0] * b[0]) + jnp.sum(a[1] * b[1])

    x = (jnp.zeros_like(b_n), jnp.zeros_like(b_p))
    r = (b_n, b_p)
    z = Minv(*r)
    pvec = z
    rz = dot(r, z)
    b_norm = jnp.sqrt(dot(r, r)) + 1e-30

    def cond(s):
        x, r, pvec, rz, i = s
        return (i < max_iters) & (jnp.sqrt(dot(r, r)) > tol * b_norm)

    def body(s):
        x, r, pvec, rz, i = s
        Ap = A(*pvec)
        alpha = rz / (dot(pvec, Ap) + 1e-30)
        x = (x[0] + alpha * pvec[0], x[1] + alpha * pvec[1])
        r = (r[0] - alpha * Ap[0], r[1] - alpha * Ap[1])
        z = Minv(*r)
        rz_new = dot(r, z)
        beta = rz_new / (rz + 1e-30)
        pvec = (z[0] + beta * pvec[0], z[1] + beta * pvec[1])
        return x, r, pvec, rz_new, i + 1

    x, r, pvec, rz, iters = jax.lax.while_loop(
        cond, body, (x, r, pvec, rz, jnp.int32(0)))
    return x


# ---------------------------------------------------------------------------
# dense path
# ---------------------------------------------------------------------------

def assemble_dense(g: PoseGraphData, lin: LinearizedGraph, axis_name=None):
    """Full (D, D) Hessian and (D,) gradient; D = 6N + 3P.

    With `axis_name` (inside shard_map over edge shards) each device
    assembles its local edges' contributions and the full Hessian arrives
    by ONE psum over the ICI — the scaling-book recipe: the O(E)
    linearization work is sharded, the O(D^2) result is replicated."""
    n, p = g.n_nodes, g.n_planes
    D = 6 * n + 3 * p
    H = jnp.zeros((D, D), jnp.float32)

    def add_block(H, rows, cols, blocks):
        # rows (E, a), cols (E, b), blocks (E, a, b)
        return H.at[rows[:, :, None], cols[:, None, :]].add(blocks)

    def idx6(node_idx):
        return node_idx[:, None] * 6 + jnp.arange(6)[None, :]

    def idxp(plane_idx):
        return 6 * n + plane_idx[:, None] * 3 + jnp.arange(3)[None, :]

    if _has(g.se3):
        WJi = jnp.einsum("eab,ebj->eaj", lin.W_se3, lin.Ji)
        WJj = jnp.einsum("eab,ebj->eaj", lin.W_se3, lin.Jj)
        fi, ti = idx6(g.se3.from_idx), idx6(g.se3.to_idx)
        H = add_block(H, fi, fi, jnp.einsum("eai,eaj->eij", lin.Ji, WJi))
        H = add_block(H, fi, ti, jnp.einsum("eai,eaj->eij", lin.Ji, WJj))
        H = add_block(H, ti, fi, jnp.einsum("eai,eaj->eij", lin.Jj, WJi))
        H = add_block(H, ti, ti, jnp.einsum("eai,eaj->eij", lin.Jj, WJj))

    if _has(g.priors):
        WJp = jnp.einsum("eab,ebj->eaj", lin.W_pr, lin.Jp)
        ni = idx6(g.priors.node_idx)
        H = add_block(H, ni, ni, jnp.einsum("eai,eaj->eij", lin.Jp, WJp))

    if _has(g.plane_edges):
        WJpl = jnp.einsum("eab,ebj->eaj", lin.W_pl, lin.Jpl_pose)
        WJpp = jnp.einsum("eab,ebj->eaj", lin.W_pl, lin.Jpl_plane)
        pi, pli = idx6(g.plane_edges.node_idx), idxp(g.plane_edges.plane_idx)
        H = add_block(H, pi, pi,
                      jnp.einsum("eai,eaj->eij", lin.Jpl_pose, WJpl))
        H = add_block(H, pi, pli,
                      jnp.einsum("eai,eaj->eij", lin.Jpl_pose, WJpp))
        H = add_block(H, pli, pi,
                      jnp.einsum("eai,eaj->eij", lin.Jpl_plane, WJpl))
        H = add_block(H, pli, pli,
                      jnp.einsum("eai,eaj->eij", lin.Jpl_plane, WJpp))

    if _has(g.plane_priors):
        WJprior = jnp.einsum("eab,ebj->eaj", lin.W_pp, lin.Jpp)
        ppi = idxp(g.plane_priors.plane_idx)
        H = add_block(H, ppi, ppi,
                      jnp.einsum("eai,eaj->eij", lin.Jpp, WJprior))
    if _has(g.plane_plane):
        WJa = jnp.einsum("eab,ebj->eaj", lin.W_qq, lin.Jqq_a)
        WJb = jnp.einsum("eab,ebj->eaj", lin.W_qq, lin.Jqq_b)
        qa, qb = idxp(g.plane_plane.from_idx), idxp(g.plane_plane.to_idx)
        H = add_block(H, qa, qa, jnp.einsum("eai,eaj->eij", lin.Jqq_a, WJa))
        H = add_block(H, qa, qb, jnp.einsum("eai,eaj->eij", lin.Jqq_a, WJb))
        H = add_block(H, qb, qa, jnp.einsum("eai,eaj->eij", lin.Jqq_b, WJa))
        H = add_block(H, qb, qb, jnp.einsum("eai,eaj->eij", lin.Jqq_b, WJb))

    g_n, g_p = gradient(g, lin, axis_name=axis_name)
    b = -jnp.concatenate([g_n.reshape(-1), g_p.reshape(-1)])
    if axis_name is not None:
        H = jax.lax.psum(H, axis_name)

    # project out fixed/invalid dofs: zero rows/cols, unit diagonal
    fn, fp = _free_masks(g)
    free = jnp.concatenate([
        jnp.repeat(fn[:, 0], 6), jnp.repeat(fp[:, 0], 3)])
    H = H * free[:, None] * free[None, :] + jnp.diag(1.0 - free)
    b = b * free
    return H, b, free


def dense_delta(H, b, free, lam):
    """Damped dense Newton step -> (x, predicted_reduction, grad_inf_norm).

    f32 Cholesky on a raw pose-graph Hessian (condition ~1e6+) loses
    enough precision to stall LM; symmetric Jacobi equilibration plus one
    iterative-refinement step recovers near-f64 step quality at ~1 extra
    matmul. Shared by the single-device LM driver and the distributed
    solver's replicated dense backend."""
    diag = jnp.diagonal(H)
    gnorm = jnp.max(jnp.abs(b))
    # absolute damping floor keeps H positive definite even when a dof is
    # unconstrained (e.g. a node with only a rotation prior)
    Hl = H + jnp.diag((lam * diag + 1e-6) * free)
    s = jax.lax.rsqrt(jnp.maximum(jnp.diagonal(Hl), 1e-12))
    Hs = Hl * s[:, None] * s[None, :]
    bs = b * s
    cf = jax.scipy.linalg.cho_factor(Hs)
    y = jax.scipy.linalg.cho_solve(cf, bs)
    y = y + jax.scipy.linalg.cho_solve(cf, bs - Hs @ y)
    x = y * s
    # predicted chi2 reduction of the damped step (g2o's LM rho
    # denominator): dx^T (lam * D dx + b)
    pred = jnp.sum(x * (lam * diag * x + b))
    return x, pred, gnorm


# ---------------------------------------------------------------------------
# LM driver
# ---------------------------------------------------------------------------

def _retract_all(g: PoseGraphData, dx_n, dx_p) -> PoseGraphData:
    poses = jax.vmap(se3.pose_retract)(g.poses, dx_n)
    planes = plane_retract(g.planes, dx_p)
    fn, fp = _free_masks(g)
    poses = jnp.where(fn > 0, poses, g.poses)
    planes = jnp.where(fp > 0, planes, g.planes)
    return g._replace(poses=poses, planes=planes)


def optimize(g: PoseGraphData, cfg: OptimizerConfig,
             aux=None) -> OptimizeResult:
    """Levenberg-Marquardt with chi2-based accept/reject.

    Honors the reference's g2o settings: `g2o_solver_num_iterations` caps the
    outer loop (graph_slam.cpp:353); chi2 before/after are returned like the
    reference prints (:368-393). `gn_*` solver strings run with a fixed tiny
    damping (Gauss-Newton-ish); `lm_*` use adaptive lambda.

    Only the backend/solver-type choice is a static jit argument; iteration
    caps and tolerances ride as traced scalars so tuning them reuses the
    compiled program (see ops.registration.split_reg for the rationale).

    The "chain" backend (graph/chain_solver.py — segmented block-
    tridiagonal Cholesky + Woodbury loop correction, the large-graph exact
    path) additionally needs the host-side coupling classification `aux`;
    it is computed here from the edge tables when not supplied.
    """
    stat, dyn = split_optimizer(cfg, g)
    if stat[0] == "chain" and aux is None:
        aux = chain_aux_for(g)
    return _optimize_split(stat, dyn, g, aux)


def chain_aux_for(g: PoseGraphData):
    """Host-side coupling classification for the chain backend (one small
    int-array fetch when the tables live on device)."""
    import numpy as np

    from .chain_solver import classify
    return classify(np.asarray(g.se3.from_idx), np.asarray(g.se3.to_idx),
                    np.asarray(g.se3.mask),
                    g.plane_edges.mask.shape[0],
                    g.plane_plane.mask.shape[0],
                    pl_mask=np.asarray(g.plane_edges.mask),
                    qq_mask=np.asarray(g.plane_plane.mask))


def _chain_K(n: int) -> int:
    """Segment length for the chain backend: the largest power of two
    <= 64 dividing the node capacity (capacities are powers of two)."""
    k = 64
    while k > 2 and n % k:
        k //= 2
    return k


def resolve_backend(backend: str, n_nodes: int, n_planes: int = 0,
                    max_dofs: int = 12288) -> str:
    """"auto" -> dense while the (6N+3P)^2 Hessian is cheap (<= 2k nodes
    at the default threshold), the chain backend (segmented tridiagonal +
    Woodbury) past that — so a live graph that outgrows dense capacity
    transparently switches to the large-graph exact path, like g2o's
    cholmod handles any size. `max_dofs` comes from
    OptimizerConfig.auto_dense_max_dofs."""
    if backend != "auto":
        return backend
    return "dense" if 6 * n_nodes + 3 * n_planes <= max_dofs else "chain"


def split_optimizer(cfg: OptimizerConfig, g: Optional[PoseGraphData] = None):
    """Static program identity vs traced numeric knobs for the LM body —
    the single source of truth for every caller of `_optimize_body`
    (optimize, builder.optimize_many, parallel.dist_solver)."""
    backend = cfg.solver_backend
    if g is not None:
        backend = resolve_backend(backend, g.n_nodes, g.n_planes,
                                  cfg.auto_dense_max_dofs)
    assert backend != "auto", (
        "auto solver backend needs the graph to resolve against")
    K = _chain_K(g.n_nodes) if (g is not None
                                and backend == "chain") else 0
    stat = (backend, cfg.g2o_solver_type.startswith("lm"), K)
    dyn = dict(max_outer=jnp.int32(cfg.g2o_solver_num_iterations),
               chi2_rel_tol=jnp.float32(cfg.chi2_rel_tol),
               lam0=jnp.float32(cfg.lm_initial_lambda),
               cg_max=jnp.int32(cfg.cg_max_iterations),
               cg_tol=jnp.float32(cfg.cg_tol))
    return stat, dyn


@functools.partial(jax.jit, static_argnames=("stat",))
def _optimize_split(stat, dyn, g: PoseGraphData, aux=None) -> OptimizeResult:
    # TPU matmuls (incl. the ones inside Cholesky factorization and the
    # einsum reductions) default to bf16 — enough error to stall LM at
    # chi2 ~40 where the optimum is ~1.6 (same failure mode as the NN
    # distance corruption documented in ops/pallas_nn.py). Everything in
    # the solver runs f32-highest.
    with jax.default_matmul_precision("highest"):
        return _optimize_body(stat, dyn, g, aux=aux)


def _optimize_body(stat, dyn, g: PoseGraphData,
                   axis_name=None, aux=None, chain_axis=None,
                   chain_shards: int = 1) -> OptimizeResult:
    """Shared LM loop. With `axis_name` set this body runs SPMD inside a
    shard_map over edge shards (parallel/dist_solver.py) — every reduction
    (chi2, gradient, diag blocks, dense assembly, Hv) psums over that axis
    and the replicated-state control flow (lambda schedule, accept/reject,
    early stop) is byte-identical to the single-device path.

    The chain backend distributes differently: the graph stays REPLICATED
    (axis_name must be None so edge reductions are not double-counted)
    and `chain_axis`/`chain_shards` shard the factorization's segment
    panels over the mesh instead (chain_solver._factor_T docstring)."""
    solver_backend, is_lm, chain_K = stat
    max_outer = dyn["max_outer"]

    # ONE linearization per LM iteration: the loop carries the current
    # point's LinearizedGraph, the trial point's chi2 falls out of ITS
    # linearization (lin.chi2 — no separate chi2_only residual pass), and
    # an accepted step hands the trial linearization to the next iteration.
    # A rejected step recomputes nothing: the carried lin is still valid at
    # the unchanged point (the reference's g2o relinearizes every iteration
    # regardless, graph_slam.cpp:353).
    lin0 = linearize(g, axis_name=axis_name)
    chi2_0 = lin0.chi2

    def solve_delta(g_, lin, lam, g0norm):
        """-> (dx_n, dx_p, pred_reduction, gradient_inf_norm)."""
        if solver_backend == "dense":
            # the damping diagonal comes straight off the assembled H
            # (dense_delta reads diagonal(H)); tracing block_diagonal here
            # would only add dead HLO for XLA to eliminate
            H, b, free = assemble_dense(g_, lin, axis_name=axis_name)
            x, pred, gnorm = dense_delta(H, b, free, lam)
            n = g_.n_nodes
            dx_n = x[: 6 * n].reshape(n, 6)
            dx_p = x[6 * n:].reshape(g_.n_planes, 3)
        elif solver_backend == "chain":
            from .chain_solver import chain_delta
            dx_n, dx_p, pred, gnorm = chain_delta(g_, lin, lam, aux,
                                                  chain_K,
                                                  axis_name=chain_axis,
                                                  n_shards=chain_shards)
        else:
            D_n, D_p = block_diagonal(g_, lin, axis_name=axis_name)
            d_n = jnp.diagonal(D_n, axis1=-2, axis2=-1)
            d_p = jnp.diagonal(D_p, axis1=-2, axis2=-1)
            g_n, g_p = gradient(g_, lin, axis_name=axis_name)
            gnorm = jnp.max(jnp.abs(g_n))
            if g_.n_planes:  # jnp.max of a zero-size array is an error
                gnorm = jnp.maximum(gnorm, jnp.max(jnp.abs(g_p)))
            fn, fp = _free_masks(g_)
            eye6 = jnp.eye(6, dtype=jnp.float32)
            eye3 = jnp.eye(3, dtype=jnp.float32)
            damped_n = (D_n + (lam * d_n[..., None] + 1e-6) * eye6
                        + (1 - fn[..., None]) * eye6)
            damped_p = (D_p + (lam * d_p[..., None] + 1e-6) * eye3
                        + (1 - fp[..., None]) * eye3)
            M_n = _inv_sym(damped_n)
            M_p = _inv_sym(damped_p)
            hvp = make_hvp(g_, lin, axis_name=axis_name)
            # Eisenstat-Walker forcing: early LM steps only need a crude
            # Newton direction — solve CG to a tolerance proportional to
            # gradient progress instead of burning cg_max iterations on a
            # linearization that the next retract invalidates anyway.
            eta = jnp.clip(gnorm / jnp.maximum(g0norm, 1e-30), 0.0, 0.1)
            cg_tol_i = jnp.maximum(dyn["cg_tol"], eta)
            dx_n, dx_p = pcg_solve(hvp, -g_n, -g_p, M_n, M_p, lam, d_n, d_p,
                                   dyn["cg_max"], cg_tol_i)
            pred = (jnp.sum(dx_n * (lam * d_n * dx_n - g_n))
                    + jnp.sum(dx_p * (lam * d_p * dx_p - g_p)))
        return dx_n, dx_p, pred, gnorm

    def cond(s):
        g_, lin, lam, nu, chi2, g0norm, it, done = s
        return (it < max_outer) & ~done

    def body(s):
        g_, lin, lam, nu, chi2, g0norm, it, done = s
        dx_n, dx_p, pred, gnorm = solve_delta(g_, lin, lam, g0norm)
        g0norm = jnp.where(g0norm < 0, gnorm, g0norm)
        g_new = _retract_all(g_, dx_n, dx_p)
        lin_new = linearize(g_new, axis_name=axis_name)
        chi2_new = lin_new.chi2
        # `done` is sticky and freezes the state: in the scalar while_loop
        # the body never runs once done, but under vmap (the batched
        # cross-robot solve) the loop runs until EVERY graph finishes, so a
        # finished graph must hold its result while the others iterate.
        accept = (chi2_new <= chi2) & ~done
        if is_lm:
            # Nielsen's gain-ratio schedule: excellent steps slash lambda
            # toward Gauss-Newton (quadratic tail convergence); rejects
            # back off geometrically faster each consecutive failure.
            rho = (chi2 - chi2_new) / jnp.maximum(pred, 1e-30)
            shrink = jnp.maximum(1.0 / 3.0, 1.0 - (2.0 * rho - 1.0) ** 3)
            lam_next = jnp.where(accept,
                                 jnp.maximum(lam * shrink, 1e-12),
                                 jnp.minimum(lam * nu, 1e10))
            nu_next = jnp.where(accept, jnp.float32(2.0),
                                jnp.minimum(nu * 2.0, jnp.float32(1e8)))
            lam_next = jnp.where(done, lam, lam_next)
            nu_next = jnp.where(done, nu, nu_next)
        else:
            lam_next = lam
            nu_next = nu
        g_out = g_._replace(
            poses=jnp.where(accept, g_new.poses, g_.poses),
            planes=jnp.where(accept, g_new.planes, g_.planes))
        lin_out = jax.tree.map(lambda a, b: jnp.where(accept, a, b),
                               lin_new, lin)
        rel_improve = (chi2 - chi2_new) / jnp.maximum(chi2, 1e-12)
        done_now = (done | (accept & (rel_improve < dyn["chi2_rel_tol"]))
                    | (lam_next > 1e8))
        chi2_out = jnp.where(accept, chi2_new, chi2)
        it_out = it + jnp.where(done, jnp.int32(0), jnp.int32(1))
        return (g_out, lin_out, lam_next, nu_next, chi2_out, g0norm, it_out,
                done_now)

    lam0 = jnp.where(is_lm, dyn["lam0"], jnp.float32(1e-9))
    state = (g, lin0, lam0, jnp.float32(2.0), chi2_0, jnp.float32(-1.0),
             jnp.int32(0), jnp.bool_(False))
    g_fin, _, lam_fin, nu_fin, chi2_fin, _, iters, _ = jax.lax.while_loop(
        cond, body, state)
    return OptimizeResult(poses=g_fin.poses, planes=g_fin.planes,
                          chi2_initial=chi2_0, chi2_final=chi2_fin,
                          iterations=iters, lambda_final=lam_fin)


@functools.partial(jax.jit, static_argnames=("stat",))
def _optimize_many_split(stat, dyn, gs: PoseGraphData) -> OptimizeResult:
    """Batched LM over a leading graph axis.

    The cross-robot solve (models/coordinator.py): every robot hosted on
    the chip optimizes its own pose graph in ONE dispatch — the vmapped
    while_loop runs lockstep until the slowest graph's early stop, which
    still beats R separate ~26 ms-round-trip dispatches. Same numerics as
    `optimize` (the body is shared)."""
    with jax.default_matmul_precision("highest"):
        return jax.vmap(lambda g: _optimize_body(stat, dyn, g))(gs)


@functools.partial(jax.jit, static_argnames=("exact",))
def marginals_many(gs: PoseGraphData, exact: bool = True) -> jnp.ndarray:
    """Batched `marginals` over a leading graph axis (one dispatch for all
    hosted robots' per-tick covariance blocks)."""
    with jax.default_matmul_precision("highest"):
        return jax.vmap(lambda g: _marginals_body(g, exact))(gs)


@functools.partial(jax.jit, static_argnames=("exact",))
def marginals(g: PoseGraphData, exact: bool = True) -> jnp.ndarray:
    """Per-node 6x6 covariance blocks, diag of H^-1.

    exact=True inverts the dense Hessian (matches g2o's sparse marginals,
    graph_slam.cpp:401-425, at dense cost); exact=False returns the
    block-Jacobi approximation inv(diag blocks) — cheap, conservative for
    well-conditioned graphs.
    """
    with jax.default_matmul_precision("highest"):
        return _marginals_body(g, exact)


@jax.jit
def marginals_selected(g: PoseGraphData, node_idx: jnp.ndarray,
                       cg_max: jnp.ndarray = 400,
                       cg_tol: jnp.ndarray = 1e-9) -> jnp.ndarray:
    """Exact 6x6 covariance blocks for selected nodes, matrix-free.

    The dense path (`marginals(exact=True)`) inverts the full Hessian —
    right for small keyframe graphs but O(D^3). This path solves
    H x = e_{i,a} for the 6 basis vectors of each selected node with
    block-Jacobi-preconditioned CG (one vmapped batch of 6m right-hand
    sides, every iteration a batched Hessian-vector product over the edge
    tables), then reads cov[a,b] = e_{i,a}^T H^-1 e_{i,b}. Matches g2o's
    sparse selected marginals (graph_slam.cpp:401-425) without ever
    forming H. O(E) memory; usable on graphs far past dense capacity.

    node_idx: (m,) int32 node ids. Returns (m, 6, 6); fixed/invalid nodes
    get zero covariance like the dense path.
    """
    with jax.default_matmul_precision("highest"):
        lin = linearize(g)
        fn, fp = _free_masks(g)
        D_n, D_p = block_diagonal(g, lin)
        eye6 = jnp.eye(6, dtype=jnp.float32)
        eye3 = jnp.eye(3, dtype=jnp.float32)
        # lam=0 solve; the 1e-6 ridge inside pcg_solve's operator keeps
        # unconstrained dofs bounded (mirrors the dense path's 1e-9*I)
        M_n = _inv_sym(D_n + 1e-6 * eye6 + (1 - fn[..., None]) * eye6)
        M_p = _inv_sym(D_p + 1e-6 * eye3 + (1 - fp[..., None]) * eye3)
        hvp = make_hvp(g, lin)
        n, p = g.n_nodes, g.n_planes
        m = node_idx.shape[0]
        rhs_n = jnp.zeros((m, 6, n, 6), jnp.float32)
        rhs_n = rhs_n.at[jnp.arange(m)[:, None], jnp.arange(6)[None, :],
                         node_idx[:, None], jnp.arange(6)[None, :]].set(1.0)
        rhs_n = (rhs_n.reshape(m * 6, n, 6) * fn[None])
        rhs_p = jnp.zeros((m * 6, p, 3), jnp.float32)
        zero_d = (jnp.zeros((n, 6), jnp.float32),
                  jnp.zeros((p, 3), jnp.float32))

        def solve_one(b_n, b_p):
            x_n, _ = pcg_solve(hvp, b_n, b_p, M_n, M_p, jnp.float32(0.0),
                               zero_d[0], zero_d[1], cg_max, cg_tol)
            return x_n

        X = jax.vmap(solve_one)(rhs_n, rhs_p)          # (6m, N, 6)
        X = X.reshape(m, 6, n, 6)
        cov = X[jnp.arange(m)[:, None], jnp.arange(6)[None, :],
                node_idx[:, None]]                      # (m, 6, 6)
        free_sel = fn[node_idx]                         # (m, 1)
        return cov * free_sel[:, :, None]


def _marginals_body(g: PoseGraphData, exact: bool) -> jnp.ndarray:
    lin = linearize(g)
    fn, _ = _free_masks(g)
    if exact:
        H, b, free = assemble_dense(g, lin)
        # Cholesky-based inverse (the factorization the damped step also
        # uses): ~2x cheaper than LU-pivoted jnp.linalg.inv and stabler
        # in f32 on SPD pose-graph Hessians
        cf = jax.scipy.linalg.cho_factor(H + 1e-9 * jnp.eye(H.shape[0]))
        Hinv = jax.scipy.linalg.cho_solve(cf, jnp.eye(H.shape[0]))
        n = g.n_nodes
        idx = jnp.arange(n)[:, None] * 6 + jnp.arange(6)[None, :]
        cov = Hinv[idx[:, :, None], idx[:, None, :]]
    else:
        D_n, _ = block_diagonal(g, lin)
        cov = _inv_sym(D_n, ridge=1e-6)
    # fixed/invalid nodes have zero covariance by definition
    return cov * fn[:, :, None]
