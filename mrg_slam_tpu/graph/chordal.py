"""Chordal initialization for pose graphs.

Cold-start pose graphs (load_graph restores, large merged multi-robot maps,
the 1024-node solver benchmark) hand LM an estimate whose rotation errors
put it far outside the quadratic basin — the solver then spends tens of
damped iterations just untwisting the graph. The standard cure is chordal
initialization (Martinec & Pajdla 2007; Carlone et al., ICRA 2015
"Initialization techniques for 3D SLAM"): relax SO(3) to R^{3x3}, solve the
resulting LINEAR least squares for all rotations at once, project back to
SO(3), then solve translations — also linear given rotations.

The reference's g2o pipeline has no equivalent (graph_slam.cpp:353 runs LM
from whatever estimates the graph carries); this is a capability on top of
parity, and it is TPU-shaped: both relaxations are matrix-free CG solves
whose operator is two segment-sums over the SE3 edge table — the same data
layout the LM solver (graph/solve.py) already streams.

Only SE3 odometry/loop edges drive the initialization; priors, plane and
GPS edges are refinements LM handles well once the chordal estimate is in
the right basin. Fixed nodes (and, with no fixed node, the first valid
node) anchor both solves via a strong quadratic tie to their current
estimates, so gauge freedom never reaches CG.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils import se3
from .types import PoseGraphData

_ANCHOR_WEIGHT = 1.0e4  # soft equality tie for anchored nodes
_CG_ITERS = 128
_CG_TOL = 1.0e-6


def _cg(apply_A, b, x0, iters: int, tol: float):
    """Plain conjugate gradient on a flat operator; runs entirely on
    device inside the enclosing jit."""
    r0 = b - apply_A(x0)
    bnorm = jnp.maximum(jnp.sqrt(jnp.sum(b * b)), 1e-30)

    def cond(s):
        x, r, p, rs, it = s
        return (it < iters) & (jnp.sqrt(rs) > tol * bnorm)

    def body(s):
        x, r, p, rs, it = s
        Ap = apply_A(p)
        alpha = rs / jnp.maximum(jnp.sum(p * Ap), 1e-30)
        x = x + alpha * p
        r = r - alpha * Ap
        rs_new = jnp.sum(r * r)
        p = r + (rs_new / jnp.maximum(rs, 1e-30)) * p
        return x, r, p, rs_new, it + 1

    x, _, _, _, _ = jax.lax.while_loop(
        cond, body, (x0, r0, r0, jnp.sum(r0 * r0), jnp.int32(0)))
    return x


def _project_so3(M: jnp.ndarray) -> jnp.ndarray:
    """Nearest rotation to a near-orthogonal 3x3: Newton polar iteration
    R <- (R + R^{-T}) / 2, quadratically convergent.

    A vmapped `jnp.linalg.svd` here took >10 min to COMPILE on the remote
    TPU (the batched Jacobi SVD program explodes under Mosaic); eight
    cross-product-inverse Newton steps compile instantly and match SVD to
    f32 precision for the chordal estimates (which are already close to
    rotations). A degenerate det<=0 input (never produced by the relaxed
    system in practice) falls back to identity via the guard below."""
    d = jnp.linalg.det(M)
    M = jnp.where(jnp.abs(d) > 1e-6, M, jnp.eye(3, dtype=M.dtype))
    # flip improper solutions (det<0) to the nearest proper rotation basin
    M = jnp.where(d < 0, -M, M)

    def inv_t(R):
        """(R^{-1})^T of a general 3x3 via column cross products."""
        c0, c1, c2 = R[:, 0], R[:, 1], R[:, 2]
        det = jnp.dot(c0, jnp.cross(c1, c2))
        adj_rows = jnp.stack([jnp.cross(c1, c2), jnp.cross(c2, c0),
                              jnp.cross(c0, c1)])  # rows of inv*det
        return adj_rows.T / jnp.where(jnp.abs(det) > 1e-20, det, 1.0)

    def body(_, R):
        return 0.5 * (R + inv_t(R))

    return jax.lax.fori_loop(0, 8, body, M)


@jax.jit
def chordal_init(g: PoseGraphData) -> jnp.ndarray:
    """Return (N,7) poses re-initialized by chordal relaxation.

    Invalid (masked) and anchored nodes keep their current estimates
    exactly; everything else gets the relaxed rotation + linear
    translation solution. The caller feeds the result to the LM solver.
    """
    with jax.default_matmul_precision("highest"):
        return _chordal_body(g)


def _chordal_body(g: PoseGraphData) -> jnp.ndarray:
    e = g.se3
    n = g.poses.shape[0]
    w = e.mask.astype(jnp.float32)  # (E,)
    fi, ti = e.from_idx, e.to_idx

    valid = g.node_mask
    any_fixed = jnp.any(g.node_fixed & valid)
    first = jnp.argmax(valid.astype(jnp.int32))
    anchor = jnp.where(any_fixed, g.node_fixed & valid,
                       jnp.arange(n) == first)
    aw = anchor.astype(jnp.float32) * _ANCHOR_WEIGHT
    # nodes with no valid edge and no anchor would make the operator
    # singular; tie them (weakly) to their current estimate as well
    deg = (jnp.zeros(n, jnp.float32).at[fi].add(w).at[ti].add(w))
    loose = (valid & (deg == 0)).astype(jnp.float32)
    aw = aw + loose + (~valid).astype(jnp.float32)

    R_meas = jax.vmap(se3.quat_to_mat)(e.meas[:, 3:7])      # (E,3,3)
    R0 = jax.vmap(se3.quat_to_mat)(g.poses[:, 3:7])          # (N,3,3)
    t0 = g.poses[:, :3]

    # --- rotation relaxation over Y_i = R_i^T -------------------------
    # edge residual r_e = Y_to - R_e^T Y_from  (from R_to = R_from R_e);
    # normal-equation operator applies the transposed scatter of r_e.
    Y0 = jnp.swapaxes(R0, -1, -2)

    def apply_rot(Yf):
        Y = Yf.reshape(n, 3, 3)
        r = (Y[ti] - jnp.einsum("eba,ebc->eac", R_meas, Y[fi])) * w[:, None, None]
        out = jnp.zeros_like(Y)
        out = out.at[ti].add(r)
        out = out.at[fi].add(-jnp.einsum("eab,ebc->eac", R_meas, r))
        out = out + aw[:, None, None] * Y
        return out.reshape(-1)

    b_rot = (aw[:, None, None] * Y0).reshape(-1)
    Y = _cg(apply_rot, b_rot, Y0.reshape(-1), _CG_ITERS, _CG_TOL)
    R = jax.vmap(_project_so3)(jnp.swapaxes(Y.reshape(n, 3, 3), -1, -2))

    # --- translation: linear given rotations --------------------------
    # residual r_e = t_to - t_from - R_from t_e
    d = jnp.einsum("eab,eb->ea", R[fi], e.meas[:, :3]) * w[:, None]

    def apply_tr(Tf):
        T = Tf.reshape(n, 3)
        r = (T[ti] - T[fi]) * w[:, None]
        out = jnp.zeros_like(T)
        out = out.at[ti].add(r)
        out = out.at[fi].add(-r)
        out = out + aw[:, None] * T
        return out.reshape(-1)

    b_tr = (jnp.zeros((n, 3), jnp.float32).at[ti].add(d).at[fi].add(-d)
            + aw[:, None] * t0).reshape(-1)
    t = _cg(apply_tr, b_tr, t0.reshape(-1), _CG_ITERS, _CG_TOL).reshape(n, 3)

    q = jax.vmap(se3.mat_to_quat)(R)
    poses = jnp.concatenate([t, q], axis=1)
    keep = (anchor | ~valid)[:, None]
    return jnp.where(keep, g.poses, poses)
