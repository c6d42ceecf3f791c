"""Large-graph linear solver: segmented block-tridiagonal Cholesky + Woodbury.

The reference solves 10k+-node graphs through g2o's sparse cholmod LM
(src/mrg_slam/graph_slam.cpp:28-30,353; lm_var_cholmod). A dense (6N)^2
Hessian caps out around 1-2k nodes on one chip and block-Jacobi PCG stalls
on long graph diameters — this module is the exact solver between them,
designed for how SLAM Hessians are actually structured and for how the MXU
wants to compute:

  H + damping = T + U Uᵀ

- T: the block-tridiagonal part — odometry-chain SE3 edges (|from−to| = 1
  after the builder's insertion-ordered node ids), unary priors, plane
  block-diagonals, and the LM damping. Factored by a two-level Schur
  scheme: nodes are cut into S segments of K; each segment's (6(K−1))²
  dense interior is Cholesky-factored in ONE batched MXU call, interiors
  are eliminated onto the S separator nodes, and the reduced 6S×6S
  block-tridiagonal system is solved densely (tiny). This is the
  "supernodal Cholesky on the MXU" shape: thousands of tiny 6×6 blocks
  become S big dense panels.
- U Uᵀ: everything off-chain — loop closures, inter-robot edges,
  SE3-plane couplings, plane-plane constraints — enters as an exact
  low-rank correction (6 columns per coupling edge, U = J W^{1/2} rows at
  the edge's two endpoints) and is solved by the Woodbury identity:
      x = Y_b − Y_U (I + Uᵀ Y_U)⁻¹ Uᵀ Y_b,   Y_* = T⁻¹ [b, U].
  The capacity of the coupling set is a static bucket chosen host-side
  (next power of two over the live coupling-edge count), so the jitted
  program recompiles only when the loop count crosses a bucket.

Numerics: everything runs f32-highest with symmetric Jacobi equilibration
(the same trick dense_delta needs — raw pose-graph Hessians condition at
1e6+) plus one matrix-free iterative-refinement pass against the full
damped Hessian.

Cost at N=8192, K=64, m=256 couplings: 128 batched 378³ Cholesky panels
(~2.4 GFLOP), one (N,6,1+6m) multi-RHS T-solve, and one 1536² dense
Cholesky — milliseconds on the MXU where the dense path's 48k² Hessian
would not even fit in HBM.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import solve as S


class ChainAux(NamedTuple):
    """Host-classified coupling slots (traced; -1 ⇒ padding slot).

    Shapes are the static Woodbury buckets; values index into the
    corresponding edge tables of PoseGraphData."""

    se3_cidx: jnp.ndarray   # (m1,) i32 indices of non-chain SE3 edges
    pl_cidx: jnp.ndarray    # (m2,) i32 indices of SE3-plane edges
    qq_cidx: jnp.ndarray    # (m3,) i32 indices of plane-plane edges


def _bucket(n: int, lo: int = 8) -> int:
    """Static Woodbury capacity: next multiple of 16 (pow2 below 16).

    The multi-RHS T-solve cost scales with 6*bucket columns, so pow2
    padding was paying up to 2x (65 live couplings -> 128 slots -> 769
    RHS columns; multiples of 16 -> 80 slots -> 481). A growing live
    graph recompiles the solve every 16 new loop closures, acceptable at
    the graph sizes that choose this backend."""
    if n <= lo:
        return lo
    if n <= 16:
        return 16
    return ((n + 15) // 16) * 16


def classify(from_idx: np.ndarray, to_idx: np.ndarray, mask: np.ndarray,
             n_plane_edges: int, n_plane_plane: int,
             pl_mask: Optional[np.ndarray] = None,
             qq_mask: Optional[np.ndarray] = None) -> ChainAux:
    """Host-side coupling classification (numpy staging buffers).

    A live SE3 edge is 'chain' iff |from−to| == 1 — true for odometry
    edges under the builder's insertion-ordered ids (including per-robot
    runs in a merged multi-robot graph; edges that straddle another
    robot's interleaved id block simply become coupling columns, which is
    correct, only marginally more work). Everything else — loops,
    inter-robot edges, anchors attached non-adjacently — couples."""
    live = np.flatnonzero(mask & (np.abs(from_idx - to_idx) != 1))
    m1 = _bucket(len(live))
    se3_c = np.full(m1, -1, np.int32)
    se3_c[: len(live)] = live
    pl_live = (np.flatnonzero(pl_mask) if pl_mask is not None
               else np.arange(n_plane_edges))
    m2 = _bucket(len(pl_live), lo=1) if len(pl_live) else 1
    pl_c = np.full(m2, -1, np.int32)
    pl_c[: len(pl_live)] = pl_live
    qq_live = (np.flatnonzero(qq_mask) if qq_mask is not None
               else np.arange(n_plane_plane))
    m3 = _bucket(len(qq_live), lo=1) if len(qq_live) else 1
    qq_c = np.full(m3, -1, np.int32)
    qq_c[: len(qq_live)] = qq_live
    return ChainAux(se3_cidx=jnp.asarray(se3_c), pl_cidx=jnp.asarray(pl_c),
                    qq_cidx=jnp.asarray(qq_c))


def _sym_sqrt(W: jnp.ndarray) -> jnp.ndarray:
    """Batched factor G with G Gᵀ = W (+ tiny ridge), via Cholesky.

    The Woodbury correction only needs ANY factorization of the edge's
    effective information, not the symmetric sqrt. NOT eigh/svd: a
    vmapped small eigh takes >10 min to COMPILE on the remote TPU (same
    Mosaic pathology as graph/chordal.py documents for svd; observed
    again here — the probe hung >25 min until this was Cholesky-ified).
    The ridge (1e-12 absolute + 1e-7 relative) keeps rank-deficient W
    (e.g. XY priors with zero z-information, zero-masked padding slots)
    factorizable; the resulting ~1e-7 relative error in U Uᵀ is absorbed
    by chain_delta's iterative-refinement pass against the true H."""
    d = W.shape[-1]
    tr = jnp.trace(W, axis1=-2, axis2=-1)[..., None, None]
    eye = jnp.eye(d, dtype=W.dtype)
    return jnp.linalg.cholesky(W + (1e-12 + 1e-7 * tr / d) * eye)


class ChainFactors(NamedTuple):
    """With `axis_name` set (distributed factorization) cholA/E/F hold only
    the LOCAL shard's segment panels — (Sg/n_shards, ...) — while cholR
    and Tp_inv stay replicated."""

    cholA: jnp.ndarray     # (Sg[_loc], mi, mi) per-segment interior Cholesky
    E: jnp.ndarray         # (Sg[_loc], mi, 12) interior->[left,right] seps
    F: jnp.ndarray         # (Sg[_loc], mi, 12) A^{-1} E
    cholR: jnp.ndarray     # (6*Sg, 6*Sg) reduced separator Cholesky
    Tp_inv: jnp.ndarray    # (P, 3, 3) plane-block inverses


def _my_shard(axis_name) -> jnp.ndarray:
    return jax.lax.axis_index(axis_name) if axis_name else jnp.int32(0)


def _scatter_psum(local: jnp.ndarray, seg0, Sg: int, axis_name):
    """Place this shard's segment-panel rows at their global offset and
    psum — the collective that assembles a replicated per-segment array
    from per-device panels (each device owns a disjoint slice, so the sum
    IS the concatenation)."""
    full = jnp.zeros((Sg,) + local.shape[1:], local.dtype)
    full = jax.lax.dynamic_update_slice_in_dim(full, local, seg0, 0)
    return jax.lax.psum(full, axis_name) if axis_name else full


def _chain_T(g, lin, lam, d_n, d_p, free_n, free_p):
    """Block-tridiagonal T (+ plane block-diagonal), damped + projected.

    Returns (Td (N,6,6), Toff (N,6,6) with Toff[i] = T[i, i+1] and
    Toff[N−1] = 0, Tp (P,3,3))."""
    n, p = g.n_nodes, g.n_planes
    Td = jnp.zeros((n, 6, 6), jnp.float32)
    Toff = jnp.zeros((n, 6, 6), jnp.float32)

    if S._has(g.se3):
        f, t = g.se3.from_idx, g.se3.to_idx
        chain = g.se3.mask & (jnp.abs(f - t) == 1)
        Wc = lin.W_se3 * chain[:, None, None]
        WJi = jnp.einsum("eab,ebj->eaj", Wc, lin.Ji)
        WJj = jnp.einsum("eab,ebj->eaj", Wc, lin.Jj)
        Td += jax.ops.segment_sum(
            jnp.einsum("eai,eaj->eij", lin.Ji, WJi), f, num_segments=n)
        Td += jax.ops.segment_sum(
            jnp.einsum("eai,eaj->eij", lin.Jj, WJj), t, num_segments=n)
        # off-diagonal block H[lo, hi]: J_lo^T W J_hi at slot lo
        lo = jnp.minimum(f, t)
        from_is_lo = f < t
        Hlh = jnp.where(from_is_lo[:, None, None],
                        jnp.einsum("eai,eaj->eij", lin.Ji, WJj),
                        jnp.einsum("eai,eaj->eij", lin.Jj, WJi))
        Toff = Toff.at[lo].add(Hlh)
    if S._has(g.priors):
        WJp = jnp.einsum("eab,ebj->eaj", lin.W_pr, lin.Jp)
        Td += jax.ops.segment_sum(
            jnp.einsum("eai,eaj->eij", lin.Jp, WJp),
            g.priors.node_idx, num_segments=n)

    # damping (lam * diag(H_full) + 1e-6, like dense_delta) + projection
    damp_n = (lam * d_n + 1e-6) * free_n[:, 0:1]
    Td = (Td * (free_n[:, :, None] * free_n[:, None, :])
          + jnp.eye(6) * (1.0 - free_n[:, 0, None, None])
          + jnp.vectorize(jnp.diag, signature="(k)->(k,k)")(damp_n))
    both_free = (free_n[:-1, 0] * free_n[1:, 0])
    Toff = Toff.at[:-1].multiply(both_free[:, None, None])
    Toff = Toff.at[-1].set(0.0)

    Tp = jnp.zeros((p, 3, 3), jnp.float32)
    if p:
        if S._has(g.plane_priors):
            WJpp = jnp.einsum("eab,ebj->eaj", lin.W_pp, lin.Jpp)
            Tp += jax.ops.segment_sum(
                jnp.einsum("eai,eaj->eij", lin.Jpp, WJpp),
                g.plane_priors.plane_idx, num_segments=p)
        damp_p = (lam * d_p + 1e-6) * free_p[:, 0:1]
        Tp = (Tp * (free_p[:, :, None] * free_p[:, None, :])
              + jnp.eye(3) * (1.0 - free_p[:, 0, None, None])
              + jnp.vectorize(jnp.diag, signature="(k)->(k,k)")(damp_p))
    return Td, Toff, Tp


def _factor_T(Td, Toff, Tp, K: int, axis_name=None,
              n_shards: int = 1) -> ChainFactors:
    """Two-level factorization of block-tridiagonal T.

    Segments of K nodes; interiors = first K−1 nodes per segment,
    separators = each segment's last node. Batched dense interior
    Cholesky -> Schur onto separators -> dense reduced Cholesky.

    Distributed (`axis_name` set): the segment panels shard over the mesh
    axis — each device Cholesky-factors its Sg/n_shards interior panels
    (the FLOPs of the factorization) from the replicated Td/Toff, the
    per-segment Schur contributions G are psum-assembled, and the tiny
    6S×6S reduced separator system (the Schur complement onto the
    separators) is factored replicated on every device. This is the
    survey's 'distributed Gauss-Newton with Schur complement + psum +
    solve on the reduced system' (SURVEY.md §2.7) applied to the chain
    backend — the cholmod-at-any-size replacement
    (graph_slam.cpp:28-30,353)."""
    n = Td.shape[0]
    assert n % K == 0, (n, K)
    Sg, mi = n // K, 6 * (K - 1)
    assert Sg % n_shards == 0, (Sg, n_shards)
    Sg_loc = Sg // n_shards
    seg0 = _my_shard(axis_name) * Sg_loc
    segs = seg0 + jnp.arange(Sg_loc)                  # global segment ids

    # this shard's dense interior matrices (Sg_loc, K-1, K-1, 6, 6)
    Td_loc = jax.lax.dynamic_slice_in_dim(Td, seg0 * K, Sg_loc * K, 0)
    Toff_loc = jax.lax.dynamic_slice_in_dim(Toff, seg0 * K, Sg_loc * K, 0)
    Dseg = Td_loc.reshape(Sg_loc, K, 6, 6)[:, : K - 1]
    Oseg = (Toff_loc.reshape(Sg_loc, K, 6, 6)[:, : K - 2]
            if K > 2 else None)
    A = jnp.zeros((Sg_loc, K - 1, K - 1, 6, 6), jnp.float32)
    ii = jnp.arange(K - 1)
    A = A.at[:, ii, ii].set(Dseg)
    if K > 2:
        jj = jnp.arange(K - 2)
        A = A.at[:, jj, jj + 1].set(Oseg)
        A = A.at[:, jj + 1, jj].set(
            jnp.swapaxes(Oseg, -1, -2))
    A = A.transpose(0, 1, 3, 2, 4).reshape(Sg_loc, mi, mi)
    cholA = jnp.linalg.cholesky(A)

    # interior -> separator couplings E (Sg_loc, mi, 12): cols 0:6 left
    # sep (segment s-1's last node, via Toff[sK-1]ᵀ at interior row 0),
    # cols 6:12 right sep (own last node, via Toff[sK+K-2] at row K-2)
    left = Toff[jnp.maximum(segs * K - 1, 0)]
    left = left * (segs > 0)[:, None, None]
    right = Toff_loc.reshape(Sg_loc, K, 6, 6)[:, K - 2]
    E = jnp.zeros((Sg_loc, K - 1, 6, 12), jnp.float32)
    E = E.at[:, 0, :, 0:6].set(jnp.swapaxes(left, -1, -2))
    E = E.at[:, K - 2, :, 6:12].set(right)
    E = E.reshape(Sg_loc, mi, 12)
    F = jax.scipy.linalg.cho_solve((cholA, True), E)

    # reduced separator system (block-tridiagonal, assembled dense):
    # per-shard Schur contributions psum into the replicated G
    G = _scatter_psum(jnp.einsum("sic,sid->scd", E, F), seg0, Sg,
                      axis_name)                      # (Sg, 12, 12)
    sep = Td.reshape(Sg, K, 6, 6)[:, K - 1]           # (Sg, 6, 6)
    Rd = sep - G[:, 6:12, 6:12]
    Rd = Rd.at[:-1].add(-G[1:, 0:6, 0:6])
    Ro = -G[:, 0:6, 6:12]                             # R[s-1, s] for s>=1
    R = jnp.zeros((Sg, Sg, 6, 6), jnp.float32)
    ss = jnp.arange(Sg)
    R = R.at[ss, ss].set(Rd)
    R = R.at[ss[:-1], ss[:-1] + 1].set(Ro[1:])
    R = R.at[ss[:-1] + 1, ss[:-1]].set(jnp.swapaxes(Ro[1:], -1, -2))
    R = R.transpose(0, 2, 1, 3).reshape(6 * Sg, 6 * Sg)
    cholR = jnp.linalg.cholesky(R)

    Tp_inv = S._inv_sym(Tp, ridge=0.0) if Tp.shape[0] else Tp
    return ChainFactors(cholA=cholA, E=E, F=F, cholR=cholR, Tp_inv=Tp_inv)


def _solve_T(fac: ChainFactors, b_n: jnp.ndarray, b_p: jnp.ndarray,
             K: int, axis_name=None,
             n_shards: int = 1) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """T^{-1} applied to stacked RHS b_n (N, 6, k), b_p (P, 3, k).

    Distributed: interior forward/backward substitutions run on each
    shard's local segment panels; the separator RHS reductions and the
    back-substituted interiors psum-assemble into the replicated result
    (two collectives per application)."""
    n, _, k = b_n.shape
    Sg, mi = n // K, 6 * (K - 1)
    Sg_loc = Sg // n_shards
    seg0 = _my_shard(axis_name) * Sg_loc
    b_loc = jax.lax.dynamic_slice_in_dim(b_n, seg0 * K, Sg_loc * K, 0)
    b_int = b_loc.reshape(Sg_loc, K, 6, k)[:, : K - 1].reshape(
        Sg_loc, mi, k)
    b_sep = b_n.reshape(Sg, K, 6, k)[:, K - 1]        # (Sg, 6, k) repl.

    y = jax.scipy.linalg.cho_solve((fac.cholA, True), b_int)
    r_red = _scatter_psum(jnp.einsum("sic,sik->sck", fac.E, y), seg0, Sg,
                          axis_name)                  # (Sg, 12, k)
    r_sep = b_sep - r_red[:, 6:12]
    r_sep = r_sep.at[:-1].add(-r_red[1:, 0:6])
    x_sep = jax.scipy.linalg.cho_solve(
        (fac.cholR, True), r_sep.reshape(6 * Sg, k)).reshape(Sg, 6, k)
    # gather [left, right] separator values per segment
    x_left = jnp.concatenate([jnp.zeros((1, 6, k)), x_sep[:-1]], axis=0)
    x_lr = jnp.concatenate([x_left, x_sep], axis=1)   # (Sg, 12, k)
    x_lr_loc = jax.lax.dynamic_slice_in_dim(x_lr, seg0, Sg_loc, 0)
    x_int_loc = y - jnp.einsum("sic,sck->sik", fac.F, x_lr_loc)
    x_int = _scatter_psum(x_int_loc.reshape(Sg_loc, K - 1, 6, k), seg0,
                          Sg, axis_name)
    x_n = jnp.concatenate([x_int, x_sep[:, None]], axis=1).reshape(n, 6, k)
    x_p = (jnp.einsum("pij,pjk->pik", fac.Tp_inv, b_p)
           if b_p.shape[0] else b_p)
    return x_n, x_p


def _coupling_U(g, lin, aux: ChainAux, free_n, free_p):
    """The Woodbury correction columns, kept factored by edge endpoint.

    Each coupling edge c contributes a 6-wide column block with rows
    Uf[c] = J_fromᵀ W^{1/2} at its 'from' node and Ut[c] at 'to' (plane
    families analogously, zero-padded to width 6). Padding slots (-1)
    get zero via their sqrt of a zero-masked W."""
    parts = []  # (kind, idx_a, Ua (m,da,6), idx_b | None, Ub)
    m1 = aux.se3_cidx.shape[0]
    if S._has(g.se3) and m1:
        e = jnp.maximum(aux.se3_cidx, 0)
        valid = (aux.se3_cidx >= 0) & g.se3.mask[e]
        Wh = _sym_sqrt(lin.W_se3[e] * valid[:, None, None])
        f, t = g.se3.from_idx[e], g.se3.to_idx[e]
        Uf = jnp.einsum("eai,eab->eib", lin.Ji[e], Wh) * free_n[f][:, :, None]
        Ut = jnp.einsum("eai,eab->eib", lin.Jj[e], Wh) * free_n[t][:, :, None]
        parts.append(("nn", f, Uf, t, Ut))
    m2 = aux.pl_cidx.shape[0]
    if S._has(g.plane_edges) and m2:
        e = jnp.maximum(aux.pl_cidx, 0)
        valid = (aux.pl_cidx >= 0) & g.plane_edges.mask[e]
        Wh3 = _sym_sqrt(lin.W_pl[e] * valid[:, None, None])   # (m,3,3)
        Wh = jnp.zeros((m2, 3, 6), jnp.float32).at[:, :, :3].set(Wh3)
        ni, pi = g.plane_edges.node_idx[e], g.plane_edges.plane_idx[e]
        Un = (jnp.einsum("eai,eab->eib", lin.Jpl_pose[e], Wh)
              * free_n[ni][:, :, None])
        Up = (jnp.einsum("eai,eab->eib", lin.Jpl_plane[e], Wh)
              * free_p[pi][:, :, None])
        parts.append(("np", ni, Un, pi, Up))
    m3 = aux.qq_cidx.shape[0]
    if S._has(g.plane_plane) and m3:
        e = jnp.maximum(aux.qq_cidx, 0)
        valid = (aux.qq_cidx >= 0) & g.plane_plane.mask[e]
        Wh4 = _sym_sqrt(lin.W_qq[e] * valid[:, None, None])   # (m,4,4)
        Wh = jnp.zeros((m3, 4, 6), jnp.float32).at[:, :, :4].set(Wh4)
        a, b = g.plane_plane.from_idx[e], g.plane_plane.to_idx[e]
        Ua = (jnp.einsum("eai,eab->eib", lin.Jqq_a[e], Wh)
              * free_p[a][:, :, None])
        Ub = (jnp.einsum("eai,eab->eib", lin.Jqq_b[e], Wh)
              * free_p[b][:, :, None])
        parts.append(("pp", a, Ua, b, Ub))
    return parts


def _U_dense(parts, n, p, mtot):
    """Materialize U as RHS stacks: (N,6,6m) node rows, (P,3,6m) plane."""
    U_n = jnp.zeros((n, 6, 6 * mtot), jnp.float32)
    U_p = jnp.zeros((p, 3, 6 * mtot), jnp.float32)
    off = 0
    for kind, ia, Ua, ib, Ub in parts:
        m = Ua.shape[0]
        cols = off * 6 + jnp.arange(m)[:, None] * 6 + jnp.arange(6)[None, :]
        if kind == "nn":
            U_n = U_n.at[ia[:, None, None], jnp.arange(6)[None, :, None],
                         cols[:, None, :]].add(Ua)
            U_n = U_n.at[ib[:, None, None], jnp.arange(6)[None, :, None],
                         cols[:, None, :]].add(Ub)
        elif kind == "np":
            U_n = U_n.at[ia[:, None, None], jnp.arange(6)[None, :, None],
                         cols[:, None, :]].add(Ua)
            U_p = U_p.at[ib[:, None, None], jnp.arange(3)[None, :, None],
                         cols[:, None, :]].add(Ub)
        else:
            U_p = U_p.at[ia[:, None, None], jnp.arange(3)[None, :, None],
                         cols[:, None, :]].add(Ua)
            U_p = U_p.at[ib[:, None, None], jnp.arange(3)[None, :, None],
                         cols[:, None, :]].add(Ub)
        off += m
    return U_n, U_p


def _Ut_dot(parts, Y_n, Y_p):
    """Uᵀ @ Y using U's two-endpoint sparsity; Y_n (N,6,k) -> (6m, k)."""
    outs = []
    for kind, ia, Ua, ib, Ub in parts:
        Ya = Y_n[ia] if kind in ("nn", "np") else Y_p[ia]
        Yb = Y_p[ib] if kind in ("np", "pp") else Y_n[ib]
        o = (jnp.einsum("eic,eik->eck", Ua, Ya)
             + jnp.einsum("eic,eik->eck", Ub, Yb))    # (m, 6, k)
        outs.append(o.reshape(-1, o.shape[-1]))
    return jnp.concatenate(outs, axis=0)


def chain_delta(g, lin, lam, aux: ChainAux, K: int, axis_name=None,
                n_shards: int = 1):
    """Exact damped Newton step via T+UUᵀ Woodbury.

    Drop-in for dense_delta inside the LM body: returns
    (dx_n (N,6), dx_p (P,3), predicted_reduction, grad_inf_norm).

    With `axis_name` (inside a shard_map whose graph inputs are
    REPLICATED — not edge-sharded) the segment panels of the
    factorization and of every T-solve shard over the mesh axis; the O(E)
    linearization reductions stay replicated, which is cheap next to the
    panel Cholesky + multi-RHS Woodbury solves that dominate past the
    dense envelope."""
    n, p = g.n_nodes, g.n_planes
    free_n, free_p = S._free_masks(g)

    D_n, D_p = S.block_diagonal(g, lin)
    d_n = jnp.diagonal(D_n, axis1=-2, axis2=-1)
    d_p = jnp.diagonal(D_p, axis1=-2, axis2=-1)
    g_n, g_p = S.gradient(g, lin)
    gnorm = jnp.max(jnp.abs(g_n))
    if p:
        gnorm = jnp.maximum(gnorm, jnp.max(jnp.abs(g_p)))

    # symmetric Jacobi equilibration in the damped metric (same role as
    # dense_delta's rescale: f32 Cholesky on raw SLAM Hessians stalls LM)
    sc_n = jax.lax.rsqrt(jnp.maximum((1 + lam) * d_n + 1e-6, 1e-12)) * free_n
    sc_n = jnp.where(free_n > 0, sc_n, 1.0)
    sc_p = jax.lax.rsqrt(jnp.maximum((1 + lam) * d_p + 1e-6, 1e-12)) * free_p
    sc_p = jnp.where(free_p > 0, sc_p, 1.0)

    Td, Toff, Tp = _chain_T(g, lin, lam, d_n, d_p, free_n, free_p)
    Td = Td * sc_n[:, :, None] * sc_n[:, None, :]
    Toff = Toff * sc_n[:, :, None] * jnp.roll(sc_n, -1, 0)[:, None, :]
    if p:
        Tp = Tp * sc_p[:, :, None] * sc_p[:, None, :]
    fac = _factor_T(Td, Toff, Tp, K, axis_name=axis_name,
                    n_shards=n_shards)

    parts = _coupling_U(g, lin, aux, free_n, free_p)
    # scale U rows like b: U' = S U
    parts = [(kind,
              ia, Ua * ((sc_n if kind in ("nn", "np") else sc_p)[ia]
                        )[:, :, None],
              ib, Ub * ((sc_p if kind in ("np", "pp") else sc_n)[ib]
                        )[:, :, None])
             for kind, ia, Ua, ib, Ub in parts]
    mtot = sum(pt[2].shape[0] for pt in parts)

    b_n, b_p = -g_n * sc_n, -g_p * sc_p

    def wsolve(r_n, r_p):
        """(T̂ + Û Ûᵀ)^{-1} [r] in the scaled space."""
        if mtot:
            U_n, U_p = _U_dense(parts, n, p, mtot)
            rhs_n = jnp.concatenate([r_n[:, :, None], U_n], axis=2)
            rhs_p = jnp.concatenate([r_p[:, :, None], U_p], axis=2)
            Y_n, Y_p = _solve_T(fac, rhs_n, rhs_p, K, axis_name=axis_name,
                                n_shards=n_shards)
            UtY = _Ut_dot(parts, Y_n, Y_p)            # (6m, 1+6m)
            Smat = jnp.eye(6 * mtot) + UtY[:, 1:]
            z = jnp.linalg.solve(Smat, UtY[:, 0])
            x_n = Y_n[:, :, 0] - jnp.einsum("nic,c->ni", Y_n[:, :, 1:], z)
            x_p = (Y_p[:, :, 0] - jnp.einsum("pic,c->pi", Y_p[:, :, 1:], z)
                   if p else r_p)
            return x_n, x_p
        x_n, x_p = _solve_T(fac, r_n[:, :, None], r_p[:, :, None], K,
                            axis_name=axis_name, n_shards=n_shards)
        return x_n[:, :, 0], x_p[:, :, 0]

    x_n, x_p = wsolve(b_n, b_p)

    # one iterative-refinement pass against the full damped Hessian
    # (matrix-free), in the scaled space: Ĥ v = S H S v + damping
    hvp = S.make_hvp(g, lin)

    def H_hat(v_n, v_p):
        h_n, h_p = hvp(v_n * sc_n, v_p * sc_p)
        h_n = h_n * sc_n + ((lam * d_n + 1e-6) * sc_n * sc_n) * v_n
        h_p = h_p * sc_p + ((lam * d_p + 1e-6) * sc_p * sc_p) * v_p
        # projected-out dofs carry unit diagonal in T̂
        h_n = h_n + (1.0 - (free_n > 0)) * v_n
        h_p = h_p + (1.0 - (free_p > 0)) * v_p
        return h_n, h_p

    Hx_n, Hx_p = H_hat(x_n, x_p)
    r_n, r_p = b_n - Hx_n, b_p - Hx_p
    e_n, e_p = wsolve(r_n, r_p)
    x_n, x_p = x_n + e_n, x_p + e_p

    dx_n = x_n * sc_n * (free_n > 0)
    dx_p = x_p * sc_p * (free_p > 0) if p else jnp.zeros((p, 3))
    pred = (jnp.sum(dx_n * (lam * d_n * dx_n - g_n))
            + (jnp.sum(dx_p * (lam * d_p * dx_p - g_p)) if p else 0.0))
    return dx_n, dx_p, pred, gnorm


def chain_marginals(g, aux: ChainAux, K: int) -> jnp.ndarray:
    """Per-node 6x6 covariance blocks — diag of H^{-1} — via the SAME
    segmented factorization + Woodbury identity the chain step uses.

    The reference computes exact sparse marginals at any graph size
    through g2o/cholmod (graph_slam.cpp:401-425); the dense path here
    caps at ~4k dofs and the batched-CG selected inverse pays hundreds of
    Hv sweeps. This reuses the chain structure directly (lam=0):

      H^{-1} = T^{-1} - Y S^{-1} Y^T,   Y = T^{-1} U,  S = I + U^T Y

    with the block-tridiagonal T^{-1} diagonal recovered from the
    two-level factors (interior blocks A^{-1} + F Sigma_lr F^T, separator
    blocks read off the reduced inverse R^{-1}) and the coupling
    correction evaluated only at the diagonal. The 1e-6 relative ridge
    built into T (vs the dense path's 1e-9 absolute) makes weakly
    constrained dofs marginally more conservative; well-constrained
    blocks agree with the dense inverse (validated at 512 nodes in
    tests/test_chain_solver.py).

    Returns (N, 6, 6); fixed/invalid nodes get zero covariance.
    """
    n, p = g.n_nodes, g.n_planes
    lin = S.linearize(g)
    free_n, free_p = S._free_masks(g)
    D_n, D_p = S.block_diagonal(g, lin)
    d_n = jnp.diagonal(D_n, axis1=-2, axis2=-1)
    d_p = jnp.diagonal(D_p, axis1=-2, axis2=-1)

    sc_n = jax.lax.rsqrt(jnp.maximum(d_n + 1e-6, 1e-12)) * free_n
    sc_n = jnp.where(free_n > 0, sc_n, 1.0)
    sc_p = jax.lax.rsqrt(jnp.maximum(d_p + 1e-6, 1e-12)) * free_p
    sc_p = jnp.where(free_p > 0, sc_p, 1.0)

    lam = jnp.float32(0.0)
    Td, Toff, Tp = _chain_T(g, lin, lam, d_n, d_p, free_n, free_p)
    Td = Td * sc_n[:, :, None] * sc_n[:, None, :]
    Toff = Toff * sc_n[:, :, None] * jnp.roll(sc_n, -1, 0)[:, None, :]
    if p:
        Tp = Tp * sc_p[:, :, None] * sc_p[:, None, :]
    fac = _factor_T(Td, Toff, Tp, K)

    Sg, mi = n // K, 6 * (K - 1)
    # ---- diag blocks of T^{-1} -------------------------------------
    # separators: all 6x6 blocks of the reduced inverse R^{-1}
    Rinv = jax.scipy.linalg.cho_solve((fac.cholR, True),
                                      jnp.eye(6 * Sg, dtype=jnp.float32))
    Rb = Rinv.reshape(Sg, 6, Sg, 6).transpose(0, 2, 1, 3)  # (Sg,Sg,6,6)
    ss = jnp.arange(Sg)
    sep_cov = Rb[ss, ss]                                   # (Sg, 6, 6)
    # per-segment [left,right] separator covariance (12, 12); segment 0
    # has no left separator -> zero rows/cols there
    sm1 = jnp.maximum(ss - 1, 0)
    has_left = (ss > 0).astype(jnp.float32)[:, None, None]
    ll = Rb[sm1, sm1] * has_left
    lr = Rb[sm1, ss] * has_left
    rr = sep_cov
    Slr = jnp.concatenate([
        jnp.concatenate([ll, lr], axis=2),
        jnp.concatenate([jnp.swapaxes(lr, -1, -2), rr], axis=2)], axis=1)
    # interiors: diag blocks of A^{-1} plus the separator feedback
    Ainv = jax.scipy.linalg.cho_solve(
        (fac.cholA, True), jnp.broadcast_to(jnp.eye(mi, dtype=jnp.float32),
                                            (Sg, mi, mi)))
    Ab = Ainv.reshape(Sg, K - 1, 6, K - 1, 6)
    kk = jnp.arange(K - 1)
    Aind = Ab[:, kk, :, kk].transpose(1, 0, 2, 3)          # (Sg, K-1, 6, 6)
    Fseg = fac.F.reshape(Sg, K - 1, 6, 12)
    corr_int = jnp.einsum("skic,scd,skjd->skij", Fseg, Slr, Fseg)
    int_cov = Aind + corr_int                              # (Sg, K-1, 6, 6)
    covT = jnp.concatenate([int_cov, sep_cov[:, None]], axis=1
                           ).reshape(n, 6, 6)

    # ---- Woodbury correction at the diagonal -----------------------
    parts = _coupling_U(g, lin, aux, free_n, free_p)
    parts = [(kind,
              ia, Ua * ((sc_n if kind in ("nn", "np") else sc_p)[ia]
                        )[:, :, None],
              ib, Ub * ((sc_p if kind in ("np", "pp") else sc_n)[ib]
                        )[:, :, None])
             for kind, ia, Ua, ib, Ub in parts]
    mtot = sum(pt[2].shape[0] for pt in parts)
    if mtot:
        U_n, U_p = _U_dense(parts, n, p, mtot)
        Y_n, Y_p = _solve_T(fac, U_n, U_p, K)
        Smat = (jnp.eye(6 * mtot, dtype=jnp.float32)
                + _Ut_dot(parts, Y_n, Y_p))
        cfS = jax.scipy.linalg.cho_factor(
            0.5 * (Smat + Smat.T) + 1e-9 * jnp.eye(6 * mtot))
        Z = jax.scipy.linalg.cho_solve(
            cfS, Y_n.reshape(n * 6, 6 * mtot).T).T.reshape(n, 6, 6 * mtot)
        covT = covT - jnp.einsum("nic,njc->nij", Y_n, Z)

    cov = covT * sc_n[:, :, None] * sc_n[:, None, :]
    return cov * (free_n > 0)[:, :, None]


@functools.partial(jax.jit, static_argnames=("K",))
def chain_marginals_jit(g, aux: ChainAux, K: int) -> jnp.ndarray:
    # same bf16 hazard as the step solver: everything f32-highest
    with jax.default_matmul_precision("highest"):
        return chain_marginals(g, aux, K)
