"""Batched point-cloud registration: ICP / GICP / VGICP / NDT as Gauss-Newton.

This is the TPU re-design of the reference's registration factory
(src/mrg_slam/registrations.cpp) and of the small_gicp/fast_gicp/pclomp
engines behind it. One shared weighted-correspondence Gauss-Newton core:

    minimize  sum_i  r_i^T W_i r_i,     r_i = q_i - T p_i

with method-specific correspondence + weight rules:

- ICP        q = 1-NN point,            W = I
- GICP       q = 1-NN point,            W = (C_q + R C_p R^T)^-1
             (SMALL_GICP / FAST_GICP / GICP_OMP semantics; per-point
             covariances from kNN, plane-regularized — covariance.py)
- VGICP      q = voxel-Gaussian mean,   W = (C_vox + R C_p R^T)^-1
             (FAST_VGICP semantics; gaussian_voxel.py target)
- NDT        q = voxel-Gaussian mean,   W = C_vox^-1
             (pclomp NDT P2D semantics with DIRECT1/7/27 association)

Everything is fixed-shape: invalid source lanes and gated correspondences
carry zero weight. The whole `align` is one jitted `lax.while_loop`, and is
`vmap`-compatible for batched loop-closure candidate matching (the
reference matches candidates serially, loop_detector.cpp:97-188; here they
run as one batched program).

Jacobian convention (right perturbation, T <- T * exp(xi), xi = [rho, theta]):
    r(xi) ~= r0 - R rho + R skew(p) theta   =>   J = [-R, R skew(p)]
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import RegistrationConfig
from ..utils import se3
from . import knn
from .cloud import PointCloud
from .covariance import (GICPCloud, estimate_covariances,
                         estimate_covariances_radius, inv3x3)
from .gaussian_voxel import GaussianVoxelMap, build_gaussian_voxel_map, lookup


def _covariances(cloud: PointCloud, params) -> GICPCloud:
    if params.reg_covariance_mode == "radius":
        return estimate_covariances_radius(
            cloud, radius=params.reg_covariance_radius)
    return estimate_covariances(cloud,
                                k=params.reg_correspondence_randomness)


# ---------------------------------------------------------------------------
# static/traced parameter split
# ---------------------------------------------------------------------------
# Changing ANY field of a config dataclass used as a jit static argument
# invalidates every cached program (the round-1 suite paid ~17 min of
# recompiles for a single default change; on the remote TPU each program
# costs 30-90 s to rebuild). Only the fields that change program STRUCTURE
# stay static — method dispatch, kNN size (a shape), branch flags. All
# numeric thresholds ride as traced scalars, so runs differing only in
# epsilons/radii/iteration caps share one compiled program.

_REG_STATIC = ("registration_method", "reg_use_reciprocal_correspondences",
               "reg_correspondence_randomness", "reg_nn_search_method",
               "reg_covariance_mode", "reg_coarse_stride")
_REG_DYN_F32 = ("reg_transformation_epsilon",
                "reg_max_correspondence_distance", "reg_resolution",
                "reg_covariance_radius", "reg_ndt_outlier_ratio",
                "reg_stall_epsilon")


class RegView:
    """Mixed static/traced view of RegistrationConfig used inside traces."""

    def __init__(self, stat: tuple, dyn: dict):
        for f, v in zip(_REG_STATIC, stat):
            setattr(self, f, v)
        for f, v in dyn.items():
            setattr(self, f, v)


def split_reg(params: RegistrationConfig):
    """-> (hashable static tuple, traced scalar pytree)."""
    stat = tuple(getattr(params, f) for f in _REG_STATIC)
    dyn = {f: jnp.float32(getattr(params, f)) for f in _REG_DYN_F32}
    dyn["reg_maximum_iterations"] = jnp.int32(params.reg_maximum_iterations)
    dyn["reg_coarse_iterations"] = jnp.int32(params.reg_coarse_iterations)
    return stat, dyn


class RegistrationResult(NamedTuple):
    pose: jnp.ndarray        # (7,) final estimate
    converged: jnp.ndarray   # bool: epsilon-criteria hit within max iters
    iterations: jnp.ndarray  # int32
    error: jnp.ndarray       # mean weighted (Mahalanobis) error per inlier
    num_inliers: jnp.ndarray  # int32 gated correspondences at the solution
    hessian: jnp.ndarray     # (6,6) Gauss-Newton Hessian at the solution


class RegistrationTarget(NamedTuple):
    """Union target: dense GICP cloud and/or voxel-Gaussian map."""

    gicp: Optional[GICPCloud] = None
    voxels: Optional[GaussianVoxelMap] = None


def is_gicp_like(method: str) -> bool:
    return method in ("SMALL_GICP", "FAST_GICP", "GICP", "GICP_OMP", "ICP")


def covariance_compatible(a, b) -> bool:
    """True when `make_source(cloud, a)` and `make_source(cloud, b)` yield
    identical covariances — the gate for reusing a front-end's per-scan
    GICP covariances as the back-end's per-keyframe cache
    (models/backend.py process_scan source_covs)."""
    ga, gb = is_gicp_like(a.registration_method), is_gicp_like(
        b.registration_method)
    if not (ga and gb):
        return False
    ia, ib = a.registration_method == "ICP", b.registration_method == "ICP"
    if ia != ib:
        return False
    if ia:
        return True  # both identity covariances
    if a.reg_covariance_mode != b.reg_covariance_mode:
        return False
    if a.reg_covariance_mode == "radius":
        return a.reg_covariance_radius == b.reg_covariance_radius
    return (a.reg_correspondence_randomness
            == b.reg_correspondence_randomness)


def make_target(cloud: PointCloud, params: RegistrationConfig,
                voxel_capacity: int = 16384) -> RegistrationTarget:
    """Preprocess a target cloud for the configured method."""
    m = params.registration_method
    if is_gicp_like(m):
        covs = (_covariances(cloud, params) if m != "ICP" else
                GICPCloud(cloud.points, cloud.mask,
                          jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32),
                                           cloud.points.shape[:1] + (3, 3))))
        return RegistrationTarget(gicp=covs)
    if m in ("FAST_VGICP", "VGICP", "NDT", "NDT_OMP"):
        vox = build_gaussian_voxel_map(
            cloud, params.reg_resolution, capacity=voxel_capacity,
            min_points=4 if m in ("NDT", "NDT_OMP") else 1)
        return RegistrationTarget(voxels=vox)
    raise ValueError(f"unknown registration method {m}")


def make_source(cloud: PointCloud, params: RegistrationConfig) -> GICPCloud:
    """Preprocess a source cloud (covariances only for GICP-family)."""
    m = params.registration_method
    if m in ("SMALL_GICP", "FAST_GICP", "GICP", "GICP_OMP", "FAST_VGICP",
             "VGICP"):
        return _covariances(cloud, params)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32),
                           cloud.points.shape[:1] + (3, 3))
    return GICPCloud(cloud.points, cloud.mask, eye)


@functools.partial(jax.jit, static_argnames=("stat",))
def _make_source_batch_split(stat, dyn, pts, msk):
    view = RegView(stat, dyn)
    return jax.vmap(lambda p, m: make_source(PointCloud(p, m), view)
                    )(pts, msk)


def make_source_batch(pts: jnp.ndarray, msk: jnp.ndarray,
                      params: RegistrationConfig) -> GICPCloud:
    """Batched `make_source` over a leading keyframe axis (B, N, 3)/(B, N).

    MODULE-level jit on the shared static/traced split: per-instance
    `jax.jit(lambda ...)` wrappers re-traced the program every time a new
    backend was constructed (one fresh trace + cache load per bench run —
    measured 2.7x slower multi-robot timed runs before this was hoisted).
    """
    stat, dyn = split_reg(params)
    return _make_source_batch_split(stat, dyn, pts, msk)


def _correspondences(method: str, params: RegistrationConfig,
                     p_world: jnp.ndarray, src_mask: jnp.ndarray,
                     target: RegistrationTarget
                     ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """-> (q (N,3), C_q (N,3,3), valid (N,)) for the current source pose."""
    if is_gicp_like(method):
        tg = target.gicp
        d2, idx, valid = knn.nn_within(
            p_world, src_mask, tg.points, tg.mask,
            params.reg_max_correspondence_distance)
        if params.reg_use_reciprocal_correspondences:
            # keep only mutual nearest neighbours
            # (pcl setUseReciprocalCorrespondences semantics)
            _, idx_back = knn.nearest_neighbor(tg.points, p_world, src_mask)
            mutual = idx_back[idx] == jnp.arange(p_world.shape[0],
                                                 dtype=jnp.int32)
            valid = valid & mutual
        return tg.points[idx], tg.covs[idx], valid
    vox = target.voxels
    idx, found = lookup(vox, p_world, src_mask, params.reg_resolution,
                        method=params.reg_nn_search_method)
    q = vox.means[idx]
    d2 = jnp.sum((q - p_world) ** 2, axis=-1)
    gate = d2 <= params.reg_max_correspondence_distance ** 2
    return q, vox.covs[idx], src_mask & found & gate


def _align_impl(params: RegistrationConfig, source: GICPCloud,
                target: RegistrationTarget, init_pose: jnp.ndarray,
                max_iters) -> RegistrationResult:
    """align() body; `max_iters` may be a python int or a traced scalar
    (the batched pair program passes a per-pair budget, 0 = evaluate-only).

    With `reg_coarse_stride > 1` the Gauss-Newton runs coarse-to-fine:
    the first `reg_coarse_iterations` of the budget iterate on
    stride-subsampled source AND target clouds (the per-iteration
    nearest-neighbor pass — the wall of the batched pair program at
    production cloud sizes — shrinks by stride² for GICP targets), then
    the remaining budget polishes at full resolution from the coarse
    pose. Inside a vmapped batch the wall is the max budget across rows
    (non-overlapping candidate rows never converge), so the static
    schedule is what the tick pays: e.g. 16 iters at 8192 pts -> 12
    coarse (stride 4: 1/16 NN cost each) + 4 fine ≈ 4.75 full-iteration
    equivalents instead of 16."""
    method = params.registration_method
    use_source_covs = method not in ("ICP", "NDT", "NDT_OMP")
    eps_t = params.reg_transformation_epsilon
    eps_r = params.reg_transformation_epsilon

    p = source.points
    src_mask = source.mask

    if method in ("NDT", "NDT_OMP"):
        # Magnusson (2009) Gaussian+uniform mixture constants, as computed
        # by pclomp (ndt_omp_impl.hpp computeDerivatives): the score per
        # correspondence is -d1 * exp(-d2/2 * r^T Sigma^-1 r). In the
        # shared IRLS-GN core this becomes a per-correspondence scalar
        # weight d2 * exp(-d2/2 * m): the exponential saturates the
        # influence of poor matches, reproducing NDT's wide, soft
        # convergence basin (vs. the quadratic P2D objective round 1 used).
        out_ratio = jnp.float32(params.reg_ndt_outlier_ratio)
        res3 = jnp.float32(params.reg_resolution) ** 3
        c1 = 10.0 * (1.0 - out_ratio)
        c2 = out_ratio / res3
        d3 = -jnp.log(c2)
        d1 = -jnp.log(c1 + c2) - d3
        ndt_d2 = -2.0 * jnp.log(
            (-jnp.log(c1 * jnp.exp(jnp.float32(-0.5)) + c2) - d3) / d1)
    else:
        ndt_d2 = None

    def run_stage(src: GICPCloud, tgt: RegistrationTarget,
                  pose0, budget):
        sp, sm = src.points, src.mask

        def gn_step(pose):
            R = se3.pose_rotation(pose)
            p_world = se3.pose_apply(pose, sp)
            q, Cq, valid = _correspondences(method, params, p_world, sm,
                                            tgt)
            r = q - p_world  # (N,3)
            # precision pins: skew(p) carries raw coordinate magnitudes
            # (~45 m) into J, and H/b contract over thousands of
            # correspondences — at bf16 MXU precision the Gauss-Newton
            # direction picks up ~0.4% noise per iteration, enough to
            # chatter around the 1e-3 convergence epsilon and tip
            # knife-edge registrations into divergence on-chip (CPU f32
            # runs of the same scans converge). O(N*36) FLOPs — free
            # next to the NN search.
            _HI = jax.lax.Precision.HIGHEST
            if use_source_covs:
                RCpRt = jnp.einsum("ab,nbc,dc->nad", R, src.covs, R,
                                   precision=_HI)
                W = inv3x3(Cq + RCpRt)
            else:
                W = inv3x3(Cq)
            w = valid.astype(jnp.float32)
            if ndt_d2 is not None:
                m = jnp.einsum("na,nab,nb->n", r, W, r, precision=_HI)
                w = w * ndt_d2 * jnp.exp(-0.5 * ndt_d2 * m)
            W = W * w[:, None, None]
            # J = [-R, R skew(p)] : (N,3,6)
            Rskew = jnp.einsum("ab,nbc->nac", R, se3.skew(sp),
                               precision=_HI)
            J = jnp.concatenate([-jnp.broadcast_to(R, Rskew.shape), Rskew],
                                axis=-1)
            WJ = jnp.einsum("nab,nbj->naj", W, J, precision=_HI)
            H = jnp.einsum("nai,naj->ij", J, WJ, precision=_HI)
            b = jnp.einsum("naj,na->j", WJ, r, precision=_HI)
            err = jnp.einsum("na,nab,nb->", r, W, r, precision=_HI)
            n_in = jnp.sum(valid.astype(jnp.int32))
            xi = jnp.linalg.solve(H + 1e-6 * jnp.eye(6, dtype=H.dtype), -b)
            return xi, H, err / jnp.maximum(n_in, 1), n_in

        # Per-row stall exit (reg_stall_epsilon > 0): under vmap the
        # while_loop runs until EVERY row of the batched pair program
        # finishes, and rows without enough true overlap never satisfy
        # the update-norm criterion — so without a stall exit the whole
        # tick pays the full iteration budget for them (531 ms of a
        # ~610 ms tick in BENCH_r04). A row whose mean correspondence
        # error improves by < stall_eps (relative) for 2 consecutive
        # iterations has numerically finished: if it still holds
        # correspondences it reports converged=True and lets the fitness
        # gate decide acceptance (the reference's real filter,
        # loop_detector.cpp:156 — a plateaued-at-optimum row passes, a
        # plateaued-garbage row carries garbage fitness and is
        # rejected); a row with ZERO correspondences dies unconverged
        # (keep-last semantics, loop_detector.cpp:150-155).
        stall_eps = jnp.float32(getattr(params, "reg_stall_epsilon", 0.0))

        def cond(state):
            pose, i, done, dead, stall, err, n_in, H = state
            return (i < budget) & ~done & ~dead

        def body(state):
            pose, i, done, dead, stall, err, n_in, H = state
            xi, H2, err2, n2 = gn_step(pose)
            new_pose = se3.pose_retract(pose, xi)
            dt = jnp.linalg.norm(xi[:3])
            dr = jnp.linalg.norm(xi[3:])
            converged = (dt < eps_t) & (dr < eps_r)
            improve = jnp.where(jnp.isfinite(err),
                                (err - err2) / jnp.maximum(err, 1e-12),
                                jnp.float32(jnp.inf))
            stall2 = jnp.where(improve < stall_eps, stall + 1, 0)
            stall_on = stall_eps > 0
            converged = converged | (stall_on & (stall2 >= 2) & (n2 > 0))
            dead2 = stall_on & (n2 == 0)
            return (new_pose, i + 1, converged, dead2, stall2, err2, n2, H2)

        init = (pose0, jnp.int32(0), jnp.bool_(False), jnp.bool_(False),
                jnp.int32(0), jnp.float32(jnp.inf),
                jnp.int32(0), jnp.zeros((6, 6), jnp.float32))
        pose, it, done, dead, stall, err, n_in, H = jax.lax.while_loop(
            cond, body, init)
        return pose, it, done, err, n_in, H

    pose0 = init_pose.astype(jnp.float32)
    stride = int(getattr(params, "reg_coarse_stride", 1))
    if stride > 1:
        src_c = GICPCloud(p[::stride], src_mask[::stride],
                          source.covs[::stride])
        if target.gicp is not None:
            tg = target.gicp
            tgt_c = RegistrationTarget(gicp=GICPCloud(
                tg.points[::stride], tg.mask[::stride], tg.covs[::stride]))
        else:
            # voxel targets: hash lookup is O(source) — subsampling the
            # source already cuts the coarse iteration cost by stride
            tgt_c = target
        # always leave >=1 fine iteration for any row with a budget:
        # `converged` (and the solution Hessian/inlier count) comes from
        # the full-resolution stage, so a coarse-only row would read as
        # permanently non-converged (keep-last death spiral, CLAUDE.md)
        budget_c = jnp.minimum(params.reg_coarse_iterations,
                               jnp.maximum(max_iters - 1, 0))
        pose_c, it_c, _, _, _, _ = run_stage(src_c, tgt_c, pose0, budget_c)
        budget_f = jnp.maximum(max_iters - budget_c, 0)
        pose, it_f, done, err, n_in, H = run_stage(source, target, pose_c,
                                                   budget_f)
        iters = it_c + it_f
    else:
        pose, iters, done, err, n_in, H = run_stage(source, target, pose0,
                                                    max_iters)
    # hasConverged() semantics (small_gicp): the update-norm criterion was
    # hit within the iteration budget AND correspondences existed at the
    # solution. Running out of iterations or losing all correspondences is
    # NOT convergence (loop_detector.cpp:150-155 rejects such candidates).
    return RegistrationResult(pose=pose, converged=done & (n_in > 0),
                              iterations=iters,
                              error=err, num_inliers=n_in, hessian=H)


@functools.partial(jax.jit, static_argnames=("stat",))
def _align_split(stat, dyn, source, target, init_pose):
    p = RegView(stat, dyn)
    return _align_impl(p, source, target, init_pose,
                       p.reg_maximum_iterations)


def align(params: RegistrationConfig, source: GICPCloud,
          target: RegistrationTarget,
          init_pose: jnp.ndarray) -> RegistrationResult:
    """Register `source` onto `target` starting from `init_pose` (7-vec).

    Equivalent surface to `pcl::Registration::align` with the reference's
    reg_* parameters (registrations.cpp:34-43); returns the full GN Hessian
    for downstream information-matrix use. Numeric parameters are traced
    (see split_reg) — two configs differing only in thresholds share one
    compiled program.
    """
    stat, dyn = split_reg(params)
    return _align_split(stat, dyn, source, target, init_pose)


def align_clouds(params: RegistrationConfig, source_cloud: PointCloud,
                 target_cloud: PointCloud,
                 init_pose: jnp.ndarray) -> RegistrationResult:
    """Convenience: preprocess both clouds then align (one-shot use)."""
    src = make_source(source_cloud, params)
    tgt = make_target(target_cloud, params)
    return align(params, src, tgt, init_pose)


class PairResults(NamedTuple):
    """Batched pair-program outputs (one row per requested pair)."""

    pose: jnp.ndarray           # (B,7) final (or initial, if max_iters=0)
    converged: jnp.ndarray      # (B,) bool
    iterations: jnp.ndarray     # (B,) int32
    num_inliers: jnp.ndarray    # (B,) int32
    fitness_inf: jnp.ndarray    # (B,) mean NN sq-dist at `pose`, no gate
    fitness_range: jnp.ndarray  # (B,) same, gated to fitness_max_range


def align_pairs(params: RegistrationConfig,
                tgt_points: jnp.ndarray, tgt_mask: jnp.ndarray,
                tgt_covs: jnp.ndarray,
                src_points: jnp.ndarray, src_mask: jnp.ndarray,
                src_covs: jnp.ndarray,
                init_poses: jnp.ndarray, max_iters: jnp.ndarray,
                fitness_max_range: jnp.ndarray) -> PairResults:
    """THE back-end tick program: every cloud pair the tick needs, in one
    dispatch.

    The reference runs these serially — one registration per loop candidate
    (loop_detector.cpp:97-188), two more for the consistency check
    (:190-303), plus a kd-tree fitness pass per new graph edge
    (information_matrix_calculator.cpp:46). Here all of them are rows of one
    vmapped program over stacked (target, source) GICP clouds:

    - `max_iters[b] = 0` rows are evaluate-only (edge fitness at the given
      relative pose, no registration);
    - `max_iters[b] > 0` rows run the Gauss-Newton alignment first;
    - both fitness flavors come out of ONE shared NN pass at the final
      pose: ungated (information matrices use max_range = inf) and gated to
      `fitness_max_range[b]` (loop acceptance, loop_detector.cpp:156).

    Under the remote-TPU tunnel this turns ~10 round trips per tick into
    one dispatch + one fetch.
    """
    stat, dyn = split_reg(params)
    return _align_pairs_split(stat, dyn, tgt_points, tgt_mask, tgt_covs,
                              src_points, src_mask, src_covs,
                              init_poses, max_iters, fitness_max_range)


@functools.partial(jax.jit, static_argnames=("stat",))
def _align_pairs_split(stat, dyn, tgt_points, tgt_mask, tgt_covs,
                       src_points, src_mask, src_covs,
                       init_poses, max_iters,
                       fitness_max_range) -> PairResults:
    return _align_pairs_body(RegView(stat, dyn), tgt_points, tgt_mask,
                             tgt_covs, src_points, src_mask, src_covs,
                             init_poses, max_iters, fitness_max_range)


def align_pairs_packed(params: RegistrationConfig,
                       tgts, srcs, init_poses, max_iters,
                       fitness_max_range) -> jnp.ndarray:
    """Single-fetch variant of `align_pairs` for the back-end tick.

    `tgts`/`srcs` are length-B sequences of per-keyframe `GICPCloud`s (device
    buffers); the stacking happens INSIDE the jitted program (one dispatch
    instead of six eager concatenates), and the six result fields come back
    as ONE packed (B, 12) f32 array so the host pays a single ~26 ms tunnel
    round trip instead of six:

        row = [pose(7) | converged | iterations | num_inliers |
               fitness_inf | fitness_range]

    Compiles once per bucket size (PairRunner pads to power-of-two buckets).
    """
    stat, dyn = split_reg(params)
    return _align_pairs_packed(stat, dyn, tuple(tgts), tuple(srcs),
                               init_poses, max_iters, fitness_max_range)


@functools.partial(jax.jit, static_argnames=("stat",))
def _align_pairs_packed(stat, dyn, tgts, srcs, init_poses, max_iters,
                        fitness_max_range) -> jnp.ndarray:
    res = _align_pairs_body(
        RegView(stat, dyn),
        jnp.stack([t.points for t in tgts]),
        jnp.stack([t.mask for t in tgts]),
        jnp.stack([t.covs for t in tgts]),
        jnp.stack([s.points for s in srcs]),
        jnp.stack([s.mask for s in srcs]),
        jnp.stack([s.covs for s in srcs]),
        init_poses, max_iters, fitness_max_range)
    return _pack_rows(res)


def _pair_row(params, src: GICPCloud, tgt: RegistrationTarget,
              tgt_points, tgt_mask, ip, mi, fr) -> PairResults:
    """One pair of the tick program: optional registration (mi > 0) plus
    both fitness flavors from a shared NN pass against the RAW target
    points (getFitnessScore searches the target cloud regardless of the
    registration method's own association structure)."""
    res = _align_impl(params, src, tgt, ip, mi)
    moved = se3.pose_apply(res.pose, src.points)
    d2, _ = knn.nearest_neighbor(moved, tgt_points, tgt_mask)
    ok = src.mask & jnp.isfinite(d2)
    n_inf = jnp.sum(ok.astype(jnp.int32))
    fit_inf = jnp.where(n_inf > 0,
                        jnp.sum(jnp.where(ok, d2, 0.0))
                        / jnp.maximum(n_inf, 1), jnp.inf)
    okr = ok & (d2 <= fr * fr)
    n_r = jnp.sum(okr.astype(jnp.int32))
    fit_r = jnp.where(n_r > 0,
                      jnp.sum(jnp.where(okr, d2, 0.0))
                      / jnp.maximum(n_r, 1), jnp.inf)
    return PairResults(pose=res.pose, converged=res.converged,
                       iterations=res.iterations,
                       num_inliers=res.num_inliers,
                       fitness_inf=fit_inf, fitness_range=fit_r)


def _align_pairs_body(params, tgt_points, tgt_mask, tgt_covs,
                      src_points, src_mask, src_covs,
                      init_poses, max_iters,
                      fitness_max_range) -> PairResults:
    def one(tp, tm, tc, sp, sm, sc, ip, mi, fr):
        return _pair_row(params, GICPCloud(sp, sm, sc),
                         RegistrationTarget(gicp=GICPCloud(tp, tm, tc)),
                         tp, tm, ip, mi, fr)

    return jax.vmap(one)(tgt_points, tgt_mask, tgt_covs,
                         src_points, src_mask, src_covs,
                         init_poses, max_iters, fitness_max_range)


def _pack_rows(res: PairResults) -> jnp.ndarray:
    f32 = jnp.float32
    return jnp.concatenate([
        res.pose,
        res.converged.astype(f32)[:, None],
        res.iterations.astype(f32)[:, None],
        res.num_inliers.astype(f32)[:, None],
        res.fitness_inf[:, None],
        res.fitness_range[:, None]], axis=1)


def align_pairs_voxel_packed(params: RegistrationConfig,
                             tgt_maps, tgt_clouds, srcs,
                             init_poses, max_iters,
                             fitness_max_range) -> jnp.ndarray:
    """`align_pairs_packed` for the voxel-target family (VGICP/NDT).

    `tgt_maps` are per-keyframe `GaussianVoxelMap`s (cached like the GICP
    covariances), `tgt_clouds` the corresponding raw `PointCloud`s for the
    fitness NN pass, `srcs` the per-keyframe `GICPCloud`s (identity
    covariances for NDT). Same packed (B, 12) single-fetch contract."""
    stat, dyn = split_reg(params)
    return _align_pairs_voxel_packed(stat, dyn, tuple(tgt_maps),
                                     tuple(tgt_clouds), tuple(srcs),
                                     init_poses, max_iters,
                                     fitness_max_range)


@functools.partial(jax.jit, static_argnames=("stat",))
def _align_pairs_voxel_packed(stat, dyn, tgt_maps, tgt_clouds, srcs,
                              init_poses, max_iters,
                              fitness_max_range) -> jnp.ndarray:
    from .gaussian_voxel import GaussianVoxelMap

    params = RegView(stat, dyn)
    vox = GaussianVoxelMap(*[jnp.stack([getattr(m, f) for m in tgt_maps])
                             for f in GaussianVoxelMap._fields])
    tp = jnp.stack([c.points for c in tgt_clouds])
    tm = jnp.stack([c.mask for c in tgt_clouds])
    sp = jnp.stack([s.points for s in srcs])
    sm = jnp.stack([s.mask for s in srcs])
    sc = jnp.stack([s.covs for s in srcs])

    def one(vox_row, tp_, tm_, sp_, sm_, sc_, ip, mi, fr):
        return _pair_row(params, GICPCloud(sp_, sm_, sc_),
                         RegistrationTarget(voxels=vox_row),
                         tp_, tm_, ip, mi, fr)

    res = jax.vmap(one)(vox, tp, tm, sp, sm, sc,
                        init_poses, max_iters, fitness_max_range)
    return _pack_rows(res)
