"""Batched plane RANSAC + normal estimation.

Replaces pcl::SampleConsensusModelPlane/RANSAC and pcl::NormalEstimation
(floor_detection_component.cpp:139-161, :216-253). TPU design: all H
hypotheses are drawn and scored in ONE batched program — sample 3-point
triplets with jax.random, fit each plane in closed form, count inliers with
a (H, N) mask reduction, then refine the winner with a least-squares fit
over its inliers (smallest eigenvector of the inlier scatter).

Plane convention: (n, d) with n unit and n.x + d = 0.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import knn
from .cloud import PointCloud


class PlaneFit(NamedTuple):
    coeffs: jnp.ndarray      # (4,) [nx, ny, nz, d]
    num_inliers: jnp.ndarray  # int32
    inlier_mask: jnp.ndarray  # (N,) bool
    valid: jnp.ndarray        # bool: enough points to attempt a fit


@functools.partial(jax.jit, static_argnames=("num_hypotheses",))
def ransac_plane(cloud: PointCloud, key: jnp.ndarray,
                 distance_thresh: float,
                 num_hypotheses: int = 256) -> PlaneFit:
    pts = cloud.points
    n_pts = pts.shape[0]
    valid_f = cloud.mask.astype(jnp.float32)
    n_valid = jnp.sum(valid_f)

    # sample triplets among valid points: draw uniform ints in [0, n_valid)
    # and map through the compaction order of the mask
    order = jnp.argsort(~cloud.mask)  # valid lanes first
    idx = jax.random.randint(key, (num_hypotheses, 3), 0,
                             jnp.maximum(n_valid.astype(jnp.int32), 1))
    tri = pts[order[idx]]  # (H, 3, 3)

    v1 = tri[:, 1] - tri[:, 0]
    v2 = tri[:, 2] - tri[:, 0]
    normal = jnp.cross(v1, v2)
    norm = jnp.linalg.norm(normal, axis=-1, keepdims=True)
    normal = normal / jnp.maximum(norm, 1e-12)
    # elementwise product + sum stays f32 on the VPU — an einsum here can
    # lower to a bf16 MXU contraction, and at ~45 m coordinates a bf16
    # plane offset d carries ~0.1 m error (the scale of distance_thresh),
    # re-corrupting every point-plane distance the pin below protects
    d = -jnp.sum(normal * tri[:, 0], axis=-1)
    degenerate = norm[:, 0] < 1e-8

    # score: inliers within distance_thresh. precision=HIGHEST is
    # load-bearing: the TPU MXU defaults to bf16 inputs, and at LiDAR
    # coordinate magnitudes (~45 m) a bf16 point-plane distance carries
    # ~0.1 m error — the same scale as distance_thresh — so hypothesis
    # scoring (and the final inlier mask) is corrupted on-chip
    # (measured: floor-augmented acceptance ATE 1.97 m vs 0.24 m on CPU).
    _HI = jax.lax.Precision.HIGHEST
    dist = jnp.abs(jnp.matmul(pts, normal.T, precision=_HI) + d[None, :])
    within = (dist <= distance_thresh) & cloud.mask[:, None]
    scores = jnp.sum(within, axis=0)
    scores = jnp.where(degenerate, -1, scores)
    best = jnp.argmax(scores)

    n_best, d_best = normal[best], d[best]
    inliers = within[:, best]

    # least-squares refinement on the winning inliers
    w = inliers.astype(jnp.float32)
    cnt = jnp.maximum(jnp.sum(w), 1.0)
    mean = jnp.sum(pts * w[:, None], axis=0) / cnt
    diff = (pts - mean) * w[:, None]
    cov = jnp.matmul(diff.T, diff, precision=_HI) / cnt
    from .sym3eig import smallest_eigvec3
    _, n_ref = smallest_eigvec3(cov)  # smallest eigenvalue direction
    # keep orientation of the RANSAC normal
    n_ref = jnp.where(jnp.dot(n_ref, n_best) < 0, -n_ref, n_ref)
    d_ref = -jnp.sum(n_ref * mean)  # same bf16-offset hazard as d above

    dist_ref = jnp.abs(jnp.matmul(pts, n_ref, precision=_HI) + d_ref)
    inliers_ref = (dist_ref <= distance_thresh) & cloud.mask
    return PlaneFit(
        coeffs=jnp.concatenate([n_ref, d_ref[None]]),
        num_inliers=jnp.sum(inliers_ref.astype(jnp.int32)),
        inlier_mask=inliers_ref,
        valid=n_valid >= 3)


@functools.partial(jax.jit, static_argnames=("k",))
def estimate_normals(cloud: PointCloud, k: int = 10) -> jnp.ndarray:
    """Per-point unit normals from kNN scatter (smallest eigenvector)."""
    d2, idx = knn.knn(cloud.points, cloud.points, cloud.mask, k=k)
    neigh = cloud.points[idx]
    nmask = (cloud.mask[idx] & jnp.isfinite(d2)).astype(jnp.float32)
    cnt = jnp.maximum(jnp.sum(nmask, axis=-1), 1.0)
    mean = jnp.sum(neigh * nmask[..., None], axis=-2) / cnt[..., None]
    diff = (neigh - mean[:, None, :]) * nmask[..., None]
    cov = jnp.einsum("nka,nkb->nab", diff, diff,
                     precision=jax.lax.Precision.HIGHEST) / cnt[..., None,
                                                                None]
    from .sym3eig import smallest_eigvec3
    _, normals = smallest_eigvec3(cov)
    # orient upward (+z) like the floor detector expects
    return jnp.where(normals[..., 2:3] < 0, -normals, normals)
