"""Fitness score: mean squared NN distance between aligned clouds.

Shared by loop-closure acceptance (loop_detector.cpp:156) and edge
information weighting (information_matrix_calculator.cpp:46-81): transform
`cloud2` by `relpose` into `cloud1`'s frame, find each point's NN in
`cloud1`, and average the squared distances of those within `max_range`.
Returns max_range^2-equivalent (inf here) when nothing matches, like the
reference's `nr == 0` fallback of max double.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..utils import se3
from . import knn
from .cloud import PointCloud


@functools.partial(jax.jit, static_argnames=("chunk",))
def fitness_score(cloud1: PointCloud, cloud2: PointCloud,
                  relpose: jnp.ndarray, max_range: float = jnp.inf,
                  chunk: int = 1024) -> jnp.ndarray:
    """Mean squared 1-NN distance of cloud2 (moved by relpose) into cloud1."""
    moved = se3.pose_apply(relpose, cloud2.points)
    d2, _ = knn.nearest_neighbor(moved, cloud1.points, cloud1.mask,
                                 chunk=chunk)
    ok = cloud2.mask & (d2 <= jnp.float32(max_range) ** 2) & jnp.isfinite(d2)
    n = jnp.sum(ok.astype(jnp.int32))
    total = jnp.sum(jnp.where(ok, d2, 0.0))
    return jnp.where(n > 0, total / jnp.maximum(n, 1), jnp.inf)


@functools.partial(jax.jit, static_argnames=("chunk",))
def inlier_fraction(cloud1: PointCloud, cloud2: PointCloud,
                    relpose: jnp.ndarray, max_dist: float,
                    chunk: int = 1024) -> jnp.ndarray:
    """Fraction of cloud2 points with a cloud1 NN within max_dist after
    alignment (ScanMatchingStatus inlier stat,
    scan_matching_odometry_component.cpp:407-417)."""
    moved = se3.pose_apply(relpose, cloud2.points)
    d2, _ = knn.nearest_neighbor(moved, cloud1.points, cloud1.mask,
                                 chunk=chunk)
    ok = cloud2.mask & (d2 <= jnp.float32(max_dist) ** 2)
    n_valid = jnp.sum(cloud2.mask.astype(jnp.int32))
    return jnp.sum(ok.astype(jnp.int32)) / jnp.maximum(n_valid, 1)
