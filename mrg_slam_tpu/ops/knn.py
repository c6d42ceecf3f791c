"""Nearest-neighbour search as MXU-tiled brute force.

The reference leans on PCL/nanoflann kd-trees everywhere (odometry inlier
stats scan_matching_odometry_component.cpp:407-417, fitness scores
information_matrix_calculator.cpp:46, GICP covariance estimation inside
small_gicp). Pointer-chasing trees are hostile to TPUs; dense distance
tiles ride the MXU instead:

    ||s - t||^2 = ||s||^2 + ||t||^2 - 2 * s @ t^T

The `s @ t^T` term is a (chunk, 3) x (3, M) matmul. We stream source chunks
with `lax.map` so the full (N, M) distance matrix never materializes; each
chunk reduces immediately to 1-NN / k-NN results. Padding lanes sit at the
sentinel coordinate (ops.cloud.PAD_VALUE) and are additionally masked to
+inf, so they never win an argmin.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

_INF = jnp.float32(jnp.inf)


def _chunk_sqdist(src_chunk: jnp.ndarray, tgt: jnp.ndarray,
                  tgt_mask: jnp.ndarray) -> jnp.ndarray:
    """(C,3) x (M,3) -> (C,M) squared distances; invalid targets -> +inf.

    precision=HIGHEST is load-bearing: the TPU MXU defaults to bf16 inputs,
    which at LiDAR coordinate magnitudes (|t|^2 ~ 1e3) corrupts squared
    distances by ~10 m^2 and flips a third of the argmins (measured on
    v5e against a float64 golden).
    """
    s2 = jnp.sum(src_chunk * src_chunk, axis=-1, keepdims=True)  # (C,1)
    t2 = jnp.sum(tgt * tgt, axis=-1)  # (M,)
    cross = jax.lax.dot_general(
        src_chunk, tgt.T, dimension_numbers=(((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)
    d2 = s2 + t2[None, :] - 2.0 * cross
    d2 = jnp.maximum(d2, 0.0)
    return jnp.where(tgt_mask[None, :], d2, _INF)


def _pad_to_chunks(x: jnp.ndarray, chunk: int) -> jnp.ndarray:
    n = x.shape[0]
    pad = (-n) % chunk
    if pad:
        x = jnp.concatenate(
            [x, jnp.zeros((pad,) + x.shape[1:], dtype=x.dtype)], axis=0)
    return x


@functools.partial(jax.jit, static_argnames=("chunk",))
def nearest_neighbor(src: jnp.ndarray, tgt: jnp.ndarray,
                     tgt_mask: jnp.ndarray,
                     chunk: int = 1024) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """1-NN of every `src` point in the masked `tgt` cloud.

    Returns (sq_dists (N,), indices (N,) int32). If no target is valid the
    distance is +inf and the index 0. On TPU this dispatches to the fused
    Pallas kernel (ops.pallas_nn) — exact f32, no HBM distance matrix.
    """
    if jax.default_backend() not in ("cpu",):
        from .pallas_nn import nearest_neighbor_pallas

        return nearest_neighbor_pallas(src, tgt, tgt_mask)
    n = src.shape[0]
    srcp = _pad_to_chunks(src, chunk).reshape(-1, chunk, 3)

    def body(s):
        d2 = _chunk_sqdist(s, tgt, tgt_mask)
        idx = jnp.argmin(d2, axis=-1)
        return jnp.take_along_axis(d2, idx[:, None], axis=-1)[:, 0], idx

    d2, idx = jax.lax.map(body, srcp)
    return d2.reshape(-1)[:n], idx.reshape(-1)[:n].astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("k", "chunk"))
def knn(src: jnp.ndarray, tgt: jnp.ndarray, tgt_mask: jnp.ndarray,
        k: int, chunk: int = 512) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """k-NN of every `src` point in the masked `tgt` cloud.

    Returns (sq_dists (N,k) ascending, indices (N,k) int32). Used for GICP
    per-point covariance neighborhoods (reg_correspondence_randomness=k,
    matching small_gicp's covariance estimation) and statistical outlier
    removal.
    """
    n = src.shape[0]
    srcp = _pad_to_chunks(src, chunk).reshape(-1, chunk, 3)
    on_tpu = jax.default_backend() not in ("cpu",)

    def body(s):
        d2 = _chunk_sqdist(s, tgt, tgt_mask)
        if on_tpu:
            # approx_min_k lowers to the TPU PartialReduce op — an order of
            # magnitude cheaper than a full top_k sort over the lane dim.
            # recall 0.95 is ample for covariance neighborhoods and
            # mean-kNN-distance outlier statistics (the only consumers).
            d2k, idx = jax.lax.approx_min_k(d2, k, recall_target=0.95)
            return d2k, idx
        neg, idx = jax.lax.top_k(-d2, k)
        return -neg, idx

    d2, idx = jax.lax.map(body, srcp)
    return (d2.reshape(-1, k)[:n], idx.reshape(-1, k)[:n].astype(jnp.int32))


@functools.partial(jax.jit, static_argnames=("chunk",))
def radius_count(points: jnp.ndarray, mask: jnp.ndarray, radius: float,
                 chunk: int = 1024) -> jnp.ndarray:
    """Number of *other* valid points within `radius` of each point.

    Semantics match pcl::RadiusOutlierRemoval's neighbor count (self
    excluded). TPU dispatches to the fused Pallas accumulation kernel.
    """
    if jax.default_backend() not in ("cpu",):
        from .pallas_stats import radius_count_pallas

        return radius_count_pallas(points, mask, radius)
    n = points.shape[0]
    r2 = jnp.float32(radius * radius)
    pts = _pad_to_chunks(points, chunk).reshape(-1, chunk, 3)

    def body(s):
        d2 = _chunk_sqdist(s, points, mask)
        within = (d2 <= r2) & (d2 > 0.0)  # exclude self (d2 == 0)
        return jnp.sum(within, axis=-1, dtype=jnp.int32)

    counts = jax.lax.map(body, pts).reshape(-1)[:n]
    return jnp.where(mask, counts, 0)


@functools.partial(jax.jit, static_argnames=("chunk",))
def nn_within(src: jnp.ndarray, src_mask: jnp.ndarray, tgt: jnp.ndarray,
              tgt_mask: jnp.ndarray, max_dist: float,
              chunk: int = 1024) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """1-NN with a correspondence gate.

    Returns (sq_dists, indices, valid) where `valid` means: source valid AND
    its NN squared distance <= max_dist^2. This is the correspondence search
    of GICP/ICP (reg_max_correspondence_distance gating).
    """
    d2, idx = nearest_neighbor(src, tgt, tgt_mask, chunk=chunk)
    valid = src_mask & (d2 <= jnp.float32(max_dist * max_dist))
    return d2, idx, valid
