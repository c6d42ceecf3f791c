"""Pallas TPU kernels: radius-gated neighborhood statistics.

Same tiling skeleton as pallas_nn (source rows x streamed target chunks,
all-2D, preloaded ramps, revisited output blocks), but instead of a
running argmin the j sweep accumulates masked moments:

- `radius_count`:   #neighbors within r (exact pcl::RadiusOutlierRemoval
                    semantics, self excluded) — replaces the voxel-bucket
                    approximation on TPU.
- `radius_moments`: (count, sum, raw second moments) of neighbors within r
                    per source point — one pass over all pairs, from which
                    GICP covariances come in closed form without the kNN
                    top-k sort (estimate_covariances_radius).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_nn import _pad_points

# TC stays 512 here: the moments kernel carries (BS, 16) accumulators plus
# the (BS, TC) distance tile; TC 2048 exceeds the 16M scoped-VMEM budget
# (measured: 25.2M requested). The plain NN kernel (pallas_nn) runs TC 2048.
_BS = 1024
_TC = 512


def _count_kernel(src_ref, tgt_ref, r2_ref, out_ref):
    j = pl.program_id(1)
    sx, sy, sz = src_ref[:, 0:1], src_ref[:, 1:2], src_ref[:, 2:3]
    tx, ty, tz = tgt_ref[0:1, :], tgt_ref[1:2, :], tgt_ref[2:3, :]
    d = (sx - tx) ** 2 + (sy - ty) ** 2 + (sz - tz) ** 2
    r2 = r2_ref[0, 0]
    # exclude self matches (d == 0) like the reference's radius filter
    w = ((d <= r2) & (d > 0.0)).astype(jnp.float32)
    c = jnp.sum(w, axis=1, keepdims=True)  # (BS, 1)

    @pl.when(j == 0)
    def _():
        out_ref[:, :] = c

    @pl.when(j > 0)
    def _():
        out_ref[:, :] = out_ref[:, :] + c


@jax.jit
def _count_call(src_r, tgt_t, r2):
    n = src_r.shape[0]
    m = tgt_t.shape[1]
    return pl.pallas_call(
        _count_kernel,
        grid=(n // _BS, m // _TC),
        in_specs=[
            pl.BlockSpec((_BS, 8), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, _TC), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((_BS, 1), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, 1), jnp.float32),
    )(src_r, tgt_t, r2)


def radius_count_pallas(points: jnp.ndarray, mask: jnp.ndarray,
                        radius: float) -> jnp.ndarray:
    """Exact neighbor counts within `radius` (self excluded)."""
    n = points.shape[0]
    src_p = _pad_points(points, mask, _BS)
    src_r = jnp.concatenate(
        [src_p, jnp.zeros((src_p.shape[0], 5), src_p.dtype)], axis=1)
    tgt_p = _pad_points(points, mask, _TC)
    tgt_t = jnp.concatenate(
        [tgt_p.T, jnp.zeros((5, tgt_p.shape[0]), tgt_p.dtype)], axis=0)
    r2 = jnp.asarray([[radius * radius]], jnp.float32)
    c = _count_call(src_r, tgt_t, r2)[:n, 0]
    return jnp.where(mask, c.astype(jnp.int32), 0)


# ---------------------------------------------------------------------------
# neighborhood moments -> GICP covariances
# ---------------------------------------------------------------------------

def _moments_kernel(src_ref, tgt_ref, r2_ref, out_ref):
    """out lanes: [count, sx, sy, sz, xx, xy, xz, yy, yz, zz, 0...] (BS,16)."""
    j = pl.program_id(1)
    sx, sy, sz = src_ref[:, 0:1], src_ref[:, 1:2], src_ref[:, 2:3]
    tx, ty, tz = tgt_ref[0:1, :], tgt_ref[1:2, :], tgt_ref[2:3, :]
    d = (sx - tx) ** 2 + (sy - ty) ** 2 + (sz - tz) ** 2
    r2 = r2_ref[0, 0]
    w = (d <= r2).astype(jnp.float32)  # self INCLUDED (like kNN covs)
    wx = w * tx
    wy = w * ty
    wz = w * tz
    acc = jnp.concatenate([
        jnp.sum(w, axis=1, keepdims=True),
        jnp.sum(wx, axis=1, keepdims=True),
        jnp.sum(wy, axis=1, keepdims=True),
        jnp.sum(wz, axis=1, keepdims=True),
        jnp.sum(wx * tx, axis=1, keepdims=True),
        jnp.sum(wx * ty, axis=1, keepdims=True),
        jnp.sum(wx * tz, axis=1, keepdims=True),
        jnp.sum(wy * ty, axis=1, keepdims=True),
        jnp.sum(wy * tz, axis=1, keepdims=True),
        jnp.sum(wz * tz, axis=1, keepdims=True),
        jnp.zeros((_BS, 6), jnp.float32),
    ], axis=1)  # (BS, 16)

    @pl.when(j == 0)
    def _():
        out_ref[:, :] = acc

    @pl.when(j > 0)
    def _():
        out_ref[:, :] = out_ref[:, :] + acc


@jax.jit
def _moments_call(src_r, tgt_t, r2):
    n = src_r.shape[0]
    m = tgt_t.shape[1]
    return pl.pallas_call(
        _moments_kernel,
        grid=(n // _BS, m // _TC),
        in_specs=[
            pl.BlockSpec((_BS, 8), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, _TC), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((_BS, 16), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, 16), jnp.float32),
    )(src_r, tgt_t, r2)


def radius_moments_pallas(points: jnp.ndarray, mask: jnp.ndarray,
                          radius: float
                          ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """-> (count (N,), mean (N,3), cov (N,3,3)) of the radius neighborhood."""
    n = points.shape[0]
    src_p = _pad_points(points, mask, _BS)
    src_r = jnp.concatenate(
        [src_p, jnp.zeros((src_p.shape[0], 5), src_p.dtype)], axis=1)
    tgt_p = _pad_points(points, mask, _TC)
    tgt_t = jnp.concatenate(
        [tgt_p.T, jnp.zeros((5, tgt_p.shape[0]), tgt_p.dtype)], axis=0)
    r2 = jnp.asarray([[radius * radius]], jnp.float32)
    mo = _moments_call(src_r, tgt_t, r2)[:n]
    cnt = jnp.maximum(mo[:, 0], 1.0)
    mean = mo[:, 1:4] / cnt[:, None]
    xx, xy, xz, yy, yz, zz = (mo[:, 4], mo[:, 5], mo[:, 6], mo[:, 7],
                              mo[:, 8], mo[:, 9])
    M2 = jnp.stack([
        jnp.stack([xx, xy, xz], axis=-1),
        jnp.stack([xy, yy, yz], axis=-1),
        jnp.stack([xz, yz, zz], axis=-1),
    ], axis=-2) / cnt[:, None, None]
    cov = M2 - jnp.einsum("na,nb->nab", mean, mean)
    return mo[:, 0], mean, cov
