"""Hashed voxel-grid kernels (sort + segment reductions, XLA-friendly).

Replaces pcl::VoxelGrid / pcl::ApproximateVoxelGrid and the reference's own
ApproximateMeanVoxelGrid (include/pcl/filters/ApproximateMeanVoxelGrid.hpp):
per-voxel *mean* point with a minimum-hits threshold.

TPU design: no hash map with chasing — instead
  1. quantize points to integer voxel coords, pack into one int32 key
     (10 bits per axis around the cloud min corner, 1024^3 voxel window),
  2. sort points by key (XLA sort is fast on TPU),
  3. segment-reduce means with `jax.ops.segment_sum` over contiguous runs.
Everything is static-shaped; invalid points get the max key and fall off the
end of the segment table.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from .cloud import PAD_VALUE, PointCloud

_BITS = 10
_MASK = (1 << _BITS) - 1
_INVALID_KEY = jnp.int32(2 ** 31 - 1)


def scramble_key(key: jnp.ndarray) -> jnp.ndarray:
    """Pseudo-random int32 mix of a voxel key (invalid stays last-sorting).

    Voxel tables are truncated to a static capacity; sorting segments by a
    *hashed* key makes any overflow drop a spatially uniform random subset
    of voxels instead of a contiguous spatial corner (packed keys are
    monotone in x). Equal keys share a hash, so grouping still works with a
    (hash, key) lexsort.
    """
    h = key * jnp.int32(-1640531527)  # Knuth multiplicative hash, wraps
    h = h ^ (h >> 15)
    # keep hashes non-negative so _INVALID_KEY's slot still sorts last
    h = jnp.abs(h) & jnp.int32(2 ** 30 - 1)
    return jnp.where(key == _INVALID_KEY, _INVALID_KEY, h)


def voxel_coords(points: jnp.ndarray, resolution: float,
                 origin: jnp.ndarray) -> jnp.ndarray:
    """Integer voxel coordinates of points relative to `origin`."""
    return jnp.floor((points - origin) / resolution).astype(jnp.int32)


def pack_key(coords: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """Pack (N,3) voxel coords into a single int32 key; invalid -> max key.

    Coordinates outside the 1024^3 window are treated as invalid (the window
    is anchored at the cloud min corner, so this only drops points farther
    than 1024 * resolution from the nearest point — beyond any LiDAR range
    at the resolutions used here).
    """
    in_window = jnp.all((coords >= 0) & (coords <= _MASK), axis=-1)
    ok = valid & in_window
    key = (coords[..., 0] << (2 * _BITS)) | (coords[..., 1] << _BITS) | coords[..., 2]
    return jnp.where(ok, key, _INVALID_KEY)


def wrapped_key(points: jnp.ndarray, valid: jnp.ndarray,
                resolution: float) -> jnp.ndarray:
    """Translation-invariant voxel keys: absolute-origin coords wrapped to
    the 1024-cell window per axis.

    Identical world voxels get identical keys regardless of which scan they
    appear in, so fixed-capacity truncation keeps CONSISTENT subsets across
    overlapping keyframes (min-corner anchoring makes subsets differ per
    cloud, which degrades cross-keyframe fitness scores). Wrapping aliases
    voxels 1024*resolution apart — safe for single scans (LiDAR diameter
    ~70 m << 102 m at 0.1 m resolution), NOT for whole-map assembly.
    """
    coords = jnp.floor(points / resolution).astype(jnp.int32) & _MASK
    key = (coords[..., 0] << (2 * _BITS)) | (coords[..., 1] << _BITS) \
        | coords[..., 2]
    return jnp.where(valid, key, _INVALID_KEY)


@functools.partial(jax.jit, static_argnames=("capacity", "absolute_origin"))
def voxel_downsample(cloud: PointCloud, resolution: float,
                     min_points: int = 1,
                     capacity: Optional[int] = None,
                     absolute_origin: bool = False) -> PointCloud:
    """Per-voxel mean downsample with a min-hits threshold.

    Semantics of ApproximateMeanVoxelGrid::applyFilter (reference custom PCL
    filter) and, with min_points=1, of the VOXELGRID/APPROX_VOXELGRID
    prefiltering paths (apps/prefiltering_component.cpp:158-180).

    absolute_origin=True uses translation-invariant wrapped keys (see
    wrapped_key) — right for per-scan clouds; keep False for maps larger
    than 1024 * resolution.
    """
    cap = capacity or cloud.capacity
    pts = cloud.points
    valid = cloud.mask

    if absolute_origin:
        key = wrapped_key(pts, valid, resolution)
    else:
        # Anchor the quantization window at the min corner of the cloud.
        big = jnp.where(valid[:, None], pts, jnp.inf)
        origin = jnp.min(big, axis=0)
        origin = jnp.where(jnp.isfinite(origin), origin, 0.0)
        key = pack_key(voxel_coords(pts, resolution, origin), valid)
    order = jnp.lexsort((key, scramble_key(key)))
    key_s = key[order]
    pts_s = pts[order]
    valid_s = key_s != _INVALID_KEY

    # Segment ids over sorted keys: new segment where the key changes.
    new_seg = jnp.concatenate(
        [jnp.array([True]), key_s[1:] != key_s[:-1]])
    seg_id = jnp.cumsum(new_seg.astype(jnp.int32)) - 1
    # Invalid lanes: shove into an overflow segment beyond capacity.
    seg_id = jnp.where(valid_s, seg_id, cap)

    ones = valid_s.astype(jnp.float32)
    counts = jax.ops.segment_sum(ones, seg_id, num_segments=cap + 1)[:cap]
    sums = jax.ops.segment_sum(
        pts_s * ones[:, None], seg_id, num_segments=cap + 1)[:cap]

    mask = counts >= jnp.float32(min_points)
    means = sums / jnp.maximum(counts, 1.0)[:, None]
    means = jnp.where(mask[:, None], means, PAD_VALUE)
    return PointCloud(means, mask)


@jax.jit
def approximate_radius_mask(cloud: PointCloud, resolution: float,
                            min_neighbors: int) -> jnp.ndarray:
    """Voxel-bucketed approximation of radius outlier removal.

    Counts points in each point's own voxel plus the 6 face neighbors at
    `resolution` ~= radius; a point survives if that count (minus itself)
    reaches `min_neighbors`. An O(N log N) approximation of
    pcl::RadiusOutlierRemoval for the prefilter hot path; exact brute-force
    counting lives in knn.radius_count for small clouds.
    """
    pts = cloud.points
    valid = cloud.mask
    big = jnp.where(valid[:, None], pts, jnp.inf)
    origin = jnp.min(big, axis=0)
    origin = jnp.where(jnp.isfinite(origin), origin, 0.0)

    coords = voxel_coords(pts, resolution, origin)
    key = pack_key(coords, valid)
    skeys = jnp.sort(key)

    def count_of(k):
        lo = jnp.searchsorted(skeys, k, side="left")
        hi = jnp.searchsorted(skeys, k, side="right")
        return (hi - lo).astype(jnp.int32)

    offsets = jnp.array(
        [[0, 0, 0], [1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0],
         [0, 0, 1], [0, 0, -1]], dtype=jnp.int32)
    total = jnp.zeros(pts.shape[0], dtype=jnp.int32)
    for off in range(offsets.shape[0]):
        nk = pack_key(coords + offsets[off][None, :], valid)
        total = total + count_of(nk)
    neighbor_count = total - 1  # exclude self
    return valid & (neighbor_count >= min_neighbors)
