"""Map assembly (src/mrg_slam/map_cloud_generator.cpp).

Transform every keyframe snapshot's cloud by its optimized pose, cull
points beyond `distance_far_thresh` of their sensor origin, optionally skip
first keyframes (their clouds still contain other robots' bodies), then
ApproximateMeanVoxelGrid-downsample with a min-points-per-voxel threshold.

TPU design: one vmapped transform over the stacked keyframe cloud tensor,
flattened into a single voxel_downsample pass — the hash-voxel kernel the
reference implements by hand in ApproximateMeanVoxelGrid.hpp.
"""

from __future__ import annotations

import functools
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.cloud import PAD_VALUE, PointCloud
from ..ops.voxel import voxel_downsample
from ..utils import se3


@functools.partial(jax.jit, static_argnames=("resolution", "min_points",
                                             "capacity"))
def assemble_map(points: jnp.ndarray, masks: jnp.ndarray, poses: jnp.ndarray,
                 skip: jnp.ndarray, far_thresh: float, resolution: float,
                 min_points: int, capacity: int) -> PointCloud:
    """points (K,P,3), masks (K,P), poses (K,7), skip (K,) -> map cloud."""
    local_d = jnp.linalg.norm(points, axis=-1)
    keep = masks & (local_d < far_thresh) & ~skip[:, None]
    world = jax.vmap(se3.pose_apply)(poses, points)
    world = jnp.where(keep[..., None], world, PAD_VALUE)
    flat = PointCloud(world.reshape(-1, 3), keep.reshape(-1))
    return voxel_downsample(flat, resolution, min_points=min_points,
                            capacity=capacity)


class MapCloudGenerator:
    def __init__(self, resolution: float, min_points_per_voxel: int,
                 distance_far_thresh: float, capacity: int = 1 << 20,
                 keyframes_per_chunk: int = 64):
        self.resolution = float(resolution)
        self.min_points = int(min_points_per_voxel)
        self.far_thresh = float(distance_far_thresh)
        self.capacity = int(capacity)
        self.chunk = int(keyframes_per_chunk)

    def generate(self, clouds: Sequence[PointCloud],
                 poses: np.ndarray, skip_first: bool = True,
                 first_flags: Sequence[bool] | None = None) -> np.ndarray:
        """Returns the assembled map as a dense (M,3) numpy array.

        Chunks over keyframes so arbitrarily long missions fit in device
        memory; chunk maps are concatenated and re-voxelized once.
        """
        if not clouds:
            return np.zeros((0, 3), np.float32)
        first_flags = list(first_flags) if first_flags is not None else [
            False] * len(clouds)
        parts: List[np.ndarray] = []
        for s in range(0, len(clouds), self.chunk):
            chunk = clouds[s: s + self.chunk]
            pts = jnp.stack([c.points for c in chunk])
            msk = jnp.stack([c.mask for c in chunk])
            pse = jnp.asarray(poses[s: s + self.chunk], jnp.float32)
            skp = jnp.asarray([skip_first and f
                               for f in first_flags[s: s + self.chunk]])
            sub = assemble_map(pts, msk, pse, skp, self.far_thresh,
                               self.resolution, 1,
                               capacity=min(self.capacity,
                                            pts.shape[0] * pts.shape[1]))
            parts.append(sub.to_numpy())
        merged = np.concatenate(parts, axis=0)
        cap = 1 << max(int(np.ceil(np.log2(max(len(merged), 2)))), 1)
        pc = PointCloud.from_array(merged, capacity=cap)
        out = voxel_downsample(pc, self.resolution,
                               min_points=self.min_points, capacity=cap)
        return out.to_numpy()
