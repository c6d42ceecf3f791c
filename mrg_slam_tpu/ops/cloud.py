"""Fixed-capacity padded point-cloud container.

XLA requires static shapes, so the PCL `pcl::PointCloud` of the reference
becomes a `(capacity, 3)` float32 array plus a boolean validity mask. All
kernels in `mrg_slam_tpu.ops` take and return this structure; invalid lanes
are kept at a large sentinel coordinate so that distance-based kernels
naturally ignore them without extra branching.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

# Sentinel coordinate for padding lanes: far enough that any distance test
# excludes it, small enough that squaring stays finite in float32.
PAD_VALUE = 1.0e6


@jax.tree_util.register_pytree_node_class
class PointCloud:
    """Padded point cloud: `points` (N,3) f32, `mask` (N,) bool.

    Immutable value type; registered as a pytree so it can cross jit/vmap
    boundaries freely.
    """

    def __init__(self, points: jnp.ndarray, mask: jnp.ndarray):
        self.points = points
        self.mask = mask

    # -- pytree protocol ----------------------------------------------------
    def tree_flatten(self):
        return (self.points, self.mask), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    # -- properties ---------------------------------------------------------
    @property
    def capacity(self) -> int:
        return self.points.shape[0]

    def count(self) -> jnp.ndarray:
        return jnp.sum(self.mask.astype(jnp.int32))

    # -- constructors -------------------------------------------------------
    @staticmethod
    def from_array(pts, capacity: Optional[int] = None) -> "PointCloud":
        pts = np.asarray(pts, dtype=np.float32)
        if pts.ndim != 2 or pts.shape[1] < 3:
            raise ValueError(f"expected (N,>=3) points, got {pts.shape}")
        pts = pts[:, :3]
        n = pts.shape[0]
        cap = capacity if capacity is not None else n
        if n > cap:
            pts = pts[:cap]
            n = cap
        out = np.full((cap, 3), PAD_VALUE, dtype=np.float32)
        out[:n] = pts
        mask = np.zeros((cap,), dtype=bool)
        mask[:n] = True
        return PointCloud(jnp.asarray(out), jnp.asarray(mask))

    @staticmethod
    def empty(capacity: int) -> "PointCloud":
        return PointCloud(
            jnp.full((capacity, 3), PAD_VALUE, dtype=jnp.float32),
            jnp.zeros((capacity,), dtype=bool),
        )

    # -- ops ----------------------------------------------------------------
    def sanitized(self) -> "PointCloud":
        """Force padding lanes to the sentinel coordinate."""
        pts = jnp.where(self.mask[:, None], self.points, PAD_VALUE)
        return PointCloud(pts, self.mask)

    def transformed(self, pose: jnp.ndarray) -> "PointCloud":
        """Rigid-transform valid points by 7-vector pose; padding preserved."""
        from ..utils import se3

        pts = se3.pose_apply(pose, self.points)
        pts = jnp.where(self.mask[:, None], pts, PAD_VALUE)
        return PointCloud(pts, self.mask)

    def to_numpy(self) -> np.ndarray:
        """Dense (n,3) numpy array of valid points (host sync)."""
        m = np.asarray(self.mask)
        return np.asarray(self.points)[m]


def compact(cloud: PointCloud, capacity: Optional[int] = None) -> PointCloud:
    """Move valid points to the front (stable), pad the tail.

    Static-shaped compaction via argsort on ~mask: sorts valid lanes first
    while preserving order. Output capacity defaults to input capacity.
    """
    cap = capacity or cloud.capacity
    order = jnp.argsort(~cloud.mask, stable=True)
    pts = cloud.points[order][:cap]
    mask = cloud.mask[order][:cap]
    pts = jnp.where(mask[:, None], pts, PAD_VALUE)
    return PointCloud(pts, mask)


def merge(a: PointCloud, b: PointCloud, capacity: int) -> PointCloud:
    """Concatenate two padded clouds then compact to `capacity`."""
    pts = jnp.concatenate([a.points, b.points], axis=0)
    mask = jnp.concatenate([a.mask, b.mask], axis=0)
    return compact(PointCloud(pts, mask), capacity)
