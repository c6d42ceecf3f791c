"""Synthesize a ground disc under the first keyframe
(src/pcl/fill_ground_plane.cpp).

Helps navigation stacks that need a complete costmap under the robot at
startup: RANSAC-fit the dominant plane of the first cloud (`ransac`
variant, :22) or use the base pose's z=0 plane (`simple` variant, :38),
then sample concentric rings at the map resolution (`fill_cloud` :51-66).
"""

from __future__ import annotations

import math
import jax
import jax.numpy as jnp
import numpy as np

from ..utils import se3
from .cloud import PointCloud, merge
from .ransac import ransac_plane


def _ring_points(center: np.ndarray, normal: np.ndarray, radius: float,
                 resolution: float) -> np.ndarray:
    """Concentric rings on the plane through `center` with `normal`."""
    n = normal / max(np.linalg.norm(normal), 1e-12)
    ref = np.asarray([1.0, 0, 0]) if abs(n[0]) < 0.9 else np.asarray(
        [0.0, 1.0, 0])
    b1 = np.cross(n, ref)
    b1 /= max(np.linalg.norm(b1), 1e-12)
    b2 = np.cross(n, b1)
    pts = [center]
    r = resolution
    while r <= radius:
        count = max(8, int(round(2 * math.pi * r / resolution)))
        th = np.linspace(0, 2 * math.pi, count, endpoint=False)
        ring = (center[None, :] + np.outer(r * np.cos(th), b1)
                + np.outer(r * np.sin(th), b2))
        pts.append(ring)
        r += resolution
    return np.concatenate([p.reshape(-1, 3) for p in pts]).astype(np.float32)


def fill_ground_plane_ransac(cloud: PointCloud, radius: float,
                             resolution: float,
                             seed: int = 0) -> PointCloud:
    """RANSAC the dominant plane of `cloud`, fill a disc around its centroid."""
    fit = ransac_plane(cloud, jax.random.PRNGKey(seed),
                       distance_thresh=resolution)
    coeffs = np.asarray(fit.coeffs)
    pts = cloud.to_numpy()
    if not bool(fit.valid) or len(pts) == 0:
        return cloud
    center = pts.mean(axis=0)
    # project centroid onto the plane: c - (n.c + d) n
    n = coeffs[:3]
    center = center - (float(n @ center) + coeffs[3]) * n
    disc = _ring_points(center, n, radius, resolution)
    extra = PointCloud.from_array(disc, capacity=len(disc))
    return merge(cloud, extra, capacity=cloud.capacity + len(disc))


def fill_ground_plane_simple(cloud: PointCloud, base_pose: np.ndarray,
                             radius: float, resolution: float) -> PointCloud:
    """Disc on the base pose's own xy-plane (z=0 in base frame)."""
    R = np.asarray(se3.pose_rotation(jnp.asarray(base_pose)))
    center = np.asarray(base_pose[:3], np.float64)
    normal = R[:, 2]
    disc = _ring_points(center.astype(np.float32),
                        normal.astype(np.float32), radius, resolution)
    extra = PointCloud.from_array(disc, capacity=len(disc))
    return merge(cloud, extra, capacity=cloud.capacity + len(disc))
