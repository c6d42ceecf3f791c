"""Per-scan point-cloud conditioning (the Prefiltering component).

TPU-native re-design of apps/prefiltering_component.cpp: one jitted function
per stage over padded clouds; the composed `prefilter` mirrors the
reference's stage order `deskew -> distance_filter -> downsample ->
outlier_removal` (cloud_callback :116-155).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from ..config import PrefilterConfig
from ..utils import se3
from . import knn, voxel
from .cloud import PAD_VALUE, PointCloud, compact


@jax.jit
def distance_filter(cloud: PointCloud, near: float, far: float) -> PointCloud:
    """Keep points with near <= ||p|| <= far (prefiltering_component.cpp:206).

    The norm is taken in the sensor/base frame, matching the reference which
    filters before any map transform.
    """
    d = jnp.linalg.norm(cloud.points, axis=-1)
    mask = cloud.mask & (d > near) & (d < far)
    pts = jnp.where(mask[:, None], cloud.points, PAD_VALUE)
    return PointCloud(pts, mask)


@functools.partial(jax.jit, static_argnames=("mean_k",))
def statistical_outlier_mask(cloud: PointCloud, mean_k: int,
                             stddev_mult: float) -> jnp.ndarray:
    """pcl::StatisticalOutlierRemoval semantics
    (prefiltering_component.cpp:182-193): per-point mean distance to k NN;
    drop points whose mean distance exceeds global mean + mult * stddev.

    Cost note: this is exact O(N^2) brute-force kNN (MXU distance tiles +
    top_k). That is acceptable by construction: the pipeline applies
    outlier removal AFTER voxel downsampling, same as the reference
    (prefiltering_component.cpp:149-151), so N here is bounded by
    `capacity_filtered_points` (4-8k), never the 32k+ raw scan size.
    """
    d2, _ = knn.knn(cloud.points, cloud.points, cloud.mask, k=mean_k + 1)
    # first neighbor is self (distance 0)
    mean_d = jnp.mean(jnp.sqrt(jnp.maximum(d2[:, 1:], 0.0)), axis=-1)
    valid = cloud.mask
    n = jnp.maximum(jnp.sum(valid), 1)
    mu = jnp.sum(jnp.where(valid, mean_d, 0.0)) / n
    var = jnp.sum(jnp.where(valid, (mean_d - mu) ** 2, 0.0)) / n
    thresh = mu + stddev_mult * jnp.sqrt(var)
    return valid & (mean_d <= thresh)


@jax.jit
def deskew(cloud: PointCloud, point_time_frac: jnp.ndarray,
           ang_vel: jnp.ndarray, scan_period: float) -> PointCloud:
    """Constant-angular-velocity rotation unwarp
    (prefiltering_component.cpp:231-258): rotate each point back by the
    rotation accumulated since scan start, theta_i = omega * t_i with
    t_i = point_time_frac * scan_period.
    """
    ang = point_time_frac[:, None] * scan_period * ang_vel[None, :]
    R = se3.so3_exp(-ang)  # undo rotation
    # precision pin: this per-point rotation touches RAW coordinates
    # (~45 m); through a bf16 MXU contraction the near-identity rotation
    # still rounds the dominant term, injecting ~0.1 m of noise into
    # every deskewed cloud on-chip
    pts = jnp.einsum("nij,nj->ni", R, cloud.points,
                     precision=jax.lax.Precision.HIGHEST)
    pts = jnp.where(cloud.mask[:, None], pts, PAD_VALUE)
    return PointCloud(pts, cloud.mask)


def prefilter(cloud: PointCloud, cfg: PrefilterConfig,
              base_transform: Optional[jnp.ndarray] = None,
              ang_vel: Optional[jnp.ndarray] = None,
              point_time_frac: Optional[jnp.ndarray] = None) -> PointCloud:
    """Full prefiltering pipeline; returns a compacted cloud of
    `cfg.capacity_filtered_points`.

    `base_transform` is the sensor->base_link pose (7-vec), applied like the
    reference's tf transform to base frame (prefiltering_component.cpp:129).
    """
    if cfg.enable_deskewing and ang_vel is not None and point_time_frac is not None:
        cloud = deskew(cloud, point_time_frac, ang_vel, cfg.scan_period)
    if base_transform is not None:
        cloud = cloud.transformed(base_transform)
    if cfg.enable_distance_filter:
        cloud = distance_filter(cloud, cfg.distance_near_thresh,
                                cfg.distance_far_thresh)
    if cfg.downsample_method in ("VOXELGRID", "APPROX_VOXELGRID"):
        # absolute_origin: per-scan grids quantize translation-invariantly
        # so overlapping keyframes keep consistent voxel subsets
        cloud = voxel.voxel_downsample(
            cloud, cfg.downsample_resolution,
            min_points=cfg.downsample_min_points_per_voxel,
            capacity=cfg.capacity_filtered_points, absolute_origin=True)
    else:
        cloud = compact(cloud, cfg.capacity_filtered_points)
    if cfg.outlier_removal_method == "RADIUS":
        # exact pcl::RadiusOutlierRemoval semantics; the Pallas accumulation
        # kernel makes the exact count cheaper on TPU than the voxel-bucket
        # approximation (which leans on searchsorted gathers)
        counts = knn.radius_count(cloud.points, cloud.mask, cfg.radius_radius)
        mask = cloud.mask & (counts >= cfg.radius_min_neighbors)
        cloud = PointCloud(
            jnp.where(mask[:, None], cloud.points, PAD_VALUE), mask)
    elif cfg.outlier_removal_method == "STATISTICAL":
        mask = statistical_outlier_mask(
            cloud, cfg.statistical_mean_k, cfg.statistical_stddev)
        cloud = PointCloud(
            jnp.where(mask[:, None], cloud.points, PAD_VALUE), mask)
    return cloud
