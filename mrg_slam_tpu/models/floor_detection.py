"""Ground-plane extraction per scan (apps/floor_detection_component.cpp).

Pipeline (detect :100-190): tilt compensation -> height clip around the
expected floor level -> optional normal filtering (keep near-vertical
normals) -> batched plane RANSAC -> verticality check -> normal flip so
the floor normal points up. Emits FloorCoeffs (n, d with n.x + d = 0, in
the base frame) or None.

The reference declares `enable_normal_filtering` but reads
`use_normal_filtering` (:61 vs :120) — a latent param bug this re-design
does not reproduce: one flag, used consistently.
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import FloorDetectionConfig
from ..ops.cloud import PAD_VALUE, PointCloud
from ..ops.ransac import estimate_normals, ransac_plane
from ..utils import se3


@dataclasses.dataclass
class FloorCoeffs:
    stamp: float
    coeffs: np.ndarray  # (4,)


class FloorDetection:
    def __init__(self, cfg: FloorDetectionConfig, seed: int = 0):
        self.cfg = cfg
        self._key = jax.random.PRNGKey(seed)

    def detect(self, cloud: PointCloud, stamp: float = 0.0
               ) -> Optional[FloorCoeffs]:
        cfg = self.cfg
        self._key, key = jax.random.split(self._key)
        coeffs, n_inliers, ok = _detect_jit(
            cloud, key, cfg.tilt_deg, cfg.sensor_height,
            cfg.height_clip_range, cfg.enable_normal_filtering,
            cfg.normal_filter_thresh_deg, cfg.ransac_distance_thresh,
            cfg.floor_normal_thresh_deg, cfg.ransac_iterations)
        if not bool(ok) or int(n_inliers) < cfg.floor_pts_thresh:
            return None
        return FloorCoeffs(stamp=stamp,
                           coeffs=np.asarray(coeffs, np.float32))


@functools.partial(jax.jit, static_argnames=(
    "tilt_deg", "sensor_height", "height_clip_range", "use_normal_filter",
    "normal_filter_thresh_deg", "ransac_distance_thresh",
    "floor_normal_thresh_deg", "num_hypotheses"))
def _detect_jit(cloud: PointCloud, key, tilt_deg: float,
                sensor_height: float, height_clip_range: float,
                use_normal_filter: bool, normal_filter_thresh_deg: float,
                ransac_distance_thresh: float,
                floor_normal_thresh_deg: float, num_hypotheses: int):
    # tilt compensation (:109-116): un-rotate the sensor's pitch
    tilt = jnp.float32(math.radians(tilt_deg))
    R = se3.so3_exp(jnp.asarray([0.0, 1.0, 0.0]) * tilt)
    # precision pin: rotating ~45 m LiDAR coordinates through a bf16 MXU
    # matmul injects ~0.1 m noise, which the height clip and the RANSAC
    # inlier threshold (same scale) then amplify into a garbage floor fit
    pts = jnp.matmul(cloud.points, R.T, precision=jax.lax.Precision.HIGHEST)
    # height clip around the floor level z = -sensor_height (:192-214)
    z = pts[..., 2]
    mask = (cloud.mask & (z > -sensor_height - height_clip_range)
            & (z < -sensor_height + height_clip_range))
    clipped = PointCloud(jnp.where(mask[:, None], pts, PAD_VALUE), mask)

    if use_normal_filter:
        normals = estimate_normals(clipped, k=10)
        cos_t = jnp.cos(jnp.float32(
            math.radians(normal_filter_thresh_deg)))
        vertical = jnp.abs(normals[..., 2]) > cos_t
        mask = mask & vertical
        clipped = PointCloud(
            jnp.where(mask[:, None], clipped.points, PAD_VALUE), mask)

    fit = ransac_plane(clipped, key, ransac_distance_thresh,
                       num_hypotheses=num_hypotheses)
    # verticality check (:153-161): the plane normal must be near +-z
    cos_v = jnp.cos(jnp.float32(math.radians(floor_normal_thresh_deg)))
    vertical_ok = jnp.abs(fit.coeffs[2]) > cos_v
    # normal flip (:165): normal points up
    coeffs = jnp.where(fit.coeffs[2] < 0, -fit.coeffs, fit.coeffs)
    # undo tilt so coeffs live in the original base frame
    n_base = jnp.matmul(R.T, coeffs[:3],
                        precision=jax.lax.Precision.HIGHEST)
    coeffs = jnp.concatenate([n_base, coeffs[3:4]])
    return coeffs, fit.num_inliers, fit.valid & vertical_ok
