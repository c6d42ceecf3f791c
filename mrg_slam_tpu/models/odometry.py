"""Scan-matching odometry: frame-to-keyframe registration with keyframe
switching and transform-jump rejection.

TPU re-design of apps/scan_matching_odometry_component.cpp: the ROS
callback becomes `ScanMatchingOdometry.step`, a host-side orchestrator
around two jitted programs — the registration `align` (the hot loop,
:266) and the target preprocessing on keyframe switch (:326-339). All
data-dependent branching (rejection logic :278-315, keyframe switch) runs
on host scalars; the arrays never leave the device.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax.numpy as jnp
import numpy as np

from ..config import ScanMatchingOdometryConfig
from ..ops import registration as reg
from ..ops import voxel
from ..ops.cloud import PointCloud
from ..utils import se3


@dataclasses.dataclass
class ScanMatchingStatus:
    """Mirror of mrg_slam_msgs/ScanMatchingStatus
    (scan_matching_odometry_component.cpp:391-430)."""

    has_converged: bool = True
    matching_error: float = 0.0
    inlier_fraction: float = 1.0
    relative_pose: Optional[np.ndarray] = None
    prediction_labels: tuple = ()


class OdometryOutput(NamedTuple):
    pose: np.ndarray       # (7,) odom-frame pose of this scan
    delta: np.ndarray      # (7,) relative pose w.r.t. previous scan
    is_new_keyframe: bool
    status: ScanMatchingStatus


class ScanMatchingOdometry:
    """Frame-to-keyframe odometry with internal keyframe switching."""

    def __init__(self, cfg: ScanMatchingOdometryConfig):
        self.cfg = cfg
        self.params = cfg.registration
        self._keyframe_pose: Optional[np.ndarray] = None  # odom frame (7,)
        self._keyframe_stamp: float = 0.0
        self._target = None          # RegistrationTarget of keyframe cloud
        self._keyframe_cloud = None  # PointCloud (downsampled)
        self._prev_rel = np.asarray(se3.pose_identity())  # keyframe->last scan
        self._last_delta = np.asarray(se3.pose_identity())  # scan-to-scan
        self._prev_pose = np.asarray(se3.pose_identity())
        self._rejections = 0
        # external initial-guess sources (:152-158, :210-263)
        self._msf_pose: Optional[tuple] = None               # (stamp, pose7)
        self._msf_pose_after_update: Optional[tuple] = None  # (stamp, pose7)
        self._robot_odom_prev: Optional[np.ndarray] = None   # pose7
        self._robot_odom_cur: Optional[np.ndarray] = None

    # ------------------------------------------------------------------
    # external initial-guess feeds
    # ------------------------------------------------------------------
    def msf_pose_callback(self, stamp: float, pose7: np.ndarray,
                          after_update: bool) -> None:
        """MSF-filtered pose stream (msf_core/pose[_after_update],
        scan_matching_odometry_component.cpp:152-158)."""
        entry = (float(stamp), np.asarray(pose7, np.float32))
        if after_update:
            self._msf_pose_after_update = entry
        else:
            self._msf_pose = entry

    def robot_odom_callback(self, pose7: np.ndarray) -> None:
        """Secondary robot odometry sample for this scan (the reference
        looks the same delta up from TF, :225-263)."""
        self._robot_odom_prev = self._robot_odom_cur
        self._robot_odom_cur = np.asarray(pose7, np.float32)

    def _msf_delta(self):
        """-> (delta7 | None, source label) per :210-263."""
        from ..utils import se3np

        if self.cfg.enable_imu_frontend:
            if (self._msf_pose is not None
                    and self._msf_pose[0] > self._keyframe_stamp
                    and self._msf_pose_after_update is not None
                    and self._msf_pose_after_update[0] > self._keyframe_stamp):
                return se3np.pose_between(self._msf_pose_after_update[1],
                                          self._msf_pose[1]), "imu"
            return None, ""  # msf data too old (reference warns, :223)
        if (self.cfg.enable_robot_odometry_init_guess
                and self._robot_odom_prev is not None):
            return se3np.pose_between(self._robot_odom_prev,
                                      self._robot_odom_cur), "odometry"
        return None, ""

    # ------------------------------------------------------------------
    def _downsample(self, cloud: PointCloud) -> PointCloud:
        if self.cfg.downsample_method in ("VOXELGRID", "APPROX_VOXELGRID"):
            return voxel.voxel_downsample(
                cloud, self.cfg.downsample_resolution,
                min_points=self.cfg.downsample_min_points_per_voxel,
                capacity=cloud.capacity)
        return cloud

    def _set_keyframe(self, cloud: PointCloud, pose: np.ndarray,
                      stamp: float) -> None:
        self._keyframe_cloud = cloud
        self._target = reg.make_target(cloud, self.params)
        self._keyframe_pose = np.asarray(pose, dtype=np.float32)
        self._keyframe_stamp = stamp
        self._prev_rel = np.asarray(se3.pose_identity())

    # ------------------------------------------------------------------
    def step(self, cloud: PointCloud, stamp: float) -> OdometryOutput:
        """Process one prefiltered scan; returns the odometry estimate.

        Equivalent of cloud_callback + matching()
        (scan_matching_odometry_component.cpp:138,195).
        """
        cloud = self._downsample(cloud)
        if self._keyframe_pose is None:
            self._set_keyframe(cloud, se3.pose_identity(), stamp)
            self._prev_pose = np.asarray(se3.pose_identity())
            return OdometryOutput(
                pose=self._prev_pose, delta=np.asarray(se3.pose_identity()),
                is_new_keyframe=True, status=ScanMatchingStatus())

        source = reg.make_source(cloud, self.params)
        # initial guess = prev_trans * msf_delta (:266). The delta comes
        # from the MSF/robot-odometry frontends when enabled; otherwise the
        # last scan-to-scan delta (constant-velocity model — a strict
        # improvement over the reference's identity fallback).
        msf_delta, msf_source = self._msf_delta()
        delta_guess = (msf_delta if msf_delta is not None
                       else self._last_delta)
        guess = se3.pose_compose(jnp.asarray(self._prev_rel),
                                 jnp.asarray(delta_guess))
        result = reg.align(self.params, source, self._target, guess)

        # keep-last on failure, matching the fused path
        # (odometry_fused.py): a registration that lost ALL correspondences
        # returns its garbage running pose; accepting it poisons
        # `last_delta` and the constant-velocity guess launches every
        # subsequent solve out of correspondence range. Zero inliers /
        # non-finite gates acceptance; solves that merely exhausted the
        # iteration budget keep their (useful) estimate, like the
        # reference front-end (scan_matching_odometry_component.cpp:270-273).
        converged = bool(result.converged) or int(result.iterations) > 0
        rel = np.asarray(result.pose, dtype=np.float32)
        if int(result.num_inliers) <= 0 or not np.isfinite(rel).all():
            converged = False

        if not converged:
            # keep last odometry (reference :270-273 returns keep-last pose)
            rel = self._prev_rel
        else:
            rel = self._apply_jump_rejection(rel)

        pose = np.asarray(se3.pose_compose(
            jnp.asarray(self._keyframe_pose), jnp.asarray(rel)),
            dtype=np.float32)
        delta = np.asarray(se3.pose_between(
            jnp.asarray(self._prev_pose), jnp.asarray(pose)),
            dtype=np.float32)

        status = ScanMatchingStatus(
            has_converged=converged,
            matching_error=float(result.error),
            inlier_fraction=float(result.num_inliers) /
            max(1, int(np.asarray(cloud.mask).sum())),
            relative_pose=rel,
            prediction_labels=(msf_source,) if msf_source else (),
        )

        # keyframe switch on accumulated motion (:326-339)
        dt = float(np.linalg.norm(rel[:3]))
        da = float(se3.rotation_angle(jnp.asarray(rel[3:7])))
        dtime = stamp - self._keyframe_stamp
        new_kf = (dt > self.cfg.keyframe_delta_translation
                  or da > self.cfg.keyframe_delta_angle
                  or dtime > self.cfg.keyframe_delta_time)
        if new_kf:
            self._set_keyframe(cloud, pose, stamp)
        else:
            self._prev_rel = rel
        self._last_delta = delta
        self._prev_pose = pose
        return OdometryOutput(pose=pose, delta=delta, is_new_keyframe=new_kf,
                              status=status)

    # ------------------------------------------------------------------
    def _apply_jump_rejection(self, rel: np.ndarray) -> np.ndarray:
        """Transform thresholding (:278-315): reject implausible jumps,
        force-accept after max_consecutive_rejections to avoid deadlock."""
        if not self.cfg.enable_transform_thresholding:
            return rel
        delta = np.asarray(se3.pose_between(jnp.asarray(self._prev_rel),
                                            jnp.asarray(rel)))
        dt = float(np.linalg.norm(delta[:3]))
        da = float(se3.rotation_angle(jnp.asarray(delta[3:7])))
        if (dt > self.cfg.max_acceptable_translation
                or da > self.cfg.max_acceptable_angle):
            self._rejections += 1
            if self._rejections < self.cfg.max_consecutive_rejections:
                return self._prev_rel
        self._rejections = 0
        return rel
