"""Device-resident scan-matching odometry: one jitted step, zero host syncs.

models/odometry.py mirrors the reference's host-side control flow, reading
back scalars every scan. Through a remote TPU link every host round trip
costs ~26 ms — more than the compute itself. This variant keeps the whole
odometry state machine on device:

- the carry holds the keyframe target, poses, and switch bookkeeping;
- the keyframe switch (scan_matching_odometry_component.cpp:326-339) is a
  masked select instead of a host branch — for GICP-family methods the
  would-be keyframe target IS the current source (same cloud, same
  covariances), so "rebuilding the target" is free;
- the host streams scans and fetches pose batches at whatever cadence it
  likes (`run_batch` scans a whole frame block in one dispatch).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..config import ScanMatchingOdometryConfig
from ..ops import registration as reg
from ..ops.cloud import PointCloud
from ..ops.covariance import GICPCloud
from ..utils import se3


class OdomCarry(NamedTuple):
    target_points: jnp.ndarray   # (P,3) keyframe cloud
    target_mask: jnp.ndarray     # (P,)
    target_covs: jnp.ndarray     # (P,3,3)
    keyframe_pose: jnp.ndarray   # (7,) odom frame
    keyframe_stamp: jnp.ndarray  # f32
    prev_rel: jnp.ndarray        # (7,) keyframe -> last scan
    last_delta: jnp.ndarray      # (7,) scan-to-scan
    prev_pose: jnp.ndarray       # (7,)
    initialized: jnp.ndarray     # bool
    rejections: jnp.ndarray      # i32 consecutive jump rejections


class OdomStepOut(NamedTuple):
    pose: jnp.ndarray            # (7,)
    delta: jnp.ndarray           # (7,)
    is_new_keyframe: jnp.ndarray  # bool
    converged: jnp.ndarray       # bool
    error: jnp.ndarray           # f32
    num_inliers: jnp.ndarray     # i32
    # (P,3,3) source GICP covariances of this scan — the back-end's
    # per-keyframe cache wants exactly these (PairRunner.gicp), so a
    # front-end with covariance-compatible registration settings
    # (reg.covariance_compatible) hands them to process_scan and the
    # tick's covariance prefetch dispatch disappears (measured ~300 ms
    # of the production tick's device wall, r5 probe)
    covs: jnp.ndarray


def init_carry(capacity: int) -> OdomCarry:
    ident = jnp.asarray(se3.pose_identity())
    return OdomCarry(
        target_points=jnp.full((capacity, 3), 1.0e6, jnp.float32),
        target_mask=jnp.zeros(capacity, bool),
        target_covs=jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32),
                                     (capacity, 3, 3)),
        keyframe_pose=ident, keyframe_stamp=jnp.float32(0.0),
        prev_rel=ident, last_delta=ident, prev_pose=ident,
        initialized=jnp.bool_(False), rejections=jnp.int32(0))


def _split_odom(cfg: ScanMatchingOdometryConfig):
    """Static program identity vs traced thresholds (see reg.split_reg)."""
    stat, reg_dyn = reg.split_reg(cfg.registration)
    dyn = dict(reg=reg_dyn,
               kf_trans=jnp.float32(cfg.keyframe_delta_translation),
               kf_angle=jnp.float32(cfg.keyframe_delta_angle),
               kf_time=jnp.float32(cfg.keyframe_delta_time),
               thresholding=jnp.bool_(cfg.enable_transform_thresholding),
               max_trans=jnp.float32(cfg.max_acceptable_translation),
               max_angle=jnp.float32(cfg.max_acceptable_angle),
               max_rejections=jnp.int32(cfg.max_consecutive_rejections))
    return stat, dyn


def odometry_step(cfg: ScanMatchingOdometryConfig, carry: OdomCarry,
                  points: jnp.ndarray, mask: jnp.ndarray,
                  stamp: jnp.ndarray) -> Tuple[OdomCarry, OdomStepOut]:
    """One fully-jitted frame-to-keyframe odometry step (GICP family)."""
    stat, dyn = _split_odom(cfg)
    return _odometry_step_split(stat, dyn, carry, points, mask, stamp)


@functools.partial(jax.jit, static_argnames=("stat",))
def _odometry_step_split(stat, dyn, carry: OdomCarry,
                         points: jnp.ndarray, mask: jnp.ndarray,
                         stamp: jnp.ndarray) -> Tuple[OdomCarry, OdomStepOut]:
    params = reg.RegView(stat, dyn["reg"])
    assert reg.is_gicp_like(params.registration_method), (
        "fused odometry supports the GICP family; use models.odometry for "
        "voxel-target methods")
    cloud = PointCloud(points, mask)
    source = reg.make_source(cloud, params)

    guess = se3.pose_compose(carry.prev_rel, carry.last_delta)
    target = reg.RegistrationTarget(gicp=GICPCloud(
        carry.target_points, carry.target_mask, carry.target_covs))
    result = reg._align_impl(params, source, target, guess,
                             params.reg_maximum_iterations)

    # keep-last on failure (scan_matching_odometry_component.cpp:270-273):
    # a registration that lost ALL correspondences returns its (possibly
    # garbage) running pose — accepting it poisons `last_delta`, and the
    # constant-velocity guess then launches every subsequent solve out of
    # correspondence range (a permanent ~keyframe-sized ping-pong observed
    # on-chip). Zero inliers / non-finite gates acceptance; solves that
    # merely exhausted the iteration budget keep their (useful) estimate,
    # like the reference front-end, with the jump-rejection gate below as
    # the guard against inlier-rich-but-wrong aliased alignments.
    ok = (result.num_inliers > 0) & jnp.isfinite(result.pose).all()
    rel = jnp.where(ok, result.pose, carry.prev_rel)

    # transform-jump rejection with forced re-acceptance after
    # max_consecutive_rejections (:278-315), as masked selects
    jd = se3.pose_between(carry.prev_rel, rel)
    jump = ((jnp.linalg.norm(jd[:3]) > dyn["max_trans"])
            | (se3.rotation_angle(jd[3:7]) > dyn["max_angle"]))
    reject = (dyn["thresholding"] & jump
              & (carry.rejections < dyn["max_rejections"]))
    rel = jnp.where(reject, carry.prev_rel, rel)
    rejections = jnp.where(dyn["thresholding"] & jump,
                           jnp.where(reject, carry.rejections + 1,
                                     jnp.int32(0)),
                           jnp.int32(0))

    pose = se3.pose_compose(carry.keyframe_pose, rel)
    delta = se3.pose_between(carry.prev_pose, pose)

    dt = jnp.linalg.norm(rel[:3])
    da = se3.rotation_angle(rel[3:7])
    dtime = stamp - carry.keyframe_stamp
    new_kf = ((dt > dyn["kf_trans"])
              | (da > dyn["kf_angle"])
              | (dtime > dyn["kf_time"])
              | ~carry.initialized)

    # first frame: become the keyframe at identity with identity rel
    pose = jnp.where(carry.initialized, pose,
                     jnp.asarray(se3.pose_identity()))
    delta = jnp.where(carry.initialized, delta,
                      jnp.asarray(se3.pose_identity()))
    rel_out = jnp.where(new_kf, jnp.asarray(se3.pose_identity()), rel)

    sel = lambda a, b: jnp.where(new_kf, a, b)
    carry2 = OdomCarry(
        target_points=sel(source.points, carry.target_points),
        target_mask=jnp.where(new_kf, source.mask, carry.target_mask),
        target_covs=sel(source.covs, carry.target_covs),
        keyframe_pose=sel(pose, carry.keyframe_pose),
        keyframe_stamp=jnp.where(new_kf, jnp.float32(stamp),
                                 carry.keyframe_stamp),
        prev_rel=rel_out, last_delta=delta, prev_pose=pose,
        initialized=jnp.bool_(True), rejections=rejections)
    out = OdomStepOut(pose=pose, delta=delta, is_new_keyframe=new_kf,
                      converged=ok,
                      error=result.error, num_inliers=result.num_inliers,
                      covs=source.covs)
    return carry2, out


def run_batch(cfg: ScanMatchingOdometryConfig, carry: OdomCarry,
              points: jnp.ndarray, masks: jnp.ndarray,
              stamps: jnp.ndarray) -> Tuple[OdomCarry, OdomStepOut]:
    """Scan a whole (F, P, 3) frame block in ONE device program.

    The odometry chain is inherently sequential; `lax.scan` keeps the
    sequence on device so the host pays one dispatch + one fetch per block
    instead of per frame.
    """
    stat, dyn = _split_odom(cfg)
    return _run_batch_split(stat, dyn, carry, points, masks, stamps)


@functools.partial(jax.jit, static_argnames=("stat",))
def _run_batch_split(stat, dyn, carry: OdomCarry,
                     points: jnp.ndarray, masks: jnp.ndarray,
                     stamps: jnp.ndarray) -> Tuple[OdomCarry, OdomStepOut]:
    def body(c, frame):
        pts, m, s = frame
        c2, out = _odometry_step_split(stat, dyn, c, pts, m, s)
        return c2, out

    return jax.lax.scan(body, carry, (points, masks, stamps))


def run_batch_multi(cfg: ScanMatchingOdometryConfig, carries: OdomCarry,
                    points: jnp.ndarray, masks: jnp.ndarray,
                    stamps: jnp.ndarray) -> Tuple[OdomCarry, OdomStepOut]:
    """R robots' frame blocks in ONE device program.

    `carries` is a robot-stacked OdomCarry pytree (leading axis R, stack
    per-robot `init_carry` trees with `jax.tree.map(jnp.stack, ...)`);
    points/masks/stamps are (R, F, ...) blocks. The per-robot odometry
    chains are independent, so the robot axis vmaps over the `lax.scan` —
    R co-hosted robots cost one dispatch + one fetch per block instead of
    R (the reference runs one ScanMatchingOdometryComponent process per
    robot; here robots batch like everything else on the chip).
    """
    stat, dyn = _split_odom(cfg)
    return _run_batch_multi_split(stat, dyn, carries, points, masks, stamps)


@functools.partial(jax.jit, static_argnames=("stat",))
def _run_batch_multi_split(stat, dyn, carries: OdomCarry,
                           points: jnp.ndarray, masks: jnp.ndarray,
                           stamps: jnp.ndarray
                           ) -> Tuple[OdomCarry, OdomStepOut]:
    def scan_one(carry, pts, msk, stp):
        def body(c, frame):
            return _odometry_step_split(stat, dyn, c, *frame)

        return jax.lax.scan(body, carry, (pts, msk, stp))

    return jax.vmap(scan_one)(carries, points, masks, stamps)
