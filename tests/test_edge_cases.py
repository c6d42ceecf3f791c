"""Edge-case coverage: jump rejection, LoopManager, info matrix weights."""

import numpy as np
import jax.numpy as jnp
import pytest

from mrg_slam_tpu.config import (InformationMatrixConfig,
                                 RegistrationConfig,
                                 ScanMatchingOdometryConfig)
from mrg_slam_tpu.models.information_matrix import InformationMatrixCalculator
from mrg_slam_tpu.models.keyframe import KeyFrame
from mrg_slam_tpu.models.graph_database import Loop
from mrg_slam_tpu.models.loop_detector import LoopManager
from mrg_slam_tpu.models.odometry import ScanMatchingOdometry
from mrg_slam_tpu.ops.cloud import PointCloud
from mrg_slam_tpu.utils import se3


def _kf(name, slam_uuid, accum):
    return KeyFrame(robot_name=name, stamp=0.0,
                    odom=np.asarray(se3.pose_identity()),
                    accum_distance=accum, cloud=PointCloud.empty(1),
                    slam_uuid=slam_uuid)


def test_loop_manager_accum_distance_keeps_newest():
    lm = LoopManager()
    a1 = _kf("a", "slamA", 10.0)
    b = _kf("b", "slamB", 5.0)
    lm.add_loop_accum_distance_check(Loop(a1, b, np.zeros(7)))
    assert lm.get_loop("slamA", "slamB").key1 is a1
    # older loop (lower accum) must NOT overwrite
    a0 = _kf("a", "slamA", 4.0)
    lm.add_loop_accum_distance_check(Loop(a0, b, np.zeros(7)))
    assert lm.get_loop("slamA", "slamB").key1 is a1
    # newer one does
    a2 = _kf("a", "slamA", 20.0)
    lm.add_loop_accum_distance_check(Loop(a2, b, np.zeros(7)))
    assert lm.get_loop("slamA", "slamB").key1 is a2
    assert lm.get_loop("slamX", "slamB") is None


def test_transform_jump_rejection(rng):
    """A sudden implausible jump keeps the previous relative pose until
    max_consecutive_rejections forces re-acceptance
    (scan_matching_odometry_component.cpp:278-315)."""
    cfg = ScanMatchingOdometryConfig(
        enable_transform_thresholding=True,
        max_acceptable_translation=0.5, max_acceptable_angle=0.5,
        max_consecutive_rejections=3,
        registration=RegistrationConfig())
    odom = ScanMatchingOdometry(cfg)
    odom._prev_rel = np.asarray(se3.pose_identity())
    jump = np.asarray([5.0, 0, 0, 1, 0, 0, 0], np.float32)
    # first two rejections return the previous rel
    for _ in range(2):
        out = odom._apply_jump_rejection(jump)
        np.testing.assert_allclose(out, np.asarray(se3.pose_identity()))
    # third consecutive rejection force-accepts (deadlock avoidance)
    out = odom._apply_jump_rejection(jump)
    np.testing.assert_allclose(out, jump)
    # counter reset after acceptance
    assert odom._rejections == 0


def test_information_matrix_weight_interpolation():
    cfg = InformationMatrixConfig()
    calc = InformationMatrixCalculator(cfg)
    # fitness 0 -> tightest information (1/min_var)
    inf0 = calc.from_fitness(0.0)
    np.testing.assert_allclose(inf0[0, 0], 1.0 / cfg.min_stddev_x ** 2,
                               rtol=1e-5)
    np.testing.assert_allclose(inf0[5, 5], 1.0 / cfg.min_stddev_q ** 2,
                               rtol=1e-5)
    # fitness at the threshold -> loosest (1/max_var)
    inf1 = calc.from_fitness(cfg.fitness_score_thresh)
    np.testing.assert_allclose(inf1[0, 0], 1.0 / cfg.max_stddev_x ** 2,
                               rtol=1e-5)
    # monotone in between
    mid = calc.from_fitness(cfg.fitness_score_thresh / 2)
    assert inf1[0, 0] < mid[0, 0] < inf0[0, 0]
    # constant path reproduces the reference's stddev (not variance) quirk
    c = InformationMatrixCalculator(InformationMatrixConfig(
        use_const_inf_matrix=True, const_stddev_x=0.5, const_stddev_q=0.1))
    inf_c = c.from_fitness(123.0)
    np.testing.assert_allclose(inf_c[0, 0], 1.0 / 0.5)
    np.testing.assert_allclose(inf_c[5, 5], 1.0 / 0.1)


def test_keyframe_updater_angle_gate():
    from mrg_slam_tpu.models.keyframe_updater import KeyframeUpdater

    up = KeyframeUpdater(keyframe_delta_trans=1.0, keyframe_delta_angle=0.5)
    assert up.update(np.asarray(se3.pose_identity()))  # first always
    # small motion: rejected
    assert not up.update(np.asarray([0.2, 0, 0, 1, 0, 0, 0], np.float32))
    # big rotation alone: accepted
    q = np.asarray(se3.rpy_to_quat(jnp.float32(0), jnp.float32(0),
                                   jnp.float32(0.6)))
    assert up.update(np.concatenate([[0.2, 0, 0], q]).astype(np.float32))
    # accum distance counts translation of accepted keyframes
    assert up.accum_distance == pytest.approx(0.2, abs=1e-6)
