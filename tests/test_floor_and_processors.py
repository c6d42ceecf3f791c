"""Floor detection, RANSAC, GPS/IMU/floor processors, geodesy, NMEA."""

import dataclasses
import math

import jax
import numpy as np
import jax.numpy as jnp
import pytest

from mrg_slam_tpu.config import (FloorCoeffsConfig, FloorDetectionConfig,
                                 GpsConfig, ImuConfig, OptimizerConfig,
                                 SlamConfig)
from mrg_slam_tpu.models.floor_detection import FloorCoeffs, FloorDetection
from mrg_slam_tpu.models.graph_database import GraphDatabase
from mrg_slam_tpu.models.processors import (FloorCoeffsProcessor, GpsFix,
                                            GpsProcessor, ImuProcessor,
                                            ImuSample)
from mrg_slam_tpu.ops.cloud import PointCloud
from mrg_slam_tpu.ops.ransac import estimate_normals, ransac_plane
from mrg_slam_tpu.utils import se3
from mrg_slam_tpu.utils.geodesy import LocalCartesian, latlon_to_utm
from mrg_slam_tpu.utils.nmea import checksum_ok, parse_gprmc


def test_ransac_plane(rng):
    n = 800
    plane_pts = np.stack([rng.uniform(-5, 5, n), rng.uniform(-5, 5, n),
                          0.02 * rng.normal(size=n) + 1.0], axis=1)
    noise = rng.uniform(-5, 5, size=(150, 3))
    pc = PointCloud.from_array(
        np.concatenate([plane_pts, noise]).astype(np.float32), capacity=1024)
    fit = ransac_plane(pc, jax.random.PRNGKey(0), distance_thresh=0.1)
    coeffs = np.asarray(fit.coeffs)
    n_hat = coeffs[:3] * np.sign(coeffs[2])
    assert abs(n_hat[2]) > 0.99
    # plane z=1 -> n=(0,0,1), d=-1
    assert abs(coeffs[3] / coeffs[2] + 1.0) < 0.05
    assert int(fit.num_inliers) > 600


def test_estimate_normals_plane(rng):
    pts = np.stack([rng.uniform(-2, 2, 300), rng.uniform(-2, 2, 300),
                    np.zeros(300)], axis=1).astype(np.float32)
    pc = PointCloud.from_array(pts, capacity=512)
    nm = np.asarray(estimate_normals(pc, k=8))[:300]
    assert (np.abs(nm[:, 2]) > 0.99).all()


def test_floor_detection(rng):
    # ground at z = -2 (sensor 2 m above floor) + a wall to ignore
    n = 2000
    ground = np.stack([rng.uniform(-10, 10, n), rng.uniform(-10, 10, n),
                       -2.0 + 0.02 * rng.normal(size=n)], axis=1)
    wall = np.stack([rng.uniform(-10, 10, 500),
                     np.full(500, 5.0), rng.uniform(-2, 2, 500)], axis=1)
    pc = PointCloud.from_array(
        np.concatenate([ground, wall]).astype(np.float32), capacity=4096)
    det = FloorDetection(FloorDetectionConfig(
        enable_floor_detection=True, sensor_height=2.0,
        height_clip_range=1.0, floor_pts_thresh=256))
    fc = det.detect(pc, stamp=1.0)
    assert fc is not None
    c = fc.coeffs
    assert c[2] > 0.99           # normal up
    assert abs(c[3] - 2.0) < 0.1  # n.x + d = 0 at z=-2 -> d = 2


def test_floor_detection_rejects_tilted(rng):
    # 45-degree "ground" must fail the verticality check
    n = 2000
    tilted = np.stack([rng.uniform(-10, 10, n), rng.uniform(-10, 10, n),
                       np.zeros(n)], axis=1)
    tilted[:, 2] = -2.0 + tilted[:, 0]  # 45 deg slope
    pc = PointCloud.from_array(tilted.astype(np.float32), capacity=2048)
    det = FloorDetection(FloorDetectionConfig(
        enable_floor_detection=True, sensor_height=2.0,
        height_clip_range=3.0, floor_pts_thresh=100,
        enable_normal_filtering=False))
    assert det.detect(pc, stamp=0.0) is None


def _db(**kw):
    cfg = SlamConfig(capacity_keyframes=32, capacity_edges=64,
                     optimizer=OptimizerConfig(solver_backend="dense"), **kw)
    return GraphDatabase(cfg)


def _add_kf(db, stamp, pose):
    kf = db.add_odom_keyframe(stamp, np.asarray(pose, np.float32), stamp,
                              PointCloud.empty(8))
    db.flush_keyframe_queue(np.asarray(se3.pose_identity()))
    return kf


def test_gps_processor_utm_priors():
    db = _db()
    k1 = _add_kf(db, 0.0, se3.pose_identity())
    k2 = _add_kf(db, 1.0, [10, 0, 0, 1, 0, 0, 0])
    gp = GpsProcessor(GpsConfig(enable_gps=True))
    gp.add_fix(GpsFix(0.01, 49.0, 8.4, 110.0))
    gp.add_fix(GpsFix(1.01, 49.0001, 8.4, 110.0))
    assert gp.flush(db, [k1, k2])
    assert len(db.graph._priors) == 2
    assert k1.utm_coord is not None
    # ~11.1 m north between the two fixes
    dy = k2.utm_coord[1] - k1.utm_coord[1]
    assert abs(dy - 11.1) < 0.5


def test_gps_enu_matches_utm_locally():
    enu = LocalCartesian(49.0, 8.4, 0.0)
    p = enu.forward(49.0001, 8.4001, 0.0)
    e0, n0, _ = latlon_to_utm(49.0, 8.4)
    e1, n1, _ = latlon_to_utm(49.0001, 8.4001)
    np.testing.assert_allclose(p[:2], [e1 - e0, n1 - n0], atol=0.25)  # UTM scale+convergence


def test_imu_processor_orientation_prior():
    db = _db()
    k1 = _add_kf(db, 0.0, se3.pose_identity())
    ip = ImuProcessor(ImuConfig(enable_imu_orientation=True,
                                enable_imu_acceleration=True))
    ip.add_sample(ImuSample(0.02, np.asarray([1.0, 0, 0, 0]),
                            np.asarray([0.0, 0, 9.81])))
    assert ip.flush(db, [k1])
    assert len(db.graph._priors) == 2  # quat + vec


def test_floor_coeffs_processor_adds_plane_edges():
    db = _db()
    k1 = _add_kf(db, 0.0, se3.pose_identity())
    fp = FloorCoeffsProcessor(FloorCoeffsConfig(enable_floor_coeffs=True))
    fp.add_coeffs(FloorCoeffs(stamp=0.0,
                              coeffs=np.asarray([0, 0, 1, 2.0], np.float32)))
    assert fp.flush(db, [k1])
    assert fp.plane_node_id is not None
    assert len(db.graph._pl_edges) == 1
    # optimization with the plane edge stays finite
    db.graph.optimize(8)
    assert np.isfinite(db.graph.poses[:2]).all()


def test_nmea():
    s = "$GPRMC,123519,A,4807.038,N,01131.000,E,022.4,084.4,230394,003.1,W*6A"
    assert checksum_ok(s)
    fix = parse_gprmc(s)
    assert fix is not None and fix.valid
    assert abs(fix.latitude - 48.1173) < 1e-3
    assert abs(fix.longitude - 11.5167) < 1e-3
    assert parse_gprmc("$GPRMC,bad*00") is None


def test_utm_known_point():
    # Karlsruhe 49.0069 N, 8.4037 E -> zone 32. Expected values validated
    # against numerical integration of the meridian arc plus the second-
    # order easting/northing terms (see commit history).
    e, n, z = latlon_to_utm(49.0069, 8.4037)
    assert z == 32
    assert abs(e - 456391.2) < 1.0
    assert abs(n - 5428394.1) < 1.0
    # central meridian / equator sanity
    e0, n0, _ = latlon_to_utm(0.0, 9.0)
    assert abs(e0 - 500000) < 1e-6 and abs(n0) < 1e-6
