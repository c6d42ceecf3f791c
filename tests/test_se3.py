"""Golden tests of the SE(3)/SO(3) Lie math against scipy.spatial.transform."""

import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation as Rsp

from mrg_slam_tpu.utils import se3


def random_quats(rng, n):
    q = rng.normal(size=(n, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    return q  # w-first interpretation is fine for random testing


def test_quat_to_mat_roundtrip(rng):
    q = random_quats(rng, 64).astype(np.float32)
    R = np.asarray(se3.quat_to_mat(jnp.asarray(q)))
    # scipy is x,y,z,w ordered
    R_sp = Rsp.from_quat(np.roll(q, -1, axis=-1)).as_matrix()
    np.testing.assert_allclose(R, R_sp, atol=1e-5)
    q2 = np.asarray(se3.mat_to_quat(jnp.asarray(R)))
    # compare up to sign
    dot = np.abs(np.sum(q * q2, axis=-1))
    np.testing.assert_allclose(dot, 1.0, atol=1e-5)


def test_so3_exp_log_roundtrip(rng):
    w = rng.normal(size=(128, 3)).astype(np.float32)
    # include tiny and near-pi magnitudes
    w[0] = 0.0
    w[1] = [1e-8, 0, 0]
    w[2] = [np.pi - 1e-4, 0, 0]
    R = np.asarray(se3.so3_exp(jnp.asarray(w)))
    R_sp = Rsp.from_rotvec(w).as_matrix()
    np.testing.assert_allclose(R, R_sp, atol=1e-5)
    w2 = np.asarray(se3.so3_log(jnp.asarray(R)))
    w_sp = Rsp.from_matrix(R).as_rotvec()
    np.testing.assert_allclose(w2, w_sp, atol=1e-4)


def test_se3_exp_log_roundtrip(rng):
    xi = rng.normal(size=(64, 6)).astype(np.float32)
    xi[0] = 0
    # keep rotation magnitude < pi so the twist is the canonical representative
    xi[:, 3:] *= 0.9 * np.pi / np.maximum(
        np.linalg.norm(xi[:, 3:], axis=-1, keepdims=True), 1.0)
    R, t = se3.se3_exp(jnp.asarray(xi))
    xi2 = np.asarray(se3.se3_log(R, t))
    np.testing.assert_allclose(xi2, xi, atol=1e-3)
    # and exp(log(T)) == T for arbitrary transforms
    R2, t2 = se3.se3_exp(jnp.asarray(xi2))
    np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-5)
    np.testing.assert_allclose(np.asarray(t2), np.asarray(t), atol=1e-4)


def test_pose_compose_inverse(rng):
    a = np.asarray(se3.pose_exp(jnp.asarray(
        rng.normal(size=(32, 6)).astype(np.float32))))
    b = np.asarray(se3.pose_exp(jnp.asarray(
        rng.normal(size=(32, 6)).astype(np.float32))))
    ab = se3.pose_compose(jnp.asarray(a), jnp.asarray(b))
    Ta = np.asarray(se3.pose_to_matrix(jnp.asarray(a)))
    Tb = np.asarray(se3.pose_to_matrix(jnp.asarray(b)))
    Tab = np.asarray(se3.pose_to_matrix(ab))
    np.testing.assert_allclose(Tab, Ta @ Tb, atol=1e-4)

    inv = se3.pose_inverse(jnp.asarray(a))
    ident = np.asarray(se3.pose_to_matrix(se3.pose_compose(jnp.asarray(a), inv)))
    np.testing.assert_allclose(ident, np.broadcast_to(np.eye(4), ident.shape),
                               atol=1e-5)


def test_pose_apply_matches_matrix(rng):
    p = np.asarray(se3.pose_exp(jnp.asarray(
        rng.normal(size=(6,)).astype(np.float32))))
    x = rng.normal(size=(100, 3)).astype(np.float32)
    y = np.asarray(se3.pose_apply(jnp.asarray(p), jnp.asarray(x)))
    T = np.asarray(se3.pose_to_matrix(jnp.asarray(p)))
    y_ref = x @ T[:3, :3].T + T[:3, 3]
    np.testing.assert_allclose(y, y_ref, atol=1e-5)


def test_pose_error_zero_at_truth(rng):
    a = se3.pose_exp(jnp.asarray(rng.normal(size=(6,)).astype(np.float32)))
    b = se3.pose_exp(jnp.asarray(rng.normal(size=(6,)).astype(np.float32)))
    meas = se3.pose_between(a, b)
    err = np.asarray(se3.pose_error(meas, a, b))
    np.testing.assert_allclose(err, 0.0, atol=1e-5)


def test_rpy_to_quat(rng):
    r, p, y = 0.3, -0.2, 1.1
    q = np.asarray(se3.rpy_to_quat(jnp.float32(r), jnp.float32(p), jnp.float32(y)))
    R = np.asarray(se3.quat_to_mat(jnp.asarray(q)))
    R_sp = Rsp.from_euler("ZYX", [y, p, r]).as_matrix()
    np.testing.assert_allclose(R, R_sp, atol=1e-5)


def test_rotation_angle(rng):
    w = np.array([[0.5, 0, 0], [0, 0, 2.0]], dtype=np.float32)
    R = se3.so3_exp(jnp.asarray(w))
    ang = np.asarray(se3.rotation_angle(R))
    np.testing.assert_allclose(ang, [0.5, 2.0], atol=1e-5)
    q = se3.mat_to_quat(R)
    ang_q = np.asarray(se3.rotation_angle(q))
    np.testing.assert_allclose(ang_q, [0.5, 2.0], atol=1e-3)
