"""SE(3) / SO(3) Lie-group math for the TPU-native SLAM engine.

Conventions
-----------
- A pose is a rigid transform mapping *local* coordinates to *world*
  coordinates: ``x_w = R @ x_l + t``.
- Compact pose storage is a 7-vector ``[tx, ty, tz, qw, qx, qy, qz]``
  (translation first, then a unit quaternion in w-first order).
- Tangent (twist) vectors are 6-vectors ``[rho, theta]`` = (translational,
  rotational), matching the common robotics convention; ``se3_exp`` uses the
  full closed form with the SO(3) left-Jacobian ``V`` so that
  ``se3_exp(se3_log(T)) == T``.
- Edge measurements follow the g2o ``EdgeSE3`` convention used by the
  reference (/root/reference/src/mrg_slam/graph_slam.cpp:146 et al.):
  ``T_ij = T_i^-1 @ T_j`` is the measured relative pose from node i to node j.

Everything is written to be `jit`/`vmap`/`grad`-safe: all angle branches use
Taylor-switched forms with `jnp.where` on safe inputs, so autodiff through
`exp`/`log` is well behaved at theta -> 0.
"""

from __future__ import annotations

import jax.numpy as jnp

# Small-angle threshold under which Taylor expansions are used. Chosen for
# float32: below 1e-2 rad the trig forms lose precision to cancellation
# (1 - cos(theta) rounds to 0 for theta < ~1e-3), while the dropped Taylor
# terms are O(theta^4) ~ 1e-10 — both branches are accurate at the switch.
_EPS = 1e-2


# ---------------------------------------------------------------------------
# Quaternions (w-first: [w, x, y, z])
# ---------------------------------------------------------------------------

def quat_identity() -> jnp.ndarray:
    return jnp.array([1.0, 0.0, 0.0, 0.0], dtype=jnp.float32)


def quat_normalize(q: jnp.ndarray) -> jnp.ndarray:
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quat_conjugate(q: jnp.ndarray) -> jnp.ndarray:
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quat_rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vector(s) v by unit quaternion q (broadcasting on leading dims)."""
    w = q[..., 0:1]
    u = q[..., 1:4]
    uv = jnp.cross(u, v)
    return v + 2.0 * (w * uv + jnp.cross(u, uv))


def quat_to_mat(q: jnp.ndarray) -> jnp.ndarray:
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(q.shape[:-1] + (3, 3))


def mat_to_quat(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix -> unit quaternion (w-first), branch-free (Shepperd).

    Computes all four candidate quaternions and selects the one with the
    largest pivot, which is numerically stable for all rotations and safe
    under vmap/jit.
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidates, each scaled by 4*component^2 (>= 0).
    qw2 = jnp.maximum(0.0, 1.0 + tr)
    qx2 = jnp.maximum(0.0, 1.0 + m00 - m11 - m22)
    qy2 = jnp.maximum(0.0, 1.0 - m00 + m11 - m22)
    qz2 = jnp.maximum(0.0, 1.0 - m00 - m11 + m22)

    # candidate from w pivot
    sw = jnp.sqrt(qw2 + 1e-24) * 2.0
    cand_w = jnp.stack([qw2 / 2.0 * (2.0 / sw), (m21 - m12) / sw, (m02 - m20) / sw, (m10 - m01) / sw], axis=-1)
    sx = jnp.sqrt(qx2 + 1e-24) * 2.0
    cand_x = jnp.stack([(m21 - m12) / sx, qx2 / 2.0 * (2.0 / sx), (m01 + m10) / sx, (m02 + m20) / sx], axis=-1)
    sy = jnp.sqrt(qy2 + 1e-24) * 2.0
    cand_y = jnp.stack([(m02 - m20) / sy, (m01 + m10) / sy, qy2 / 2.0 * (2.0 / sy), (m12 + m21) / sy], axis=-1)
    sz = jnp.sqrt(qz2 + 1e-24) * 2.0
    cand_z = jnp.stack([(m10 - m01) / sz, (m02 + m20) / sz, (m12 + m21) / sz, qz2 / 2.0 * (2.0 / sz)], axis=-1)

    cands = jnp.stack([cand_w, cand_x, cand_y, cand_z], axis=-2)  # (..., 4cand, 4)
    scores = jnp.stack([qw2, qx2, qy2, qz2], axis=-1)
    idx = jnp.argmax(scores, axis=-1)
    q = jnp.take_along_axis(cands, idx[..., None, None].astype(jnp.int32).repeat(4, axis=-1), axis=-2)[..., 0, :]
    # canonical sign: w >= 0
    q = jnp.where(q[..., 0:1] < 0, -q, q)
    return quat_normalize(q)


# ---------------------------------------------------------------------------
# SO(3)
# ---------------------------------------------------------------------------

def skew(v: jnp.ndarray) -> jnp.ndarray:
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zeros = jnp.zeros_like(x)
    return jnp.stack(
        [zeros, -z, y, z, zeros, -x, -y, x, zeros], axis=-1
    ).reshape(v.shape[:-1] + (3, 3))


def so3_exp(w: jnp.ndarray) -> jnp.ndarray:
    """Rotation vector -> rotation matrix (Rodrigues).

    Uses the double-`where` pattern so that autodiff through the small-angle
    branch never sees the 0/0 of the trig form (the unselected branch is
    evaluated at theta=1, keeping all tangents finite).
    """
    theta2 = jnp.sum(w * w, axis=-1)
    small = theta2 < _EPS ** 2
    theta2_safe = jnp.where(small, 1.0, theta2)
    theta = jnp.sqrt(theta2_safe)
    # sin(t)/t and (1-cos(t))/t^2 with Taylor fallback
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0,
                  (1.0 - jnp.cos(theta)) / theta2_safe)
    W = skew(w)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + a[..., None, None] * W + b[..., None, None] * (W @ W)


def so3_log(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix -> rotation vector. Safe near theta=0 and theta=pi.

    Near pi the standard (R - R^T) formula degenerates; we use the quaternion
    route instead, which is stable everywhere given mat_to_quat's pivoting.
    """
    q = mat_to_quat(R)
    return quat_log(q)


def quat_log(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion -> rotation vector (2 * log), autodiff-safe at 0."""
    q = jnp.where(q[..., 0:1] < 0, -q, q)  # w >= 0, theta in [0, pi]
    w = jnp.clip(q[..., 0], -1.0, 1.0)
    v2 = jnp.sum(q[..., 1:4] * q[..., 1:4], axis=-1)
    small = v2 < _EPS ** 2
    v2_safe = jnp.where(small, 1.0, v2)
    vnorm = jnp.sqrt(v2_safe)
    main = 2.0 * jnp.arctan2(vnorm, w) / vnorm
    w_safe = jnp.maximum(w, 0.5)
    taylor = 2.0 / w_safe * (1.0 - v2 / (3.0 * w_safe * w_safe))
    scale = jnp.where(small, taylor, main)
    return q[..., 1:4] * scale[..., None]


def so3_left_jacobian(w: jnp.ndarray) -> jnp.ndarray:
    """SO(3) left Jacobian J_l(w) (a.k.a. V matrix in SE(3) exp)."""
    theta2 = jnp.sum(w * w, axis=-1)
    small = theta2 < _EPS ** 2
    theta2_safe = jnp.where(small, 1.0, theta2)
    theta = jnp.sqrt(theta2_safe)
    b = jnp.where(small, 0.5 - theta2 / 24.0,
                  (1.0 - jnp.cos(theta)) / theta2_safe)
    c = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0,
                  (theta - jnp.sin(theta)) / (theta2_safe * theta))
    W = skew(w)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + b[..., None, None] * W + c[..., None, None] * (W @ W)


def so3_left_jacobian_inv(w: jnp.ndarray) -> jnp.ndarray:
    theta2 = jnp.sum(w * w, axis=-1)
    small = theta2 < _EPS ** 2
    theta2_safe = jnp.where(small, 1.0, theta2)
    theta = jnp.sqrt(theta2_safe)
    # coefficient k s.t. Jl_inv = I - W/2 + k W^2
    k = jnp.where(
        small,
        1.0 / 12.0 + theta2 / 720.0,
        (1.0 - (theta * jnp.sin(theta)) /
         (2.0 * (1.0 - jnp.cos(theta)))) / theta2_safe,
    )
    W = skew(w)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye - 0.5 * W + k[..., None, None] * (W @ W)


# ---------------------------------------------------------------------------
# SE(3) on (R, t) pairs
# ---------------------------------------------------------------------------

def se3_exp(xi: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Twist [rho, theta] -> (R, t) with t = J_l(theta) @ rho."""
    rho, w = xi[..., 0:3], xi[..., 3:6]
    R = so3_exp(w)
    V = so3_left_jacobian(w)
    t = jnp.einsum("...ij,...j->...i", V, rho)
    return R, t


def se3_log(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    w = so3_log(R)
    Vinv = so3_left_jacobian_inv(w)
    rho = jnp.einsum("...ij,...j->...i", Vinv, t)
    return jnp.concatenate([rho, w], axis=-1)


def se3_adjoint(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """6x6 adjoint of (R, t): Ad = [[R, skew(t)R], [0, R]] (rho-first order)."""
    tR = skew(t) @ R
    top = jnp.concatenate([R, tR], axis=-1)
    bot = jnp.concatenate([jnp.zeros_like(R), R], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


# ---------------------------------------------------------------------------
# 7-vector pose API: [tx, ty, tz, qw, qx, qy, qz]
# ---------------------------------------------------------------------------

def pose_identity() -> jnp.ndarray:
    return jnp.array([0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0], dtype=jnp.float32)


def make_pose(t: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    return jnp.concatenate([t, quat_normalize(q)], axis=-1)


def pose_translation(p: jnp.ndarray) -> jnp.ndarray:
    return p[..., 0:3]


def pose_quat(p: jnp.ndarray) -> jnp.ndarray:
    return p[..., 3:7]


def pose_rotation(p: jnp.ndarray) -> jnp.ndarray:
    return quat_to_mat(p[..., 3:7])


def pose_compose(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """a ∘ b: apply b first then a (matrix product T_a @ T_b)."""
    qa, qb = a[..., 3:7], b[..., 3:7]
    ta, tb = a[..., 0:3], b[..., 0:3]
    t = ta + quat_rotate(qa, tb)
    q = quat_normalize(quat_mul(qa, qb))
    return jnp.concatenate([t, q], axis=-1)


def pose_inverse(p: jnp.ndarray) -> jnp.ndarray:
    qinv = quat_conjugate(p[..., 3:7])
    tinv = -quat_rotate(qinv, p[..., 0:3])
    return jnp.concatenate([tinv, qinv], axis=-1)


def pose_apply(p: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Transform points x (..., 3) by pose p."""
    return quat_rotate(p[..., 3:7], x) + p[..., 0:3]


def pose_between(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Relative pose a^-1 ∘ b (the g2o EdgeSE3 measurement convention)."""
    return pose_compose(pose_inverse(a), b)


def pose_to_matrix(p: jnp.ndarray) -> jnp.ndarray:
    R = pose_rotation(p)
    t = p[..., 0:3]
    top = jnp.concatenate([R, t[..., :, None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=p.dtype), p.shape[:-1] + (4,)
    )[..., None, :]
    return jnp.concatenate([top, bottom], axis=-2)


def matrix_to_pose(T: jnp.ndarray) -> jnp.ndarray:
    return jnp.concatenate([T[..., 0:3, 3], mat_to_quat(T[..., 0:3, 0:3])], axis=-1)


def pose_exp(xi: jnp.ndarray) -> jnp.ndarray:
    """Twist -> 7-vector pose."""
    R, t = se3_exp(xi)
    return jnp.concatenate([t, mat_to_quat(R)], axis=-1)


def pose_log(p: jnp.ndarray) -> jnp.ndarray:
    """7-vector pose -> twist."""
    return se3_log(pose_rotation(p), p[..., 0:3])


def pose_retract(p: jnp.ndarray, xi: jnp.ndarray) -> jnp.ndarray:
    """Right-multiplicative retraction p ∘ exp(xi) (the optimizer's chart)."""
    return pose_compose(p, pose_exp(xi))


def pose_error(meas: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """EdgeSE3 residual: log( meas^-1 ∘ a^-1 ∘ b ) as a 6-twist."""
    return pose_log(pose_compose(pose_inverse(meas), pose_between(a, b)))


def rpy_to_quat(roll: jnp.ndarray, pitch: jnp.ndarray, yaw: jnp.ndarray) -> jnp.ndarray:
    """ZYX (yaw-pitch-roll) Euler angles -> quaternion, ROS convention."""
    cy, sy = jnp.cos(yaw * 0.5), jnp.sin(yaw * 0.5)
    cp, sp = jnp.cos(pitch * 0.5), jnp.sin(pitch * 0.5)
    cr, sr = jnp.cos(roll * 0.5), jnp.sin(roll * 0.5)
    return jnp.stack(
        [
            cr * cp * cy + sr * sp * sy,
            sr * cp * cy - cr * sp * sy,
            cr * sp * cy + sr * cp * sy,
            cr * cp * sy - sr * sp * cy,
        ],
        axis=-1,
    )


def rotation_angle(q_or_R: jnp.ndarray) -> jnp.ndarray:
    """Rotation magnitude in radians from a quaternion or matrix."""
    if q_or_R.shape[-1] == 4:
        w = jnp.abs(jnp.clip(q_or_R[..., 0], -1.0, 1.0))
        return 2.0 * jnp.arccos(w)
    tr = jnp.trace(q_or_R, axis1=-2, axis2=-1)
    return jnp.arccos(jnp.clip((tr - 1.0) / 2.0, -1.0, 1.0))
