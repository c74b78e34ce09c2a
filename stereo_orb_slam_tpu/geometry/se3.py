"""SE(3) / SO(3) utilities, batched and jit-friendly.

Replaces the reference's Eigen-based pose math (ref `src/math_utils.h:6-41`):
`Normalize` (quaternion round-trip renormalization), `MatrixToPose` /
`PoseToMatrix` (4x4 homogeneous <-> 6-dof angle-axis+translation used as the
BA parameterization). Everything here is pure `jnp`, works on arbitrary
leading batch dimensions, and is safe at the theta->0 singularity (Taylor
branches via `jnp.where` with poisoned-gradient protection).

Convention: a pose matrix T maps homogeneous points from the "child" frame to
the "parent" frame, matching the reference (frame global pose maps
camera-local points to world, ref `src/camera_frame.h:20-27`).

The 6-dof vector layout is [wx, wy, wz, tx, ty, tz] — rotation (angle*axis)
first, translation second, matching ref `src/math_utils.h:19-24`.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-8


def hat(w):
    """Skew-symmetric matrix of a 3-vector. Batched over leading dims."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    zero = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([zero, -wz, wy], axis=-1),
            jnp.stack([wz, zero, -wx], axis=-1),
            jnp.stack([-wy, wx, zero], axis=-1),
        ],
        axis=-2,
    )


def so3_exp(w):
    """Rodrigues: angle-axis (angle*axis) -> rotation matrix."""
    theta2 = jnp.sum(w * w, axis=-1, keepdims=True)[..., None]  # [...,1,1]
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS * _EPS))
    small = theta2 < _EPS
    # sin(t)/t and (1-cos(t))/t^2 with Taylor fallbacks near zero.
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    K = hat(w)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), K.shape)
    return eye + a * K + b * (K @ K)


def so3_log(R):
    """Rotation matrix -> angle-axis (angle*axis).

    Uses the quaternion route for numerical robustness near pi.
    """
    q = rotmat_to_quat(R)  # [..., 4] (w, x, y, z), w >= 0
    qw = jnp.clip(q[..., 0], -1.0, 1.0)
    qv = q[..., 1:]
    norm_qv = jnp.linalg.norm(qv, axis=-1, keepdims=True)
    theta = 2.0 * jnp.arctan2(norm_qv[..., 0], qw)[..., None]  # [...,1]
    small = norm_qv < _EPS
    scale = jnp.where(small, 2.0 / jnp.maximum(qw[..., None], _EPS), theta / jnp.maximum(norm_qv, _EPS))
    return scale * qv


def se3_exp(xi):
    """6-dof [w, t_v] -> 4x4 matrix, where t = V(w) @ t_v (true SE(3) exp)."""
    w, v = xi[..., :3], xi[..., 3:]
    theta2 = jnp.sum(w * w, axis=-1, keepdims=True)[..., None]
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS * _EPS))
    small = theta2 < _EPS
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    c = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0, (1.0 - a) / theta2)
    K = hat(w)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), K.shape)
    R = eye + a * K + b * (K @ K)
    V = eye + b * K + c * (K @ K)
    t = (V @ v[..., None])[..., 0]
    return rt_to_matrix(R, t)


def se3_log(T):
    """4x4 matrix -> 6-dof [w, t_v] (true SE(3) log)."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    w = so3_log(R)
    theta2 = jnp.sum(w * w, axis=-1, keepdims=True)[..., None]
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS * _EPS))
    small = theta2 < _EPS
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    K = hat(w)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=T.dtype), K.shape)
    # V^-1 = I - K/2 + (1/theta^2)(1 - a/(2b)) K^2
    coef = jnp.where(small, 1.0 / 12.0 + theta2 / 720.0, (1.0 - a / (2.0 * b)) / theta2)
    Vinv = eye - 0.5 * K + coef * (K @ K)
    v = (Vinv @ t[..., None])[..., 0]
    return jnp.concatenate([w, v], axis=-1)


def pose6_to_matrix(pose):
    """[w (angle*axis), t] -> 4x4, with t copied verbatim (NOT the SE(3) exp).

    Mirrors ref `src/math_utils.h:28-41` PoseToMatrix: rotation from
    angle-axis, translation placed directly in the last column. This is the
    parameterization the BA cost uses (rotate-then-translate, ref
    `src/reprojection_error.h:20-24`).
    """
    R = so3_exp(pose[..., :3])
    return rt_to_matrix(R, pose[..., 3:])


def matrix_to_pose6(T):
    """4x4 -> [w, t] with t copied verbatim (ref src/math_utils.h:13-25)."""
    w = so3_log(T[..., :3, :3])
    return jnp.concatenate([w, T[..., :3, 3]], axis=-1)


def rt_to_matrix(R, t):
    """(3x3, 3) -> 4x4 homogeneous, batched."""
    batch = R.shape[:-2]
    T = jnp.zeros(batch + (4, 4), dtype=R.dtype)
    T = T.at[..., :3, :3].set(R)
    T = T.at[..., :3, 3].set(t)
    T = T.at[..., 3, 3].set(1.0)
    return T


def inverse(T):
    """Closed-form inverse of a rigid transform, batched."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    return rt_to_matrix(Rt, -(Rt @ t[..., None])[..., 0])


def transform_points(T, pts):
    """Apply 4x4 T to [..., N, 3] points."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    return pts @ jnp.swapaxes(R, -1, -2) + t[..., None, :]


def rotmat_to_quat(R):
    """Rotation matrix -> quaternion (w, x, y, z), w >= 0, batched.

    Branch-free Shepperd-style: compute all four candidate constructions and
    select the best-conditioned one with `where`.
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidates, each scaled by 4*q_i^2 (guaranteed >= 0 pre-clip).
    qw2 = jnp.maximum(1.0 + tr, 0.0)
    qx2 = jnp.maximum(1.0 + m00 - m11 - m22, 0.0)
    qy2 = jnp.maximum(1.0 - m00 + m11 - m22, 0.0)
    qz2 = jnp.maximum(1.0 - m00 - m11 + m22, 0.0)

    sw = 0.5 * jnp.sqrt(jnp.maximum(qw2, _EPS))
    sx = 0.5 * jnp.sqrt(jnp.maximum(qx2, _EPS))
    sy = 0.5 * jnp.sqrt(jnp.maximum(qy2, _EPS))
    sz = 0.5 * jnp.sqrt(jnp.maximum(qz2, _EPS))

    qw_w = jnp.stack([sw, (m21 - m12) / (4 * sw), (m02 - m20) / (4 * sw), (m10 - m01) / (4 * sw)], -1)
    qx_x = jnp.stack([(m21 - m12) / (4 * sx), sx, (m01 + m10) / (4 * sx), (m02 + m20) / (4 * sx)], -1)
    qy_y = jnp.stack([(m02 - m20) / (4 * sy), (m01 + m10) / (4 * sy), sy, (m12 + m21) / (4 * sy)], -1)
    qz_z = jnp.stack([(m10 - m01) / (4 * sz), (m02 + m20) / (4 * sz), (m12 + m21) / (4 * sz), sz], -1)

    best = jnp.argmax(jnp.stack([qw2, qx2, qy2, qz2], -1), axis=-1)
    q = jnp.where((best == 0)[..., None], qw_w,
        jnp.where((best == 1)[..., None], qx_x,
        jnp.where((best == 2)[..., None], qy_y, qz_z)))
    # Canonical sign (w >= 0) and normalize.
    q = q * jnp.where(q[..., 0:1] < 0, -1.0, 1.0)
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quat_to_rotmat(q):
    """Quaternion (w, x, y, z) -> rotation matrix, batched."""
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    row0 = jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], -1)
    row1 = jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], -1)
    row2 = jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], -1)
    return jnp.stack([row0, row1, row2], axis=-2)


def normalize_pose(T):
    """Re-orthonormalize the rotation block via a quaternion round trip.

    Mirrors ref `src/math_utils.h:6-10` Normalize(): called after every pose
    composition to stop float error accumulating over thousands of frames.
    """
    R = quat_to_rotmat(rotmat_to_quat(T[..., :3, :3]))
    return rt_to_matrix(R, T[..., :3, 3])
