"""SE(3)/SO(3) round-trips and identities vs a scipy oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from stereo_orb_slam_tpu.geometry import se3

jax.config.update("jax_enable_x64", False)


def random_rotvecs(rng, n):
    v = rng.normal(size=(n, 3))
    mags = rng.uniform(0.0, 3.0, size=(n, 1))
    return (v / np.linalg.norm(v, axis=1, keepdims=True) * mags).astype(np.float32)


def test_so3_exp_matches_scipy(rng):
    w = random_rotvecs(rng, 64)
    R = np.asarray(se3.so3_exp(jnp.asarray(w)))
    R_ref = Rotation.from_rotvec(w).as_matrix()
    np.testing.assert_allclose(R, R_ref, atol=1e-5)


def test_so3_log_roundtrip(rng):
    w = random_rotvecs(rng, 64)
    R = Rotation.from_rotvec(w).as_matrix().astype(np.float32)
    w_back = np.asarray(se3.so3_log(jnp.asarray(R)))
    np.testing.assert_allclose(w_back, w, atol=1e-4)


def test_so3_small_angle():
    w = jnp.asarray([[1e-9, 0, 0], [0, 0, 0]], jnp.float32)
    R = se3.so3_exp(w)
    np.testing.assert_allclose(np.asarray(R), np.eye(3)[None].repeat(2, 0), atol=1e-6)
    np.testing.assert_allclose(np.asarray(se3.so3_log(R)), np.zeros((2, 3)), atol=1e-6)


def test_se3_exp_log_roundtrip(rng):
    xi = rng.normal(size=(32, 6)).astype(np.float32)
    T = se3.se3_exp(jnp.asarray(xi))
    xi_back = np.asarray(se3.se3_log(T))
    np.testing.assert_allclose(xi_back, xi, atol=1e-4)


def test_pose6_roundtrip_matches_reference_semantics(rng):
    """pose6 keeps translation verbatim (ref src/math_utils.h:13-41)."""
    w = random_rotvecs(rng, 16)
    t = rng.normal(size=(16, 3)).astype(np.float32) * 10
    pose = np.concatenate([w, t], axis=1)
    T = se3.pose6_to_matrix(jnp.asarray(pose))
    np.testing.assert_allclose(np.asarray(T[:, :3, 3]), t, atol=1e-5)
    pose_back = np.asarray(se3.matrix_to_pose6(T))
    np.testing.assert_allclose(pose_back, pose, atol=1e-4)


def test_inverse(rng):
    xi = rng.normal(size=(8, 6)).astype(np.float32)
    T = se3.se3_exp(jnp.asarray(xi))
    eye = np.asarray(T @ se3.inverse(T))
    np.testing.assert_allclose(eye, np.eye(4)[None].repeat(8, 0), atol=1e-5)


def test_transform_points(rng):
    xi = rng.normal(size=(6,)).astype(np.float32)
    T = se3.se3_exp(jnp.asarray(xi))
    pts = rng.normal(size=(10, 3)).astype(np.float32)
    out = np.asarray(se3.transform_points(T, jnp.asarray(pts)))
    ph = np.concatenate([pts, np.ones((10, 1), np.float32)], axis=1)
    ref = (np.asarray(T) @ ph.T).T[:, :3]
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_quat_roundtrip(rng):
    w = random_rotvecs(rng, 64)
    R = Rotation.from_rotvec(w).as_matrix().astype(np.float32)
    q = se3.rotmat_to_quat(jnp.asarray(R))
    R_back = np.asarray(se3.quat_to_rotmat(q))
    np.testing.assert_allclose(R_back, R, atol=1e-5)


def test_quat_near_pi():
    R = Rotation.from_rotvec([np.pi - 1e-6, 0, 0]).as_matrix().astype(np.float32)
    q = se3.rotmat_to_quat(jnp.asarray(R))
    R_back = np.asarray(se3.quat_to_rotmat(q))
    np.testing.assert_allclose(R_back, R, atol=1e-5)


def test_normalize_pose(rng):
    xi = rng.normal(size=(6,)).astype(np.float32)
    T = np.asarray(se3.se3_exp(jnp.asarray(xi)))
    T_noisy = T.copy()
    T_noisy[:3, :3] += rng.normal(size=(3, 3)).astype(np.float32) * 1e-3
    T_norm = np.asarray(se3.normalize_pose(jnp.asarray(T_noisy)))
    R = T_norm[:3, :3]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)
