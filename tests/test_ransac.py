"""Batched RANSAC solver: recovery of known rigid transforms with outliers.

The reference's solver code is absent (empty submodule), so per SURVEY.md §4
we validate against math — synthetic stereo scenes with known motion — not
against an implementation.
"""

import jax
import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation

from stereo_orb_slam_tpu.frontend import ransac
from stereo_orb_slam_tpu.geometry import camera, se3

FX, CX, CY, B = 718.856, 607.1928, 185.2157, 0.5371657


def make_rig():
    left = camera.Pinhole.create(FX, FX, CX, CY)
    pose_r = np.eye(4, dtype=np.float32)
    pose_r[0, 3] = B
    right = camera.Pinhole.create(FX, FX, CX, CY, pose=pose_r)
    return camera.StereoRig.create(left, right, rectified=True)


def synth_scene(rng, n=256, motion=None, outlier_frac=0.0, noise_px=0.0):
    """Points seen from two stereo poses; returns RANSAC inputs + truth T."""
    rig = make_rig()
    P_l = np.asarray(rig.left.projection)
    P_r = np.asarray(rig.right.projection)

    if motion is None:
        w = rng.normal(size=3) * 0.02
        t = np.array([0.03, 0.01, 0.8])  # forward-dominant, KITTI-like
        motion = np.eye(4, dtype=np.float32)
        motion[:3, :3] = Rotation.from_rotvec(w).as_matrix()
        motion[:3, 3] = t
    # T maps curr-camera coords -> prev-camera coords.
    T_true = motion.astype(np.float32)

    pts_prev = np.stack(
        [rng.uniform(-15, 15, n), rng.uniform(-3, 3, n), rng.uniform(4, 60, n)], 1
    ).astype(np.float32)
    Tinv = np.linalg.inv(T_true)
    pts_curr = (pts_prev @ Tinv[:3, :3].T + Tinv[:3, 3]).astype(np.float32)

    def obs(P_l, P_r, pts):
        def proj(P):
            ph = np.concatenate([pts, np.ones((n, 1), np.float32)], 1)
            uvw = ph @ P.T
            return uvw[:, :2] / uvw[:, 2:3]
        return np.concatenate([proj(P_l), proj(P_r)], 1).astype(np.float32)

    obs_prev = obs(P_l, P_r, pts_prev)
    obs_curr = obs(P_l, P_r, pts_curr)
    if noise_px > 0:
        obs_prev += rng.normal(0, noise_px, obs_prev.shape).astype(np.float32)
        obs_curr += rng.normal(0, noise_px, obs_curr.shape).astype(np.float32)

    n_out = int(outlier_frac * n)
    if n_out:
        idx = rng.choice(n, n_out, replace=False)
        pts_curr[idx] += rng.normal(0, 5.0, (n_out, 3)).astype(np.float32)

    valid = np.ones(n, bool)
    weights = np.ones(n, np.float32)
    return (
        jnp.asarray(pts_curr), jnp.asarray(pts_prev),
        jnp.asarray(obs_curr), jnp.asarray(obs_prev),
        jnp.asarray(valid), jnp.asarray(weights),
        jnp.asarray(P_l), jnp.asarray(P_r), T_true, idx if n_out else None,
    )


def pose_error(T_est, T_true):
    dT = np.linalg.inv(T_true) @ np.asarray(T_est)
    rot_err = np.linalg.norm(Rotation.from_matrix(dT[:3, :3]).as_rotvec())
    trans_err = np.linalg.norm(dT[:3, 3])
    return rot_err, trans_err


def test_exact_recovery(rng):
    args = synth_scene(rng, outlier_frac=0.0)
    res = ransac.solve(jax.random.key(0), *args[:8])
    assert bool(res.success)
    rot_err, trans_err = pose_error(res.transform, args[8])
    assert rot_err < 1e-3 and trans_err < 1e-2
    assert int(res.num_inliers) > 250


def test_recovery_with_outliers(rng):
    args = synth_scene(rng, outlier_frac=0.4)
    res = ransac.solve(jax.random.key(1), *args[:8])
    assert bool(res.success)
    rot_err, trans_err = pose_error(res.transform, args[8])
    assert rot_err < 1e-2 and trans_err < 0.05
    # Outliers must be excluded from the inlier mask.
    mask = np.asarray(res.inlier_mask)
    out_idx = args[9]
    assert mask[out_idx].mean() < 0.2
    assert mask.mean() > 0.45


def test_noise_robustness(rng):
    args = synth_scene(rng, outlier_frac=0.2, noise_px=0.5)
    res = ransac.solve(jax.random.key(2), *args[:8])
    assert bool(res.success)
    rot_err, trans_err = pose_error(res.transform, args[8])
    assert rot_err < 0.02 and trans_err < 0.1


def test_too_few_pairs_fails(rng):
    args = list(synth_scene(rng, n=256))
    valid = np.zeros(256, bool)
    valid[:8] = True  # below min_pairs=10 (ref visual_odometer.cpp:100)
    args[4] = jnp.asarray(valid)
    res = ransac.solve(jax.random.key(3), *args[:8])
    assert not bool(res.success)
    np.testing.assert_allclose(np.asarray(res.transform), np.eye(4), atol=1e-6)


def test_kabsch_exact(rng):
    w = rng.normal(size=3)
    R = Rotation.from_rotvec(w).as_matrix().astype(np.float32)
    t = rng.normal(size=3).astype(np.float32)
    src = rng.normal(size=(10, 3)).astype(np.float32)
    dst = src @ R.T + t
    T = np.asarray(ransac.kabsch(jnp.asarray(src), jnp.asarray(dst)))
    np.testing.assert_allclose(T[:3, :3], R, atol=1e-5)
    np.testing.assert_allclose(T[:3, 3], t, atol=1e-5)
