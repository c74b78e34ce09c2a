"""Camera model tests: projection/triangulation round-trips vs closed form,
and distortion parity against the cv2 oracle."""

import cv2
import jax.numpy as jnp
import numpy as np
import pytest

from stereo_orb_slam_tpu.geometry import camera

FX, FY, CX, CY = 718.856, 718.856, 607.1928, 185.2157
BASELINE = 0.5371657


def make_kitti_like_rig():
    left = camera.Pinhole.create(FX, FY, CX, CY)
    pose_r = np.eye(4, dtype=np.float32)
    pose_r[0, 3] = BASELINE
    right = camera.Pinhole.create(FX, FY, CX, CY, pose=pose_r)
    return camera.StereoRig.create(left, right, rectified=True)


def test_projection_matrix():
    rig = make_kitti_like_rig()
    P_r = np.asarray(rig.right.projection)
    # Right camera projection must shift u by -fx*b for a point at depth z=1.
    pt = np.array([[0.0, 0.0, 1.0]])
    uv = np.asarray(camera.project(rig.right.projection, jnp.asarray(pt)))
    np.testing.assert_allclose(uv[0, 0], CX - FX * BASELINE, rtol=1e-5)


def test_rectified_triangulation_roundtrip(rng):
    rig = make_kitti_like_rig()
    pts = np.stack(
        [
            rng.uniform(-10, 10, 128),
            rng.uniform(-2, 2, 128),
            rng.uniform(2, 60, 128),
        ],
        axis=1,
    ).astype(np.float32)
    uv_l = np.asarray(camera.project(rig.left.projection, jnp.asarray(pts)))
    uv_r = np.asarray(camera.project(rig.right.projection, jnp.asarray(pts)))
    tri, valid = camera.triangulate_rectified(rig, jnp.asarray(uv_l), jnp.asarray(uv_r))
    assert bool(np.all(np.asarray(valid)))
    np.testing.assert_allclose(np.asarray(tri), pts, rtol=1e-3, atol=1e-3)


def test_rectified_depth_gate():
    rig = make_kitti_like_rig()
    # Disparity so small that depth > 100 m -> invalid (ref camera_model.cpp:219)
    uv_l = jnp.asarray([[500.0, 200.0]])
    uv_r = jnp.asarray([[500.0 - 0.5, 200.0]])
    _, valid = camera.triangulate_rectified(rig, uv_l, uv_r)
    assert not bool(valid[0])
    # Negative disparity -> behind camera -> invalid
    uv_r2 = jnp.asarray([[501.0, 200.0]])
    _, valid2 = camera.triangulate_rectified(rig, uv_l, uv_r2)
    assert not bool(valid2[0])


def test_dlt_triangulation_roundtrip(rng):
    rig = make_kitti_like_rig()
    pts = np.stack(
        [
            rng.uniform(-10, 10, 64),
            rng.uniform(-2, 2, 64),
            rng.uniform(2, 60, 64),
        ],
        axis=1,
    ).astype(np.float32)
    uv_l = camera.project(rig.left.projection, jnp.asarray(pts))
    uv_r = camera.project(rig.right.projection, jnp.asarray(pts))
    tri = camera.triangulate_dlt(rig.left.projection, rig.right.projection, uv_l, uv_r)
    np.testing.assert_allclose(np.asarray(tri), pts, rtol=1e-2, atol=5e-2)


def test_undistort_matches_cv2(rng):
    dist = np.array([-0.28, 0.07, 1e-4, -2e-4, 0.0], np.float32)
    cam = camera.Pinhole.create(458.654, 457.296, 367.215, 248.375, dist=dist)
    uv = np.stack(
        [rng.uniform(100, 650, 200), rng.uniform(80, 420, 200)], axis=1
    ).astype(np.float32)
    ours = np.asarray(camera.undistort_points(cam, jnp.asarray(uv), iterations=20))
    K = np.asarray(cam.K)
    cv_out = cv2.undistortPoints(uv[:, None, :], K, dist).reshape(-1, 2)
    cv_px = np.stack(
        [K[0, 0] * cv_out[:, 0] + K[0, 2], K[1, 1] * cv_out[:, 1] + K[1, 2]], axis=1
    )
    # cv2 terminates its fixed-point iteration early (5 iters / eps criteria);
    # we iterate further, so agreement is sub-0.1px rather than exact.
    np.testing.assert_allclose(ours, cv_px, atol=0.1)


def test_max_sensible_distance():
    rig = make_kitti_like_rig()
    assert np.isclose(float(rig.max_sensible_distance()), FX * BASELINE, rtol=1e-6)


def test_distort_undistort_roundtrip(rng):
    dist = np.array([-0.28, 0.07, 1e-4, -2e-4, 0.0], np.float32)
    cam = camera.Pinhole.create(458.654, 457.296, 367.215, 248.375, dist=dist)
    xy = np.stack(
        [rng.uniform(-0.5, 0.5, 100), rng.uniform(-0.4, 0.4, 100)], axis=1
    ).astype(np.float32)
    xyd = camera.distort_normalized(cam, jnp.asarray(xy))
    uv_dist = np.stack(
        [458.654 * np.asarray(xyd)[:, 0] + 367.215, 457.296 * np.asarray(xyd)[:, 1] + 248.375],
        axis=1,
    )
    uv_undist = np.asarray(camera.undistort_points(cam, jnp.asarray(uv_dist), iterations=20))
    expect = np.stack([458.654 * xy[:, 0] + 367.215, 457.296 * xy[:, 1] + 248.375], axis=1)
    np.testing.assert_allclose(uv_undist, expect, atol=0.05)
