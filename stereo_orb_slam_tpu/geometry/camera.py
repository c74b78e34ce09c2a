"""Camera models: pinhole projection, distortion, stereo triangulation.

Replaces the reference's OpenCV-backed camera layer (ref
`src/camera_model.h:13-84`, `src/camera_model.cpp`):

- `PinholeCamera` intrinsics K, 5-coef radial-tangential distortion, a
  camera-to-rig pose, and the 3x4 projection P = K @ [I|0] @ pose^-1
  (ref `src/camera_model.cpp:38-49`).
- Point undistortion (cv::undistortPoints + re-projection to pixels, ref
  `src/camera_model.cpp:72-90`) — here an iterative fixed-point inversion
  inside `lax.fori_loop`, fully batched.
- General stereo DLT triangulation (cv::triangulatePoints, ref
  `src/camera_model.cpp:123-152`) — here a batched 4x4 SVD null-space solve.
- Rectified fast path: closed-form disparity->depth through the reprojection
  matrix Q (ref `src/camera_model.cpp:155-228`). The reference *drops*
  out-of-range points there, silently misaligning the points list with the
  keypoint list (ref `src/camera_model.cpp:219`); we keep alignment and
  return a validity mask instead.
- `max_sensible_distance` = fx * baseline (ref `src/camera_model.cpp:111-121`).

All camera parameters are held in a pytree dataclass so they flow through
`jax.jit` as traced arrays (static per run in practice).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from stereo_orb_slam_tpu.geometry import se3


class Pinhole(NamedTuple):
    """One pinhole camera. All fields are jnp arrays (pytree-compatible)."""

    fx: jnp.ndarray
    fy: jnp.ndarray
    cx: jnp.ndarray
    cy: jnp.ndarray
    dist: jnp.ndarray       # [5] = (k1, k2, p1, p2, k3)
    pose: jnp.ndarray       # [4,4] camera-to-rig transform
    projection: jnp.ndarray  # [3,4] = K @ [I|0] @ pose^-1

    @staticmethod
    def create(fx, fy, cx, cy, dist=None, pose=None) -> "Pinhole":
        dist = np.zeros(5, np.float32) if dist is None else np.asarray(dist, np.float32)
        pose = np.eye(4, dtype=np.float32) if pose is None else np.asarray(pose, np.float32)
        K34 = np.array(
            [[fx, 0.0, cx, 0.0], [0.0, fy, cy, 0.0], [0.0, 0.0, 1.0, 0.0]], np.float32
        )
        proj = K34 @ np.linalg.inv(pose)
        return Pinhole(
            fx=jnp.float32(fx), fy=jnp.float32(fy),
            cx=jnp.float32(cx), cy=jnp.float32(cy),
            dist=jnp.asarray(dist), pose=jnp.asarray(pose),
            projection=jnp.asarray(proj),
        )

    @property
    def K(self):
        z = jnp.zeros_like(self.fx)
        o = jnp.ones_like(self.fx)
        return jnp.stack(
            [
                jnp.stack([self.fx, z, self.cx], -1),
                jnp.stack([z, self.fy, self.cy], -1),
                jnp.stack([z, z, o], -1),
            ],
            -2,
        )


class StereoRig(NamedTuple):
    """A stereo pair; `rectified` selects the closed-form triangulation path.

    `rectified` is a plain Python bool (host metadata — readable without a
    device round trip; becomes a traced scalar if the rig pytree enters a
    jit). `baseline` is a device scalar.
    """

    left: Pinhole
    right: Pinhole
    rectified: bool
    baseline: jnp.ndarray   # scalar; x-baseline of right cam in left frame

    @staticmethod
    def create(left: Pinhole, right: Pinhole, rectified: bool,
               baseline: float = None) -> "StereoRig":
        # Baseline from the x-offset of the right camera in the left frame.
        # NOTE reference quirk: StereoRectified reads the baseline from the
        # *y* component trans(1,3) (ref src/camera_model.cpp:175) while
        # MaxSensibleDistance uses x (ref src/camera_model.cpp:119). For a
        # conventional horizontal rig x is correct; we use x everywhere and
        # document the deviation.
        if baseline is None:
            # Stay on device — a host readback (np.asarray on a device
            # array) is surprisingly expensive through remote-attached TPU
            # transports; callers that know the baseline pass the float.
            pose_lr = se3.inverse(left.pose) @ right.pose
            b = jnp.abs(pose_lr[0, 3])
        else:
            b = jnp.float32(abs(float(baseline)))
        return StereoRig(
            left=left, right=right,
            rectified=bool(rectified),
            baseline=b,
        )

    def max_sensible_distance(self):
        """fx * baseline: depth beyond which disparity < 1 px.

        Mirrors ref `src/camera_model.cpp:111-121`.
        """
        return self.left.fx * self.baseline


def project(P, pts):
    """Project [..., N, 3] points through a [3,4] projection. -> [..., N, 2]."""
    ph = jnp.concatenate([pts, jnp.ones_like(pts[..., :1])], axis=-1)
    uvw = ph @ P.T
    w = uvw[..., 2:3]
    safe_w = jnp.where(jnp.abs(w) < 1e-12, 1e-12, w)
    return uvw[..., :2] / safe_w


def distort_normalized(cam: Pinhole, xy):
    """Apply the 5-coef radial-tangential model to normalized coords [...,2]."""
    k1, k2, p1, p2, k3 = (cam.dist[i] for i in range(5))
    x, y = xy[..., 0], xy[..., 1]
    r2 = x * x + y * y
    radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
    xd = x * radial + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
    yd = y * radial + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
    return jnp.stack([xd, yd], axis=-1)


def undistort_points(cam: Pinhole, uv, iterations: int = 8):
    """Distorted pixel coords -> undistorted pixel coords.

    Matches the semantics of ref `src/camera_model.cpp:72-90`: undistort to
    normalized coordinates (fixed-point iteration, same scheme OpenCV uses)
    then re-project through K to pixels.
    """
    x0 = (uv[..., 0] - cam.cx) / cam.fx
    y0 = (uv[..., 1] - cam.cy) / cam.fy
    xy0 = jnp.stack([x0, y0], axis=-1)

    def body(_, xy):
        k1, k2, p1, p2, k3 = (cam.dist[i] for i in range(5))
        x, y = xy[..., 0], xy[..., 1]
        r2 = x * x + y * y
        radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
        dx = 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
        dy = p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
        xn = (xy0[..., 0] - dx) / radial
        yn = (xy0[..., 1] - dy) / radial
        return jnp.stack([xn, yn], axis=-1)

    xy = jax.lax.fori_loop(0, iterations, body, xy0)
    u = cam.fx * xy[..., 0] + cam.cx
    v = cam.fy * xy[..., 1] + cam.cy
    return jnp.stack([u, v], axis=-1)


def triangulate_dlt(P1, P2, uv1, uv2):
    """Batched DLT triangulation. [N,2]x2 -> [N,3].

    Same math as cv::triangulatePoints (ref `src/camera_model.cpp:123-152`):
    for each correspondence build the 4x4 system A X = 0 from
    (u*P^3 - P^1, v*P^3 - P^2) rows of both views and take the null space
    via SVD, then dehomogenize.
    """
    def rows(P, uv):
        u = uv[..., 0:1]
        v = uv[..., 1:2]
        r1 = u * P[2] - P[0]
        r2 = v * P[2] - P[1]
        return jnp.stack([r1, r2], axis=-2)  # [N,2,4]

    A = jnp.concatenate([rows(P1, uv1), rows(P2, uv2)], axis=-2)  # [N,4,4]
    # Null vector = right singular vector of the smallest singular value.
    _, _, vt = jnp.linalg.svd(A)
    Xh = vt[..., -1, :]
    w = Xh[..., 3:4]
    safe_w = jnp.where(jnp.abs(w) < 1e-12, 1e-12, w)
    return Xh[..., :3] / safe_w


def triangulate_rectified(rig: StereoRig, uv_l, uv_r, max_depth: float = 100.0):
    """Closed-form rectified triangulation with validity mask.

    Mirrors ref `src/camera_model.cpp:195-228`: x = (u-cx)*z/fx etc. with
    z = fx*b/d, plus the 0 < z < 100 gate (ref `src/camera_model.cpp:219`).
    Unlike the reference, invalid points stay in place (masked) so arrays
    remain aligned with keypoints.
    """
    fx = rig.left.fx
    cx = rig.left.cx
    cy = rig.left.cy
    cx_r = rig.right.cx
    b = rig.baseline
    u = uv_l[..., 0]
    v = uv_l[..., 1]
    d = uv_l[..., 0] - uv_r[..., 0]
    # Depth from disparity, accounting for differing principal points:
    # z = fx * b / (d - (cx - cx_r)).
    dd = d - (cx - cx_r)
    safe_dd = jnp.where(jnp.abs(dd) < 1e-6, 1e-6, dd)
    z = fx * b / safe_dd
    x = (u - cx) * z / fx
    y = (v - cy) * z / fx  # rectified model assumes fx == fy
    pts = jnp.stack([x, y, z], axis=-1)
    valid = (z > 0.0) & (z < max_depth)
    return pts, valid


def triangulate_general(rig: StereoRig, uv_l, uv_r, max_depth: float = 100.0):
    """General stereo path: undistort (ref `src/camera_model.cpp:128-132`)
    then DLT-triangulate; validity is a positive-depth test in the left
    camera frame."""
    uvl_u = undistort_points(rig.left, uv_l)
    uvr_u = undistort_points(rig.right, uv_r)
    pts = triangulate_dlt(rig.left.projection, rig.right.projection, uvl_u, uvr_u)
    local = se3.transform_points(se3.inverse(rig.left.pose), pts)
    valid = (local[..., 2] > 0.0) & (local[..., 2] < max_depth)
    return pts, valid


def triangulate_ideal(rig: StereoRig, uv_l, uv_r, max_depth: float = 100.0,
                      rectified: bool = True):
    """Triangulate ALREADY-UNDISTORTED (ideal pinhole) pixel observations.

    Static dispatch: rectified -> closed-form disparity; general -> DLT
    without re-undistorting. This is the path the front end uses after it
    normalizes observations (see frontend/odometer.py): downstream RANSAC,
    BA, and loop-closure geometry all consume ideal coordinates, fixing the
    reference's inconsistency where Ceres/RANSAC residuals compared pinhole
    projections against raw distorted pixels (ref reprojection_error.h:27-38
    with raw observations from visual_odometer.cpp:167-169).
    """
    if rectified:
        return triangulate_rectified(rig, uv_l, uv_r, max_depth)
    pts = triangulate_dlt(rig.left.projection, rig.right.projection, uv_l, uv_r)
    local = se3.transform_points(se3.inverse(rig.left.pose), pts)
    valid = (local[..., 2] > 0.0) & (local[..., 2] < max_depth)
    return pts, valid


def triangulate_rectified_np(fx, cx, cy, cx_r, baseline, uv_l, uv_r):
    """Host (NumPy) mirror of triangulate_rectified's VALUE computation —
    exact same f32 op order, scalar intrinsics.

    Exists so the live loop's packed readback can DROP the [K,N,3] point
    block (~33%% of the transfer bytes on the relay transport) and
    recompute it from the keypoints it already reads back; the validity
    gate still comes from the device flags. Rectified rigs only — the
    general path's SVD has no cheap host mirror.
    """
    fx = np.float32(fx)
    cx = np.float32(cx)
    cy = np.float32(cy)
    cx_r = np.float32(cx_r)
    b = np.float32(baseline)
    u = uv_l[..., 0]
    v = uv_l[..., 1]
    d = uv_l[..., 0] - uv_r[..., 0]
    dd = d - (cx - cx_r)
    safe_dd = np.where(np.abs(dd) < np.float32(1e-6), np.float32(1e-6), dd)
    z = fx * b / safe_dd
    x = (u - cx) * z / fx
    y = (v - cy) * z / fx
    return np.stack([x, y, z], axis=-1)


def triangulate(rig: StereoRig, uv_l, uv_r, max_depth: float = 100.0,
                rectified=None):
    """Dispatch rectified / general triangulation; both return (pts, valid).

    `rectified` may be passed as a static Python bool (preferred inside jit:
    only the live branch is compiled — the dead branch's batched SVD costs
    real TPU compile time). When None it falls back to a `lax.cond` on the
    rig's traced flag.
    """
    if rectified is not None:
        if rectified:
            return triangulate_rectified(rig, uv_l, uv_r, max_depth)
        return triangulate_general(rig, uv_l, uv_r, max_depth)

    return jax.lax.cond(
        rig.rectified,
        lambda args: triangulate_rectified(rig, args[0], args[1], max_depth),
        lambda args: triangulate_general(rig, args[0], args[1], max_depth),
        (uv_l, uv_r),
    )
