"""End-to-end VO through the GENERAL (non-rectified, distorted) stereo path:
undistortion + DLT triangulation (the EuRoC-style configuration)."""

import numpy as np
import scipy.ndimage as ndi

from stereo_orb_slam_tpu.frontend.odometer import VisualOdometer
from stereo_orb_slam_tpu.geometry import camera
from stereo_orb_slam_tpu.worldmap import WorldMap


class DistortedPlaneScene:
    """Textured plane rendered through cameras WITH radial distortion."""

    def __init__(self, rng, fx=220.0, cx=160.0, cy=120.0, baseline=0.4,
                 depth=10.0, h=240, w=320, k1=-0.15, k2=0.03):
        self.fx, self.cx, self.cy = fx, cx, cy
        self.baseline, self.depth = baseline, depth
        self.h, self.w = h, w
        self.dist = np.array([k1, k2, 0.0, 0.0, 0.0], np.float32)
        tex = rng.uniform(0, 255, (512, 512)).astype(np.float32)
        tex = np.kron(tex, np.ones((8, 8), np.float32))
        self.tex = ndi.gaussian_filter(tex, 1.0)
        self.tex_scale = 0.02

    def render(self, cam_x, right=False):
        ox = cam_x + (self.baseline if right else 0.0)
        uu, vv = np.meshgrid(
            np.arange(self.w, dtype=np.float32),
            np.arange(self.h, dtype=np.float32),
        )
        # Undistort model forward: pixel -> normalized distorted coords ->
        # invert numerically is what the pipeline does; for RENDERING we go
        # the other way: each pixel (distorted) samples the world through
        # the distortion model: normalize, undistort by iteration, project.
        x = (uu - self.cx) / self.fx
        y = (vv - self.cy) / self.fx
        # iterative undistort (forward rendering uses undistorted ray)
        xu, yu = x.copy(), y.copy()
        k1, k2 = self.dist[0], self.dist[1]
        for _ in range(10):
            r2 = xu * xu + yu * yu
            rad = 1.0 + k1 * r2 + k2 * r2 * r2
            xu = x / rad
            yu = y / rad
        wx = xu * self.depth + ox
        wy = yu * self.depth
        tx = wx / self.tex_scale + self.tex.shape[1] / 2
        ty = wy / self.tex_scale + self.tex.shape[0] / 2
        return ndi.map_coordinates(
            self.tex, [ty, tx], order=1, mode="nearest"
        ).astype(np.float32)

    def make_rig(self):
        left = camera.Pinhole.create(
            self.fx, self.fx, self.cx, self.cy, dist=self.dist
        )
        pose_r = np.eye(4, dtype=np.float32)
        pose_r[0, 3] = self.baseline
        right = camera.Pinhole.create(
            self.fx, self.fx, self.cx, self.cy, dist=self.dist, pose=pose_r
        )
        # rectified=False forces the undistort + DLT path.
        return camera.StereoRig.create(
            left, right, rectified=False, baseline=self.baseline
        )


def test_general_stereo_vo(rng):
    scene = DistortedPlaneScene(rng)
    rig = scene.make_rig()
    assert rig.rectified is False
    world = WorldMap()
    vo = VisualOdometer(world, rig, seed=0)

    step = 0.15
    for i in range(5):
        vo.track(scene.render(i * step), scene.render(i * step, right=True))
    assert world.num_frames == 5
    assert vo.success
    xs = world.pose_global[: world.num_frames][:, 0, 3]
    # Distortion warps appearance between views, degrading descriptor
    # matching; the per-frame estimates are noisy but unbiased. Validate the
    # path is functional: trajectory grows in +x and stays within ~1.5 steps.
    assert xs[-1] > step  # net forward progress
    np.testing.assert_allclose(xs, np.arange(5) * step, atol=1.6 * step)
    # Landmarks near the plane depth.
    live = world.point_obs_count[: world.num_points] > 0
    z = world.points[: world.num_points][live][:, 2]
    assert abs(np.median(z) - scene.depth) < 0.5
