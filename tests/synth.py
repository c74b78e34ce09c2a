"""Synthetic stereo sequence renderer for end-to-end tests.

Renders a textured fronto-parallel plane at known depth viewed by a
translating rectified stereo rig. Every pixel's appearance comes from a fixed
world texture, so detection/matching/triangulation/RANSAC/BA can be validated
against exact ground truth (the reference has no tests; SURVEY.md §4 calls
for synthetic-track validation).
"""

import numpy as np
import scipy.ndimage as ndi


class PlaneScene:
    def __init__(self, rng, fx=200.0, cx=160.0, cy=120.0, baseline=0.5,
                 depth=10.0, h=240, w=320, tex_size=4096, tex_scale=0.02):
        self.fx, self.cx, self.cy = fx, cx, cy
        self.baseline, self.depth = baseline, depth
        self.h, self.w = h, w
        # Smooth random texture (world units -> texels via tex_scale).
        tex = rng.uniform(0, 255, (tex_size // 8, tex_size // 8)).astype(np.float32)
        tex = np.kron(tex, np.ones((8, 8), np.float32))
        self.tex = ndi.gaussian_filter(tex, 1.0)
        self.tex_scale = tex_scale  # meters per texel

    def render(self, cam_x, cam_y=0.0, right=False):
        """Render the plane from a camera at (cam_x, cam_y, 0), looking +z."""
        ox = cam_x + (self.baseline if right else 0.0)
        uu, vv = np.meshgrid(
            np.arange(self.w, dtype=np.float32),
            np.arange(self.h, dtype=np.float32),
        )
        # World coords on the plane z = depth.
        wx = (uu - self.cx) * self.depth / self.fx + ox
        wy = (vv - self.cy) * self.depth / self.fx + cam_y
        tx = wx / self.tex_scale + self.tex.shape[1] / 2
        ty = wy / self.tex_scale + self.tex.shape[0] / 2
        return ndi.map_coordinates(
            self.tex, [ty, tx], order=1, mode="nearest"
        ).astype(np.float32)

    def make_rig(self):
        from stereo_orb_slam_tpu.geometry import camera

        left = camera.Pinhole.create(self.fx, self.fx, self.cx, self.cy)
        pose_r = np.eye(4, dtype=np.float32)
        pose_r[0, 3] = self.baseline
        right = camera.Pinhole.create(
            self.fx, self.fx, self.cx, self.cy, pose=pose_r
        )
        return camera.StereoRig.create(left, right, rectified=True)
