"""Synthetic stereo sequence renderers for end-to-end tests.

Two scene families (the reference has no tests; SURVEY.md §4 calls for
synthetic-track validation):

- PlaneScene: textured fronto-parallel plane, pure lateral translation.
  The easy case — exact dense appearance, zero rotation, constant depth.
- CloudScene: a 3D landmark cloud rendered by stamping a unique
  high-contrast patch at each landmark's exact projection, under ARBITRARY
  SE(3) trajectories (forward motion, yaw, noise) — the KITTI-like case:
  depth-varying disparity, radially sliding temporal matches, rotation
  through the full RANSAC/Horn path. Patch appearance is constant across
  views (no perspective warp), so descriptors match; the projected CENTERS
  are geometrically exact, so trajectory recovery can be asserted against
  ground truth to tight bounds.
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


# --------------------------------------------------------------- trajectories
def forward_yaw_trajectory(n, speed=0.3, yaw_rate_deg=1.0, start=None):
    """KITTI-like cam-to-world poses: forward (+z) motion with constant yaw.

    Returns [n,4,4] float32. Frame 0 at origin looking +z (or `start`).
    """
    poses = []
    T = np.eye(4, dtype=np.float64) if start is None else start.astype(np.float64)
    yaw = np.deg2rad(yaw_rate_deg)
    c, s = np.cos(yaw), np.sin(yaw)
    R_step = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
    for _ in range(n):
        poses.append(T.copy())
        step = np.eye(4)
        step[:3, :3] = R_step
        step[2, 3] = speed  # advance along the camera's own +z
        T = T @ step
    return np.asarray(poses, np.float32)


def loop_trajectory(n, side=4.0, depth_jitter=0.0):
    """A closed square loop (4 straight legs + 90-degree yaw turns spread
    over the corners), returning near the start — drives loop closure."""
    per_leg = n // 4
    poses = []
    T = np.eye(4, dtype=np.float64)
    speed = side / per_leg
    turn_frames = max(3, per_leg // 4)
    yaw = np.deg2rad(90.0 / turn_frames)
    c, s = np.cos(yaw), np.sin(yaw)
    R_turn = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
    for leg in range(4):
        for i in range(per_leg):
            poses.append(T.copy())
            step = np.eye(4)
            step[2, 3] = speed
            if i >= per_leg - turn_frames:
                step[:3, :3] = R_turn
            T = T @ step
    while len(poses) < n:
        poses.append(T.copy())
    return np.asarray(poses[:n], np.float32)


# ----------------------------------------------------------------- CloudScene
class CloudScene:
    """3D landmark cloud + patch-stamp renderer for arbitrary trajectories.

    Landmarks are seeded by backprojecting random pixels at random depths
    from poses along `traj` (so every view sees enough of them). Each
    landmark carries a unique random-block patch with a maximal-contrast
    X-corner at its exact center: Shi-Tomasi detects the center, ORB
    descriptors are stable across views (constant appearance), and the
    center's projection is exact ground truth.
    """

    def __init__(self, rng, traj, fx=200.0, cx=160.0, cy=120.0, baseline=0.5,
                 h=240, w=320, n_per_anchor=70, anchor_stride=5,
                 depth_range=(6.0, 28.0), patch=35, noise_sigma=0.0):
        self.fx, self.cx, self.cy = fx, cx, cy
        self.baseline = baseline
        self.h, self.w = h, w
        self.patch = patch
        self.noise_sigma = noise_sigma
        self.rng = rng

        # Seed landmarks from anchor poses, with greedy min-spacing enforced
        # against ALL accepted landmarks in EVERY anchor view: overlapping
        # stamps at different depths shift differently between the stereo
        # eyes and across frames, which corrupts appearance and creates
        # geometrically inconsistent corners.
        anchors = np.asarray(traj[::anchor_stride], np.float64)
        m = patch // 2 + 2
        min_spacing = 0.95 * patch
        pts: list = []

        def projections(X):
            """[A,2] projection of world point X in each anchor view, NaN
            where behind the camera / out of frame."""
            out = np.full((len(anchors), 2), np.nan)
            for ai, T in enumerate(anchors):
                R, t = T[:3, :3], T[:3, 3]
                l = R.T @ (X - t)
                if l[2] <= 1.0:
                    continue
                u = fx * l[0] / l[2] + cx
                v = fx * l[1] / l[2] + cy
                if -patch < u < w + patch and -patch < v < h + patch:
                    out[ai] = (u, v)
            return out

        proj_cache: list = []  # per accepted point: [A,2]
        for ai, T in enumerate(anchors):
            accepted = 0
            tries = 0
            while accepted < n_per_anchor and tries < n_per_anchor * 40:
                tries += 1
                u = rng.uniform(m, w - m)
                v = rng.uniform(m, h - m)
                z = rng.uniform(*depth_range)
                X = T[:3, :3] @ np.array(
                    [(u - cx) * z / fx, (v - cy) * z / fx, z]
                ) + T[:3, 3]
                cand = projections(X)
                clash = False
                for other in proj_cache:
                    d = cand - other
                    dist2 = d[:, 0] ** 2 + d[:, 1] ** 2  # NaN where unseen
                    if np.any(dist2 < min_spacing ** 2):
                        clash = True
                        break
                if clash:
                    continue
                pts.append(X)
                proj_cache.append(cand)
                accepted += 1
        self.points = np.asarray(pts, np.float64).reshape(-1, 3)

        # Unique per-landmark patches: mid-contrast random 5px blocks for
        # descriptor identity, plus a 12x12 FULL-contrast checker centered
        # at the landmark => the center X-corner's Shi-Tomasi response
        # dominates the surround's, so detection lands on the exact center.
        P = len(self.points)
        blocks = rng.uniform(96, 160, (P, patch // 5 + 1, patch // 5 + 1))
        self.patches = np.kron(
            blocks, np.ones((5, 5))
        )[:, :patch, :patch].astype(np.float32)
        # Strong deterministic horizontal brightness dipole: pins the ORB
        # intensity-centroid orientation far from quantization-bin
        # boundaries, so the steered descriptor is stable across the +-1px
        # detection jitter between views (random-moment patches flip
        # orientation bins and scramble ~40 descriptor bits).
        ramp = np.linspace(-48.0, 48.0, patch, dtype=np.float32)[None, None, :]
        self.patches = np.clip(self.patches + ramp, 0.0, 255.0)
        half = patch // 2
        a = rng.uniform(0, 32, (P, 1, 1))
        b = rng.uniform(224, 255, (P, 1, 1))
        q = np.kron(np.array([[1.0, 0.0], [0.0, 1.0]]), np.ones((6, 6)))
        checker = a * q + b * (1 - q)  # [P,12,12], per-landmark contrast
        self.patches[:, half - 6 : half + 6, half - 6 : half + 6] = checker

    def render_pose(self, T_cam_to_world, right=False, noise_rng=None):
        """Render one view from a 4x4 cam-to-world pose."""
        T = np.asarray(T_cam_to_world, np.float64)
        R, t = T[:3, :3], T[:3, 3]
        local = (self.points - t) @ R  # R^T (X - t)
        if right:
            local = local - np.array([self.baseline, 0.0, 0.0])
        z = local[:, 2]
        vis = z > 1.0
        u = self.fx * local[:, 0] / np.where(vis, z, 1.0) + self.cx
        v = self.fx * local[:, 1] / np.where(vis, z, 1.0) + self.cy
        half = self.patch // 2
        vis &= (u > half + 1) & (u < self.w - half - 2) \
             & (v > half + 1) & (v < self.h - half - 2)

        img = np.full((self.h, self.w), 96.0, np.float32)
        order = np.argsort(-z[vis])  # painter: far first, near overwrites
        idx = np.where(vis)[0][order]
        for i in idx:
            ui, vi = u[i], v[i]
            x0, y0 = int(np.floor(ui)), int(np.floor(vi))
            ax, ay = ui - x0, vi - y0
            # Bilinear sub-pixel placement: out[y,x] = p[y-ay, x-ax], so the
            # patch content sits at its exact fractional projection.
            p = self.patches[i]
            pr = np.pad(p, ((1, 0), (1, 0)), mode="edge")
            sh = ((1 - ay) * (1 - ax) * pr[1:, 1:]
                  + (1 - ay) * ax * pr[1:, :-1]
                  + ay * (1 - ax) * pr[:-1, 1:]
                  + ay * ax * pr[:-1, :-1])
            img[y0 - half : y0 + half + 1, x0 - half : x0 + half + 1] = sh
        if self.noise_sigma > 0:
            r = noise_rng or self.rng
            img = img + r.normal(0, self.noise_sigma, img.shape)
        return img.clip(0, 255).astype(np.float32)

    def render_sequence(self, traj):
        """[(img_l, img_r)] for each pose in traj."""
        return [
            (self.render_pose(T, False), self.render_pose(T, True))
            for T in traj
        ]

    def make_rig(self):
        from stereo_orb_slam_tpu.geometry import camera

        left = camera.Pinhole.create(self.fx, self.fx, self.cx, self.cy)
        pose_r = np.eye(4, dtype=np.float32)
        pose_r[0, 3] = self.baseline
        right = camera.Pinhole.create(
            self.fx, self.fx, self.cx, self.cy, pose=pose_r
        )
        return camera.StereoRig.create(left, right, rectified=True,
                                       baseline=self.baseline)
