"""Synthetic stereo sequence renderers for end-to-end tests.

Two scene families (the reference has no tests; SURVEY.md §4 calls for
synthetic-track validation):

- PlaneScene: textured fronto-parallel plane, pure lateral translation.
  The easy case — exact dense appearance, zero rotation, constant depth.
- CloudScene: a 3D landmark cloud rendered by stamping a unique
  high-contrast patch at each landmark's exact projection, under ARBITRARY
  SE(3) trajectories (forward motion, yaw, noise) — the KITTI-like case:
  depth-varying disparity, radially sliding temporal matches, rotation
  through the full RANSAC/Horn path. The projected CENTERS are
  geometrically exact, so trajectory recovery can be asserted against
  ground truth to tight bounds.

  Realism knobs (r2 verdict item 5 — the default flat mode stamps
  constant-appearance patches, which makes matching artificially easy):

  * ``warp=True``: each landmark becomes a TILTED PLANAR patch (random
    surface normal within ``tilt_max_deg`` of the seed view direction),
    rendered by exact per-pixel ray/plane intersection — a true
    perspective homography per view, so appearance, scale, and shear
    change with viewpoint exactly as a physical surface's would.
  * ``illum_drift``: slow multiplicative gain + additive bias drift over
    the sequence (auto-exposure / lighting change).
  * ``n_occluders_per_anchor``: low-contrast foreground quads at near
    depth that sweep across and occlude landmarks under parallax.
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




def illum_gain_bias(f: int, amplitude: float):
    """Slow exposure/lighting drift shared by the realistic renderers:
    (gain, bias) for frame f, both eyes of a frame equally (shared-exposure
    rig). Incommensurate periods so gain and bias never phase-lock."""
    if amplitude <= 0:
        return 1.0, 0.0
    return (1.0 + amplitude * np.sin(2 * np.pi * f / 41.0),
            24.0 * amplitude * np.sin(2 * np.pi * f / 59.0))


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
                 depth_range=(6.0, 28.0), patch=35, noise_sigma=0.0,
                 warp=False, tilt_max_deg=30.0, illum_drift=0.0,
                 n_occluders_per_anchor=0, bg_depth=None):
        self.fx, self.cx, self.cy = fx, cx, cy
        self.baseline = baseline
        self.h, self.w = h, w
        self.patch = patch
        self.noise_sigma = noise_sigma
        self.warp = warp
        self.illum_drift = illum_drift
        self.rng = rng
        # Textured far background plane (world z = bg_depth): real images
        # have texture everywhere, so a descriptor window that extends past
        # its landmark's patch must see coherent (far-parallax) content,
        # not a constant — constant surrounds make the boundary bits
        # viewpoint-noise and were the dominant synthetic-vs-real gap.
        self.bg_depth = bg_depth
        if bg_depth is not None:
            tex = rng.uniform(0, 255, (1024, 1024))
            self.bg_tex = (40.0 + 176.0 * (
                (lambda s: (s - s.min()) / (s.max() - s.min()))(
                    ndi.gaussian_filter(tex, 2.0))
            )).astype(np.float32)
            self.bg_scale = 0.12  # meters per texel at the bg plane

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
        seed_info: list = []   # per accepted point: (anchor_idx, depth)
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
                seed_info.append((ai, z))
                accepted += 1
        self.points = np.asarray(pts, np.float64).reshape(-1, 3)
        self._seed_info = seed_info

        # Unique per-landmark patches, plus a 12x12 FULL-contrast checker
        # centered at the landmark => the center X-corner's Shi-Tomasi
        # response dominates the surround's, so detection lands on the exact
        # center.
        P = len(self.points)
        if warp:
            # Natural-image-like texture: band-limited noise with gradients
            # everywhere. Piecewise-constant blocks (flat mode below) make
            # ORB's pairwise intensity comparisons exact ties that pixel
            # noise then decides at random; real images are smooth, so the
            # realistic mode must be too.
            noise = rng.uniform(0, 255, (P, patch, patch))
            # sigma 2.2: mostly low-frequency content, like natural image
            # statistics — high-frequency texture decorrelates under the
            # perspective warp far faster than real surfaces do.
            sm = ndi.gaussian_filter(noise, (0, 2.2, 2.2))
            lo = sm.min(axis=(1, 2), keepdims=True)
            hi = sm.max(axis=(1, 2), keepdims=True)
            self.patches = (
                40.0 + 176.0 * (sm - lo) / np.maximum(hi - lo, 1e-6)
            ).astype(np.float32)
        else:
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
        self.is_occluder = np.zeros(P, bool)

        # Foreground occluders: low-contrast near-depth planar quads that
        # sweep across under parallax and hide landmarks behind them. They
        # join the landmark arrays (painter's algorithm handles the hiding)
        # but carry smooth low-texture patches so they seed few corners.
        if n_occluders_per_anchor > 0:
            occ_pts, occ_patches, occ_info = [], [], []
            op = patch * 2 + 1  # larger footprint
            for ai, T in enumerate(anchors):
                for _ in range(n_occluders_per_anchor):
                    u = rng.uniform(op, w - op)
                    v = rng.uniform(op, h - op)
                    z = rng.uniform(2.5, depth_range[0] - 1.0)
                    X = T[:3, :3] @ np.array(
                        [(u - cx) * z / fx, (v - cy) * z / fx, z]
                    ) + T[:3, 3]
                    occ_pts.append(X)
                    tex = ndi.gaussian_filter(
                        rng.uniform(100, 150, (op, op)), 3.0
                    ).astype(np.float32)
                    occ_patches.append(tex)
                    occ_info.append((ai, z))
            if occ_pts:
                self.points = np.concatenate(
                    [self.points, np.asarray(occ_pts, np.float64)]
                )
                # Pad the landmark patches to the occluder footprint so one
                # stacked array serves both (render uses per-point extent).
                pad = (op - patch) // 2
                lm = np.pad(self.patches,
                            ((0, 0), (pad, pad), (pad, pad)),
                            mode="edge")
                self.patches = np.concatenate(
                    [lm, np.asarray(occ_patches, np.float32)]
                )
                self._patch_extent = np.concatenate(
                    [np.full(P, patch, np.int32),
                     np.full(len(occ_pts), op, np.int32)]
                )
                self.is_occluder = np.concatenate(
                    [self.is_occluder, np.ones(len(occ_pts), bool)]
                )
                seed_info.extend(occ_info)
        if not hasattr(self, "_patch_extent"):
            self._patch_extent = np.full(len(self.points), patch, np.int32)

        # Per-landmark tilted plane frames for the perspective-warp renderer:
        # normal within tilt_max_deg of the SEED view direction, tangent
        # frame (e1, e2), and meters-per-texel chosen so the patch spans its
        # pixel extent exactly at the seed depth (scale then varies with
        # 1/z like a physical surface).
        if warp:
            n_all = len(self.points)
            normals = np.zeros((n_all, 3))
            e1s = np.zeros((n_all, 3))
            e2s = np.zeros((n_all, 3))
            ms = np.zeros(n_all)
            for i in range(n_all):
                ai, z = seed_info[i]
                T = anchors[ai]
                d = self.points[i] - T[:3, 3]
                d = d / np.linalg.norm(d)
                nrm = -d
                if not self.is_occluder[i]:
                    tilt = np.deg2rad(rng.uniform(0.0, tilt_max_deg))
                    phi = rng.uniform(0, 2 * np.pi)
                    # Rotate the anti-view normal by `tilt` about a random
                    # in-plane axis.
                    a1 = np.cross(nrm, [0.0, 1.0, 0.0])
                    a1 /= np.linalg.norm(a1) + 1e-12
                    a2 = np.cross(nrm, a1)
                    axis = np.cos(phi) * a1 + np.sin(phi) * a2
                    K = np.array([[0, -axis[2], axis[1]],
                                  [axis[2], 0, -axis[0]],
                                  [-axis[1], axis[0], 0]])
                    R = (np.eye(3) + np.sin(tilt) * K
                         + (1 - np.cos(tilt)) * (K @ K))
                    nrm = R @ nrm
                normals[i] = nrm
                t1 = np.cross([0.0, 1.0, 0.0], nrm)
                t1 /= np.linalg.norm(t1) + 1e-12
                e1s[i] = t1
                e2s[i] = np.cross(nrm, t1)
                ms[i] = z / fx  # 1 texel per pixel at seed depth
            self._plane_n = normals
            self._plane_e1 = e1s
            self._plane_e2 = e2s
            self._plane_ms = ms

    def render_pose(self, T_cam_to_world, right=False, noise_rng=None,
                    gain=1.0, bias=0.0):
        """Render one view from a 4x4 cam-to-world pose."""
        T = np.asarray(T_cam_to_world, np.float64)
        R, t = T[:3, :3], T[:3, 3]
        eye = t + (R @ np.array([self.baseline, 0.0, 0.0]) if right else 0.0)
        local = (self.points - eye) @ R  # R^T (X - eye)
        z = local[:, 2]
        vis = z > 1.0
        u = self.fx * local[:, 0] / np.where(vis, z, 1.0) + self.cx
        v = self.fx * local[:, 1] / np.where(vis, z, 1.0) + self.cy
        ext = self._patch_extent
        half_i = ext // 2
        vis &= (u > half_i + 1) & (u < self.w - half_i - 2) \
             & (v > half_i + 1) & (v < self.h - half_i - 2)
        if self.warp:
            # Skip patches seen too edge-on (physically near-invisible and
            # numerically degenerate).
            view = (self.points - eye)
            view /= np.linalg.norm(view, axis=1, keepdims=True) + 1e-12
            vis &= np.einsum("ij,ij->i", view, self._plane_n) < -0.25

        if self.bg_depth is None:
            img = np.full((self.h, self.w), 96.0, np.float32)
        else:
            # Background plane z_w = bg_depth, textured by world (x, y):
            # exact per-pixel ray intersection (full parallax).
            uu, vv = np.meshgrid(np.arange(self.w, dtype=np.float64),
                                 np.arange(self.h, dtype=np.float64))
            rays = np.stack([(uu - self.cx) / self.fx,
                             (vv - self.cy) / self.fx,
                             np.ones_like(uu)], axis=-1) @ R.T
            rz = np.where(np.abs(rays[..., 2]) < 1e-6, 1e-6, rays[..., 2])
            s_bg = (self.bg_depth - eye[2]) / rz
            Yb = eye + rays * s_bg[..., None]
            tx = Yb[..., 0] / self.bg_scale
            ty = Yb[..., 1] / self.bg_scale
            img = ndi.map_coordinates(
                self.bg_tex, [ty % 1024, tx % 1024], order=1, mode="wrap"
            ).astype(np.float32)
            img[s_bg <= 0] = 96.0
        order = np.argsort(-z[vis])  # painter: far first, near overwrites
        idx = np.where(vis)[0][order]
        for i in idx:
            ui, vi = u[i], v[i]
            p = self.patches[i]
            pe = int(ext[i])
            half = pe // 2
            if p.shape[0] != pe:  # padded stack: crop to this point's extent
                off = (p.shape[0] - pe) // 2
                p = p[off : off + pe, off : off + pe]
            if not self.warp:
                x0, y0 = int(np.floor(ui)), int(np.floor(vi))
                ax, ay = ui - x0, vi - y0
                # Bilinear sub-pixel placement: out[y,x] = p[y-ay, x-ax], so
                # the patch content sits at its exact fractional projection.
                pr = np.pad(p, ((1, 0), (1, 0)), mode="edge")
                sh = ((1 - ay) * (1 - ax) * pr[1:, 1:]
                      + (1 - ay) * ax * pr[1:, :-1]
                      + ay * (1 - ax) * pr[:-1, 1:]
                      + ay * ax * pr[:-1, :-1])
                img[y0 - half : y0 + half + 1,
                    x0 - half : x0 + half + 1] = sh
                continue

            # Perspective path: sample the tilted planar patch by ray/plane
            # intersection for every pixel in its projected footprint — the
            # exact homography a physical surface induces.
            n_i = self._plane_n[i]
            e1, e2 = self._plane_e1[i], self._plane_e2[i]
            ms = self._plane_ms[i]
            X = self.points[i]
            # Footprint: project the 4 patch corners, take the bbox.
            s = half * ms
            corners = X + np.array([[s, s], [s, -s], [-s, s], [-s, -s]]) \
                @ np.stack([e1, e2])
            cl = (corners - eye) @ R
            cz = np.maximum(cl[:, 2], 0.5)
            cu = self.fx * cl[:, 0] / cz + self.cx
            cv = self.fx * cl[:, 1] / cz + self.cy
            x0 = max(int(np.floor(cu.min())), 0)
            x1 = min(int(np.ceil(cu.max())) + 1, self.w)
            y0 = max(int(np.floor(cv.min())), 0)
            y1 = min(int(np.ceil(cv.max())) + 1, self.h)
            if x1 - x0 < 2 or y1 - y0 < 2 \
                    or (x1 - x0) * (y1 - y0) > (4 * pe) ** 2:
                continue
            uu, vv = np.meshgrid(np.arange(x0, x1, dtype=np.float64),
                                 np.arange(y0, y1, dtype=np.float64))
            # World ray directions for each pixel.
            rays = np.stack([(uu - self.cx) / self.fx,
                             (vv - self.cy) / self.fx,
                             np.ones_like(uu)], axis=-1) @ R.T
            denom = rays @ n_i
            tnum = (X - eye) @ n_i
            with np.errstate(divide="ignore", invalid="ignore"):
                s_ray = tnum / denom
            Y = eye + rays * s_ray[..., None]
            d = Y - X
            a1 = (d @ e1) / ms + half
            a2 = (d @ e2) / ms + half
            inside = ((s_ray > 0.5) & (a1 >= 0) & (a1 <= pe - 1)
                      & (a2 >= 0) & (a2 <= pe - 1))
            if not inside.any():
                continue
            samp = ndi.map_coordinates(p, [a2.ravel(), a1.ravel()],
                                       order=1, mode="nearest")
            tile = img[y0:y1, x0:x1]
            tile[inside] = samp.reshape(inside.shape)[inside]
        img = img * gain + bias
        if self.noise_sigma > 0:
            r = noise_rng or self.rng
            img = img + r.normal(0, self.noise_sigma, img.shape)
        return img.clip(0, 255).astype(np.float32)

    def render_sequence(self, traj):
        """[(img_l, img_r)] for each pose in traj (illumination drift via
        illum_gain_bias, both eyes of a frame equally)."""
        out = []
        for f, T in enumerate(traj):
            g, b = illum_gain_bias(f, self.illum_drift)
            out.append((self.render_pose(T, False, gain=g, bias=b),
                        self.render_pose(T, True, gain=g, bias=b)))
        return out

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


# ---------------------------------------------------------------- CanyonScene
class CanyonScene:
    """Continuous piecewise-planar world ("urban canyon"): ground plane,
    side walls, far wall — every pixel textured, exact per-pixel depth.

    The realism harness (r2 verdict item 5). Stamped-patch scenes
    (CloudScene) give exact landmark centers but surround each corner with
    synthetic content that decorrelates unnaturally fast; real images are
    continuous surfaces, so ORB's 31 px sampling window always sees
    coherent texture that warps smoothly with viewpoint. Here the IMAGE IS
    the world: corners come from band-limited texture exactly as on real
    footage, appearance change under motion is a true homography per plane,
    and ground truth for ANY pixel (not just landmark centers) comes from
    closed-form ray/plane intersection — so descriptor recall can be
    verified against exact reprojection.

    Knobs: `noise_sigma` (sensor noise), `illum_drift` (exposure drift),
    plus arbitrary SE(3) trajectories.
    """

    def __init__(self, rng, fx=300.0, cx=240.0, cy=160.0, baseline=0.54,
                 h=320, w=480, noise_sigma=0.0, illum_drift=0.0,
                 tex_sigma=2.0, planes=None):
        self.fx, self.cx, self.cy = fx, cx, cy
        self.baseline = baseline
        self.h, self.w = h, w
        self.noise_sigma = noise_sigma
        self.illum_drift = illum_drift
        self.rng = rng

        # Each plane: (point, normal, e1, e2, texture, meters/texel).
        # Default canyon: ground below, two walls, far wall — covers every
        # pixel for forward(+z)/yaw trajectories within ~|x| < 4, z < 25.
        def plane(point, normal, up, scale, tex_hw=2048, smooth=None):
            nrm = np.asarray(normal, np.float64)
            nrm = nrm / np.linalg.norm(nrm)
            e1 = np.cross(up, nrm).astype(np.float64)
            e1 /= np.linalg.norm(e1)
            e2 = np.cross(nrm, e1)
            tex = rng.uniform(0, 255, (tex_hw, tex_hw))
            tex = ndi.gaussian_filter(tex, smooth or tex_sigma)
            tex = 40.0 + 176.0 * (tex - tex.min()) / (tex.max() - tex.min())
            return (np.asarray(point, np.float64), nrm, e1, e2,
                    tex.astype(np.float32), scale)

        self.planes = planes or [
            plane([0.0, 1.6, 0.0], [0.0, -1.0, 0.0], [0.0, 0.0, 1.0], 0.030),
            plane([-5.0, 0.0, 0.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0], 0.035),
            plane([6.0, 0.0, 0.0], [-1.0, 0.0, 0.0], [0.0, 1.0, 0.0], 0.035),
            plane([0.0, 0.0, 45.0], [0.0, 0.0, -1.0], [0.0, 1.0, 0.0], 0.10),
            # Near wall behind the start: closed-loop trajectories that yaw
            # through 360 degrees always face textured surface.
            plane([0.0, 0.0, -12.0], [0.0, 0.0, 1.0], [0.0, 1.0, 0.0], 0.05),
        ]

    def _trace(self, T_cam_to_world, right, uu, vv):
        """Ray-cast pixels (uu, vv): returns (intensity, depth) arrays."""
        T = np.asarray(T_cam_to_world, np.float64)
        R, t = T[:3, :3], T[:3, 3]
        eye = t + (R @ np.array([self.baseline, 0.0, 0.0]) if right else 0.0)
        rays = np.stack([(uu - self.cx) / self.fx,
                         (vv - self.cy) / self.fx,
                         np.ones_like(uu)], axis=-1) @ R.T
        img = np.full(uu.shape, 96.0, np.float32)
        depth = np.full(uu.shape, np.inf)
        for (X0, nrm, e1, e2, tex, ms) in self.planes:
            denom = rays @ nrm
            with np.errstate(divide="ignore", invalid="ignore"):
                s = ((X0 - eye) @ nrm) / denom
            ok = (s > 0.2) & (np.abs(denom) > 1e-9)
            # Camera-frame depth (z along view axis), not ray length.
            zc = s * (rays @ R[:, 2])
            hit = ok & (zc < depth) & (zc > 0.2)
            if not hit.any():
                continue
            Y = eye + rays * np.where(ok, s, 0.0)[..., None]
            d = Y - X0
            a1 = (d @ e1) / ms
            a2 = (d @ e2) / ms
            n_t = tex.shape[0]
            samp = ndi.map_coordinates(
                tex, [a2[hit] % n_t, a1[hit] % n_t], order=1, mode="wrap"
            )
            img[hit] = samp
            depth[hit] = zc[hit]
        return img, depth

    def render_pose(self, T_cam_to_world, right=False, noise_rng=None,
                    gain=1.0, bias=0.0):
        uu, vv = np.meshgrid(np.arange(self.w, dtype=np.float64),
                             np.arange(self.h, dtype=np.float64))
        img, _ = self._trace(T_cam_to_world, right, uu, vv)
        img = img * gain + bias
        if self.noise_sigma > 0:
            r = noise_rng or self.rng
            img = img + r.normal(0, self.noise_sigma, img.shape)
        return img.clip(0, 255).astype(np.float32)

    def depth_map(self, T_cam_to_world, right=False):
        uu, vv = np.meshgrid(np.arange(self.w, dtype=np.float64),
                             np.arange(self.h, dtype=np.float64))
        return self._trace(T_cam_to_world, right, uu, vv)[1]

    def reproject(self, uv, T_a, T_b, right_a=False, right_b=False):
        """Exact ground-truth transfer of pixels `uv` [N,2] from view
        (T_a, right_a) to view (T_b, right_b). Returns ([N,2] pixel coords
        in B, [N] bool validity)."""
        uv = np.asarray(uv, np.float64)
        img_depth = self._trace(T_a, right_a, uv[:, 0], uv[:, 1])
        depth = img_depth[1]
        Ta = np.asarray(T_a, np.float64)
        Ra, ta = Ta[:3, :3], Ta[:3, 3]
        eye_a = ta + (Ra @ np.array([self.baseline, 0, 0]) if right_a else 0.0)
        rays = np.stack([(uv[:, 0] - self.cx) / self.fx,
                         (uv[:, 1] - self.cy) / self.fx,
                         np.ones(len(uv))], axis=-1) @ Ra.T
        # depth is z along the camera axis; ray parameter s = depth / (r.z_cam)
        rz = rays @ Ra[:, 2]
        ok = np.isfinite(depth) & (rz > 1e-9)
        s = np.where(ok, depth / np.where(ok, rz, 1.0), 0.0)
        Xw = eye_a + rays * s[:, None]
        Tb = np.asarray(T_b, np.float64)
        Rb, tb = Tb[:3, :3], Tb[:3, 3]
        eye_b = tb + (Rb @ np.array([self.baseline, 0, 0]) if right_b else 0.0)
        loc = (Xw - eye_b) @ Rb
        z = loc[:, 2]
        ok &= z > 0.2
        zs = np.where(ok, z, 1.0)
        ub = self.fx * loc[:, 0] / zs + self.cx
        vb = self.fx * loc[:, 1] / zs + self.cy
        # Occlusion check: the B-view depth at the reprojected pixel must
        # match (within 2%) the transferred depth.
        zb = self._trace(T_b, right_b, ub, vb)[1]
        ok &= np.isfinite(zb) & (np.abs(zb - z) < 0.02 * z + 0.05)
        ok &= (ub >= 0) & (ub < self.w) & (vb >= 0) & (vb < self.h)
        return np.stack([ub, vb], 1), ok

    def render_sequence(self, traj):
        out = []
        for f, T in enumerate(traj):
            g, b = illum_gain_bias(f, self.illum_drift)
            out.append((self.render_pose(T, False, gain=g, bias=b),
                        self.render_pose(T, True, gain=g, bias=b)))
        return out

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
