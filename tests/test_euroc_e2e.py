"""EuRoC-format end-to-end drive: a distorted (non-rectified) synthetic
stereo sequence laid out as a EuRoC mav0 tree, a reference key=value camera
file with distortion, driven through the apps/visual_odometry CLI.

Covers the full general-stereo product path of the reference in one test:
dataset loading (ref src/dataset.cpp:43-114 EuRoc branch), camera file
parsing with distortion + extrinsics (ref src/camera_utils.cpp:8-64),
undistortion + DLT triangulation (ref src/camera_model.cpp:123-152), and
the VO loop + exports (ref src/visual_odometry.cpp:33-123).
"""

import os

import cv2
import numpy as np

from test_general_stereo import DistortedPlaneScene

from stereo_orb_slam_tpu.apps import visual_odometry


def _write_euroc_tree(tmp_path, scene, xs):
    for cam in ("cam0", "cam1"):
        os.makedirs(tmp_path / "mav0" / cam / "data", exist_ok=True)
    rows = []
    for i, x in enumerate(xs):
        ts = 1_000_000 + i  # fake nanosecond timestamps
        name = f"{ts}.png"
        l8 = np.clip(scene.render(x), 0, 255).astype(np.uint8)
        r8 = np.clip(scene.render(x, right=True), 0, 255).astype(np.uint8)
        cv2.imwrite(str(tmp_path / "mav0" / "cam0" / "data" / name), l8)
        cv2.imwrite(str(tmp_path / "mav0" / "cam1" / "data" / name), r8)
        rows.append((ts, name))
    for cam in ("cam0", "cam1"):
        with open(tmp_path / "mav0" / cam / "data.csv", "w") as f:
            f.write("#timestamp [ns],filename\n")
            for ts, name in rows:
                f.write(f"{ts},{name}\n")


def _write_camera_file(path, scene):
    k1, k2 = float(scene.dist[0]), float(scene.dist[1])
    d = f"{k1} {k2} 0 0 0"
    T_r = np.eye(4)
    T_r[0, 3] = scene.baseline
    with open(path, "w") as f:
        f.write("type=Stereo\n")
        for side in ("l", "r"):
            f.write(f"fx_{side}={scene.fx}\nfy_{side}={scene.fx}\n")
            f.write(f"cx_{side}={scene.cx}\ncy_{side}={scene.cy}\n")
            f.write(f"d_{side}={d}\n")
        f.write("T_l=" + " ".join("1 0 0 0 0 1 0 0 0 0 1 0 0 0 0 1".split()) + "\n")
        f.write("T_r=" + " ".join(str(v) for v in T_r.reshape(-1)) + "\n")


def test_euroc_distorted_vo_cli(rng, tmp_path):
    scene = DistortedPlaneScene(rng)
    step = 0.05
    xs = [i * step for i in range(8)]
    _write_euroc_tree(tmp_path, scene, xs)
    cam_file = tmp_path / "camera.txt"
    _write_camera_file(cam_file, scene)

    out = tmp_path / "out"
    os.makedirs(out)
    visual_odometry.main([
        "--dataset", "EuRoc",
        "--folder", str(tmp_path),
        "--camera", str(cam_file),
        "--output_dir", str(out),
        "--output_suffix", "vo",
    ])

    traj_file = out / "trajectory_vo.txt"
    assert traj_file.exists()
    traj = np.loadtxt(traj_file).reshape(-1, 3, 4)
    assert len(traj) == len(xs)
    # Camera translates along +x by `step` per frame; distortion handled by
    # the general path (undistort -> DLT). uint8 quantization + distortion
    # warp dominate the error budget.
    # Precision note: at fx=220 and depth 10 m one pixel is ~4.5 cm, and the
    # 8-bit PNG round trip quantizes the distorted rendering, so the error
    # budget here is a few px of accumulated drift. Sub-pixel accuracy of the
    # general path is pinned by test_general_stereo (float images); this test
    # pins the CLI plumbing: EuRoC tree -> camera file -> undistort/DLT ->
    # exports.
    est_x = traj[:, 0, 3]
    np.testing.assert_allclose(est_x, xs, atol=0.08)
    assert np.all(np.diff(est_x) > 0), "x motion must be monotonic"
    assert np.abs(traj[:, 1, 3]).max() < 0.25
    assert np.abs(traj[:, 2, 3]).max() < 0.25
    # waypoints PLY + world dumps written alongside.
    assert (out / "waypoints_vo.ply").exists()
    assert (out / "poses.txt").exists()
    assert (out / "constraints.txt").exists()
