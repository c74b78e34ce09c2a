"""IO: dataset listing, calibration parsing, export/restore round-trips."""

import os

import numpy as np
import pytest

from stereo_orb_slam_tpu.io import calib, datasets, export


def test_kitti_listing(tmp_path):
    for cam in ("image_0", "image_1"):
        d = tmp_path / cam
        d.mkdir()
        for i in [2, 0, 1]:
            (d / f"{i:06d}.png").write_bytes(b"")
    pairs = datasets.load_dataset("kitti", str(tmp_path))
    assert len(pairs) == 3
    assert pairs[0][0].endswith("image_0/000000.png")
    assert pairs[2][1].endswith("image_1/000002.png")


def test_euroc_listing(tmp_path):
    for cam in ("cam0", "cam1"):
        d = tmp_path / "mav0" / cam
        (d / "data").mkdir(parents=True)
        with open(d / "data.csv", "w") as f:
            f.write("#timestamp,filename\n")
            f.write("100,a.png\n101,b.png\n")
    pairs = datasets.load_dataset("EuRoc", str(tmp_path))
    assert len(pairs) == 2
    assert pairs[0][0].endswith("cam0/data/a.png")


def test_other_listing(tmp_path):
    for n in ["0l.png", "0r.png", "1l.png", "1r.png"]:
        (tmp_path / n).write_bytes(b"")
    pairs = datasets.load_dataset("other", str(tmp_path))
    assert len(pairs) == 2
    assert pairs[0] == (str(tmp_path / "0l.png"), str(tmp_path / "0r.png"))


def test_reference_calib_format(tmp_path):
    p = tmp_path / "camera.txt"
    p.write_text(
        "type=StereoRectified\n"
        "fx_l=718.856\nfy_l=718.856\ncx_l=607.1928\ncy_l=185.2157\n"
        "fx_r=718.856\nfy_r=718.856\ncx_r=607.1928\ncy_r=185.2157\n"
        "b=0.5371657\n"
    )
    rig = calib.load_camera(str(p))
    assert bool(rig.rectified)
    assert np.isclose(float(rig.baseline), 0.5371657)
    assert np.isclose(float(rig.left.fx), 718.856)


def test_kitti_calib_format(tmp_path):
    p = tmp_path / "calib.txt"
    fx, cx, cy, b = 718.856, 607.1928, 185.2157, 0.5371657
    P0 = f"{fx} 0 {cx} 0 0 {fx} {cy} 0 0 0 1 0"
    P1 = f"{fx} 0 {cx} {-fx*b} 0 {fx} {cy} 0 0 0 1 0"
    p.write_text(f"P0: {P0}\nP1: {P1}\n")
    rig = calib.load_camera(str(p))
    assert bool(rig.rectified)
    assert np.isclose(float(rig.baseline), b, rtol=1e-5)
    assert np.isclose(float(rig.max_sensible_distance()), fx * b, rtol=1e-5)


def test_poses_txt_roundtrip(tmp_path, rng):
    poses = rng.normal(size=(5, 4, 4)).astype(np.float32)
    path = str(tmp_path / "poses.txt")
    export.save_poses_txt(path, poses)
    back = export.read_poses_txt(path)
    np.testing.assert_allclose(back, poses, rtol=1e-5)
    with open(path) as f:
        assert f.readline().strip() == "5"


def test_constraints_roundtrip(tmp_path, rng):
    n = 20
    frame = rng.integers(0, 5, n).astype(np.int32)
    point = rng.integers(0, 100, n).astype(np.int32)
    uv = rng.normal(size=(n, 4)).astype(np.float32) * 100
    sigma = np.ones(n, np.float32)
    path = str(tmp_path / "constraints.txt")
    export.save_constraints_txt(path, frame, point, uv, sigma)
    f2, p2, uv2, s2 = export.read_constraints_txt(path)
    np.testing.assert_array_equal(f2, frame)
    np.testing.assert_array_equal(p2, point)
    np.testing.assert_allclose(uv2, uv, rtol=1e-4, atol=1e-3)


def test_ply_headers(tmp_path, rng):
    poses = np.tile(np.eye(4, dtype=np.float32), (3, 1, 1))
    pts = rng.normal(size=(4, 3)).astype(np.float32)
    mp = str(tmp_path / "map.ply")
    export.save_map_ply(mp, poses, pts, [1, 3, 7, 20])
    text = open(mp).read().splitlines()
    assert text[0] == "ply"
    assert "element vertex 7" in text
    # color palette (ref ply_utils.h:144-167)
    assert text[-1].endswith("204 85 0")      # >10 obs -> burnt orange
    assert text[-2].endswith("255 172 28")    # >5 -> bright orange
    assert text[-3].endswith("255 255 0")     # >1 -> yellow
    assert text[-4].endswith("255 255 255")   # else white

    pg = str(tmp_path / "pg.ply")
    export.save_pose_graph_ply(pg, poses, [(0, 2)])
    lines = open(pg).read().splitlines()
    assert "element edge 1" in lines
    assert lines[-1] == "0 2 255 0 0"
