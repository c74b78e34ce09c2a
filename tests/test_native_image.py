"""Native libpng decoder: parity with PIL on every PNG layout."""

import numpy as np
import pytest
from PIL import Image

from stereo_orb_slam_tpu.io import datasets, native_image


def _roundtrip(tmp_path, arr, mode):
    p = str(tmp_path / f"img_{mode}.png")
    Image.fromarray(arr, mode=mode).save(p)
    ours = native_image.read_png_gray(p)
    if ours is None:
        pytest.skip("native library unavailable")
    with Image.open(p) as im:
        ref = np.asarray(im.convert("L"), dtype=np.float32)
    return ours, ref


def test_gray8(tmp_path, rng):
    arr = rng.integers(0, 256, (48, 64), dtype=np.uint8)
    ours, ref = _roundtrip(tmp_path, arr, "L")
    np.testing.assert_array_equal(ours, ref)


def test_rgb(tmp_path, rng):
    arr = rng.integers(0, 256, (32, 40, 3), dtype=np.uint8)
    ours, ref = _roundtrip(tmp_path, arr, "RGB")
    # PIL uses the same BT.601 integer weights; allow 1-count rounding skew.
    assert np.abs(ours - ref).max() <= 1.0


def test_rgba(tmp_path, rng):
    arr = rng.integers(0, 256, (16, 20, 4), dtype=np.uint8)
    ours, ref = _roundtrip(tmp_path, arr, "RGBA")
    assert np.abs(ours - ref).max() <= 1.0


def test_read_grayscale_dispatch(tmp_path, rng):
    arr = rng.integers(0, 256, (24, 24), dtype=np.uint8)
    p = str(tmp_path / "x.png")
    Image.fromarray(arr, mode="L").save(p)
    img = datasets.read_grayscale(p)
    np.testing.assert_array_equal(img, arr.astype(np.float32))


def test_missing_file():
    assert native_image.read_png_gray("/nonexistent/file.png") is None


def test_prefetching_reader(tmp_path, rng):
    paths = []
    for i in range(4):
        arr = rng.integers(0, 256, (16, 16), dtype=np.uint8)
        pl = str(tmp_path / f"{i}l.png")
        pr = str(tmp_path / f"{i}r.png")
        Image.fromarray(arr, mode="L").save(pl)
        Image.fromarray(arr, mode="L").save(pr)
        paths.append((pl, pr))
    reader = datasets.PrefetchingReader(paths, depth=2)
    frames = list(reader)
    assert len(frames) == 4
    assert frames[0][0].shape == (16, 16)
