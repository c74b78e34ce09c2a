"""Corner detection tests on synthetic imagery."""

import jax.numpy as jnp
import numpy as np

from stereo_orb_slam_tpu.ops import detect


def checkerboard(h, w, sq=24):
    yy, xx = np.mgrid[0:h, 0:w]
    return (((yy // sq) + (xx // sq)) % 2 * 255.0).astype(np.float32)


def test_detects_checkerboard_corners():
    img = checkerboard(240, 320)
    xy, score, valid = detect.detect_corners(
        jnp.asarray(img), num_features=256, min_distance=10, border=16
    )
    xy = np.asarray(xy)[np.asarray(valid)]
    assert len(xy) >= 50
    # Every detection must be near a true grid corner (multiple of 24).
    fx = xy[:, 0] / 24.0
    fy = xy[:, 1] / 24.0
    err = np.maximum(
        np.abs(fx - np.round(fx)), np.abs(fy - np.round(fy))
    ) * 24.0
    # razor-sharp synthetic corners (no anti-aliasing) localize to ~1-2 px
    assert np.percentile(err, 90) < 2.5


def test_min_distance_respected():
    img = checkerboard(240, 320, sq=24)
    xy, _, valid = detect.detect_corners(
        jnp.asarray(img), num_features=256, min_distance=10
    )
    pts = np.asarray(xy)[np.asarray(valid)]
    d = np.linalg.norm(pts[:, None] - pts[None, :], axis=-1)
    np.fill_diagonal(d, 1e9)
    assert d.min() >= 5.0  # NMS radius = min_distance // 2


def test_blank_image_all_invalid():
    img = np.zeros((240, 320), np.float32)
    _, _, valid = detect.detect_corners(jnp.asarray(img), num_features=128)
    assert not bool(np.any(np.asarray(valid)))


def test_subpixel_accuracy():
    """A single bright blob off-center: subpixel peak should beat integer."""
    h, w = 64, 64
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    cx, cy = 31.3, 32.7
    img = 255.0 * np.exp(-(((xx - cx) ** 2 + (yy - cy) ** 2) / 18.0))
    xy, _, valid = detect.detect_corners(
        jnp.asarray(img), num_features=4, min_distance=4, border=8,
        quality_level=0.5,
    )
    xy = np.asarray(xy)[np.asarray(valid)]
    assert len(xy) >= 1
    err = np.linalg.norm(xy[0] - np.array([cx, cy]))
    assert err < 1.0


def test_static_output_shape():
    img = checkerboard(120, 160)
    xy, score, valid = detect.detect_corners(jnp.asarray(img), num_features=512)
    assert xy.shape == (512, 2) and score.shape == (512,) and valid.shape == (512,)
