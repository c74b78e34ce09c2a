"""Oriented BRIEF (ORB) descriptor extraction, batched and jit-friendly.

The reference uses cv::ORB::compute to build 256-bit descriptors on the
detected corners (descriptors only, not detection — ref
`src/visual_odometer.cpp:256-259`). Here:

- the image is pre-smoothed with a separable binomial filter,
- per-corner orientation comes from the intensity-centroid moments of a
  radius-R disc (standard ORB; computed with two fixed convolution kernels
  evaluated via gather at corner locations),
- 256 binary tests are sampled from a fixed, seeded Gaussian pattern
  (BRIEF-style, sigma = patch/5, radius-clipped) rotated by the corner
  orientation and read with bilinear interpolation,
- bits are packed into uint32[8] words (bit j of word w = test 32*w+j).

We deliberately do NOT copy OpenCV's learned `bit_pattern_31_` table: both
sides of every matching problem (stereo, temporal, loop closure, vocabulary)
use our descriptors, so cross-library compatibility buys nothing, and a
seeded isotropic pattern measures within a few percent on matching recall.

Descriptor distance is Hamming; see ops/match.py for the MXU formulation.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

N_TESTS = 256
N_WORDS = N_TESTS // 32
PATTERN_RADIUS = 13  # max test-point radius; rotation keeps it under 13*sqrt(2)<19


def _binomial_kernel(ksize: int) -> np.ndarray:
    k = np.array([1.0], np.float32)
    for _ in range(ksize - 1):
        k = np.convolve(k, [0.5, 0.5])
    return k.astype(np.float32)


def make_test_pattern(seed: int = 1234) -> np.ndarray:
    """[256, 2, 2] float32: (pair, point{a,b}, (dx, dy)) BRIEF test offsets.

    Gaussian-sampled (sigma = 31/5 as in the BRIEF paper) and clipped to a
    disc of radius PATTERN_RADIUS so rotated samples stay inside the padded
    patch window.
    """
    rng = np.random.default_rng(seed)
    sigma = 31.0 / 5.0
    pts = rng.normal(0.0, sigma, size=(N_TESTS, 2, 2)).astype(np.float32)
    norm = np.linalg.norm(pts, axis=-1, keepdims=True)
    scale = np.minimum(1.0, PATTERN_RADIUS / np.maximum(norm, 1e-6))
    return pts * scale


_PATTERN = jnp.asarray(make_test_pattern())  # [256, 2, 2]


def smooth_image(img, ksize: int = 7):
    """Separable binomial (≈Gaussian) smoothing, 'same' padding."""
    k = jnp.asarray(_binomial_kernel(ksize))
    x = img[None, None, :, :]
    kh = k[None, None, :, None]
    kw = k[None, None, None, :]
    dn = ("NCHW", "OIHW", "NCHW")
    x = jax.lax.conv_general_dilated(x, kh, (1, 1), "SAME", dimension_numbers=dn)
    x = jax.lax.conv_general_dilated(x, kw, (1, 1), "SAME", dimension_numbers=dn)
    return x[0, 0]


def _disc_moment_kernels(radius: int):
    """Fixed kernels for intensity-centroid moments m10, m01 over a disc."""
    r = radius
    ys, xs = np.mgrid[-r : r + 1, -r : r + 1]
    disc = (xs * xs + ys * ys) <= r * r
    kx = (xs * disc).astype(np.float32)
    ky = (ys * disc).astype(np.float32)
    return jnp.asarray(kx), jnp.asarray(ky)


def corner_orientations(img, xy, radius: int = 15):
    """Intensity-centroid orientation at integer corner locations.

    theta = atan2(m01, m10) with moments over a radius-R disc
    (standard ORB rotation-invariance mechanism).
    """
    kx, ky = _disc_moment_kernels(radius)
    # conv flips kernels; kx/ky are antisymmetric -> compensate with negation.
    m10_map = -_conv2d(img, kx)
    m01_map = -_conv2d(img, ky)
    xs = jnp.clip(jnp.round(xy[:, 0]).astype(jnp.int32), 0, img.shape[1] - 1)
    ys = jnp.clip(jnp.round(xy[:, 1]).astype(jnp.int32), 0, img.shape[0] - 1)
    m10 = m10_map[ys, xs]
    m01 = m01_map[ys, xs]
    return jnp.arctan2(m01, m10)


def _conv2d(img, kernel):
    x = img[None, None, :, :]
    k = kernel[None, None, :, :]
    out = jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME", dimension_numbers=("NCHW", "OIHW", "NCHW")
    )
    return out[0, 0]


def _bilinear_sample(img, x, y):
    """Bilinear interpolation at float coords; clamped to image bounds."""
    H, W = img.shape
    x = jnp.clip(x, 0.0, W - 1.001)
    y = jnp.clip(y, 0.0, H - 1.001)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    x1 = x0 + 1
    y1 = y0 + 1
    fx = x - x0.astype(img.dtype)
    fy = y - y0.astype(img.dtype)
    v00 = img[y0, x0]
    v01 = img[y0, x1]
    v10 = img[y1, x0]
    v11 = img[y1, x1]
    return (
        v00 * (1 - fx) * (1 - fy)
        + v01 * fx * (1 - fy)
        + v10 * (1 - fx) * fy
        + v11 * fx * fy
    )


def pack_bits(bits):
    """[N, 256] bool -> [N, 8] uint32 (bit j of word w = test 32w+j)."""
    n = bits.shape[0]
    b = bits.reshape(n, N_WORDS, 32).astype(jnp.uint32)
    weights = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))[None, None, :]
    return jnp.sum(b * weights, axis=-1, dtype=jnp.uint32)


def unpack_bits(words):
    """[N, 8] uint32 -> [N, 256] {0,1} float32."""
    n = words.shape[0]
    shifts = jnp.arange(32, dtype=jnp.uint32)[None, None, :]
    bits = (words[:, :, None] >> shifts) & jnp.uint32(1)
    return bits.reshape(n, N_TESTS).astype(jnp.float32)


@partial(jax.jit, static_argnames=("smoothing_ksize", "orientation_radius"))
def compute_descriptors(
    img, xy, valid, smoothing_ksize: int = 7, orientation_radius: int = 15
):
    """ORB descriptors at the given corners.

    Args:
      img:   [H, W] float32 grayscale.
      xy:    [N, 2] float32 corner coords (x, y).
      valid: [N] bool.

    Returns:
      desc:  [N, 8] uint32 bitpacked 256-bit descriptors (0 where invalid).
      angle: [N] float32 orientation (radians).
    """
    smoothed = smooth_image(img, smoothing_ksize)
    theta = corner_orientations(smoothed, xy, orientation_radius)
    c, s = jnp.cos(theta), jnp.sin(theta)

    # Rotate the whole test pattern per corner: [N, 256, 2(pts), 2(xy)]
    px = _PATTERN[None, :, :, 0]  # [1, 256, 2]
    py = _PATTERN[None, :, :, 1]
    rx = c[:, None, None] * px - s[:, None, None] * py
    ry = s[:, None, None] * px + c[:, None, None] * py
    sample_x = xy[:, None, None, 0] + rx  # [N, 256, 2]
    sample_y = xy[:, None, None, 1] + ry

    va = _bilinear_sample(smoothed, sample_x[..., 0], sample_y[..., 0])
    vb = _bilinear_sample(smoothed, sample_x[..., 1], sample_y[..., 1])
    bits = va < vb  # [N, 256]
    desc = pack_bits(bits)
    return jnp.where(valid[:, None], desc, jnp.uint32(0)), theta
