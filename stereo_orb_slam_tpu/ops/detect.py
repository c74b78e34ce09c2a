"""Shi-Tomasi corner detection, grid NMS, top-K selection, subpixel refine.

TPU-native replacement for the reference front-end detection stage
(cv::goodFeaturesToTrack + cv::cornerSubPix, ref
`src/visual_odometer.cpp:232-242`): Sobel gradients and the structure-tensor
window are expressed as convolutions (XLA maps these onto the MXU / VPU),
non-max suppression as a max-pool comparison, and corner selection as a
single `top_k` over the masked response map. Everything is static-shape: the
output is always `num_features` slots with a validity mask.

Design deviations from the reference (documented per SURVEY.md §7):
- min-distance enforcement uses window NMS (radius ~ min_distance/2) plus
  score-ordered top-k instead of OpenCV's greedy distance rejection. Coverage
  is equivalent for SLAM purposes and the op is fully parallel.
- subpixel refinement is a closed-form quadratic fit on the corner response
  surface instead of 40 iterations of cornerSubPix; accuracy on synthetic
  corners is comparable (see tests/test_detect.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _conv2d_same(img, kernel):
    """2D 'same' convolution of [H,W] with [kh,kw], f32, via XLA conv."""
    x = img[None, None, :, :]
    k = kernel[None, None, :, :]
    out = jax.lax.conv_general_dilated(
        x, k, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    return out[0, 0]


def sobel_gradients(img):
    """Sobel x/y gradients (same kernels OpenCV uses for cornerMinEigenVal)."""
    gx_k = jnp.asarray([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], jnp.float32) / 8.0
    gy_k = jnp.asarray([[-1, -2, -1], [0, 0, 0], [1, 2, 1]], jnp.float32) / 8.0
    # conv flips the kernel; Sobel kernels are antisymmetric so flip = negate.
    ix = _conv2d_same(img, gx_k[::-1, ::-1])
    iy = _conv2d_same(img, gy_k[::-1, ::-1])
    return ix, iy


def shi_tomasi_response(img, block_size: int = 5):
    """Min-eigenvalue corner response of the windowed structure tensor."""
    ix, iy = sobel_gradients(img)
    box = jnp.ones((block_size, block_size), jnp.float32) / (block_size * block_size)
    ixx = _conv2d_same(ix * ix, box)
    iyy = _conv2d_same(iy * iy, box)
    ixy = _conv2d_same(ix * iy, box)
    # min eig of [[ixx, ixy], [ixy, iyy]]
    tr_half = 0.5 * (ixx + iyy)
    det_term = jnp.sqrt(jnp.maximum(0.25 * (ixx - iyy) ** 2 + ixy * ixy, 0.0))
    return tr_half - det_term


def nms(response, radius: int):
    """Keep pixels that are the strict max of their (2r+1)^2 neighborhood."""
    k = 2 * radius + 1
    pooled = jax.lax.reduce_window(
        response, -jnp.inf, jax.lax.max, (k, k), (1, 1), "SAME"
    )
    return response >= pooled


def subpixel_refine(response, ys, xs):
    """Quadratic-fit subpixel offset from the 3x3 response neighborhood.

    Fits a 2D quadratic via central differences; the peak offset is
    -H^-1 g clamped to [-0.5, 0.5] per axis.
    """
    H, W = response.shape
    ys_c = jnp.clip(ys, 1, H - 2)
    xs_c = jnp.clip(xs, 1, W - 2)

    def at(dy, dx):
        return response[ys_c + dy, xs_c + dx]

    gx = 0.5 * (at(0, 1) - at(0, -1))
    gy = 0.5 * (at(1, 0) - at(-1, 0))
    gxx = at(0, 1) - 2.0 * at(0, 0) + at(0, -1)
    gyy = at(1, 0) - 2.0 * at(0, 0) + at(-1, 0)
    gxy = 0.25 * (at(1, 1) - at(1, -1) - at(-1, 1) + at(-1, -1))
    det = gxx * gyy - gxy * gxy
    safe_det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    dx = -(gyy * gx - gxy * gy) / safe_det
    dy = -(gxx * gy - gxy * gx) / safe_det
    ok = (jnp.abs(det) > 1e-12) & (jnp.abs(dx) <= 1.0) & (jnp.abs(dy) <= 1.0)
    dx = jnp.where(ok, jnp.clip(dx, -0.5, 0.5), 0.0)
    dy = jnp.where(ok, jnp.clip(dy, -0.5, 0.5), 0.0)
    return dy, dx


@partial(jax.jit, static_argnames=("num_features", "block_size", "min_distance", "border", "subpix"))
def detect_corners(
    img,
    num_features: int = 1024,
    quality_level: float = 0.01,
    block_size: int = 5,
    min_distance: int = 10,
    border: int = 16,
    subpix: bool = True,
):
    """Detect up to `num_features` Shi-Tomasi corners.

    Args:
      img: [H, W] float32 grayscale (0..255 or 0..1, scale-invariant).
      border: exclusion margin so descriptor patches stay in bounds.

    Returns:
      xy:    [num_features, 2] float32 (x, y) subpixel coords.
      score: [num_features] response values.
      valid: [num_features] bool mask (score above quality gate).
    """
    resp_raw = shi_tomasi_response(img, block_size)
    H, W = resp_raw.shape

    # Deterministic tie-breaking: flat response plateaus (e.g. ideal
    # checkerboards) would otherwise pass `>=` NMS at every plateau pixel.
    # The jittered map is used only for NMS / ordering; scores and the
    # quality gate use the raw response.
    yy = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    hash_pat = ((yy * 7919 + xx * 104729) % 65521).astype(jnp.float32) / 65521.0
    resp = resp_raw + hash_pat * (1e-5 * jnp.maximum(jnp.max(resp_raw), 1e-12))

    keep = nms(resp, max(1, min_distance // 2))
    in_border = (
        (yy >= border) & (yy < H - border) & (xx >= border) & (xx < W - border)
    )
    masked = jnp.where(keep & in_border, resp, -jnp.inf)

    flat = masked.reshape(-1)
    top_vals, idx = jax.lax.top_k(flat, num_features)
    ys = idx // W
    xs = idx % W
    scores = resp_raw[ys, xs]

    max_resp = jnp.max(jnp.where(keep & in_border, resp_raw, 0.0))
    valid = (
        jnp.isfinite(top_vals)
        & (scores > quality_level * max_resp)
        & (scores > 1e-6)
        & (max_resp > 0)
    )

    if subpix:
        dy, dx = subpixel_refine(resp, ys, xs)
    else:
        dy = dx = jnp.zeros_like(scores)

    xy = jnp.stack([xs.astype(jnp.float32) + dx, ys.astype(jnp.float32) + dy], axis=-1)
    xy = jnp.where(valid[:, None], xy, 0.0)
    return xy, jnp.where(valid, scores, 0.0), valid
