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


def _shift_y(img, d):
    """img shifted so out[y] = img[y+d], edge-replicated. Pure slicing."""
    H = img.shape[0]
    if d == 0:
        return img
    if d > 0:
        return jnp.concatenate([img[d:], jnp.repeat(img[-1:], d, axis=0)], 0)
    return jnp.concatenate([jnp.repeat(img[:1], -d, axis=0), img[:d]], 0)


def _shift_x(img, d):
    W = img.shape[1]
    if d == 0:
        return img
    if d > 0:
        return jnp.concatenate([img[:, d:], jnp.repeat(img[:, -1:], d, axis=1)], 1)
    return jnp.concatenate([jnp.repeat(img[:, :1], -d, axis=1), img[:, :d]], 1)


def sobel_gradients(img):
    """Sobel x/y gradients as separable shift-and-add passes.

    TPU note: XLA lowers single-channel 2D convolutions and large
    reduce_windows poorly (they dominated detection at ~15 ms/image);
    expressing the 3-tap separable kernels as shifted-slice adds keeps the
    whole stage on the VPU at memory-bandwidth speed.
    """
    # Smooth [1,2,1] along y, then diff [-1,0,1]/2 along x (and transposed).
    sy = _shift_y(img, -1) + 2.0 * img + _shift_y(img, 1)
    ix = (_shift_x(sy, 1) - _shift_x(sy, -1)) * (0.5 / 4.0)
    sx = _shift_x(img, -1) + 2.0 * img + _shift_x(img, 1)
    iy = (_shift_y(sx, 1) - _shift_y(sx, -1)) * (0.5 / 4.0)
    return ix, iy


def _box_filter(img, k: int):
    """k x k box mean via two separable shift-add passes."""
    r = k // 2
    acc = img
    for d in range(1, r + 1):
        acc = acc + _shift_y(img, d) + _shift_y(img, -d)
    out = acc
    acc2 = out
    for d in range(1, r + 1):
        acc2 = acc2 + _shift_x(out, d) + _shift_x(out, -d)
    return acc2 / float(k * k)


def shi_tomasi_response(img, block_size: int = 5):
    """Min-eigenvalue corner response of the windowed structure tensor."""
    ix, iy = sobel_gradients(img)
    ixx = _box_filter(ix * ix, block_size)
    iyy = _box_filter(iy * iy, block_size)
    ixy = _box_filter(ix * iy, block_size)
    # min eig of [[ixx, ixy], [ixy, iyy]]
    tr_half = 0.5 * (ixx + iyy)
    det_term = jnp.sqrt(jnp.maximum(0.25 * (ixx - iyy) ** 2 + ixy * ixy, 0.0))
    return tr_half - det_term


def _window_max_1d(x, radius: int, axis: int):
    """Running max over a (2r+1) window along an axis via doubling shifts."""
    shift = _shift_y if axis == 0 else _shift_x
    # Forward span: max over [0, r] using doubling.
    fwd = x
    span = 1
    while span <= radius:
        step = min(span, radius - span + 1)
        fwd = jnp.maximum(fwd, shift(fwd, step))
        span += step
    # Backward span: max over [-r, 0].
    bwd = x
    span = 1
    while span <= radius:
        step = min(span, radius - span + 1)
        bwd = jnp.maximum(bwd, shift(bwd, -step))
        span += step
    return jnp.maximum(fwd, bwd)


def nms(response, radius: int):
    """Keep pixels that are the max of their (2r+1)^2 neighborhood.

    Separable two-pass window max with log-step doubling (the edge
    replication of the shifts makes border maxima slightly conservative,
    which only ever suppresses more, never less)."""
    pooled = _window_max_1d(response, radius, axis=0)
    pooled = _window_max_1d(pooled, radius, axis=1)
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

    nms_radius = max(1, min_distance // 2)
    keep = nms(resp, nms_radius)
    in_border = (
        (yy >= border) & (yy < H - border) & (xx >= border) & (xx < W - border)
    )
    masked = jnp.where(keep & in_border, resp, -jnp.inf)

    # Hierarchical top-k: NMS survivors are > nms_radius apart (Chebyshev),
    # so any tile smaller than the radius holds at most ONE survivor.
    # Max-reduce tiles first, then sort only the tile maxima — for the
    # default 11x11 NMS this shrinks the top_k input 16x (sorting the full
    # response map is the single most expensive op in detection on TPU).
    tile = min(4, nms_radius)
    if tile > 1:
        Hp = -(-H // tile) * tile
        Wp = -(-W // tile) * tile
        padded = jnp.pad(
            masked, ((0, Hp - H), (0, Wp - W)), constant_values=-jnp.inf
        )
        tiles = padded.reshape(Hp // tile, tile, Wp // tile, tile)
        tiles = tiles.transpose(0, 2, 1, 3).reshape(-1, tile * tile)
        tile_max = jnp.max(tiles, axis=1)
        tile_arg = jnp.argmax(tiles, axis=1)
        top_vals, tidx = jax.lax.top_k(tile_max, num_features)
        n_wt = Wp // tile
        ty = tidx // n_wt
        tx = tidx % n_wt
        within = tile_arg[tidx]
        ys = ty * tile + within // tile
        xs = tx * tile + within % tile
    else:
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
