"""Batched RANSAC rigid-transform (stereo PnP) solver.

Replaces the reference's absent `ransac_solver` submodule (interface
reconstructed in SURVEY.md C8 from the call sites at ref
`src/visual_odometer.cpp:21-27,93-103,158-177`): a RANSAC::Solver over
`ObservationPair`s — stereo pixel observations (u_l, v_l, u_r, v_r) of the
same landmark in the current and previous frames — returning an SE(3)
transform `T` with `X_prev = T @ X_curr` (so that
`global_new = global_prev @ T`, ref `src/visual_odometer.cpp:372,388`),
plus a per-pair inlier mask and loss vector.

TPU-first design: the reference iterates up to 100 sequential hypotheses
(ref `src/params.h:27`); here ALL hypotheses run in parallel:

  1. sample K minimal sets of 3 pair indices (Gumbel top-k over valid mask),
  2. closed-form rigid alignment of the 3 triangulated point pairs
     (Horn/Kabsch via 3x3 SVD, vmapped over hypotheses),
  3. score every hypothesis against every pair: transform prev-frame points
     into the current frame and compare their stereo projection with the
     observed 4-vector (max-abs pixel error),
  4. argmax consensus (tie-broken by total robust loss).

"Early termination" (ref `src/params.h:21`, set false anyway) has no meaning
in the batched formulation. Optional final refit on inliers mirrors
`final_model_fitting` (ref `src/params.h:18`, default false).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from stereo_orb_slam_tpu.geometry import se3


class RansacResult(NamedTuple):
    transform: jnp.ndarray   # [4,4] T with X_prev = T @ X_curr
    inlier_mask: jnp.ndarray  # [N] bool
    losses: jnp.ndarray      # [N] float32 per-pair loss (px)
    num_inliers: jnp.ndarray  # int32
    success: jnp.ndarray     # bool


def kabsch(src, dst, weights=None, power_iters: int = 20):
    """Weighted rigid alignment: find T with dst ≈ T @ src.

    src, dst: [M, 3]. Returns [4,4]. Horn's quaternion method: the optimal
    rotation is the largest eigenvector of the symmetric 4x4 N-matrix built
    from the cross-covariance. We extract it by shifted power iteration —
    pure batched matmul/normalize ops, in contrast to an SVD, whose
    iterative LAPACK-style lowering is the slowest thing a TPU can run.
    (N is symmetric with eigenvalues >= -2*trace bound; shifting by a
    Gershgorin-style bound makes the dominant eigenvalue the target.)
    """
    if weights is None:
        weights = jnp.ones(src.shape[0], src.dtype)
    w = weights / jnp.maximum(jnp.sum(weights), 1e-9)
    mu_s = jnp.sum(src * w[:, None], axis=0)
    mu_d = jnp.sum(dst * w[:, None], axis=0)
    sc = src - mu_s
    dc = dst - mu_d
    M = (sc * w[:, None]).T @ dc  # [3,3] cross-covariance (src x dst)

    # Horn's N matrix.
    Sxx, Sxy, Sxz = M[0, 0], M[0, 1], M[0, 2]
    Syx, Syy, Syz = M[1, 0], M[1, 1], M[1, 2]
    Szx, Szy, Szz = M[2, 0], M[2, 1], M[2, 2]
    N = jnp.stack([
        jnp.stack([Sxx + Syy + Szz, Syz - Szy, Szx - Sxz, Sxy - Syx]),
        jnp.stack([Syz - Szy, Sxx - Syy - Szz, Sxy + Syx, Szx + Sxz]),
        jnp.stack([Szx - Sxz, Sxy + Syx, -Sxx + Syy - Szz, Syz + Szy]),
        jnp.stack([Sxy - Syx, Szx + Sxz, Syz + Szy, -Sxx - Syy + Szz]),
    ])

    # Top eigenvector by repeated squaring: A^(2^k) columns align with the
    # dominant eigenvector regardless of eigengap; k=12 gives an effective
    # power of 4096. Each squaring is one 4x4 matmul + normalization.
    fro = jnp.sqrt(jnp.sum(N * N)) + 1e-12
    A = N / fro + 1.5 * jnp.eye(4, dtype=N.dtype)  # spectrum now in (0.5, 2.5)

    def body(_, A):
        A = A @ A
        return A / (jnp.sqrt(jnp.sum(A * A)) + 1e-20)

    A = jax.lax.fori_loop(0, 12, body, A)
    # Column with the largest norm is parallel to the top eigenvector.
    col_norms = jnp.sum(A * A, axis=0)
    q = A[:, jnp.argmax(col_norms)]
    q = q / jnp.maximum(jnp.linalg.norm(q), 1e-20)
    R = se3.quat_to_rotmat(q)
    t = mu_d - R @ mu_s
    return se3.rt_to_matrix(R, t)


def _stereo_residuals(T, pts_curr, obs_prev, P_l, P_r):
    """Predict prev-frame stereo obs from curr-frame points under T.

    residual[i] = [proj_l(T X_i) - (u_l,v_l), proj_r(T X_i) - (u_r,v_r)].
    Returns [N, 4].
    """
    Xp = se3.transform_points(T, pts_curr)  # prev-frame coords
    ph = jnp.concatenate([Xp, jnp.ones_like(Xp[..., :1])], axis=-1)
    uvw_l = ph @ P_l.T
    uvw_r = ph @ P_r.T
    wl = jnp.where(jnp.abs(uvw_l[..., 2:3]) < 1e-9, 1e-9, uvw_l[..., 2:3])
    wr = jnp.where(jnp.abs(uvw_r[..., 2:3]) < 1e-9, 1e-9, uvw_r[..., 2:3])
    pred = jnp.concatenate([uvw_l[..., :2] / wl, uvw_r[..., :2] / wr], axis=-1)
    return pred - obs_prev


def _sample_minimal_sets(key, valid, num_hypotheses):
    """[K, 3] distinct indices drawn from valid slots (Gumbel top-3)."""
    n = valid.shape[0]
    g = jax.random.gumbel(key, (num_hypotheses, n))
    g = jnp.where(valid[None, :], g, -jnp.inf)
    _, idx = jax.lax.top_k(g, 3)
    return idx


@partial(jax.jit, static_argnames=("num_hypotheses", "final_model_fitting"))
def solve(
    key,
    pts_curr,
    pts_prev,
    obs_curr,
    obs_prev,
    valid,
    weights,
    P_l,
    P_r,
    num_hypotheses: int = 128,
    inlier_threshold_px: float = 3.0,
    min_pairs: int = 10,
    min_inliers: int = 6,
    final_model_fitting: bool = False,
):
    """Batched RANSAC solve.

    Args:
      key: jax PRNG key.
      pts_curr: [N,3] triangulated points in the current camera frame.
      pts_prev: [N,3] the matched points in the previous camera frame.
      obs_curr/obs_prev: [N,4] stereo pixel observations (u_l,v_l,u_r,v_r).
      valid: [N] bool pair mask.
      weights: [N] per-pair weights (the reference passes all-ones,
        ref src/visual_odometer.cpp:175).
      P_l, P_r: [3,4] stereo projection matrices.

    Returns: RansacResult.
    """
    n = pts_curr.shape[0]
    n_valid = jnp.sum(valid.astype(jnp.int32))

    sets = _sample_minimal_sets(key, valid, num_hypotheses)  # [K,3]

    def fit(set_idx):
        src = pts_curr[set_idx]  # [3,3]
        dst = pts_prev[set_idx]
        return kabsch(src, dst)

    Ts = jax.vmap(fit)(sets)  # [K,4,4]

    # Degeneracy guard: collinear minimal sets produce unstable rotations.
    def tri_area(set_idx):
        p = pts_curr[set_idx]
        return jnp.linalg.norm(jnp.cross(p[1] - p[0], p[2] - p[0]))

    areas = jax.vmap(tri_area)(sets)
    nondegenerate = areas > 1e-6

    def score(T):
        res = _stereo_residuals(T, pts_curr, obs_prev, P_l, P_r)  # [N,4]
        err = jnp.max(jnp.abs(res), axis=-1)  # max-abs px error
        inl = (err < inlier_threshold_px) & valid
        # Truncated robust loss for tie-breaking.
        loss = jnp.where(valid, jnp.minimum(err, inlier_threshold_px) * weights, 0.0)
        return jnp.sum(inl.astype(jnp.int32)), jnp.sum(loss), err, inl

    counts, losses_sum, errs, inls = jax.vmap(score)(Ts)
    counts = jnp.where(nondegenerate, counts, -1)
    # Best = most inliers; tie-break by smaller total loss.
    order_key = counts.astype(jnp.float32) - 1e-6 * losses_sum
    best = jnp.argmax(order_key)

    T_best = Ts[best]
    mask = inls[best]
    err_best = errs[best]
    num_inl = counts[best]

    if final_model_fitting:
        w = (mask.astype(jnp.float32)) * weights
        T_refit = kabsch(pts_curr, pts_prev, w)
        # Keep refit only if it does not reduce the inlier count.
        _, _, err_r, inl_r = score(T_refit)
        better = jnp.sum(inl_r.astype(jnp.int32)) >= num_inl
        T_best = jnp.where(better, T_refit, T_best)
        mask = jnp.where(better, inl_r, mask)
        err_best = jnp.where(better, err_r, err_best)
        num_inl = jnp.maximum(num_inl, jnp.sum(inl_r.astype(jnp.int32)))

    success = (n_valid >= min_pairs) & (num_inl >= min_inliers)
    T_out = jnp.where(success, T_best, jnp.eye(4, dtype=T_best.dtype))
    return RansacResult(
        transform=T_out,
        inlier_mask=mask & success,
        losses=jnp.where(valid, err_best, 0.0),
        num_inliers=num_inl,
        success=success,
    )
