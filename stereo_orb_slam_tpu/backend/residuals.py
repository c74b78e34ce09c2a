"""Stereo reprojection residual + Jacobians for bundle adjustment.

The cost replicated here is the reference's Ceres functor
(ref `src/reprojection_error.h:12-41`): a 6-dof camera (world->camera as
angle-axis + translation, the `MatrixToPose` parameterization of ref
`src/math_utils.h:13-25`) and a 3-dof world point produce a 4-vector residual

    [u_l_hat - u_l, v_l_hat - v_l, u_r_hat - u_r, v_r_hat - v_r]

by rotating the point into the rig frame and projecting through the static
3x4 left/right projection matrices (process-global in the reference, ref
`reprojection_error.h:43-51`; explicit arguments here).

Jacobians come from `jax.jacfwd` over the per-observation function, vmapped —
exact derivatives of the same global angle-axis parameterization Ceres
autodiffs, with no hand-derived formulas to get wrong. Robustification is
IRLS-style Huber whitening (sqrt of the Ceres Huber rho'), matching
HuberLoss(1.0) at ref `src/bundle_adjuster.cpp:100`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from stereo_orb_slam_tpu.geometry import se3


def project_rig(P, X_rig):
    """[3,4] @ homogeneous point -> pixel (u, v). X_rig: [..., 3]."""
    Xh = jnp.concatenate([X_rig, jnp.ones_like(X_rig[..., :1])], axis=-1)
    uvw = Xh @ P.T
    w = uvw[..., 2:3]
    safe_w = jnp.where(jnp.abs(w) < 1e-9, 1e-9, w)
    return uvw[..., :2] / safe_w


def residual_one(pose6, point, uv4, P_l, P_r):
    """4-vector stereo reprojection residual for one (camera, point, obs)."""
    R = se3.so3_exp(pose6[:3])
    X_rig = R @ point + pose6[3:]
    pred_l = project_rig(P_l, X_rig)
    pred_r = project_rig(P_r, X_rig)
    return jnp.concatenate([pred_l, pred_r]) - uv4


# d residual / d pose6: [4,6]; d residual / d point: [4,3]
_jac_one = jax.jacfwd(residual_one, argnums=(0, 1))


def right_jacobian_so3(w):
    """Right Jacobian Jr(w) of SO(3): exp(w + d) ~ exp(w) exp(Jr(w) d).

    Batched over leading dims; Taylor-guarded at theta -> 0.
    """
    theta2 = jnp.sum(w * w, axis=-1, keepdims=True)[..., None]
    theta = jnp.sqrt(jnp.maximum(theta2, 1e-16))
    small = theta2 < 1e-8
    a = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    b = jnp.where(
        small, 1.0 / 6.0 - theta2 / 120.0,
        (theta - jnp.sin(theta)) / (theta2 * theta),
    )
    K = se3.hat(w)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), K.shape)
    return eye - a * K + b * (K @ K)


def jacobians_closed(pose6, point, P_l, P_r):
    """Closed-form (J_c [...,4,6], J_p [...,4,3], residual-ready Y).

    Derivation: r = proj(Y) - uv with Y = R(w) X + t.
      dY/dt = I;  dY/dX = R;
      dY/dw = -R [X]x Jr(w)      (global angle-axis parameterization)
      dproj/dY rows: (P_row0[:3] - u * P_row2[:3]) / s  etc.
    ~3x cheaper than the 9-pass jacfwd and exactly equal (tested).
    Batched over leading dims of pose6/point.
    """
    w = pose6[..., :3]
    t = pose6[..., 3:]
    R = se3.so3_exp(w)
    Y = (R @ point[..., None])[..., 0] + t

    def proj_jac(P):
        Yh = jnp.concatenate([Y, jnp.ones_like(Y[..., :1])], axis=-1)
        uvw = Yh @ P.T
        s = uvw[..., 2]
        safe_s = jnp.where(jnp.abs(s) < 1e-9, 1e-9, s)
        u = uvw[..., 0] / safe_s
        v = uvw[..., 1] / safe_s
        du = (P[0, :3] - u[..., None] * P[2, :3]) / safe_s[..., None]
        dv = (P[1, :3] - v[..., None] * P[2, :3]) / safe_s[..., None]
        return jnp.stack([du, dv], axis=-2)  # [...,2,3]

    J_proj = jnp.concatenate([proj_jac(P_l), proj_jac(P_r)], axis=-2)  # [...,4,3]

    Jr = right_jacobian_so3(w)
    dY_dw = -(R @ se3.hat(point)) @ Jr          # [...,3,3]
    J_w = J_proj @ dY_dw                        # [...,4,3]
    J_t = J_proj                                # dY/dt = I
    J_c = jnp.concatenate([J_w, J_t], axis=-1)  # [...,4,6]
    J_p = J_proj @ R                            # [...,4,3]
    return J_c, J_p


def residuals_and_jacobians_gathered(p6, pt, obs_uv, obs_weight, P_l, P_r,
                                     huber_delta: float):
    """Core of residuals_and_jacobians on PRE-GATHERED per-observation poses
    and points (any leading batch shape). Used directly by the dense-Schur
    path, where the point 'gather' is a local broadcast."""
    batch = p6.shape[:-1]
    r = jax.vmap(residual_one, in_axes=(0, 0, 0, None, None))(
        p6.reshape(-1, 6), pt.reshape(-1, 3), obs_uv.reshape(-1, 4), P_l, P_r
    ).reshape(*batch, 4)
    J_c, J_p = jacobians_closed(p6, pt, P_l, P_r)

    s = jnp.sum(r * r, axis=-1)
    d2 = huber_delta * huber_delta
    # Ceres Huber: rho(s) = s (s<=d2) else 2*d*sqrt(s) - d2; rho' = min(1, d/sqrt(s))
    sqrt_s = jnp.sqrt(jnp.maximum(s, 1e-18))
    hw = jnp.where(s <= d2, 1.0, huber_delta / sqrt_s)
    rho = jnp.where(s <= d2, s, 2.0 * huber_delta * sqrt_s - d2)
    cost = 0.5 * jnp.sum(rho * obs_weight)

    wscale = (jnp.sqrt(hw) * obs_weight)[..., None]
    return r * wscale, J_c * wscale[..., None], J_p * wscale[..., None], cost


def _mat3_mul(A, B):
    """Component-tuple 3x3 matmul: A, B are 9-tuples (row-major) of [O]
    arrays. Unrolled scalar arithmetic — on TPU, batched [O,3,3] matmuls
    lower to tiny MXU ops with ~2% utilization and fragment XLA fusion;
    unrolled SoA keeps the whole chain in one VPU elementwise fusion."""
    a0, a1, a2, a3, a4, a5, a6, a7, a8 = A
    b0, b1, b2, b3, b4, b5, b6, b7, b8 = B
    return (
        a0 * b0 + a1 * b3 + a2 * b6,
        a0 * b1 + a1 * b4 + a2 * b7,
        a0 * b2 + a1 * b5 + a2 * b8,
        a3 * b0 + a4 * b3 + a5 * b6,
        a3 * b1 + a4 * b4 + a5 * b7,
        a3 * b2 + a4 * b5 + a5 * b8,
        a6 * b0 + a7 * b3 + a8 * b6,
        a6 * b1 + a7 * b4 + a8 * b7,
        a6 * b2 + a7 * b5 + a8 * b8,
    )


def _so3_exp_c(w0, w1, w2):
    """Rodrigues rotation as a 9-tuple of [O] components (se3.so3_exp
    unrolled; Taylor-guarded at theta -> 0 identically)."""
    theta2 = w0 * w0 + w1 * w1 + w2 * w2
    theta = jnp.sqrt(jnp.maximum(theta2, 1e-16))
    small = theta2 < 1e-8
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0,
                  (1.0 - jnp.cos(theta)) / theta2)
    # R = I + a*K + b*K^2 with K = hat(w).
    return (
        1.0 - b * (w1 * w1 + w2 * w2),
        -a * w2 + b * w0 * w1,
        a * w1 + b * w0 * w2,
        a * w2 + b * w0 * w1,
        1.0 - b * (w0 * w0 + w2 * w2),
        -a * w0 + b * w1 * w2,
        -a * w1 + b * w0 * w2,
        a * w0 + b * w1 * w2,
        1.0 - b * (w0 * w0 + w1 * w1),
    )


def _right_jacobian_c(w0, w1, w2):
    """Right Jacobian of SO(3) as a 9-tuple (right_jacobian_so3 unrolled)."""
    theta2 = w0 * w0 + w1 * w1 + w2 * w2
    theta = jnp.sqrt(jnp.maximum(theta2, 1e-16))
    small = theta2 < 1e-8
    a = jnp.where(small, 0.5 - theta2 / 24.0,
                  (1.0 - jnp.cos(theta)) / jnp.maximum(theta2, 1e-16))
    b = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0,
                  (theta - jnp.sin(theta)) / jnp.maximum(theta2 * theta,
                                                         1e-24))
    # Jr = I - a*K + b*K^2.
    return (
        1.0 - b * (w1 * w1 + w2 * w2),
        a * w2 + b * w0 * w1,
        -a * w1 + b * w0 * w2,
        -a * w2 + b * w0 * w1,
        1.0 - b * (w0 * w0 + w2 * w2),
        a * w0 + b * w1 * w2,
        a * w1 + b * w0 * w2,
        -a * w0 + b * w1 * w2,
        1.0 - b * (w0 * w0 + w1 * w1),
    )


def build_rows_soa(p6, pt, obs_uv, obs_weight, P_l, P_r, huber_delta: float):
    """Whitened normal-equation rows in one elementwise pass (SoA).

    Same math as residuals_and_jacobians + the downstream block products
    in build_normal_equations, but fully unrolled over scalar components
    so XLA fuses the entire build into a few wide VPU kernels — the
    batched-small-matmul formulation fragmented into dozens of ~1 ms
    low-utilization MXU ops (~19 ms of the 24 ms LM iteration on v5e;
    BA_PROFILE_r03).

    Args are PRE-GATHERED per observation: p6 [O,6], pt [O,3], obs_uv
    [O,4], obs_weight [O]. P_l/P_r are [3,4] with the standard rectified
    structure; entries are read as dynamic scalars (works for any [3,4]).

    Returns (cam_rows [O,42], pt_rows [O,12], W [O,6,3], cost):
      cam_rows = [JcT_Jc (36, row-major), JcT_r (6)]
      pt_rows  = [JpT_Jp (9, row-major), -JpT_r (3)]
    all scaled by the Huber IRLS weights exactly like the reference's
    Ceres setup (ref src/bundle_adjuster.cpp:100, HuberLoss(1.0)).
    """
    w0, w1, w2 = p6[:, 0], p6[:, 1], p6[:, 2]
    t0, t1, t2 = p6[:, 3], p6[:, 4], p6[:, 5]
    X0, X1, X2 = pt[:, 0], pt[:, 1], pt[:, 2]

    R = _so3_exp_c(w0, w1, w2)
    Y0 = R[0] * X0 + R[1] * X1 + R[2] * X2 + t0
    Y1 = R[3] * X0 + R[4] * X1 + R[5] * X2 + t1
    Y2 = R[6] * X0 + R[7] * X1 + R[8] * X2 + t2

    # dY/dw = -(R @ hat(X)) @ Jr(w); hat(X) as component tuple.
    zero = jnp.zeros_like(X0)
    hatX = (zero, -X2, X1, X2, zero, -X0, -X1, X0, zero)
    RhX = _mat3_mul(R, hatX)
    Jr = _right_jacobian_c(w0, w1, w2)
    M = _mat3_mul(RhX, Jr)
    dYdw = tuple(-m for m in M)  # [9] row-major: dY_i/dw_j

    # Projection rows for each camera: du = (P[0,:3] - u*P[2,:3])/s, etc.
    def proj_rows(P):
        p00, p01, p02, p03 = (P[0, 0], P[0, 1], P[0, 2], P[0, 3])
        p10, p11, p12, p13 = (P[1, 0], P[1, 1], P[1, 2], P[1, 3])
        p20, p21, p22, p23 = (P[2, 0], P[2, 1], P[2, 2], P[2, 3])
        su = p00 * Y0 + p01 * Y1 + p02 * Y2 + p03
        sv = p10 * Y0 + p11 * Y1 + p12 * Y2 + p13
        s = p20 * Y0 + p21 * Y1 + p22 * Y2 + p23
        safe = jnp.where(jnp.abs(s) < 1e-9, 1e-9, s)
        inv = 1.0 / safe
        u = su * inv
        v = sv * inv
        du = ((p00 - u * p20) * inv, (p01 - u * p21) * inv,
              (p02 - u * p22) * inv)
        dv = ((p10 - v * p20) * inv, (p11 - v * p21) * inv,
              (p12 - v * p22) * inv)
        return u, v, du, dv

    ul, vl, dul, dvl = proj_rows(P_l)
    ur, vr, dur, dvr = proj_rows(P_r)
    r = (ul - obs_uv[:, 0], vl - obs_uv[:, 1],
         ur - obs_uv[:, 2], vr - obs_uv[:, 3])
    Jproj = (dul, dvl, dur, dvr)  # 4 rows of 3

    # Huber whitening (Ceres semantics; see residuals_and_jacobians).
    s2 = r[0] * r[0] + r[1] * r[1] + r[2] * r[2] + r[3] * r[3]
    d2 = huber_delta * huber_delta
    sqrt_s = jnp.sqrt(jnp.maximum(s2, 1e-18))
    hw = jnp.where(s2 <= d2, 1.0, huber_delta / sqrt_s)
    rho = jnp.where(s2 <= d2, s2, 2.0 * huber_delta * sqrt_s - d2)
    cost = 0.5 * jnp.sum(rho * obs_weight)
    ws = jnp.sqrt(hw) * obs_weight

    # Whitened Jacobian rows: J_c[k] = [Jproj[k] @ dYdw, Jproj[k]] * ws,
    # J_p[k] = (Jproj[k] @ R) * ws, r[k] *= ws.
    Jc = []  # 4 rows x 6 cols of [O]
    Jp = []  # 4 rows x 3 cols
    rw = [rk * ws for rk in r]
    for k in range(4):
        g0, g1, g2 = Jproj[k]
        row_w = (
            g0 * dYdw[0] + g1 * dYdw[3] + g2 * dYdw[6],
            g0 * dYdw[1] + g1 * dYdw[4] + g2 * dYdw[7],
            g0 * dYdw[2] + g1 * dYdw[5] + g2 * dYdw[8],
        )
        row_p = (
            g0 * R[0] + g1 * R[3] + g2 * R[6],
            g0 * R[1] + g1 * R[4] + g2 * R[7],
            g0 * R[2] + g1 * R[5] + g2 * R[8],
        )
        Jc.append(tuple(c * ws for c in row_w) + tuple(c * ws for c in (g0, g1, g2)))
        Jp.append(tuple(c * ws for c in row_p))

    # Block products, unrolled. cam_rows: 36 JcT_Jc + 6 JcT_r.
    cam_cols = []
    for i in range(6):
        for j in range(6):
            cam_cols.append(sum(Jc[k][i] * Jc[k][j] for k in range(4)))
    for i in range(6):
        cam_cols.append(sum(Jc[k][i] * rw[k] for k in range(4)))
    pt_cols = []
    for i in range(3):
        for j in range(3):
            pt_cols.append(sum(Jp[k][i] * Jp[k][j] for k in range(4)))
    for i in range(3):
        pt_cols.append(-sum(Jp[k][i] * rw[k] for k in range(4)))
    W_cols = []
    for i in range(6):
        for j in range(3):
            W_cols.append(sum(Jc[k][i] * Jp[k][j] for k in range(4)))

    O = p6.shape[0]
    cam_rows = jnp.stack(cam_cols, axis=1)                 # [O,42]
    pt_rows = jnp.stack(pt_cols, axis=1)                   # [O,12]
    W = jnp.stack(W_cols, axis=1).reshape(O, 6, 3)         # [O,6,3]
    return cam_rows, pt_rows, W, cost


def residuals_and_jacobians(pose6_all, points_all, obs_cam, obs_point, obs_uv,
                            obs_weight, P_l, P_r, huber_delta: float):
    """Whitened residuals + Jacobians for a batch of observations.

    Args:
      pose6_all: [C,6] world->camera poses.
      points_all: [P,3] world points.
      obs_cam/obs_point: [O] int32 indices.
      obs_uv: [O,4]; obs_weight: [O] (0 for padding rows).

    Returns (r [O,4], J_c [O,4,6], J_p [O,4,3], cost scalar) where r/J are
    scaled by sqrt(huber_weight) * obs_weight and cost is the Ceres-style
    robust total 0.5 * sum(rho(||r||^2)).
    """
    p6 = pose6_all[obs_cam]
    pt = points_all[obs_point]
    return residuals_and_jacobians_gathered(
        p6, pt, obs_uv, obs_weight, P_l, P_r, huber_delta
    )


def robust_cost_gathered(p6, pt, obs_uv, obs_weight, P_l, P_r,
                         huber_delta: float):
    """Cost only, on pre-gathered per-observation poses/points."""
    batch = p6.shape[:-1]
    r = jax.vmap(residual_one, in_axes=(0, 0, 0, None, None))(
        p6.reshape(-1, 6), pt.reshape(-1, 3), obs_uv.reshape(-1, 4), P_l, P_r
    ).reshape(*batch, 4)
    s = jnp.sum(r * r, axis=-1)
    d2 = huber_delta * huber_delta
    sqrt_s = jnp.sqrt(jnp.maximum(s, 1e-18))
    rho = jnp.where(s <= d2, s, 2.0 * huber_delta * sqrt_s - d2)
    return 0.5 * jnp.sum(rho * obs_weight)


def robust_cost(pose6_all, points_all, obs_cam, obs_point, obs_uv, obs_weight,
                P_l, P_r, huber_delta: float):
    """Cost only (no Jacobians) for LM accept/reject evaluation."""
    p6 = pose6_all[obs_cam]
    pt = points_all[obs_point]
    r = jax.vmap(residual_one, in_axes=(0, 0, 0, None, None))(
        p6, pt, obs_uv, P_l, P_r
    )
    s = jnp.sum(r * r, axis=-1)
    d2 = huber_delta * huber_delta
    sqrt_s = jnp.sqrt(jnp.maximum(s, 1e-18))
    rho = jnp.where(s <= d2, s, 2.0 * huber_delta * sqrt_s - d2)
    return 0.5 * jnp.sum(rho * obs_weight)
