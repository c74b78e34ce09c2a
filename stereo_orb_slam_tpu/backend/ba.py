"""Bundle adjustment: Levenberg-Marquardt with Schur complement + PCG.

Replaces the reference's Ceres solve (LM trust region, SPARSE_SCHUR +
SuiteSparse, JACOBI preconditioner, ref `src/bundle_adjuster.cpp:13-36`)
with a TPU-native formulation in which every stage is a batched dense op:

- per-observation residuals/Jacobians: vmap (MXU-friendly small matmuls),
- normal-equation blocks H_cc [C,6,6], H_pp [P,3,3], W [O,6,3], gradients:
  `segment_sum` scatter-reductions,
- point marginalization: batched 3x3 Cholesky solves (embarrassingly
  parallel over landmarks — the distribution axis in parallel/dist_ba.py),
- reduced camera system S = H_cc - W H_pp^-1 W^T: solved MATRIX-FREE by
  preconditioned CG (block-Jacobi), with S·x evaluated via two
  segment-sums per iteration; S is never materialized, so global BA over
  thousands of keyframes needs O(C·36) memory instead of O(C^2·36),
- LM damping loop fully device-side (`ba_solve`: init + `lax.while_loop`
  over evaluate-once iterations, convergence exit included) — one dispatch
  and one host sync per solve; shapes are padded to geometric buckets by
  `BundleAdjuster` so compiles stay logarithmic over a growing sequence.

Window semantics match the reference (ref `src/bundle_adjuster.cpp:39-133`):
cameras parameterized as world->camera pose6, first camera in the window
held constant (ref :113), point coordinates clamped to ±bound (ref
:104-108 box constraints), writeback via world.ba_writeback which drags
first-observed landmarks exactly as Frame::GlobalPose does.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from stereo_orb_slam_tpu.config import BAConfig
from stereo_orb_slam_tpu.backend import residuals as res_mod
from stereo_orb_slam_tpu.geometry import se3


class BAProblem(NamedTuple):
    """Static-shape BA problem (padded)."""

    pose6: jnp.ndarray      # [C,6] world->camera
    points: jnp.ndarray     # [P,3]
    obs_cam: jnp.ndarray    # [O] int32
    obs_point: jnp.ndarray  # [O] int32
    obs_uv: jnp.ndarray     # [O,4]
    obs_weight: jnp.ndarray  # [O] 1.0 real / 0.0 padding
    cam_mask: jnp.ndarray   # [C] 1.0 free / 0.0 held fixed
    point_mask: jnp.ndarray  # [P] 1.0 real / 0.0 padding
    P_l: jnp.ndarray        # [3,4]
    P_r: jnp.ndarray        # [3,4]


def _seg_sum(x, ids, num, axis_name=None):
    """Segment-sum, globally reduced over `axis_name` when running inside a
    shard_map region (the distributed-BA reduction: local partial sums over
    each device's observation shard, then one psum over the mesh —
    SURVEY.md §5.8)."""
    out = jax.ops.segment_sum(x, ids, num_segments=num)
    if axis_name is not None:
        out = jax.lax.psum(out, axis_name)
    return out


def _seg_sum_points(x, obs_point, num, axis_name=None, dense_slots=None):
    """Per-point reduction of per-observation rows x [O, ...].

    Matrix-free/distributed: a segment-sum scatter. With `dense_slots`
    (windowed fast path), the point-grouped slot map turns it into a
    gather + local reduce over the K slot axis. Isolated microbenchmarks
    rank these either way depending on surrounding fusion; END-TO-END the
    gather-reduce LM iteration measures ~15% faster on v5e (23.9 vs 20.6
    it/s), so trust the whole-program number."""
    if dense_slots is None:
        return _seg_sum(x, obs_point, num, axis_name)
    from stereo_orb_slam_tpu.backend.schur_dense import slot_gather

    sto, _, smask = dense_slots
    F = int(np.prod(x.shape[1:]))
    g = slot_gather(x.reshape(-1, F), sto, smask)
    return jnp.sum(g, axis=1).reshape((sto.shape[0],) + x.shape[1:])[:num]


def _seg_sum_cams(x, obs_cam, num, axis_name=None, cam_red=None):
    """Per-camera reduction of per-observation rows x [O, F].

    Matrix-free/distributed (`cam_red` None): a segment-sum scatter
    (psum-compatible) — XLA's TPU scatter-add serializes duplicate indices
    (~6.5 ms per LM iteration for the camera Hessian blocks at O=131k).

    Dense windowed path: `cam_red` is either the [C,O] f32 ONE-HOT of
    obs_cam (one MXU matmul — the r3 formulation, measured best: the
    one-hot generation fuses into the matmul and the whole reduction rides
    the MXU) or, past the one-hot's memory gate, a ([C,Kc] slot map, mask)
    tuple from build_cam_slots_device (gather + local sum — slower than
    the one-hot by ~1.2 ms/LM-iteration at the yardstick but independent
    of C*O). NOTE r4 finding: BA_PROFILE_r03's "8.07 ms on the one-hot
    line" was fusion misattribution — op-level tracing shows the while
    body's point gathers and carry copies carried most of that time; the
    one-hot matmul itself is cheap.
    """
    if cam_red is None:
        return _seg_sum(x, obs_cam, num, axis_name)
    # Local-only reduction: the dense windowed path never runs sharded
    # (the documented dense/axis_name mutual exclusion; advisor r3).
    assert axis_name is None, "cam_red is a single-device reduction"
    if isinstance(cam_red, tuple):
        from stereo_orb_slam_tpu.backend.schur_dense import slot_gather

        sto, mask = cam_red
        g = slot_gather(x, sto, mask, sorted_indices=False)  # [C,Kc,F]
        return jnp.sum(g, axis=1)[:num]
    return cam_red @ x


def build_cam_slots_device(obs_cam, obs_weight, n_cams: int, Kc: int):
    """Device-side camera-run slot maps: [C, Kc] indices into the
    point-sorted obs arrays grouping each camera's observations, plus the
    validity mask. The camera twin of build_slots_device — but obs_cam is
    NOT sorted in the point-sorted layout, so the runs come from a stable
    argsort (materialized once per solve, loop-invariant across the LM
    while_loop). Counts/starts are derived with binary searches on the
    sorted keys — no duplicate-index scatter anywhere.

    Only the static Kc bucket (max observations per camera, pow2) is chosen
    on host. Padding rows (obs_weight == 0) sort after all real cameras.
    """
    O = obs_cam.shape[0]
    real = obs_weight > 0
    key = jnp.where(real, obs_cam, n_cams).astype(jnp.int32)
    order = jnp.argsort(key, stable=True).astype(jnp.int32)
    sorted_cam = key[order]
    cams = jnp.arange(n_cams, dtype=jnp.int32)
    starts = jnp.searchsorted(sorted_cam, cams, side="left").astype(jnp.int32)
    ends = jnp.searchsorted(sorted_cam, cams, side="right").astype(jnp.int32)
    counts = ends - starts
    k = jnp.arange(Kc, dtype=jnp.int32)
    run = jnp.minimum(k[None, :], jnp.maximum(counts - 1, 0)[:, None])
    sto = order[jnp.minimum(starts[:, None] + run, max(O - 1, 0))]
    mask = (k[None, :] < counts[:, None]).astype(jnp.float32)
    return sto, mask


def build_normal_equations(prob: BAProblem, huber_delta: float,
                           axis_name=None, dense_slots=None,
                           cam_red=None, point_sharded: bool = False):
    """point_sharded: the POINT-ALIGNED distributed layout
    (parallel/dist_ba.shard_problem_point_aligned) — every point's whole
    observation run lives on one device, so point-side reductions are
    LOCAL (no psum) and only camera-sized tensors cross the mesh."""
    C = prob.pose6.shape[0]
    P = prob.points.shape[0]
    # Whitened normal-equation rows in ONE fused elementwise pass (SoA,
    # residuals.build_rows_soa) — the batched-small-matmul formulation
    # fragmented into dozens of low-utilization MXU ops and dominated the
    # LM iteration (~19 of 24 ms on v5e; BA_PROFILE_r03).
    cam_rows, pt_rows, W, cost = res_mod.build_rows_soa(
        prob.pose6[prob.obs_cam], prob.points[prob.obs_point], prob.obs_uv,
        prob.obs_weight, prob.P_l, prob.P_r, huber_delta,
    )
    # Camera-side reductions fused into one row per observation: one
    # matmul (dense path) / one scatter (matrix-free) instead of two.
    cam_red = _seg_sum_cams(cam_rows, prob.obs_cam, C, axis_name, cam_red)
    H_cc = cam_red[:, :36].reshape(-1, 6, 6)             # [C,6,6]
    b_c = -cam_red[:, 36:]                               # [C,6]
    Wg = None
    if dense_slots is not None:
        # ONE fused slot gather for the whole point side: pt_rows (12 cols,
        # reduced over the K slot axis) and W (18 cols, kept in slot form as
        # Wg for the dense-Schur assembly + back-substitution). r4's profile
        # showed three separate [P*K, F] gathers of the SAME slot map at
        # 3.9 ms/LM-iteration; the per-row sweep cost dominates (an
        # [640000,3] gather timed the same as [640000,12]), so one 30-col
        # sweep costs ~one 18-col sweep (r5 directive 3).
        from stereo_orb_slam_tpu.backend.schur_dense import slot_gather

        sto, _, smask = dense_slots
        fused = jnp.concatenate([pt_rows, W.reshape(-1, 18)], axis=1)
        g = slot_gather(fused, sto, smask)               # [P,K,30]
        pt_red = jnp.sum(g[..., :12], axis=1)
        Wg = g[..., 12:].reshape(sto.shape[0], -1, 6, 3)
    else:
        pt_red = _seg_sum_points(pt_rows, prob.obs_point, P,
                                 None if point_sharded else axis_name)
    H_pp = pt_red[:, :9].reshape(-1, 3, 3)               # [P,3,3]
    b_p = pt_red[:, 9:]                                  # [P,3]
    if axis_name is not None:
        cost = jax.lax.psum(cost, axis_name)
    return H_cc, H_pp, W, b_c, b_p, cost, Wg


def _damp_blocks(H, lam, eps=1e-8):
    d = jnp.diagonal(H, axis1=-2, axis2=-1)  # [N,k]
    return H + jnp.vectorize(jnp.diag, signature="(k)->(k,k)")(lam * d + eps)


def _inv3(A):
    """Closed-form inverse of [N,3,3] blocks (adjugate / determinant).

    Pure arithmetic — batched Cholesky/LU lower to sequential LAPACK-style
    loops on TPU and dominated the whole LM step before this.
    """
    a, b, c = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    d, e, f = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    g, h, i = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    A11 = e * i - f * h
    A12 = c * h - b * i
    A13 = b * f - c * e
    A21 = f * g - d * i
    A22 = a * i - c * g
    A23 = c * d - a * f
    A31 = d * h - e * g
    A32 = b * g - a * h
    A33 = a * e - b * d
    det = a * A11 + b * A21 + c * A31
    inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-20, 1e-20, det)
    rows = jnp.stack(
        [
            jnp.stack([A11, A12, A13], -1),
            jnp.stack([A21, A22, A23], -1),
            jnp.stack([A31, A32, A33], -1),
        ],
        -2,
    )
    return rows * inv_det[..., None, None]


def _inv6_gj(A, eps=1e-12):
    """Batched 6x6 inverse by fixed-step Gauss-Jordan (no pivoting; the
    blocks are damped SPD, so diagonal pivots are safe). Pure arithmetic."""
    n = A.shape[-1]
    aug = jnp.concatenate(
        [A, jnp.broadcast_to(jnp.eye(n, dtype=A.dtype), A.shape)], axis=-1
    )
    for k in range(n):
        pivot = aug[..., k, k][..., None]
        pivot = jnp.where(jnp.abs(pivot) < eps, eps, pivot)
        row_k = aug[..., k, :] / pivot
        factors = aug[..., :, k][..., None]
        aug = aug - factors * row_k[..., None, :]
        aug = aug.at[..., k, :].set(row_k)
    return aug[..., :, n:]


def _batched_spd_solve(A, b):
    """Solve A x = b for [N,3,3] SPD blocks and [N,3] rhs (closed form)."""
    return jnp.einsum("nij,nj->ni", _inv3(A), b)


def schur_matvec(x, H_cc_l, Hpp_inv, W, obs_cam, obs_point, cam_mask,
                 axis_name=None, point_sharded: bool = False):
    """S @ x with S = H_cc_l - W H_pp_l^-1 W^T, matrix-free.

    x: [C,6]. Fixed cameras are pinned via cam_mask (identity rows).
    `Hpp_inv` is the PRECOMPUTED [P,3,3] inverse of the damped point blocks
    (one closed-form inversion per LM step instead of a solve per CG
    iteration). Under shard_map, W/obs_* are per-device shards; the two
    segment-sums psum over the mesh while the point marginalization stays
    local.
    """
    xm = x * cam_mask[:, None]
    u = jnp.einsum("oij,oi->oj", W, xm[obs_cam])          # [O,3] = W^T x
    z = _seg_sum(u, obs_point, Hpp_inv.shape[0],
                 None if point_sharded else axis_name)    # [P,3]
    w = jnp.einsum("nij,nj->ni", Hpp_inv, z)              # [P,3]
    v = jnp.einsum("oij,oj->oi", W, w[obs_point])         # [O,6] = W w
    out = jnp.einsum("cij,cj->ci", H_cc_l, xm) - _seg_sum(
        v, obs_cam, x.shape[0], axis_name
    )
    return out * cam_mask[:, None] + x * (1.0 - cam_mask[:, None])


def pcg(matvec, b, M_inv_blocks, iters: int, tol: float):
    """Block-Jacobi preconditioned CG on the reduced camera system."""

    def precond(r):
        return jnp.einsum("cij,cj->ci", M_inv_blocks, r)

    x0 = jnp.zeros_like(b)
    r0 = b
    z0 = precond(r0)
    p0 = z0
    rz0 = jnp.sum(r0 * z0)
    b_norm = jnp.sqrt(jnp.sum(b * b))

    def body(state):
        i, x, r, p, rz = state
        Ap = matvec(p)
        alpha = rz / jnp.maximum(jnp.sum(p * Ap), 1e-30)
        x = x + alpha * p
        r = r - alpha * Ap
        z = precond(r)
        rz_new = jnp.sum(r * z)
        beta = rz_new / jnp.maximum(rz, 1e-30)
        p = z + beta * p
        return i + 1, x, r, p, rz_new

    def cond(state):
        i, x, r, p, rz = state
        return (i < iters) & (jnp.sqrt(jnp.sum(r * r)) > tol * b_norm)

    _, x, _, _, _ = jax.lax.while_loop(cond, body, (0, x0, r0, p0, rz0))
    return x


def _solve_lm(prob: BAProblem, H_cc, H_pp, W, b_c, b_p, lam, cfg: BAConfig,
              axis_name=None, dense_slots=None, cam_red=None,
              point_sharded: bool = False, Wg=None, band=None):
    """Damp, marginalize points (Schur), solve the reduced camera system,
    back-substitute. Returns the PROPOSED (pose6, points) for this lambda.

    Two reduced-system solvers:
    - dense (windowed): IC-ordered S materialized on the MXU
      (schur_dense.assemble_schur) + direct Cholesky — exact and ~0.2 ms.
    - matrix-free (global/distributed): block-Jacobi PCG with segment-sum
      matvecs, psum-reduced under shard_map.
    """
    H_cc_l = _damp_blocks(H_cc, lam)
    H_pp_l = _damp_blocks(H_pp, lam)
    # Guard padding points: identity blocks so Cholesky stays finite.
    eye3 = jnp.eye(3, dtype=H_pp_l.dtype)
    H_pp_l = jnp.where(prob.point_mask[:, None, None] > 0, H_pp_l, eye3[None])

    Hpp_inv = _inv3(H_pp_l)

    # rhs = b_c - W H_pp^-1 b_p
    hp_bp = jnp.einsum("nij,nj->ni", Hpp_inv, b_p)
    rhs = b_c - _seg_sum_cams(
        jnp.einsum("oij,oj->oi", W, hp_bp[prob.obs_point]), prob.obs_cam,
        b_c.shape[0], axis_name, cam_red,
    )
    rhs = rhs * prob.cam_mask[:, None]

    eye6 = jnp.eye(6, dtype=H_cc_l.dtype)
    H_cc_safe = jnp.where(prob.cam_mask[:, None, None] > 0, H_cc_l, eye6[None])

    if dense_slots is not None:
        from stereo_orb_slam_tpu.backend import schur_dense

        # Distributed dense path (point-aligned shards): local assembly +
        # ONE [6C,6C] psum + replicated Cholesky — ~3 collectives per LM
        # step instead of one per CG iteration (see assemble_schur).
        assert axis_name is None or point_sharded, (
            "dense_slots under shard_map requires the point-aligned layout"
        )
        dt = jnp.bfloat16 if cfg.dense_assemble_bf16 else jnp.float32
        if band is not None and Wg is not None and axis_name is None:
            # Banded fast path (see schur_dense.band_plan): local-width
            # expansion per point chunk; feasibility proven on host.
            S = schur_dense.assemble_schur_banded(
                H_cc_safe, Hpp_inv, dense_slots[1], dense_slots[2],
                prob.cam_mask, Wg, band[0], band[1], band[2], dtype=dt,
            )
        else:
            S = schur_dense.assemble_schur(
                H_cc_safe, W, Hpp_inv, dense_slots[0], dense_slots[1],
                dense_slots[2], prob.cam_mask,
                dtype=dt, axis_name=axis_name, Wg=Wg,
            )
        dc = schur_dense.solve_reduced_chol(S, rhs, prob.cam_mask)
    else:
        # Preconditioner: inverse of damped camera diagonal blocks (fixed
        # cams get identity).
        M_inv = _inv6_gj(H_cc_safe + 1e-8 * eye6[None])
        mv = partial(
            schur_matvec,
            H_cc_l=H_cc_safe, Hpp_inv=Hpp_inv, W=W,
            obs_cam=prob.obs_cam, obs_point=prob.obs_point,
            cam_mask=prob.cam_mask, axis_name=axis_name,
            point_sharded=point_sharded,
        )
        dc = pcg(mv, rhs, M_inv, cfg.cg_iterations, cfg.cg_tol)
    dc = dc * prob.cam_mask[:, None]

    # Back-substitute points: dp = H_pp^-1 (b_p - W^T dc)
    if dense_slots is not None and Wg is not None:
        # Slot-form reduction: z_p = sum_k Wg[p,k]^T dc[slot_cam[p,k]].
        # Replaces the [P*K,3] slot gather of u = W^T dc (1.16 ms/iter at
        # the yardstick, r4 profile) with a gather from the TINY [C,6]
        # table + an elementwise contraction; Wg's baked slot mask zeroes
        # padding slots (their slot_cam reads camera 0 harmlessly).
        dcg = dc[dense_slots[1]]                          # [P,K,6]
        # Elementwise+reduce instead of einsum (the dot_general form made
        # XLA materialize dcg twice in different layouts). An unrolled
        # six-slice variant measured IDENTICAL (106.9 it/s both ways,
        # r5) — the [P*K,6] gather's ~1.15 ms is per-row sweep cost, not
        # layout duplication; don't retry without profiling.
        z = jnp.sum(Wg * dcg[:, :, :, None], axis=(1, 2))
    else:
        u = jnp.einsum("oij,oi->oj", W, dc[prob.obs_cam])
        z = _seg_sum_points(u, prob.obs_point, b_p.shape[0],
                            None if point_sharded else axis_name,
                            dense_slots)
    dp = jnp.einsum("nij,nj->ni", Hpp_inv, b_p - z)
    dp = dp * prob.point_mask[:, None]

    pose6_new = prob.pose6 + dc
    points_new = jnp.clip(prob.points + dp, -cfg.point_bound, cfg.point_bound)
    return pose6_new, points_new


def lm_step_impl(prob: BAProblem, lam, cfg: BAConfig, axis_name=None,
                 dense_slots=None, cam_red=None,
                 point_sharded: bool = False):
    """One LM iteration: build, solve (Schur+PCG), evaluate, accept/reject.

    Returns (new_prob, new_lam, accepted, cost_before, cost_after).
    With `axis_name` set this runs inside shard_map: prob.obs_* are local
    shards, poses/points replicated, reductions psum'd.
    With `dense_slots` = (slot_to_obs, slot_cam, slot_mask) from
    schur_dense.group_slots, the reduced camera system is materialized on
    the MXU and PCG runs on the explicit S (the windowed fast path; see
    backend/schur_dense.py). Mutually exclusive with `axis_name`.
    """
    H_cc, H_pp, W, b_c, b_p, cost0, Wg = build_normal_equations(
        prob, cfg.huber_delta, axis_name, dense_slots, cam_red,
        point_sharded,
    )
    pose6_new, points_new = _solve_lm(
        prob, H_cc, H_pp, W, b_c, b_p, lam, cfg, axis_name, dense_slots,
        cam_red, point_sharded, Wg,
    )

    cost1 = res_mod.robust_cost(
        pose6_new, points_new, prob.obs_cam, prob.obs_point, prob.obs_uv,
        prob.obs_weight, prob.P_l, prob.P_r, cfg.huber_delta,
    )
    if axis_name is not None:
        cost1 = jax.lax.psum(cost1, axis_name)

    accept = cost1 < cost0
    pose6_out = jnp.where(accept, pose6_new, prob.pose6)
    points_out = jnp.where(accept, points_new, prob.points)
    lam_new = jnp.where(accept, lam * cfg.lm_lambda_down, lam * cfg.lm_lambda_up)
    lam_new = jnp.clip(lam_new, cfg.lm_lambda_min, cfg.lm_lambda_max)

    new_prob = prob._replace(pose6=pose6_out, points=points_out)
    return new_prob, lam_new, accept, cost0, cost1


lm_step = jax.jit(lm_step_impl,
                  static_argnames=("cfg", "axis_name", "point_sharded"))


class LMCarry(NamedTuple):
    """Evaluate-once LM state: the normal equations at the CURRENT params
    ride along, so each iteration runs exactly one residual/Jacobian pass
    (at the trial point — which doubles as the next iteration's build when
    the step is accepted; on rejection the cached blocks are reused with a
    larger lambda)."""

    prob: BAProblem
    lam: jnp.ndarray
    cost: jnp.ndarray
    H_cc: jnp.ndarray
    H_pp: jnp.ndarray
    W: jnp.ndarray
    b_c: jnp.ndarray
    b_p: jnp.ndarray
    # Dense-path only: W in slot form [P,K,6,3] from the fused build gather
    # (None on the matrix-free/distributed-obs paths).
    Wg: Optional[jnp.ndarray] = None


def lm_init_impl(prob: BAProblem, cfg: BAConfig, dense_slots=None,
                 axis_name=None, cam_red=None,
                 point_sharded: bool = False):
    H_cc, H_pp, W, b_c, b_p, cost, Wg = build_normal_equations(
        prob, cfg.huber_delta, axis_name, dense_slots, cam_red,
        point_sharded,
    )
    return LMCarry(prob, jnp.float32(cfg.lm_lambda_init), cost,
                   H_cc, H_pp, W, b_c, b_p, Wg)


def lm_iteration_impl(carry: LMCarry, cfg: BAConfig, dense_slots=None,
                      axis_name=None, cam_red=None,
                      point_sharded: bool = False, band=None):
    """One evaluate-once LM iteration (single-device fast path).

    Returns (new_carry, accepted, cost_before, cost_after). The accept
    decisions and damping schedule are identical to lm_step_impl — the
    trial cost here comes from the SAME whitened-residual pass that also
    produces the trial normal equations. With `axis_name` this runs inside
    shard_map: the carry's W/obs arrays are per-device shards and the
    reductions psum over the mesh (parallel/dist_ba.py).
    """
    prob = carry.prob
    pose6_new, points_new = _solve_lm(
        prob, carry.H_cc, carry.H_pp, carry.W, carry.b_c, carry.b_p,
        carry.lam, cfg, axis_name, dense_slots, cam_red, point_sharded,
        carry.Wg, band,
    )
    prob_try = prob._replace(pose6=pose6_new, points=points_new)
    H_cc2, H_pp2, W2, b_c2, b_p2, cost_try, Wg2 = build_normal_equations(
        prob_try, cfg.huber_delta, axis_name, dense_slots, cam_red,
        point_sharded,
    )

    accept = cost_try < carry.cost
    lam_new = jnp.where(accept, carry.lam * cfg.lm_lambda_down,
                        carry.lam * cfg.lm_lambda_up)
    lam_new = jnp.clip(lam_new, cfg.lm_lambda_min, cfg.lm_lambda_max)

    def sel(a, b):
        return jnp.where(accept, a, b)

    new_carry = LMCarry(
        prob=prob._replace(pose6=sel(pose6_new, prob.pose6),
                           points=sel(points_new, prob.points)),
        lam=lam_new,
        cost=sel(cost_try, carry.cost),
        H_cc=sel(H_cc2, carry.H_cc), H_pp=sel(H_pp2, carry.H_pp),
        W=sel(W2, carry.W), b_c=sel(b_c2, carry.b_c),
        b_p=sel(b_p2, carry.b_p),
        Wg=None if Wg2 is None else sel(Wg2, carry.Wg),
    )
    return new_carry, accept, carry.cost, cost_try


lm_init = jax.jit(lm_init_impl, static_argnames=("cfg", "point_sharded"))
lm_iteration = jax.jit(lm_iteration_impl,
                       static_argnames=("cfg", "point_sharded"))


def build_slots_device(obs_point, obs_cam, obs_weight, n_points_pad: int,
                       K: int):
    """Device-side equivalent of schur_dense.group_slots.

    The [P,K]x3 slot maps are ~P*K*12 bytes; on a remote-attached TPU
    uploading them per solve costs more than the solve itself (~2.4 MB at
    ~38 MB/s for a live window). They are pure functions of the (sorted)
    obs arrays already on device, so the live path derives them here —
    only the static K bucket is chosen on host (from the exact per-point
    observation counts).

    REQUIRES obs_point sorted ascending with padding rows (obs_weight == 0)
    at the END of the array (the BundleAdjuster layout).
    """
    real = (obs_weight > 0).astype(jnp.int32)
    # Padding rows (obs_weight == 0, parked at obs_point=0) contribute 0.
    counts = jax.ops.segment_sum(real, obs_point,
                                 num_segments=n_points_pad)  # [P]
    n_obs = jnp.sum(real)
    starts = jnp.cumsum(counts) - counts
    k = jnp.arange(K, dtype=jnp.int32)
    run = jnp.minimum(k[None, :], jnp.maximum(counts - 1, 0)[:, None])
    sto = jnp.minimum(starts[:, None] + run,
                      jnp.maximum(n_obs - 1, 0)).astype(jnp.int32)
    mask = (k[None, :] < counts[:, None]).astype(jnp.float32)
    scam = jnp.where(mask > 0, obs_cam[sto], 0).astype(jnp.int32)
    return sto, scam, mask


def ba_solve_impl(prob: BAProblem, max_iters, cfg: BAConfig,
                  dense_slots=None, axis_name=None, dense_K=None,
                  point_sharded: bool = False, cam_K=None,
                  band_bases=None, band_B=None, band_Pc=None):
    """Full LM solve in ONE device program: init + `lax.while_loop` over
    evaluate-once iterations with the reference's convergence exit (relative
    cost decrease < function_tolerance on an accepted step, the Ceres
    default semantics; ref `src/bundle_adjuster.cpp:13-36` caps iterations
    and wall time, `src/params.h:34`).

    The host loop in BundleAdjuster previously synced per iteration to test
    convergence — on a remote-attached TPU each sync is a full transport
    round trip (~30-45 ms), dwarfing the ~40 ms of actual device work in a
    50-iteration solve. This runs the whole damping schedule device-side;
    the host reads back once. Returns (carry, iterations_run, cost_initial).

    `dense_slots` may be passed explicitly (precomputed host maps), or
    derived on device when `dense_K` (static) is given — the live-loop path,
    which avoids uploading ~P*K*12 bytes of slot maps per solve. `cam_K`
    (static, pow2 >= max observations per camera) enables the camera-run
    slot-map FALLBACK for problems past the one-hot's C*O memory gate;
    without either, camera reductions use the (slow but always-correct)
    scatter.
    """
    if dense_slots is None and dense_K is not None:
        dense_slots = build_slots_device(
            prob.obs_point, prob.obs_cam, prob.obs_weight,
            prob.points.shape[0], dense_K,
        )
    cam_red = None
    C = prob.pose6.shape[0]
    O = prob.obs_cam.shape[0]
    if dense_slots is not None and axis_name is None:
        if C * O <= (1 << 26):
            # Primary: [C,O] one-hot MXU matmul (generation fuses into the
            # matmul; measured best — see _seg_sum_cams). Size-gated to
            # 256 MB live across the while_loop.
            cam_red = (prob.obs_cam[None, :]
                       == jnp.arange(C, dtype=prob.obs_cam.dtype)[:, None]
                       ).astype(jnp.float32)
        elif cam_K is not None:
            cam_red = build_cam_slots_device(
                prob.obs_cam, prob.obs_weight, C, cam_K,
            )
    band = (None if band_bases is None or band_B is None
            else (band_bases, band_B, band_Pc))
    carry0 = lm_init_impl(prob, cfg, dense_slots, axis_name, cam_red,
                          point_sharded)
    cost_init = carry0.cost

    def cond(state):
        _, it, converged = state
        return (it < max_iters) & ~converged

    def body(state):
        carry, it, _ = state
        new_carry, accepted, c0, c1 = lm_iteration_impl(carry, cfg,
                                                        dense_slots,
                                                        axis_name,
                                                        cam_red,
                                                        point_sharded,
                                                        band)
        converged = accepted & (c0 > 0) & (
            (c0 - c1) < cfg.function_tolerance * c0
        )
        return new_carry, it + 1, converged

    carry, iters, _ = jax.lax.while_loop(
        cond, body, (carry0, jnp.int32(0), jnp.asarray(False))
    )
    return carry, iters, cost_init


ba_solve = jax.jit(ba_solve_impl,
                   static_argnames=("cfg", "axis_name", "dense_K",
                                    "point_sharded", "cam_K", "band_B",
                                    "band_Pc"))


def ba_resume_impl(carry: LMCarry, max_iters, cfg: BAConfig,
                   dense_slots=None, axis_name=None,
                   point_sharded: bool = False, cam_red=None,
                   band_bases=None, band_B=None, band_Pc=None):
    """Continue an LM solve from an existing carry for up to `max_iters`
    more evaluate-once iterations (same loop as ba_solve_impl).

    Exists so HUGE solves can be CHUNKED across dispatches: on the
    remote-attached transport, a single device program that runs for
    minutes (global BA over thousands of keyframes at max_iterations=50)
    trips the relay's watchdog and kills the worker ("TPU worker process
    crashed"). The host dispatches bounded chunks and checks the converged
    flag between them (BundleAdjuster._solve_chunked).

    Returns (carry, iterations_run, converged).
    """
    def cond(state):
        _, it, converged = state
        return (it < max_iters) & ~converged

    band = (None if band_bases is None or band_B is None
            else (band_bases, band_B, band_Pc))

    def body(state):
        c, it, _ = state
        new_c, accepted, c0, c1 = lm_iteration_impl(c, cfg, dense_slots,
                                                    axis_name, cam_red,
                                                    point_sharded, band)
        converged = accepted & (c0 > 0) & (
            (c0 - c1) < cfg.function_tolerance * c0
        )
        return new_c, it + 1, converged

    carry, iters, conv = jax.lax.while_loop(
        cond, body, (carry, jnp.int32(0), jnp.asarray(False))
    )
    return carry, iters, conv


ba_resume = jax.jit(ba_resume_impl,
                    static_argnames=("cfg", "axis_name", "point_sharded",
                                     "band_B", "band_Pc"))

# Device-side slot-map builders as standalone jits (the CHUNKED solve path
# derives the maps once and threads them through every ba_resume dispatch).
_build_slots_jit = jax.jit(build_slots_device,
                           static_argnames=("n_points_pad", "K"))
_build_cam_slots_jit = jax.jit(build_cam_slots_device,
                               static_argnames=("n_cams", "Kc"))


def _pad_to(n: int, mult: int = 256) -> int:
    """Pad to the next power of two (>= mult): BA problem sizes grow every
    frame, and each distinct padded shape is a separate XLA compile (tens of
    seconds on TPU) — geometric buckets keep the number of unique shapes
    logarithmic over a whole sequence at <=2x memory overhead."""
    n = max(n, mult)
    return 1 << (n - 1).bit_length()


def _pad_to_fine(n: int, mult: int = 256) -> int:
    """Half-octave buckets (1x and 1.5x each power of two): the dense-S
    assembly cost is linear in padded P, so the pow2 worst case (+100%)
    costs real milliseconds; 2 buckets/octave caps waste at +50% for ~2x
    the compile-cache entries."""
    n = max(n, mult)
    p = 1 << (n - 1).bit_length()
    if n <= (p >> 1) + (p >> 2):  # fits in 1.5 * p/2
        return (p >> 1) + (p >> 2)
    return p


def prepare_problem_arrays(problem: dict, sort_by_point: bool):
    """Shared world->solver conversion used by every BA driver (single
    device, obs-sharded distributed, point-aligned distributed): pose6
    parameterization on host (a device round trip per solve costs more
    than the conversion), first-camera-fixed mask (ref
    bundle_adjuster.cpp:113), and optional point-sorted observation layout
    (the dense-Schur / point-aligned contract)."""
    from stereo_orb_slam_tpu.geometry import se3_np

    pose6 = se3_np.matrix_to_pose6_np(
        se3_np.inverse_np(problem["cam_world"])
    ).astype(np.float32)
    obs_cam = np.asarray(problem["obs_cam"])
    obs_point = np.asarray(problem["obs_point"])
    obs_uv = np.asarray(problem["obs_uv"])
    if sort_by_point:
        order = np.argsort(obs_point, kind="stable")
        obs_cam = obs_cam[order]
        obs_point = obs_point[order]
        obs_uv = obs_uv[order]
    cam_mask = np.ones(len(problem["frame_ids"]), np.float32)
    cam_mask[0] = 0.0
    return pose6, obs_cam, obs_point, obs_uv, cam_mask


@jax.jit
def _pack_ba_result(pose6, points, n_iters, cost_init, cost_final):
    """Flatten the solve outputs into one f32 buffer (single readback)."""
    return jnp.concatenate([
        pose6.reshape(-1), points.reshape(-1),
        jnp.stack([n_iters.astype(jnp.float32), cost_init, cost_final]),
    ])


class BundleAdjuster:
    """Host orchestration: pad, run LM to convergence, write back.

    Mirrors BundleAdjuster::Optimize(start, end) (ref
    `src/bundle_adjuster.cpp:39-133`), called per-frame, sliding-window, and
    globally (ref `src/slam.cpp:123-129,156`).
    """

    def __init__(self, world, rig, cfg: Optional[BAConfig] = None):
        self.world = world
        self.cfg = cfg or BAConfig()
        # Already device arrays — avoid a host round trip here.
        self.P_l = rig.left.projection
        self.P_r = rig.right.projection
        self.last_stats = {}

    def optimize(self, start_frame: int, end_frame: int,
                 max_iterations: Optional[int] = None,
                 max_seconds: Optional[float] = None) -> dict:
        fin = self.optimize_async(start_frame, end_frame, max_iterations,
                                  max_seconds)
        return fin() if fin is not None else {}

    def optimize_async(self, start_frame: int, end_frame: int,
                       max_iterations: Optional[int] = None,
                       max_seconds: Optional[float] = None):
        """Build + DISPATCH the solve; return a finish() closure that blocks
        on the single packed readback and applies the writeback.

        JAX dispatch is asynchronous, so between optimize_async() and
        finish() the device crunches the LM schedule while the host does
        other work (the live loop calls finish() at the top of the NEXT
        batch — nothing touches the world in between, so the result is
        bitwise identical to the synchronous call, just off the critical
        path). Returns None when there is nothing to solve."""
        world = self.world
        end_frame = min(end_frame, world.num_frames)
        if end_frame - start_frame < 1:
            return None
        problem = world.ba_problem(start_frame, end_frame)
        n_obs = len(problem["obs_cam"])
        if n_obs == 0:
            return None

        C = len(problem["frame_ids"])
        P_real = len(problem["point_ids"])
        P_pad = _pad_to_fine(P_real)
        O_pad = _pad_to(n_obs)
        # Camera count is ALSO bucketed (half-octave, min 4): the window
        # count used to ride the exact frame range, so the early ramp
        # (C = 2, 3, ..., 2*refine_interval+K) and every loop-closure global
        # solve (C = n at closure time) each compiled a fresh XLA program —
        # the bulk of r3's 61 endurance compiles (r4 directive 1b). Padded
        # cameras are held fixed (cam_mask 0, identity rows) and carry no
        # observations, so the solve is unchanged.
        C_pad = _pad_to_fine(C, mult=4)

        from stereo_orb_slam_tpu.geometry import se3_np

        # Point-sorted layout: contiguous per-point runs make the dense-
        # Schur slot maps monotonic (sorted gathers; schur_dense.group_slots).
        pose6, s_cam, s_point, s_uv, cam_mask = prepare_problem_arrays(
            problem, sort_by_point=True
        )
        if C_pad > C:
            pose6 = np.concatenate(
                [pose6, np.zeros((C_pad - C, 6), np.float32)])
            cam_mask = np.concatenate(
                [cam_mask, np.zeros(C_pad - C, np.float32)])
        points = np.zeros((P_pad, 3), np.float32)
        points[:P_real] = problem["point_xyz"]

        obs_cam = np.zeros(O_pad, np.int32)
        obs_point = np.zeros(O_pad, np.int32)
        obs_uv = np.zeros((O_pad, 4), np.float32)
        obs_w = np.zeros(O_pad, np.float32)
        obs_cam[:n_obs] = s_cam
        obs_point[:n_obs] = s_point
        obs_uv[:n_obs] = s_uv
        obs_w[:n_obs] = 1.0

        point_mask = np.zeros(P_pad, np.float32)
        point_mask[:P_real] = 1.0

        prob = BAProblem(
            pose6=jnp.asarray(pose6),
            points=jnp.asarray(points),
            obs_cam=jnp.asarray(obs_cam),
            obs_point=jnp.asarray(obs_point),
            obs_uv=jnp.asarray(obs_uv),
            obs_weight=jnp.asarray(obs_w),
            cam_mask=jnp.asarray(cam_mask),
            point_mask=jnp.asarray(point_mask),
            P_l=self.P_l, P_r=self.P_r,
        )

        cfg = self.cfg
        # Dense-Schur fast path for windowed problems (see
        # backend/schur_dense.py); matrix-free otherwise. Only the static K
        # bucket (max observations per point, pow2) is chosen on host — the
        # [P,K] slot maps themselves are derived ON DEVICE inside ba_solve
        # (uploading them cost more than the solve on the relay transport).
        dense_K = None
        cam_K = None
        band_bases = None
        band_B = None
        band_Pc = None
        if C_pad <= cfg.dense_schur_max_cams:
            from stereo_orb_slam_tpu.backend.schur_dense import slot_width

            kmax = int(np.bincount(obs_point[:n_obs],
                                   minlength=1).max(initial=2))
            K = 1 << (max(kmax, 2) - 1).bit_length()
            if P_pad * slot_width(K) <= cfg.dense_schur_max_slots:
                dense_K = K
                # Camera-run slot bucket (per-camera twin of K). Gated so a
                # pathological skew (one camera owning most observations)
                # can't blow the [C,Kc,F] gather past ~4x the obs arrays —
                # beyond that the scatter fallback is the better trade.
                kcam = int(np.bincount(obs_cam[:n_obs],
                                       minlength=1).max(initial=2))
                Kc = 1 << (max(kcam, 2) - 1).bit_length()
                if C_pad * Kc <= 4 * O_pad:
                    cam_K = Kc
            if dense_K is not None and cfg.banded_schur:
                from stereo_orb_slam_tpu.backend.schur_dense import band_plan

                plan = band_plan(s_point, s_cam, P_pad, n_obs, C_pad,
                                 K=dense_K, max_width=cfg.banded_max_width)
                if plan is not None:
                    band_bases = jnp.asarray(plan[0])
                    band_B = plan[1]
                    band_Pc = plan[2]

        iters = max_iterations or cfg.max_iterations
        # Entire LM schedule in one device program — a single host sync per
        # solve instead of one per iteration (see ba_solve_impl docstring).
        # EXCEPT for huge matrix-free problems (global BA over thousands of
        # keyframes): a single dispatch running the whole 50-iteration
        # schedule executes for minutes and trips the relay transport's
        # watchdog, killing the worker. Those are chunked: init once, then
        # bounded ba_resume dispatches with a host convergence check in
        # between (one extra sync per chunk — negligible against the
        # multi-second chunks).
        def apply_result(flat) -> dict:
            """Shared writeback: unpack the packed result buffer, convert
            pose6 (world->camera) -> camera-to-world matrices (host math,
            geometry/se3_np.py), and write the world."""
            pose6_new = flat[: C_pad * 6].reshape(C_pad, 6)[:C]
            points_new = flat[C_pad * 6
                              : C_pad * 6 + P_pad * 3].reshape(P_pad, 3)
            n_it, c0, c1 = flat[-3:]
            cam_world_new = se3_np.inverse_np(
                se3_np.pose6_to_matrix_np(pose6_new)
            )
            self.world.ba_writeback(problem, cam_world_new,
                                    points_new[:P_real])
            self.last_stats = {
                "iterations": int(n_it),
                "cost_initial": float(c0),
                "cost_final": float(c1),
                "num_cams": C,
                "num_points": P_real,
                "num_obs": n_obs,
            }
            return self.last_stats

        # Per-call wall cap override (live loop-closure solves pass the
        # reference's 1 s Ceres budget, ref src/params.h:41); falls back to
        # the config default. A cap forces the chunked path even for
        # mid-size problems — a single dispatch cannot be interrupted, so
        # enforceability requires host sync points.
        cap_seconds = (max_seconds if max_seconds is not None
                       else cfg.max_solve_seconds)
        if O_pad >= (1 << 19) or (cap_seconds > 0 and O_pad >= (1 << 16)):
            # Big solves are CHUNKED regardless of path: bounded dispatches
            # stay under the relay watchdog and give the wall cap sync
            # points. The dense machinery (device-derived slot maps +
            # camera-run maps) threads through lm_init/ba_resume as array
            # arguments, so mid-size GLOBAL solves (C <= dense_schur_max_
            # cams) keep the scatter-free MXU formulation — the r4
            # endurance pass-3 stall traced to the matrix-free path's
            # duplicate-index scatter-adds at ~2M observations inside the
            # closure's global BA.
            ds = None
            cam_red0 = None
            if dense_K is not None:
                ds = _build_slots_jit(prob.obs_point, prob.obs_cam,
                                      prob.obs_weight, n_points_pad=P_pad,
                                      K=dense_K)
                if cam_K is not None:
                    cam_red0 = _build_cam_slots_jit(
                        prob.obs_cam, prob.obs_weight, n_cams=C_pad,
                        Kc=cam_K)
            carry0 = lm_init(prob, cfg, dense_slots=ds, cam_red=cam_red0)

            def finish_chunked() -> dict:
                import time as _time

                chunk_max = max(1, (1 << 22) // O_pad)
                t0 = _time.perf_counter()
                carry = carry0
                cost_init = carry.cost
                n_done = 0
                per_iter = None  # measured wall seconds per LM iteration
                while n_done < iters:
                    if cap_seconds > 0:
                        # A dispatch cannot be preempted, so the cap is
                        # enforced by sizing each chunk from the MEASURED
                        # per-iteration wall time (r4's fixed 4-iteration
                        # chunks overshot a 1 s cap 2.4x at 2M observations;
                        # r5 directive 7). First chunk is a 1-iteration
                        # probe that establishes the rate.
                        remaining = cap_seconds - (_time.perf_counter() - t0)
                        if remaining <= 0:
                            # Reference parity: Ceres max_solver_time (1 s,
                            # ref src/params.h:41) returns best-so-far.
                            break
                        k = (1 if per_iter is None
                             else int(max(1, min(chunk_max,
                                                 remaining / per_iter))))
                    else:
                        k = chunk_max
                    k = min(k, iters - n_done)
                    tc = _time.perf_counter()
                    carry, k_run, conv = ba_resume(carry, jnp.int32(k), cfg,
                                                   dense_slots=ds,
                                                   cam_red=cam_red0,
                                                   band_bases=band_bases,
                                                   band_B=band_B,
                                                   band_Pc=band_Pc)
                    ran = int(k_run)  # sync point bounds the dispatch
                    n_done += ran
                    if ran > 0:
                        per_iter = (_time.perf_counter() - tc) / ran
                    if bool(conv):
                        break
                flat = np.asarray(_pack_ba_result(
                    carry.prob.pose6, carry.prob.points, jnp.int32(n_done),
                    cost_init, carry.cost,
                ))
                return apply_result(flat)

            return finish_chunked

        carry, n_iters, cost_init = ba_solve(
            prob, jnp.int32(iters), cfg, dense_K=dense_K, cam_K=cam_K,
            band_bases=band_bases, band_B=band_B, band_Pc=band_Pc,
        )

        # ONE consolidated readback: in the relay's synchronous mode every
        # fetched array pays its own round trip, so pose6/points/scalars are
        # packed into a single buffer on device first. The dispatch above is
        # async — only the np.asarray inside finish() blocks.
        flat_dev = _pack_ba_result(
            carry.prob.pose6, carry.prob.points, n_iters, cost_init,
            carry.cost,
        )

        def finish() -> dict:
            return apply_result(np.asarray(flat_dev))

        return finish
