"""Stage-level roofline profile of the BA LM iteration on TPU.

Times each stage of the dense-Schur LM iteration as an isolated jitted
program with the sync-differencing methodology (see bench.py), estimates
the FLOP count of the dominant contractions, and reports achieved FLOP/s
vs the v5e single-chip peak (197 bf16 / ~49 f32 TFLOP/s MXU) so `bench.py`
can report an honest MFU figure.

Problem size matches bench.bench_ba: C=200 cams, P=20k points, O=120k obs
(the global-BA envelope of ref src/bundle_adjuster.cpp:13-36).

Usage: python benchmarks/ba_profile.py [--C 200 --P 20000 --obs_per_cam 600]
"""

import argparse
import json
import time

import numpy as np

from stereo_orb_slam_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from stereo_orb_slam_tpu.backend import schur_dense  # noqa: E402
from stereo_orb_slam_tpu.backend.ba import (  # noqa: E402
    BAProblem, _damp_blocks, _inv3, _inv6_gj, build_normal_equations,
    lm_init, lm_iteration,
)
from stereo_orb_slam_tpu.config import BAConfig  # noqa: E402


def make_problem(C, P, obs_per_cam, rng):
    fx, cx, cy, b = 718.856, 607.1928, 185.2157, 0.5371657
    P_l = np.array([[fx, 0, cx, 0], [0, fx, cy, 0], [0, 0, 1, 0]], np.float32)
    P_r = P_l.copy()
    P_r[0, 3] = -fx * b
    O = C * obs_per_cam
    pts = np.stack(
        [rng.uniform(-20, 20, P), rng.uniform(-5, 5, P), rng.uniform(5, 60, P)], 1
    ).astype(np.float32)
    pose6 = rng.normal(0, 0.01, (C, 6)).astype(np.float32)
    obs_cam = np.repeat(np.arange(C, dtype=np.int32), obs_per_cam)
    obs_point = rng.integers(0, P, O).astype(np.int32)
    order = np.argsort(obs_point, kind="stable")
    obs_point, obs_cam = obs_point[order], obs_cam[order]
    X = pts[obs_point]

    def proj(Pm):
        Xh = np.concatenate([X, np.ones((O, 1), np.float32)], 1)
        uvw = Xh @ Pm.T
        return uvw[:, :2] / np.maximum(uvw[:, 2:3], 1e-6)

    obs_uv = np.concatenate([proj(P_l), proj(P_r)], 1).astype(np.float32)
    obs_uv += rng.normal(0, 0.5, obs_uv.shape).astype(np.float32)
    prob = BAProblem(
        pose6=jnp.asarray(pose6), points=jnp.asarray(pts),
        obs_cam=jnp.asarray(obs_cam), obs_point=jnp.asarray(obs_point),
        obs_uv=jnp.asarray(obs_uv), obs_weight=jnp.ones(O, jnp.float32),
        cam_mask=jnp.asarray([0.0] + [1.0] * (C - 1), jnp.float32),
        point_mask=jnp.ones(P, jnp.float32),
        P_l=jnp.asarray(P_l), P_r=jnp.asarray(P_r),
    )
    sto, scam, smask, K = schur_dense.group_slots(obs_point, obs_cam, P, O)
    slots = (jnp.asarray(sto), jnp.asarray(scam), jnp.asarray(smask))
    return prob, slots, K


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--C", type=int, default=200)
    ap.add_argument("--P", type=int, default=20000)
    ap.add_argument("--obs_per_cam", type=int, default=600)
    ap.add_argument("--cg_iterations", type=int, default=100)
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    prob, slots, K = make_problem(args.C, args.P, args.obs_per_cam, rng)
    C, P = args.C, args.P
    O = args.C * args.obs_per_cam
    cfg = BAConfig(cg_iterations=args.cg_iterations, function_tolerance=0.0)

    # ---- isolated stage programs ------------------------------------------
    # Slot maps / masks / lam are passed as ARGUMENTS (not closures): closed-
    # over device arrays become HLO constants — long compiles + re-streamed
    # per call on the relay transport (advisor r2, CLAUDE.md rule).
    # Production dense path: camera reductions ride a constant one-hot
    # matmul (backend/ba._seg_sum_cams).
    cam_onehot = jnp.asarray(
        (np.asarray(prob.obs_cam)[None, :] == np.arange(args.C)[:, None]
         ).astype(np.float32))

    @jax.jit
    def stage_build(prob, slots, cam_onehot):
        return build_normal_equations(prob, cfg.huber_delta,
                                      dense_slots=slots,
                                      cam_onehot=cam_onehot)

    H_cc, H_pp, W, b_c, b_p, cost = stage_build(prob, slots, cam_onehot)
    lam = jnp.float32(1e-4)

    @jax.jit
    def stage_damp_inv(H_cc, H_pp, point_mask, cam_mask, lam):
        H_cc_l = _damp_blocks(H_cc, lam)
        H_pp_l = _damp_blocks(H_pp, lam)
        eye3 = jnp.eye(3, dtype=H_pp_l.dtype)
        H_pp_l = jnp.where(point_mask[:, None, None] > 0, H_pp_l,
                           eye3[None])
        Hpp_inv = _inv3(H_pp_l)
        eye6 = jnp.eye(6, dtype=H_cc_l.dtype)
        H_cc_safe = jnp.where(cam_mask[:, None, None] > 0, H_cc_l,
                              eye6[None])
        M_inv = _inv6_gj(H_cc_safe + 1e-8 * eye6[None])
        return Hpp_inv, H_cc_safe, M_inv

    Hpp_inv, H_cc_safe, M_inv = stage_damp_inv(
        H_cc, H_pp, prob.point_mask, prob.cam_mask, lam
    )

    @jax.jit
    def stage_assemble(H_cc_safe, W, Hpp_inv, slots, cam_mask):
        return schur_dense.assemble_schur(
            H_cc_safe, W, Hpp_inv, slots[0], slots[1], slots[2], cam_mask,
            dtype=jnp.bfloat16 if cfg.dense_assemble_bf16 else jnp.float32,
        )

    S = stage_assemble(H_cc_safe, W, Hpp_inv, slots, prob.cam_mask)

    @jax.jit
    def stage_chol(S, b_c, cam_mask):
        return schur_dense.solve_reduced_chol(S, b_c, cam_mask)

    dc = stage_chol(S, b_c, prob.cam_mask)

    @jax.jit
    def stage_lm(carry, slots, cam_onehot):
        return lm_iteration(carry, cfg, slots, cam_onehot=cam_onehot)

    carry = lm_init(prob, cfg, slots, cam_onehot=cam_onehot)
    out = stage_lm(carry, slots, cam_onehot)
    jax.block_until_ready(out[0].prob.pose6)

    # ---- sync-differencing timings ----------------------------------------
    noop = jax.jit(lambda x: x * 1.0)
    zz = jnp.ones((8, 8), jnp.float32)
    _ = np.asarray(noop(zz))

    def tmin(fn, n=None):
        n = n or args.iters
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            r = fn()
            _ = np.asarray(jax.tree.leaves(r)[0]).ravel()[0]
            ts.append(time.perf_counter() - t0)
        return float(np.min(ts[1:]))

    rtt = tmin(lambda: noop(zz), max(8, args.iters))
    t_build = tmin(lambda: stage_build(prob, slots, cam_onehot)) - rtt
    t_damp = tmin(lambda: stage_damp_inv(H_cc, H_pp, prob.point_mask,
                                         prob.cam_mask, lam)) - rtt
    t_assemble = tmin(lambda: stage_assemble(H_cc_safe, W, Hpp_inv, slots,
                                             prob.cam_mask)) - rtt
    t_chol = tmin(lambda: stage_chol(S, b_c, prob.cam_mask)) - rtt
    t_lm = tmin(lambda: stage_lm(carry, slots, cam_onehot)) - rtt

    # ---- FLOP model --------------------------------------------------------
    # assemble_schur: per point-chunk  S += A^T (blockdiag(Hpp_inv) A) with
    # A [3P,6C]: 2*(3P)*(6C)^2 for the big matmul + 2*P*K*C*18 one-hot expand.
    P_pad = slots[0].shape[0]
    flops_assemble = 2 * (3 * P_pad) * (6 * C) ** 2 + 2 * P_pad * K * C * 18
    # Direct Cholesky on S [6C,6C]: ~(6C)^3/3 + 2 triangular solves.
    flops_chol = (6 * C) ** 3 // 3 + 2 * (6 * C) ** 2
    # build: residual+jacobian ~500 flops/obs + block products 369*2/obs
    #        + gather-reduce point sums ~ (9+3)*K flops/point.
    flops_build = O * (500 + 2 * (36 * 4 + 18 * 4 + 24 + 12)) + P_pad * K * 12
    flops_iter = flops_assemble + flops_chol + flops_build

    result = {
        "what": "dense-Schur LM stage profile (sync-differenced device ms)",
        "problem": {"C": C, "P": P, "O": O, "K_slots": K, "P_pad": P_pad,
                    "cg_iterations": args.cg_iterations},
        "rtt_ms": round(rtt * 1e3, 2),
        "stage_ms": {
            "build_normal_equations": round(t_build * 1e3, 2),
            "damp+inverses": round(t_damp * 1e3, 2),
            "assemble_schur": round(t_assemble * 1e3, 2),
            "cholesky_solve": round(t_chol * 1e3, 2),
        },
        "lm_iteration_ms": round(t_lm * 1e3, 2),
        "stage_sum_ms": round(
            (t_build + t_damp + t_assemble + t_chol) * 1e3, 2),
        "flops_per_iter_G": round(flops_iter / 1e9, 1),
        "achieved_tflops": round(flops_iter / max(t_lm, 1e-6) / 1e12, 2),
        "mfu_vs_f32_peak_49T": round(
            flops_iter / max(t_lm, 1e-6) / 49e12, 3
        ),
    }
    print(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
