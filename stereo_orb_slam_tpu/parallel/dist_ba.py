"""Distributed bundle adjustment over a device mesh.

The reference has NO distributed capability (SURVEY.md §0); this implements
the BASELINE.json north-star design: observations sharded across the mesh,
poses/points replicated, and the Schur-complement reduction built from

- LOCAL per-shard work: residual/Jacobian evaluation, W-block products,
  batched 3x3 point marginalization (embarrassingly parallel),
- ONE `psum` per segment-sum to form the reduced camera system and the
  per-point accumulators (rides ICI within a slice),

with the PCG loop running replicated inside `shard_map` (its two
segment-sums per iteration are the only collectives). The math is the SAME
code as backend/ba.py — `lm_step_impl(axis_name=...)` — so single-device and
distributed solves are numerically identical up to reduction order, which
tests/test_dist_ba.py asserts on a virtual 8-device CPU mesh.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from stereo_orb_slam_tpu.backend.ba import (
    BAProblem, LMCarry, ba_solve_impl, lm_step_impl,
)
from stereo_orb_slam_tpu.config import BAConfig
from stereo_orb_slam_tpu.parallel.mesh import OBS_AXIS


def _prob_specs(axis_name: str):
    obs_spec = P(axis_name)
    rep = P()
    return BAProblem(
        pose6=rep, points=rep,
        obs_cam=obs_spec, obs_point=obs_spec, obs_uv=obs_spec,
        obs_weight=obs_spec,
        cam_mask=rep, point_mask=rep, P_l=rep, P_r=rep,
    )


def shard_problem(mesh: Mesh, prob: BAProblem,
                  axis_name: str = OBS_AXIS) -> BAProblem:
    """Explicitly place a BAProblem on the mesh: observation arrays
    partitioned 1/N along the obs axis, pose/point state replicated.
    (jit would reshard lazily anyway; explicit placement makes the layout
    inspectable and keeps the timed region free of host->device copies.)"""
    from jax.sharding import NamedSharding

    specs = _prob_specs(axis_name)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), prob, specs
    )


def sharded_lm_step(mesh: Mesh, cfg: BAConfig, axis_name: str = OBS_AXIS):
    """Build a jitted LM step with observations sharded over `mesh`.

    The returned function has the same signature as backend.ba.lm_step
    minus the cfg argument: (prob, lam) -> (prob', lam', accepted, c0, c1).
    """
    rep = P()
    prob_specs = _prob_specs(axis_name)

    def step(prob, lam):
        return lm_step_impl(prob, lam, cfg, axis_name=axis_name)

    sharded = shard_map(
        step,
        mesh=mesh,
        in_specs=(prob_specs, rep),
        # Outputs: updated replicated state + replicated scalars; the obs
        # arrays pass through still sharded.
        out_specs=(prob_specs, rep, rep, rep, rep),
        check_vma=False,
    )
    return jax.jit(sharded)


def sharded_ba_solve(mesh: Mesh, cfg: BAConfig, axis_name: str = OBS_AXIS):
    """Build a jitted FULL LM solve (init + while_loop + convergence exit,
    backend.ba.ba_solve_impl) under shard_map: one dispatch and one host
    sync per distributed solve instead of one per iteration. Signature:
    (prob, max_iters) -> (carry, iterations_run, cost_initial); the carry's
    W rides sharded over observations, everything else replicated."""
    rep = P()
    prob_specs = _prob_specs(axis_name)
    obs_spec = P(axis_name)
    carry_specs = LMCarry(
        prob=prob_specs, lam=rep, cost=rep,
        H_cc=rep, H_pp=rep, W=obs_spec, b_c=rep, b_p=rep,
    )

    def solve(prob, max_iters):
        return ba_solve_impl(prob, max_iters, cfg, axis_name=axis_name)

    sharded = shard_map(
        solve,
        mesh=mesh,
        in_specs=(prob_specs, rep),
        out_specs=(carry_specs, rep, rep),
        check_vma=False,
    )
    return jax.jit(sharded)


class DistributedBundleAdjuster:
    """Drop-in BA driver that runs LM steps under shard_map.

    scheme="point_aligned" (default): points + their whole observation runs
    are partitioned across the mesh; point-side work is 1/N per device and
    collectives carry only camera-sized tensors (see build_point_aligned).
    scheme="obs": the legacy layout — observations sharded arbitrarily,
    point state replicated — kept for problems whose observations cannot be
    point-sorted.
    """

    def __init__(self, world, rig, mesh: Mesh, cfg: Optional[BAConfig] = None,
                 scheme: str = "point_aligned"):
        from stereo_orb_slam_tpu.backend.ba import BundleAdjuster

        assert scheme in ("point_aligned", "obs"), scheme
        self.mesh = mesh
        self.scheme = scheme
        self.cfg = cfg or BAConfig()
        self._single = BundleAdjuster(world, rig, self.cfg)
        self.world = world
        if scheme == "obs":
            self._solve = sharded_ba_solve(mesh, self.cfg)
        else:
            # Built lazily per dense_K bucket (the distributed dense-Schur
            # fast path for windowed/mid-size C; see
            # sharded_ba_solve_point_aligned) and cached so repeat solves
            # reuse the jitted wrapper.
            self._pa_solves = {}
            self._solve = None
        self.last_stats = {}

    def _pa_solve(self, dense_K):
        if dense_K not in self._pa_solves:
            self._pa_solves[dense_K] = sharded_ba_solve_point_aligned(
                self.mesh, self.cfg, dense_K=dense_K)
        return self._pa_solves[dense_K]

    def optimize(self, start_frame: int, end_frame: int,
                 max_iterations: Optional[int] = None) -> dict:
        """Same orchestration as BundleAdjuster.optimize but with the jitted
        step replaced by the sharded one."""
        if self.scheme == "point_aligned":
            return self._optimize_point_aligned(start_frame, end_frame,
                                                max_iterations)
        import stereo_orb_slam_tpu.backend.ba as ba_mod

        # Reuse the single-device driver with our step function patched in.
        single = self._single
        n_dev = self.mesh.devices.size

        world = self.world
        end_frame = min(end_frame, world.num_frames)
        if end_frame - start_frame < 1:
            return {}
        problem = world.ba_problem(start_frame, end_frame)
        n_obs = len(problem["obs_cam"])
        if n_obs == 0:
            return {}

        from stereo_orb_slam_tpu.backend.ba import prepare_problem_arrays

        C = len(problem["frame_ids"])
        P_real = len(problem["point_ids"])
        P_pad = ba_mod._pad_to(P_real)
        O_pad = ba_mod._pad_to(n_obs, mult=256 * n_dev)

        pose6, s_cam, s_point, s_uv, cam_mask = prepare_problem_arrays(
            problem, sort_by_point=False
        )
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
            pose6=jnp.asarray(pose6), points=jnp.asarray(points),
            obs_cam=jnp.asarray(obs_cam), obs_point=jnp.asarray(obs_point),
            obs_uv=jnp.asarray(obs_uv), obs_weight=jnp.asarray(obs_w),
            cam_mask=jnp.asarray(cam_mask), point_mask=jnp.asarray(point_mask),
            P_l=single.P_l, P_r=single.P_r,
        )

        cfg = self.cfg
        iters = max_iterations or cfg.max_iterations
        # One sharded dispatch for the whole LM schedule (host syncs once;
        # see backend.ba.ba_solve_impl).
        carry, n_iters, cost_init = self._solve(prob, jnp.int32(iters))

        from stereo_orb_slam_tpu.geometry import se3_np

        cam_world_new = se3_np.inverse_np(
            se3_np.pose6_to_matrix_np(np.asarray(carry.prob.pose6))
        )
        world.ba_writeback(
            problem, cam_world_new, np.asarray(carry.prob.points[:P_real])
        )
        self.last_stats = {
            "iterations": int(n_iters),
            "cost_initial": float(cost_init),
            "cost_final": float(carry.cost),
            "num_cams": C,
            "num_points": P_real,
            "num_obs": n_obs,
            "num_devices": n_dev,
        }
        return self.last_stats

    def _optimize_point_aligned(self, start_frame: int, end_frame: int,
                                max_iterations: Optional[int] = None) -> dict:
        world = self.world
        end_frame = min(end_frame, world.num_frames)
        if end_frame - start_frame < 1:
            return {}
        problem = world.ba_problem(start_frame, end_frame)
        n_obs = len(problem["obs_cam"])
        if n_obs == 0:
            return {}
        from stereo_orb_slam_tpu.backend.ba import prepare_problem_arrays

        n_dev = self.mesh.devices.size
        C = len(problem["frame_ids"])
        P_real = len(problem["point_ids"])
        # Point-sorted observation layout (the point-aligned contract).
        pose6, obs_cam, obs_point, obs_uv, cam_mask = prepare_problem_arrays(
            problem, sort_by_point=True
        )
        prob, meta = build_point_aligned(
            pose6, problem["point_xyz"], obs_cam,
            obs_point, obs_uv, cam_mask,
            np.asarray(self._single.P_l), np.asarray(self._single.P_r),
            n_dev,
        )
        prob = place_point_aligned(self.mesh, prob)
        cfg = self.cfg
        iters = max_iterations or cfg.max_iterations
        # Dense-Schur bucket when the camera system is small enough for the
        # [6C,6C] one-psum reduction (same gate as the single-device dense
        # path); larger problems stay matrix-free (dense_K None).
        dense_K = None
        if C <= cfg.dense_schur_max_cams:
            from stereo_orb_slam_tpu.backend.schur_dense import slot_width

            kmax = max(int(np.bincount(obs_point).max(initial=2)), 2)
            K = 1 << (kmax - 1).bit_length()
            if meta["P_s"] * slot_width(K) <= cfg.dense_schur_max_slots:
                dense_K = K
        carry, n_iters, cost_init = self._pa_solve(dense_K)(
            prob, jnp.int32(iters))

        from stereo_orb_slam_tpu.geometry import se3_np

        cam_world_new = se3_np.inverse_np(
            se3_np.pose6_to_matrix_np(np.asarray(carry.prob.pose6))
        )
        pts = np.asarray(carry.prob.points).reshape(n_dev, meta["P_s"], 3)
        bounds = meta["bounds"]
        pts_real = np.concatenate(
            [pts[d, : bounds[d + 1] - bounds[d]] for d in range(n_dev)]
        ) if P_real else np.zeros((0, 3), np.float32)
        world.ba_writeback(problem, cam_world_new, pts_real)
        self.last_stats = {
            "iterations": int(n_iters),
            "cost_initial": float(cost_init),
            "cost_final": float(carry.cost),
            "num_cams": C,
            "num_points": P_real,
            "num_obs": n_obs,
            "num_devices": n_dev,
            "scheme": "point_aligned",
        }
        return self.last_stats


# -------------------------------------------------- point-aligned sharding
def partition_points_balanced(obs_point_sorted, P_real: int, n_dev: int):
    """Contiguous point ranges with ~balanced observation counts.

    Returns boundaries [n_dev + 1]: device d owns points
    [bounds[d], bounds[d+1]) and, because observations are point-sorted,
    a CONTIGUOUS run of observations.
    """
    counts = np.bincount(np.asarray(obs_point_sorted), minlength=P_real)
    cum = np.cumsum(counts)
    total = int(cum[-1]) if len(cum) else 0
    bounds = [0]
    for k in range(1, n_dev):
        bounds.append(int(np.searchsorted(cum, k * total / n_dev)))
    bounds.append(P_real)
    return bounds


def build_point_aligned(pose6, points, obs_cam, obs_point, obs_uv,
                        cam_mask, P_l, P_r, n_dev: int,
                        pad_mult: int = 8):
    """Host-side construction of the POINT-ALIGNED distributed problem.

    The legacy obs-sharded layout replicates every point-side array and
    reduction on all devices — at P=20k that duplicated work capped
    2-process compute-time efficiency at ~65% (SCALING_r03). Here points
    are partitioned into contiguous ranges (balanced by observation count)
    and each point's WHOLE observation run lands on one device, so:

      - H_pp / Hpp_inv / b_p / dp and every per-point CG quantity are
        device-local (1/N the work, no psum),
      - the only collectives are camera-sized: cam_rows [C,42], rhs [C,6],
        one [C,6] psum per CG iteration, and the scalar cost — O(C) bytes
        per step, independent of both observations and points.

    Inputs are UNPADDED host arrays with obs sorted by point id.
    Returns (BAProblem with [n_dev * S] leading-axis layouts, meta) where
    meta carries the per-device (point_lo, point_hi) ranges and pad sizes
    for the writeback slicing.
    """
    P_real = len(points)
    O_real = len(obs_cam)
    bounds = partition_points_balanced(obs_point, P_real, n_dev)
    obs_starts = np.searchsorted(np.asarray(obs_point),
                                 np.asarray(bounds[:-1]))
    obs_ends = np.concatenate([obs_starts[1:], [O_real]])

    P_s = max(int(np.max(np.diff(bounds))), 1)
    P_s = -(-P_s // pad_mult) * pad_mult
    O_s = max(int(np.max(obs_ends - obs_starts)), 1)
    O_s = -(-O_s // pad_mult) * pad_mult

    pts = np.zeros((n_dev, P_s, 3), np.float32)
    pmask = np.zeros((n_dev, P_s), np.float32)
    oc = np.zeros((n_dev, O_s), np.int32)
    op = np.zeros((n_dev, O_s), np.int32)
    ouv = np.zeros((n_dev, O_s, 4), np.float32)
    ow = np.zeros((n_dev, O_s), np.float32)
    for d in range(n_dev):
        lo, hi = bounds[d], bounds[d + 1]
        npts = hi - lo
        pts[d, :npts] = points[lo:hi]
        pmask[d, :npts] = 1.0
        s, e = obs_starts[d], obs_ends[d]
        k = e - s
        oc[d, :k] = obs_cam[s:e]
        op[d, :k] = obs_point[s:e] - lo     # LOCAL point indices
        ouv[d, :k] = obs_uv[s:e]
        ow[d, :k] = 1.0

    prob = BAProblem(
        pose6=jnp.asarray(pose6),
        points=jnp.asarray(pts.reshape(-1, 3)),
        obs_cam=jnp.asarray(oc.reshape(-1)),
        obs_point=jnp.asarray(op.reshape(-1)),
        obs_uv=jnp.asarray(ouv.reshape(-1, 4)),
        obs_weight=jnp.asarray(ow.reshape(-1)),
        cam_mask=jnp.asarray(cam_mask),
        point_mask=jnp.asarray(pmask.reshape(-1)),
        P_l=jnp.asarray(P_l), P_r=jnp.asarray(P_r),
    )
    meta = {"bounds": bounds, "P_s": P_s, "O_s": O_s, "n_dev": n_dev}
    return prob, meta


def _pa_prob_specs(axis_name: str):
    sh = P(axis_name)
    rep = P()
    return BAProblem(
        pose6=rep, points=sh,
        obs_cam=sh, obs_point=sh, obs_uv=sh, obs_weight=sh,
        cam_mask=rep, point_mask=sh, P_l=rep, P_r=rep,
    )


def place_point_aligned(mesh: Mesh, prob: BAProblem,
                        axis_name: str = OBS_AXIS) -> BAProblem:
    """Explicitly place a point-aligned problem on the mesh."""
    from jax.sharding import NamedSharding

    specs = _pa_prob_specs(axis_name)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), prob, specs
    )


def sharded_ba_solve_point_aligned(mesh: Mesh, cfg: BAConfig,
                                   axis_name: str = OBS_AXIS,
                                   dense_K=None):
    """Full LM solve over a point-aligned problem: point state sharded,
    camera state replicated, collectives O(C) per step.

    `dense_K` (static, pow2 >= max observations per point on any shard)
    switches the reduced-camera solve to the DISTRIBUTED DENSE SCHUR:
    every device assembles its local point shard's S contribution, one
    [6C,6C] psum, replicated Cholesky — ~3 latency-bound collectives per
    LM step instead of one per CG iteration. This is what lifts 2-process
    compute-time efficiency at windowed/mid-size problems (C <= ~512),
    where per-collective latency, not bytes, dominates (SCALING_r03 showed
    0.63 at the yardstick with ~29 psums/step). Larger C stays matrix-free
    (dense_K=None)."""
    rep = P()
    sh = P(axis_name)
    prob_specs = _pa_prob_specs(axis_name)
    carry_specs = LMCarry(
        prob=prob_specs, lam=rep, cost=rep,
        H_cc=rep, H_pp=sh, W=sh, b_c=rep, b_p=sh,
        # Slot-form W rides sharded over points on the dense path; on the
        # matrix-free path (dense_K None) the carry's Wg is None and the
        # spec must be the matching empty subtree.
        Wg=sh if dense_K is not None else None,
    )

    def solve(prob, max_iters):
        return ba_solve_impl(prob, max_iters, cfg, axis_name=axis_name,
                             point_sharded=True, dense_K=dense_K)

    sharded = shard_map(
        solve,
        mesh=mesh,
        in_specs=(prob_specs, rep),
        out_specs=(carry_specs, rep, rep),
        check_vma=False,
    )
    return jax.jit(sharded)


def sharded_lm_step_point_aligned(mesh: Mesh, cfg: BAConfig,
                                  axis_name: str = OBS_AXIS,
                                  dense_K=None):
    """One LM step over a point-aligned problem (scaling harnesses).
    `dense_K`: see sharded_ba_solve_point_aligned."""
    from stereo_orb_slam_tpu.backend.ba import build_slots_device

    rep = P()
    prob_specs = _pa_prob_specs(axis_name)

    def step(prob, lam):
        ds = (build_slots_device(prob.obs_point, prob.obs_cam,
                                 prob.obs_weight, prob.points.shape[0],
                                 dense_K)
              if dense_K is not None else None)
        return lm_step_impl(prob, lam, cfg, axis_name=axis_name,
                            point_sharded=True, dense_slots=ds)

    sharded = shard_map(
        step,
        mesh=mesh,
        in_specs=(prob_specs, rep),
        out_specs=(prob_specs, rep, rep, rep, rep),
        check_vma=False,
    )
    return jax.jit(sharded)
