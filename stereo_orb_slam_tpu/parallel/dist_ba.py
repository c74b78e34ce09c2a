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

from stereo_orb_slam_tpu.backend.ba import BAProblem, lm_step_impl
from stereo_orb_slam_tpu.config import BAConfig
from stereo_orb_slam_tpu.parallel.mesh import OBS_AXIS


def sharded_lm_step(mesh: Mesh, cfg: BAConfig, axis_name: str = OBS_AXIS):
    """Build a jitted LM step with observations sharded over `mesh`.

    The returned function has the same signature as backend.ba.lm_step
    minus the cfg argument: (prob, lam) -> (prob', lam', accepted, c0, c1).
    """
    obs_spec = P(axis_name)
    rep = P()

    prob_specs = BAProblem(
        pose6=rep, points=rep,
        obs_cam=obs_spec, obs_point=obs_spec, obs_uv=obs_spec,
        obs_weight=obs_spec,
        cam_mask=rep, point_mask=rep, P_l=rep, P_r=rep,
    )

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


class DistributedBundleAdjuster:
    """Drop-in BA driver that runs LM steps under shard_map.

    Pads the observation dimension to a multiple of the mesh size so the
    shard split is exact.
    """

    def __init__(self, world, rig, mesh: Mesh, cfg: Optional[BAConfig] = None):
        from stereo_orb_slam_tpu.backend.ba import BundleAdjuster

        self.mesh = mesh
        self.cfg = cfg or BAConfig()
        self._single = BundleAdjuster(world, rig, self.cfg)
        self.world = world
        self._step = sharded_lm_step(mesh, self.cfg)
        self.last_stats = {}

    def optimize(self, start_frame: int, end_frame: int,
                 max_iterations: Optional[int] = None) -> dict:
        """Same orchestration as BundleAdjuster.optimize but with the jitted
        step replaced by the sharded one."""
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

        from stereo_orb_slam_tpu.geometry import se3

        C = len(problem["frame_ids"])
        P_real = len(problem["point_ids"])
        P_pad = ba_mod._pad_to(P_real)
        O_pad = ba_mod._pad_to(n_obs, mult=256 * n_dev)

        pose6 = np.asarray(
            se3.matrix_to_pose6(se3.inverse(jnp.asarray(problem["cam_world"])))
        )
        points = np.zeros((P_pad, 3), np.float32)
        points[:P_real] = problem["point_xyz"]
        obs_cam = np.zeros(O_pad, np.int32)
        obs_point = np.zeros(O_pad, np.int32)
        obs_uv = np.zeros((O_pad, 4), np.float32)
        obs_w = np.zeros(O_pad, np.float32)
        obs_cam[:n_obs] = problem["obs_cam"]
        obs_point[:n_obs] = problem["obs_point"]
        obs_uv[:n_obs] = problem["obs_uv"]
        obs_w[:n_obs] = 1.0
        cam_mask = np.ones(C, np.float32)
        cam_mask[0] = 0.0
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
        lam = jnp.float32(cfg.lm_lambda_init)
        cost_first = cost_last = None
        it = 0
        for it in range(iters):
            prob, lam, accepted, c0, c1 = self._step(prob, lam)
            c0f, c1f = float(c0), float(c1)
            if cost_first is None:
                cost_first = c0f
            cost_last = min(c0f, c1f) if bool(accepted) else c0f
            if bool(accepted) and c0f > 0 and (c0f - c1f) < cfg.function_tolerance * c0f:
                break

        cam_world_new = np.asarray(se3.inverse(se3.pose6_to_matrix(prob.pose6)))
        world.ba_writeback(problem, cam_world_new, np.asarray(prob.points[:P_real]))
        self.last_stats = {
            "iterations": it + 1,
            "cost_initial": cost_first,
            "cost_final": cost_last,
            "num_cams": C,
            "num_points": P_real,
            "num_obs": n_obs,
            "num_devices": n_dev,
        }
        return self.last_stats
