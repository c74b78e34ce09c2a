"""Distributed pose-graph Gauss-Newton over a device mesh.

Edges sharded across the mesh, vertex state replicated; the per-edge
Hessian/gradient contributions and the two segment-sums inside each CG
matvec psum over ICI. Same math as backend/pose_graph.py
(`gn_step_impl(axis_name=...)`), asserted equal to the single-device solve
in tests/test_dist_pose_graph.py.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from stereo_orb_slam_tpu.backend.pose_graph import (
    PoseGraphProblem,
    gn_step_impl,
    pg_solve_impl,
)
from stereo_orb_slam_tpu.config import PoseGraphConfig
from stereo_orb_slam_tpu.parallel.mesh import OBS_AXIS


def _specs(axis_name: str):
    edge = P(axis_name)
    rep = P()
    return PoseGraphProblem(
        poses=rep, edge_a=edge, edge_b=edge, edge_meas=edge,
        edge_weight=edge, vertex_mask=rep,
    )


def sharded_gn_step(mesh: Mesh, cfg: PoseGraphConfig,
                    axis_name: str = OBS_AXIS):
    specs, rep = _specs(axis_name), P()

    def step(prob):
        return gn_step_impl(prob, cfg, axis_name=axis_name)

    return jax.jit(
        shard_map(
            step, mesh=mesh, in_specs=(specs,),
            out_specs=(specs, rep), check_vma=False,
        )
    )


def sharded_pg_solve(mesh: Mesh, cfg: PoseGraphConfig,
                     axis_name: str = OBS_AXIS):
    """All GN iterations in one sharded dispatch (backend.pose_graph
    .pg_solve_impl under shard_map): (prob) -> (prob, cost0, cost_final)."""
    specs, rep = _specs(axis_name), P()

    def run(prob):
        return pg_solve_impl(prob, cfg, axis_name=axis_name)

    return jax.jit(
        shard_map(
            run, mesh=mesh, in_specs=(specs,),
            out_specs=(specs, rep, rep), check_vma=False,
        )
    )


def solve(poses, edge_a, edge_b, edge_meas, mesh: Mesh,
          cfg: Optional[PoseGraphConfig] = None, fixed_vertex: int = 0):
    """Standalone distributed pose-graph solve.

    poses [N,4,4]; edges as arrays. Pads the edge dimension to a multiple of
    the mesh size. Returns (poses_new [N,4,4], costs list).
    """
    cfg = cfg or PoseGraphConfig()
    n_dev = mesh.devices.size
    E = len(edge_a)
    E_pad = -(-max(E, 1) // n_dev) * n_dev

    ea = np.zeros(E_pad, np.int32)
    eb = np.zeros(E_pad, np.int32)
    em = np.tile(np.eye(4, dtype=np.float32), (E_pad, 1, 1))
    ew = np.zeros(E_pad, np.float32)
    ea[:E] = edge_a
    eb[:E] = edge_b
    em[:E] = edge_meas
    ew[:E] = 1.0

    vmask = np.ones(len(poses), np.float32)
    vmask[fixed_vertex] = 0.0

    prob = PoseGraphProblem(
        poses=jnp.asarray(np.asarray(poses, np.float32)),
        edge_a=jnp.asarray(ea), edge_b=jnp.asarray(eb),
        edge_meas=jnp.asarray(em), edge_weight=jnp.asarray(ew),
        vertex_mask=jnp.asarray(vmask),
    )
    run = sharded_pg_solve(mesh, cfg)
    prob, c0, c_last = run(prob)  # one dispatch, one host sync
    return np.asarray(prob.poses), [float(c0), float(c_last)]
