"""SE(3) pose-graph optimization (Gauss-Newton, Huber, gauge-fixed).

Replaces the reference's g2o pipeline (ref `src/pose_graph_optimizer.cpp`):
VertexSE3 per frame, EdgeSE3 for the odometry chain (measurement = stored
relative pose, ref :126-172) and for loop closures (measurement from
descriptor re-matching + RANSAC, ref :175-217), information matrix
I6 with the translation block scaled to 0.01 (ref :23-26), Huber kernel,
frame 0 / gauge vertex fixed (ref :61-65,119-121), 10 iterations (ref :69).

TPU-native formulation mirrors backend/ba.py: per-edge residuals
r = log( Z^-1 T_a^-1 T_b ) with local right-increment Jacobians from
`jax.jacfwd` (vmapped over edges), normal equations assembled with
segment-sums, solved matrix-free by block-Jacobi PCG. The graph Hessian is
never materialized, so the solve scales to thousands of keyframes and
shards across devices the same way the BA reduced system does.

Error vector ordering is [translation, rotation] to match how the g2o
information matrix is indexed in the reference.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from stereo_orb_slam_tpu.config import PoseGraphConfig
from stereo_orb_slam_tpu.geometry import se3


class PoseGraphProblem(NamedTuple):
    poses: jnp.ndarray       # [N,4,4] global poses (camera-to-world)
    edge_a: jnp.ndarray      # [E] int32
    edge_b: jnp.ndarray      # [E] int32
    edge_meas: jnp.ndarray   # [E,4,4] measurement Z: expected T_a^-1 @ T_b
    edge_weight: jnp.ndarray  # [E] 1.0 real / 0.0 padding
    vertex_mask: jnp.ndarray  # [N] 1.0 free / 0.0 fixed (gauge)


def edge_residual(Ta, Tb, Z, da, db):
    """Whiten-ready 6-residual of one edge with local increments applied.

    r = log( Z^-1 (Ta e^da)^-1 (Tb e^db) ), reordered to [trans, rot].
    """
    Ta_i = Ta @ se3.se3_exp(da)
    Tb_i = Tb @ se3.se3_exp(db)
    diff = se3.inverse(Z) @ (se3.inverse(Ta_i) @ Tb_i)
    xi = se3.se3_log(diff)  # [w, v]
    return jnp.concatenate([xi[3:], xi[:3]])  # -> [v, w]


def _res_at_zero(Ta, Tb, Z):
    z = jnp.zeros(6, Ta.dtype)
    return edge_residual(Ta, Tb, Z, z, z)


_jac_edge = jax.jacfwd(edge_residual, argnums=(3, 4))


def edge_terms(poses, edge_a, edge_b, edge_meas, edge_weight, info_sqrt,
               huber_delta: float):
    """Whitened residuals + Jacobians for all edges.

    info_sqrt: [6] sqrt of the diagonal information ([trans x3, rot x3]).
    Returns (r [E,6], J_a [E,6,6], J_b [E,6,6], cost).
    """
    Ta = poses[edge_a]
    Tb = poses[edge_b]
    r = jax.vmap(_res_at_zero)(Ta, Tb, edge_meas)
    z = jnp.zeros((edge_a.shape[0], 6), poses.dtype)
    J_a, J_b = jax.vmap(_jac_edge)(Ta, Tb, edge_meas, z, z)

    r = r * info_sqrt[None, :]
    J_a = J_a * info_sqrt[None, :, None]
    J_b = J_b * info_sqrt[None, :, None]

    s = jnp.sum(r * r, axis=-1)
    d2 = huber_delta * huber_delta
    sqrt_s = jnp.sqrt(jnp.maximum(s, 1e-18))
    hw = jnp.where(s <= d2, 1.0, huber_delta / sqrt_s)
    rho = jnp.where(s <= d2, s, 2.0 * huber_delta * sqrt_s - d2)
    cost = 0.5 * jnp.sum(rho * edge_weight)

    wscale = (jnp.sqrt(hw) * edge_weight)[:, None]
    return r * wscale, J_a * wscale[..., None], J_b * wscale[..., None], cost


def _seg_sum(x, ids, num, axis_name=None):
    out = jax.ops.segment_sum(x, ids, num_segments=num)
    if axis_name is not None:
        out = jax.lax.psum(out, axis_name)
    return out


def gn_step_impl(prob: PoseGraphProblem, cfg: PoseGraphConfig, axis_name=None):
    """One damped Gauss-Newton iteration over the whole graph.

    With `axis_name` set this runs inside shard_map with the edge arrays
    sharded across the mesh and the vertex state replicated — per-edge
    Hessian contributions reduce over ICI exactly like the distributed BA
    camera system (SURVEY.md §5.8)."""
    info_sqrt = jnp.asarray(
        [np.sqrt(cfg.info_translation)] * 3 + [np.sqrt(cfg.info_rotation)] * 3,
        prob.poses.dtype,
    )
    r, J_a, J_b, cost = edge_terms(
        prob.poses, prob.edge_a, prob.edge_b, prob.edge_meas,
        prob.edge_weight, info_sqrt, cfg.huber_delta,
    )
    N = prob.poses.shape[0]

    # Gradient: b = -(J^T r) accumulated per vertex.
    g_a = jnp.einsum("eki,ek->ei", J_a, r)
    g_b = jnp.einsum("eki,ek->ei", J_b, r)
    b = -(_seg_sum(g_a, prob.edge_a, N, axis_name)
          + _seg_sum(g_b, prob.edge_b, N, axis_name))
    b = b * prob.vertex_mask[:, None]

    # Block-diagonal of H for the Jacobi preconditioner.
    H_aa = jnp.einsum("eki,ekj->eij", J_a, J_a)
    H_bb = jnp.einsum("eki,ekj->eij", J_b, J_b)
    diag = (_seg_sum(H_aa, prob.edge_a, N, axis_name)
            + _seg_sum(H_bb, prob.edge_b, N, axis_name))
    eye6 = jnp.eye(6, dtype=diag.dtype)
    diag = diag + cfg.damping * eye6[None]
    diag = jnp.where(prob.vertex_mask[:, None, None] > 0, diag, eye6[None])
    from stereo_orb_slam_tpu.backend.ba import _inv6_gj
    M_inv = _inv6_gj(diag)

    def matvec(x):
        xm = x * prob.vertex_mask[:, None]
        y = (
            jnp.einsum("eij,ej->ei", J_a, xm[prob.edge_a])
            + jnp.einsum("eij,ej->ei", J_b, xm[prob.edge_b])
        )  # [E,6] = J_e @ x
        out = (
            _seg_sum(jnp.einsum("eki,ek->ei", J_a, y), prob.edge_a, N, axis_name)
            + _seg_sum(jnp.einsum("eki,ek->ei", J_b, y), prob.edge_b, N, axis_name)
        )
        out = out + cfg.damping * xm
        return out * prob.vertex_mask[:, None] + x * (1.0 - prob.vertex_mask[:, None])

    def precond_cg(bvec):
        def precond(rv):
            return jnp.einsum("nij,nj->ni", M_inv, rv)

        x0 = jnp.zeros_like(bvec)
        r0 = bvec
        z0 = precond(r0)
        p0 = z0
        rz0 = jnp.sum(r0 * z0)
        bn = jnp.sqrt(jnp.sum(bvec * bvec))

        def body(state):
            i, x, rv, p, rz = state
            Ap = matvec(p)
            alpha = rz / jnp.maximum(jnp.sum(p * Ap), 1e-30)
            x = x + alpha * p
            rv = rv - alpha * Ap
            zv = precond(rv)
            rz_new = jnp.sum(rv * zv)
            beta = rz_new / jnp.maximum(rz, 1e-30)
            return i + 1, x, rv, zv + beta * p, rz_new

        def cond(state):
            i, x, rv, p, rz = state
            return (i < cfg.cg_iterations) & (
                jnp.sqrt(jnp.sum(rv * rv)) > cfg.cg_tol * bn
            )

        _, x, _, _, _ = jax.lax.while_loop(cond, body, (0, x0, r0, p0, rz0))
        return x

    if axis_name is not None:
        cost = jax.lax.psum(cost, axis_name)
    delta = precond_cg(b) * prob.vertex_mask[:, None]
    poses_new = se3.normalize_pose(prob.poses @ se3.se3_exp(delta))
    return prob._replace(poses=poses_new), cost


gn_step = jax.jit(gn_step_impl, static_argnames=("cfg", "axis_name"))


def pg_solve_impl(prob: PoseGraphProblem, cfg: PoseGraphConfig,
                  axis_name=None):
    """All `cfg.iterations` GN iterations in ONE device program (the
    reference runs a fixed 10 g2o iterations with no convergence exit,
    ref pose_graph_optimizer.cpp:68-69, so a `lax.scan` suffices). One host
    sync per pose-graph solve instead of one per iteration — the same
    transport-latency argument as backend.ba.ba_solve_impl.

    Returns (final problem, cost_initial, cost_final)."""

    def body(p, _):
        p_new, c = gn_step_impl(p, cfg, axis_name)
        return p_new, c

    prob_f, costs = jax.lax.scan(body, prob, None, length=cfg.iterations)
    return prob_f, costs[0], costs[-1]


pg_solve = jax.jit(pg_solve_impl, static_argnames=("cfg", "axis_name"))


class PoseGraphOptimizer:
    """Host orchestration over the WorldMap.

    Design deviation from the reference: the reference EXTENDS a persistent
    g2o graph incrementally (`m_last_id`, ref pose_graph_optimizer.cpp:56-59)
    because re-adding vertices/edges to g2o is expensive. Here the graph is
    stateless array data rebuilt from the WorldMap each call — building the
    edge arrays is O(N) numpy and the solve itself is the dominant cost, so
    the incremental bookkeeping buys nothing and full rebuild is simpler and
    equivalent (all committed loop edges are retained in `committed_edges`
    and re-used... pending edges are consumed exactly once, matching the
    reference's clear() at ref :216).
    """

    def __init__(self, world, cfg: Optional[PoseGraphConfig] = None,
                 bundle_adjuster=None, loop_matcher=None):
        self.world = world
        self.cfg = cfg or PoseGraphConfig()
        self.ba = bundle_adjuster
        self.loop_matcher = loop_matcher  # callable (a, b) -> (Z 4x4, ok)
        self.loop_edges: list = []        # pending (a, b) pairs
        self.committed_edges: list = []   # all (a, b) ever optimized (for PLY)
        self.last_stats = {}
        # Wall seconds of each LIVE (loop-exit) optimize() call — the
        # closure stall the endurance harness reports per episode — plus
        # the per-phase split (edge measure / solve / global BA).
        self.live_stall_log: list = []
        self.live_stall_splits: list = []
        # Finisher of a live closure's deferred polish BA (collected by
        # SlamSystem at the next batch boundary; see optimize()).
        self.deferred_ba_finish = None
        self._last_polish_frame = None
        # Called before any solve: the live loop registers its pending
        # (pipelined) BA finisher here so a loop-triggered optimization
        # always sees the refined map first (SlamSystem._finish_pending_ba).
        self.pre_optimize_hook = None

    def add_loop_edge(self, a: int, b: int):
        self.loop_edges.append((int(a), int(b)))

    def optimize(self, run_global_ba: bool = True, live: bool = False,
                 ba_max_seconds=None) -> dict:
        """`live=True` marks a mid-run (loop-exit) solve on the live loop's
        critical path (ref loop_detector.cpp:146): its global BA is capped
        at cfg.live_ba_max_seconds (Ceres max_solver_time parity, ref
        src/params.h:41) and the whole stall is logged to live_stall_log.
        `ba_max_seconds` caps the NON-live global BA instead (the finish
        budget plumbing, r5 directive 8); None = BAConfig default."""
        import time as _time

        t_start = _time.perf_counter()
        if self.pre_optimize_hook is not None:
            self.pre_optimize_hook()
        world = self.world
        n = world.num_frames
        if n < 2:
            return {}

        end_id = n - 1
        # Odometry measurements for frames [1, end_id] from stored rel poses
        # (ref :126-172).
        edge_a = list(range(0, end_id))
        edge_b = list(range(1, end_id + 1))
        meas = [world.pose_rel[i] for i in range(1, end_id + 1)]
        weights = [1.0] * len(edge_a)

        # Loop-closure edges: re-match features, RANSAC a relative transform
        # (ref :175-217). Z satisfies T_dst^-1 T_src = Z for edge
        # (a=dst, b=src). All pending edges are measured in ONE device
        # program + one readback when the matcher supports it (.batch,
        # apps/slam.make_loop_matcher) — O(1) device interactions in edge
        # count instead of the reference's per-edge MatchPoints calls.
        n_loop = 0
        t_match = _time.perf_counter()
        if (live and self.cfg.live_max_edges > 0
                and len(self.loop_edges) > self.cfg.live_max_edges):
            # Bound the per-closure measurement cost (cfg.live_max_edges):
            # keep the most recent candidates — a sustained revisit queues
            # one near-duplicate candidate per frame. The older candidates
            # are DISCARDED, not deferred: they never reach finish() (their
            # near-duplicates in the kept tail carry the same constraint).
            self.loop_edges = self.loop_edges[-self.cfg.live_max_edges:]
        if self.loop_matcher is not None and self.loop_edges:
            if hasattr(self.loop_matcher, "batch"):
                measured = self.loop_matcher.batch(self.loop_edges)
            else:
                measured = [self.loop_matcher(s, d)
                            for (s, d) in self.loop_edges]
            for (src, dst), (Z, ok) in zip(self.loop_edges, measured):
                if not ok:
                    continue
                edge_a.append(dst)
                edge_b.append(src)
                meas.append(np.asarray(Z, np.float32))
                weights.append(1.0)
                self.committed_edges.append((src, dst))
                n_loop += 1
        self.loop_edges.clear()  # consumed (ref :216)

        E = len(edge_a)
        E_pad = max(8, 1 << (E - 1).bit_length())
        ea = np.zeros(E_pad, np.int32)
        eb = np.zeros(E_pad, np.int32)
        em = np.tile(np.eye(4, dtype=np.float32), (E_pad, 1, 1))
        ew = np.zeros(E_pad, np.float32)
        ea[:E] = edge_a
        eb[:E] = edge_b
        em[:E] = np.stack(meas)
        ew[:E] = weights

        # Vertex count is bucketed (pow2, min 8): the graph grows by one
        # frame per closure-time solve, and an exact-sized program would
        # recompile at every loop exit over a long drive (r4 directive 1b).
        # Padded vertices are identity poses held fixed with no edges.
        N_pad = max(8, 1 << (n - 1).bit_length())
        poses = np.tile(np.eye(4, dtype=np.float32), (N_pad, 1, 1))
        poses[:n] = world.pose_global[:n]
        vmask = np.zeros(N_pad, np.float32)
        vmask[1:n] = 1.0  # gauge fix (ref :61-65, frame 0 fixed at :119-121)

        prob = PoseGraphProblem(
            poses=jnp.asarray(poses),
            edge_a=jnp.asarray(ea),
            edge_b=jnp.asarray(eb),
            edge_meas=jnp.asarray(em),
            edge_weight=jnp.asarray(ew),
            vertex_mask=jnp.asarray(vmask),
        )

        t_match = _time.perf_counter() - t_match

        # All GN iterations in one dispatch (see pg_solve_impl).
        t_solve = _time.perf_counter()
        prob, c0, c_last = pg_solve(prob, self.cfg)
        cost0, cost = float(c0), float(c_last)

        new_poses = np.asarray(prob.poses)[:n]
        t_solve = _time.perf_counter() - t_solve
        world.set_global_poses(np.arange(n, dtype=np.int32), new_poses)
        # Tail propagation is a no-op here (all frames optimized), but kept
        # for parity with ref :89-92 when optimizing a prefix.
        world.propagate_tail(n)

        stats = {
            "num_vertices": n,
            "num_edges": E,
            "num_loop_edges": n_loop,
            "cost_initial": cost0,
            "cost_final": cost,
        }

        # Global BA after the pose-graph solve (ref :95). Live solves are
        # wall-capped AND window-bounded (cfg.live_ba_window_frames): the
        # pose graph has already applied the closure correction; the BA
        # here is polish, and the reference's own 1 s Ceres cap buys ~one
        # LM iteration at deep-sequence scale anyway.
        t_ba = _time.perf_counter()
        if run_global_ba and self.ba is not None and n >= 2:
            lo = 0
            if live and self.cfg.live_ba_window_frames > 0:
                lo = max(0, n - 1 - self.cfg.live_ba_window_frames)
            if live:
                # DEFER the polish ENTIRELY (dispatch included): the pose
                # graph has already applied the closure correction
                # synchronously; the wall-capped BA here is refinement, so
                # a thunk is handed to SlamSystem and runs at the next
                # batch boundary — nothing touches the world in between,
                # so the solve sees the identical state. r5: the
                # synchronous polish held the live loop for its full
                # budget PLUS closure-bucket program loads (3.3-3.6 s
                # stalls against the 1.5 s target), and even the async
                # DISPATCH (problem build + program loads) cost ~1.4 s in
                # the stall; the reference BLOCKS its loop for an uncapped
                # global Ceres solve here (ref pose_graph_optimizer.cpp:95).
                spacing = self.cfg.live_polish_min_spacing_frames
                if (spacing > 0 and self._last_polish_frame is not None
                        and n - self._last_polish_frame < spacing):
                    # Sustained revisits fire closures every few dozen
                    # frames; back-to-back polishes over the same
                    # live_ba_window are redundant (the pose graph already
                    # applied each correction; finish() runs full depth).
                    stats["global_ba"] = {"skipped_redundant": True}
                else:
                    self._last_polish_frame = n
                    cap = self.cfg.live_ba_max_seconds
                    ba, lo_, hi_ = self.ba, lo, n - 1
                    self.deferred_ba_finish = (
                        lambda: ba.optimize(lo_, hi_, max_seconds=cap))
                    stats["global_ba"] = {"deferred": True}
            else:
                stats["global_ba"] = self.ba.optimize(
                    lo, n - 1, max_seconds=ba_max_seconds,
                )
        # Phase split of the stall (closure attribution, r4 directive 7):
        # edge measurement / GN solve+writeback / global BA.
        stats["wall_split_seconds"] = {
            "edge_measure": round(t_match, 2),
            "pg_solve_writeback": round(t_solve, 2),
            "global_ba": round(_time.perf_counter() - t_ba, 2),
        }
        stats["wall_seconds"] = round(_time.perf_counter() - t_start, 3)
        if live:
            self.live_stall_log.append(stats["wall_seconds"])
            self.live_stall_splits.append(stats["wall_split_seconds"])
        self.last_stats = stats
        return stats
