"""Pose-graph optimization: drift correction with loop closures."""

import numpy as np
from scipy.spatial.transform import Rotation

from stereo_orb_slam_tpu.backend.pose_graph import PoseGraphOptimizer
from stereo_orb_slam_tpu.config import PoseGraphConfig
from stereo_orb_slam_tpu.worldmap import WorldMap


def rt(w, t):
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = Rotation.from_rotvec(w).as_matrix()
    T[:3, 3] = t
    return T


def square_loop_world(drift=0.0, n_side=5, step=1.0):
    """Camera walks a square loop (4*n_side frames), optional odometry drift.

    Ground truth: returns to start. Drift accumulates in the stored rel
    poses; a loop closure edge ties the last frame back to frame 0.
    """
    world = WorldMap()
    rng = np.random.default_rng(3)
    world.add_frame(np.eye(4, dtype=np.float32))
    gt = [np.eye(4, dtype=np.float32)]
    turn = rt([0, -np.pi / 2, 0], [0, 0, 0])  # yaw 90° per corner
    for side in range(4):
        for i in range(n_side):
            rel = rt([0, 0, 0], [0, 0, step])
            if i == n_side - 1:
                rel = rel @ turn
            gt.append(gt[-1] @ rel)
            noisy = rel.copy()
            if drift:
                d = rt(rng.normal(size=3) * drift * 0.2, rng.normal(size=3) * drift)
                noisy = rel @ d
            world.add_frame(noisy)
    return world, np.stack(gt)


def test_zero_residual_graph_unchanged():
    world, gt = square_loop_world(drift=0.0)
    before = world.pose_global[: world.num_frames].copy()
    pgo = PoseGraphOptimizer(world, PoseGraphConfig(iterations=5))
    stats = pgo.optimize(run_global_ba=False)
    after = world.pose_global[: world.num_frames]
    np.testing.assert_allclose(after, before, atol=1e-3)
    assert stats["cost_final"] < 1e-6


def test_loop_closure_corrects_drift():
    world, gt = square_loop_world(drift=0.02)
    n = world.num_frames
    drift_before = np.linalg.norm(
        world.pose_global[n - 1][:3, 3] - gt[n - 1][:3, 3]
    )
    assert drift_before > 0.1  # meaningful accumulated drift

    # Loop closure: last frame sees frame 0. Measurement satisfies
    # T_dst^-1 T_src = Z with src=0, dst=n-1 (ref pose_graph_optimizer.cpp
    # edge orientation).
    Z_true = np.linalg.inv(gt[n - 1]) @ gt[0]

    pgo = PoseGraphOptimizer(
        world, PoseGraphConfig(iterations=15),
        loop_matcher=lambda a, b: (Z_true.astype(np.float32), True),
    )
    pgo.add_loop_edge(0, n - 1)
    stats = pgo.optimize(run_global_ba=False)
    assert stats["num_loop_edges"] == 1

    drift_after = np.linalg.norm(
        world.pose_global[n - 1][:3, 3] - gt[n - 1][:3, 3]
    )
    assert drift_after < drift_before * 0.3
    # Gauge frame pinned.
    np.testing.assert_allclose(world.pose_global[0], gt[0], atol=1e-5)
    # Whole-trajectory error shrinks.
    err = np.linalg.norm(
        world.pose_global[:n][:, :3, 3] - gt[:n][:, :3, 3], axis=1
    )
    assert err.max() < drift_before


def test_pose_graph_drags_points():
    """Writeback must drag first-observed landmarks with their frames."""
    world, gt = square_loop_world(drift=0.05, n_side=3)
    n = world.num_frames
    fid = n - 2
    G = world.pose_global[fid]
    local_pt = np.asarray([[0.5, 0.0, 3.0]], np.float32)
    ph = np.concatenate([local_pt, np.ones((1, 1), np.float32)], 1)
    world_pt = (G @ ph.T).T[:, :3]
    ids = world.add_points(world_pt, fid)
    world.add_observations(fid, ids, np.zeros((1, 4), np.float32))

    Z_true = np.linalg.inv(gt[n - 1]) @ gt[0]
    pgo = PoseGraphOptimizer(
        world, PoseGraphConfig(iterations=10),
        loop_matcher=lambda a, b: (Z_true.astype(np.float32), True),
    )
    pgo.add_loop_edge(0, n - 1)
    pgo.optimize(run_global_ba=False)

    # The landmark must stay rigidly attached to its first-observing frame.
    G_new = world.pose_global[fid]
    expect = (G_new @ ph.T).T[:, :3]
    np.testing.assert_allclose(world.points[ids[0]], expect[0], atol=1e-4)
