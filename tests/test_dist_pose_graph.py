"""Distributed pose-graph solve vs single-device, virtual 8-device mesh."""

import jax
import numpy as np
import pytest

from stereo_orb_slam_tpu.backend.pose_graph import PoseGraphOptimizer
from stereo_orb_slam_tpu.config import PoseGraphConfig
from stereo_orb_slam_tpu.parallel import dist_pose_graph
from stereo_orb_slam_tpu.parallel.mesh import make_mesh
from tests.test_pose_graph import square_loop_world


@pytest.fixture
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh(8)


def test_dist_pose_graph_matches_single(mesh8):
    world_a, gt = square_loop_world(drift=0.02)
    n = world_a.num_frames
    Z_true = (np.linalg.inv(gt[n - 1]) @ gt[0]).astype(np.float32)

    # Single-device via the optimizer class.
    import copy

    world_b = copy.deepcopy(world_a)
    cfg = PoseGraphConfig(iterations=10)
    pgo = PoseGraphOptimizer(
        world_a, cfg, loop_matcher=lambda a, b: (Z_true, True)
    )
    pgo.add_loop_edge(0, n - 1)
    pgo.optimize(run_global_ba=False)

    # Distributed standalone solve on the same graph.
    edge_a = list(range(0, n - 1)) + [n - 1]
    edge_b = list(range(1, n)) + [0]
    meas = [world_b.pose_rel[i] for i in range(1, n)] + [Z_true]
    poses_new, costs = dist_pose_graph.solve(
        world_b.pose_global[:n], edge_a, edge_b, np.stack(meas), mesh8, cfg
    )

    np.testing.assert_allclose(
        poses_new, world_a.pose_global[:n], atol=2e-3
    )
    assert costs[-1] <= costs[0]
