"""Distributed BA on a virtual 8-device CPU mesh: numerical equality with the
single-device solve (SURVEY.md §4 distributed-test strategy)."""

import jax
import numpy as np
import pytest

from stereo_orb_slam_tpu.backend.ba import BundleAdjuster
from stereo_orb_slam_tpu.config import BAConfig
from stereo_orb_slam_tpu.parallel.dist_ba import DistributedBundleAdjuster
from stereo_orb_slam_tpu.parallel.mesh import make_mesh
from tests.test_ba import synth_ba_world


@pytest.fixture
def eight_devices():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return jax.devices()[:8]


def test_dist_matches_single_device(rng, eight_devices):
    world_a, rig, gt_poses, _ = synth_ba_world(rng, n_frames=6, n_points=200)
    # Identical perturbations on two copies of the same world.
    pert_pose = {}
    for i in range(1, world_a.num_frames):
        d = np.eye(4, dtype=np.float32)
        d[:3, 3] = rng.normal(size=3) * 0.1
        pert_pose[i] = d
    pert_pts = rng.normal(0, 0.15, (world_a.num_points, 3)).astype(np.float32)

    import copy

    world_b = copy.deepcopy(world_a)
    for w in (world_a, world_b):
        for i, d in pert_pose.items():
            w.pose_global[i] = w.pose_global[i] @ d
        w.points[: w.num_points] += pert_pts

    cfg = BAConfig(max_iterations=10)
    single = BundleAdjuster(world_a, rig, cfg)
    s_stats = single.optimize(0, world_a.num_frames)

    mesh = make_mesh(8, devices=eight_devices)
    dist = DistributedBundleAdjuster(world_b, rig, mesh, cfg)
    d_stats = dist.optimize(0, world_b.num_frames)

    assert d_stats["num_devices"] == 8
    # Costs agree to reduction-order tolerance.
    assert np.isclose(
        d_stats["cost_final"], s_stats["cost_final"],
        rtol=1e-3, atol=1e-4,
    )
    # Recovered poses agree.
    n = world_a.num_frames
    np.testing.assert_allclose(
        world_b.pose_global[:n], world_a.pose_global[:n], atol=5e-3
    )
    # Recovered points agree (both should be near ground truth).
    np.testing.assert_allclose(
        world_b.points[: world_b.num_points],
        world_a.points[: world_a.num_points],
        atol=2e-2,
    )


def test_dist_converges(rng, eight_devices):
    world, rig, gt_poses, pts_gt = synth_ba_world(rng, n_frames=5)
    world.points[: world.num_points] += rng.normal(
        0, 0.2, (world.num_points, 3)
    ).astype(np.float32)
    mesh = make_mesh(8, devices=eight_devices)
    dist = DistributedBundleAdjuster(world, rig, mesh, BAConfig(max_iterations=15))
    stats = dist.optimize(0, world.num_frames)
    assert stats["cost_final"] < stats["cost_initial"] * 1e-2


def test_point_aligned_matches_obs_scheme(rng, eight_devices):
    """The point-aligned layout (point state sharded, O(C) collectives)
    must converge to the same solution as the legacy obs-sharded layout."""
    import copy

    world_a, rig, gt_poses, _ = synth_ba_world(rng, n_frames=6, n_points=200)
    pert_pts = rng.normal(0, 0.15, (world_a.num_points, 3)).astype(np.float32)
    world_b = copy.deepcopy(world_a)
    for w in (world_a, world_b):
        w.points[: w.num_points] += pert_pts

    cfg = BAConfig(max_iterations=10)
    mesh = make_mesh(8, devices=eight_devices)
    a = DistributedBundleAdjuster(world_a, rig, mesh, cfg, scheme="obs")
    b = DistributedBundleAdjuster(world_b, rig, mesh, cfg,
                                  scheme="point_aligned")
    sa = a.optimize(0, world_a.num_frames)
    sb = b.optimize(0, world_b.num_frames)
    assert sb["scheme"] == "point_aligned"
    assert np.isclose(sa["cost_final"], sb["cost_final"],
                      rtol=1e-3, atol=1e-4)
    n = world_a.num_frames
    np.testing.assert_allclose(world_b.pose_global[:n],
                               world_a.pose_global[:n], atol=5e-3)
    np.testing.assert_allclose(
        world_b.points[: world_b.num_points],
        world_a.points[: world_a.num_points], atol=2e-2,
    )


def test_point_aligned_dense_schur_matches_matrix_free(rng, eight_devices):
    """The DISTRIBUTED DENSE SCHUR path (local S assembly + one [6C,6C]
    psum + replicated Cholesky; dense_K set) must match the matrix-free
    point-aligned solve — same math, ~3 collectives per LM step instead of
    one per CG iteration (r4 directive 5)."""
    import jax.numpy as jnp

    from stereo_orb_slam_tpu.backend.ba import prepare_problem_arrays
    from stereo_orb_slam_tpu.parallel.dist_ba import (
        build_point_aligned, place_point_aligned,
        sharded_ba_solve_point_aligned,
    )

    world, rig, *_ = synth_ba_world(rng, n_frames=6, n_points=200)
    world.points[: world.num_points] += rng.normal(
        0, 0.15, (world.num_points, 3)).astype(np.float32)
    problem = world.ba_problem(0, world.num_frames)
    pose6, obs_cam, obs_point, obs_uv, cam_mask = prepare_problem_arrays(
        problem, sort_by_point=True)
    mesh = make_mesh(8, devices=eight_devices)
    adj = BundleAdjuster(world, rig)
    prob, meta = build_point_aligned(
        pose6, problem["point_xyz"], obs_cam, obs_point, obs_uv, cam_mask,
        np.asarray(adj.P_l), np.asarray(adj.P_r), 8)
    prob = place_point_aligned(mesh, prob)
    cfg = BAConfig(max_iterations=8, function_tolerance=0.0)

    K = 1 << (max(int(np.bincount(obs_point).max(initial=2)), 2)
              - 1).bit_length()
    mf = sharded_ba_solve_point_aligned(mesh, cfg)
    dn = sharded_ba_solve_point_aligned(mesh, cfg, dense_K=K)
    c_mf, it_mf, _ = mf(prob, jnp.int32(8))
    c_dn, it_dn, _ = dn(prob, jnp.int32(8))
    assert int(it_mf) == int(it_dn) == 8
    assert np.isclose(float(c_dn.cost), float(c_mf.cost),
                      rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(c_dn.prob.pose6),
                               np.asarray(c_mf.prob.pose6), atol=5e-3)
