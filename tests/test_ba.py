"""Bundle adjustment: synthetic problems with known ground truth.

Validates residual parity against the reference cost semantics (SURVEY.md
C9/C10) and convergence: noisy poses/points must be pulled back to ground
truth within tolerance.
"""

import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation

from stereo_orb_slam_tpu.backend import ba, residuals
from stereo_orb_slam_tpu.config import BAConfig
from stereo_orb_slam_tpu.geometry import camera, se3
from stereo_orb_slam_tpu.worldmap import WorldMap

FX, CX, CY, B = 200.0, 160.0, 120.0, 0.5


def make_rig():
    left = camera.Pinhole.create(FX, FX, CX, CY)
    pose_r = np.eye(4, dtype=np.float32)
    pose_r[0, 3] = B
    right = camera.Pinhole.create(FX, FX, CX, CY, pose=pose_r)
    return camera.StereoRig.create(left, right, rectified=True)


def project4(P_l, P_r, X_cam):
    def pr(P):
        Xh = np.concatenate([X_cam, np.ones((len(X_cam), 1), np.float32)], 1)
        uvw = Xh @ P.T
        return uvw[:, :2] / uvw[:, 2:3]
    return np.concatenate([pr(P_l), pr(P_r)], 1)


def synth_ba_world(rng, n_frames=5, n_points=120, noise_px=0.0):
    """Build a WorldMap with ground-truth geometry + optional pixel noise."""
    rig = make_rig()
    P_l = np.asarray(rig.left.projection)
    P_r = np.asarray(rig.right.projection)

    # Camera trajectory: forward motion with small rotations.
    world = WorldMap()
    gt_poses = [np.eye(4, dtype=np.float32)]
    for i in range(1, n_frames):
        T = np.eye(4, dtype=np.float32)
        T[:3, :3] = Rotation.from_rotvec(rng.normal(size=3) * 0.01).as_matrix()
        T[:3, 3] = [0.05, 0.0, 1.0]
        gt_poses.append(gt_poses[-1] @ T)

    pts_w = np.stack(
        [rng.uniform(-8, 8, n_points), rng.uniform(-2, 2, n_points),
         rng.uniform(5, 30, n_points)], 1
    ).astype(np.float32)

    for i, G in enumerate(gt_poses):
        rel = np.eye(4, dtype=np.float32) if i == 0 else (
            np.linalg.inv(gt_poses[i - 1]) @ G
        )
        world.add_frame(rel)
        if i == 0:
            ids = world.add_points(pts_w, 0)
        Ginv = np.linalg.inv(G)
        X_cam = pts_w @ Ginv[:3, :3].T + Ginv[:3, 3]
        vis = X_cam[:, 2] > 1.0
        uv = project4(P_l, P_r, X_cam[vis])
        if noise_px:
            uv = uv + rng.normal(0, noise_px, uv.shape).astype(np.float32)
        world.add_observations(i, ids[vis], uv.astype(np.float32))
    return world, rig, np.stack(gt_poses), pts_w


def test_residual_zero_at_ground_truth(rng):
    world, rig, gt_poses, pts = synth_ba_world(rng)
    adj = ba.BundleAdjuster(world, rig)
    prob = world.ba_problem(0, world.num_frames)
    pose6 = se3.matrix_to_pose6(se3.inverse(jnp.asarray(prob["cam_world"])))
    cost = residuals.robust_cost(
        pose6, jnp.asarray(prob["point_xyz"]),
        jnp.asarray(prob["obs_cam"]), jnp.asarray(prob["obs_point"]),
        jnp.asarray(prob["obs_uv"]), jnp.ones(len(prob["obs_cam"]), jnp.float32),
        adj.P_l, adj.P_r, 1.0,
    )
    assert float(cost) < 1e-3


def test_ba_recovers_from_perturbation(rng):
    world, rig, gt_poses, pts_gt = synth_ba_world(rng)
    n = world.num_frames
    # Perturb all poses except frame 0 and all points.
    for i in range(1, n):
        d = np.eye(4, dtype=np.float32)
        d[:3, :3] = Rotation.from_rotvec(rng.normal(size=3) * 0.01).as_matrix()
        d[:3, 3] = rng.normal(size=3) * 0.15
        world.pose_global[i] = world.pose_global[i] @ d
    world.points[: world.num_points] += rng.normal(
        0, 0.2, (world.num_points, 3)
    ).astype(np.float32)

    adj = ba.BundleAdjuster(world, rig, BAConfig(max_iterations=30))
    stats = adj.optimize(0, n)
    assert stats["cost_final"] < stats["cost_initial"] * 1e-2

    # Poses recovered (up to the fixed-gauge frame 0).
    for i in range(n):
        dT = np.linalg.inv(gt_poses[i]) @ world.pose_global[i]
        assert np.linalg.norm(dT[:3, 3]) < 0.03, i
        rot_err = np.linalg.norm(Rotation.from_matrix(dT[:3, :3]).as_rotvec())
        assert rot_err < 0.01, i
    # Points recovered.
    err = np.linalg.norm(world.points[: world.num_points] - pts_gt, axis=1)
    assert np.percentile(err, 90) < 0.05


def test_ba_single_frame_moves_points_only(rng):
    """Per-frame BA window [n-1, n): the lone pose is gauge-fixed, so only
    landmarks refine (ref slam.cpp:123 + bundle_adjuster.cpp:113)."""
    world, rig, gt_poses, pts_gt = synth_ba_world(rng, n_frames=2)
    world.points[: world.num_points] += rng.normal(
        0, 0.3, (world.num_points, 3)
    ).astype(np.float32)
    pose_before = world.pose_global[0].copy()
    adj = ba.BundleAdjuster(world, rig, BAConfig(max_iterations=15))
    adj.optimize(0, 1)
    np.testing.assert_allclose(world.pose_global[0], pose_before, atol=1e-6)
    err = np.linalg.norm(world.points[: world.num_points] - pts_gt, axis=1)
    # Points observed in frame 0 move back toward truth along the rays.
    assert np.median(err) < 0.15


def test_ba_huber_robust_to_outliers(rng):
    world, rig, gt_poses, pts_gt = synth_ba_world(rng, noise_px=0.3)
    # Corrupt 5% of observations badly.
    n_obs = world.num_obs
    idx = rng.choice(n_obs, n_obs // 20, replace=False)
    world.obs_uv[idx] += rng.normal(0, 50, (len(idx), 4)).astype(np.float32)
    world.points[: world.num_points] += rng.normal(
        0, 0.1, (world.num_points, 3)
    ).astype(np.float32)

    adj = ba.BundleAdjuster(world, rig, BAConfig(max_iterations=25))
    adj.optimize(0, world.num_frames)
    for i in range(world.num_frames):
        dT = np.linalg.inv(gt_poses[i]) @ world.pose_global[i]
        assert np.linalg.norm(dT[:3, 3]) < 0.05, i


def test_point_bound_clamp(rng):
    world, rig, *_ = synth_ba_world(rng)
    adj = ba.BundleAdjuster(world, rig, BAConfig(max_iterations=3))
    adj.optimize(0, world.num_frames)
    assert np.all(np.abs(world.points[: world.num_points]) <= 10000.0)


def _flat_prob_from_world(world, adj, pad=ba._pad_to):
    prob = world.ba_problem(0, world.num_frames)
    n_obs = len(prob["obs_cam"])
    C = len(prob["frame_ids"])
    P_real = len(prob["point_ids"])
    P_pad, O_pad = pad(P_real), pad(n_obs)
    pose6 = np.asarray(
        se3.matrix_to_pose6(se3.inverse(jnp.asarray(prob["cam_world"])))
    )
    points = np.zeros((P_pad, 3), np.float32)
    points[:P_real] = prob["point_xyz"]
    obs_cam = np.zeros(O_pad, np.int32)
    obs_point = np.zeros(O_pad, np.int32)
    obs_uv = np.zeros((O_pad, 4), np.float32)
    obs_w = np.zeros(O_pad, np.float32)
    order = np.argsort(prob["obs_point"], kind="stable")
    obs_cam[:n_obs] = np.asarray(prob["obs_cam"])[order]
    obs_point[:n_obs] = np.asarray(prob["obs_point"])[order]
    obs_uv[:n_obs] = np.asarray(prob["obs_uv"])[order]
    obs_w[:n_obs] = 1.0
    cam_mask = np.ones(C, np.float32)
    cam_mask[0] = 0.0
    point_mask = np.zeros(P_pad, np.float32)
    point_mask[:P_real] = 1.0
    return prob, ba.BAProblem(
        pose6=jnp.asarray(pose6), points=jnp.asarray(points),
        obs_cam=jnp.asarray(obs_cam), obs_point=jnp.asarray(obs_point),
        obs_uv=jnp.asarray(obs_uv), obs_weight=jnp.asarray(obs_w),
        cam_mask=jnp.asarray(cam_mask), point_mask=jnp.asarray(point_mask),
        P_l=adj.P_l, P_r=adj.P_r,
    ), n_obs, P_pad


def test_group_slots_roundtrip(rng):
    from stereo_orb_slam_tpu.backend import schur_dense

    n_pts, n_obs = 37, 200
    obs_point = np.sort(rng.integers(0, n_pts, n_obs).astype(np.int32))
    obs_cam = rng.integers(0, 9, n_obs).astype(np.int32)
    sto, scam, mask, K = schur_dense.group_slots(obs_point, obs_cam, 64,
                                                 n_obs)
    assert mask.sum() == n_obs
    # Valid slots enumerate each point's observations exactly once, with the
    # camera id mirrored; the flattened valid map is monotonic.
    seen = sorted(sto[mask > 0].tolist())
    assert seen == list(range(n_obs))
    assert np.all(np.diff(sto.ravel()) >= 0)
    for p in range(64):
        for k in range(K):
            if mask[p, k] > 0:
                assert obs_point[sto[p, k]] == p
                assert scam[p, k] == obs_cam[sto[p, k]]
    assert not mask[37:].any()


def test_device_slots_match_host_group_slots(rng):
    """build_slots_device (the live path: slot maps derived ON DEVICE from
    the sorted obs arrays, only K chosen on host) must reproduce the host
    group_slots maps exactly, including padding rows parked at the array
    tail with obs_point=0."""
    from stereo_orb_slam_tpu.backend import schur_dense
    from stereo_orb_slam_tpu.backend.ba import build_slots_device

    n_pts, n_obs, O_pad = 37, 200, 256
    obs_point = np.zeros(O_pad, np.int32)
    obs_cam = np.zeros(O_pad, np.int32)
    obs_w = np.zeros(O_pad, np.float32)
    obs_point[:n_obs] = np.sort(rng.integers(0, n_pts, n_obs).astype(np.int32))
    obs_cam[:n_obs] = rng.integers(0, 9, n_obs).astype(np.int32)
    obs_w[:n_obs] = 1.0

    sto_h, scam_h, mask_h, K = schur_dense.group_slots(
        obs_point[:n_obs], obs_cam[:n_obs], 64, n_obs
    )
    sto_d, scam_d, mask_d = build_slots_device(
        jnp.asarray(obs_point), jnp.asarray(obs_cam), jnp.asarray(obs_w),
        64, K,
    )
    np.testing.assert_array_equal(np.asarray(mask_d), mask_h)
    # Masked slots must agree exactly; unmasked slots only need to point at
    # SOME valid row (both implementations clamp, possibly differently).
    m = mask_h > 0
    np.testing.assert_array_equal(np.asarray(sto_d)[m], sto_h[m])
    np.testing.assert_array_equal(np.asarray(scam_d)[m], scam_h[m])
    assert np.asarray(sto_d).max() < n_obs
    assert np.all(np.diff(np.asarray(sto_d).ravel()) >= 0), "monotonic gather"


def test_ba_solve_dense_K_matches_explicit_slots(rng):
    """ba_solve with device-derived slots (dense_K) equals ba_solve with
    host-precomputed dense_slots."""
    from stereo_orb_slam_tpu.backend import schur_dense
    from stereo_orb_slam_tpu.backend.ba import ba_solve

    world, rig, *_ = synth_ba_world(rng, n_frames=6, n_points=150,
                                    noise_px=0.5)
    adj = ba.BundleAdjuster(world, rig)
    raw, flat, n_obs, P_pad = _flat_prob_from_world(world, adj)
    sto, scam, smask, K = schur_dense.group_slots(
        np.asarray(flat.obs_point)[:n_obs], np.asarray(flat.obs_cam)[:n_obs],
        P_pad, n_obs,
    )
    cfg = BAConfig(cg_iterations=50)
    c1, it1, ci1 = ba_solve(flat, jnp.int32(5), cfg,
                            dense_slots=(jnp.asarray(sto), jnp.asarray(scam),
                                         jnp.asarray(smask)))
    c2, it2, ci2 = ba_solve(flat, jnp.int32(5), cfg, dense_K=K)
    assert int(it1) == int(it2)
    np.testing.assert_array_equal(np.asarray(c1.prob.pose6),
                                  np.asarray(c2.prob.pose6))
    np.testing.assert_array_equal(np.asarray(c1.prob.points),
                                  np.asarray(c2.prob.points))


def test_dense_schur_matches_matrix_free(rng):
    """One LM step with explicit-S assembly must match the matrix-free path
    (same normal equations; CG solves to tight tol on both)."""
    from stereo_orb_slam_tpu.backend import schur_dense

    world, rig, *_ = synth_ba_world(rng, n_frames=6, n_points=150,
                                    noise_px=0.5)
    world.points[: world.num_points] += rng.normal(
        0, 0.1, (world.num_points, 3)
    ).astype(np.float32)
    adj = ba.BundleAdjuster(world, rig)
    raw, flat, n_obs, P_pad = _flat_prob_from_world(world, adj)

    n_real = int(np.sum(np.asarray(flat.obs_weight) > 0))
    sto, scam, smask, K = schur_dense.group_slots(
        np.asarray(flat.obs_point)[:n_real], np.asarray(flat.obs_cam)[:n_real],
        P_pad, n_real,
    )
    cfg = BAConfig(cg_iterations=200, cg_tol=1e-10)
    lam = jnp.float32(1e-4)
    f1, lam_f, acc_f, c0_f, c1_f = ba.lm_step(flat, lam, cfg)
    d1, lam_d, acc_d, c0_d, c1_d = ba.lm_step(
        flat, lam, cfg,
        dense_slots=(jnp.asarray(sto), jnp.asarray(scam), jnp.asarray(smask)),
    )

    np.testing.assert_allclose(float(c0_f), float(c0_d), rtol=1e-5)
    assert bool(acc_f) == bool(acc_d)
    np.testing.assert_allclose(float(c1_f), float(c1_d), rtol=1e-3)
    np.testing.assert_allclose(
        np.asarray(f1.pose6), np.asarray(d1.pose6), atol=5e-4
    )
    np.testing.assert_allclose(
        np.asarray(f1.points), np.asarray(d1.points), atol=5e-3
    )


def test_dense_schur_full_optimize_converges(rng):
    """End-to-end optimize() on the dense path (small window triggers it)."""
    world, rig, gt_poses, pts_gt = synth_ba_world(rng, n_frames=6)
    for i in range(1, world.num_frames):
        d = np.eye(4, dtype=np.float32)
        d[:3, 3] = rng.normal(size=3) * 0.1
        world.pose_global[i] = world.pose_global[i] @ d
    adj = ba.BundleAdjuster(world, rig, BAConfig(max_iterations=30))
    stats = adj.optimize(0, world.num_frames)
    assert stats["cost_final"] < stats["cost_initial"] * 1e-2
    for i in range(world.num_frames):
        dT = np.linalg.inv(gt_poses[i]) @ world.pose_global[i]
        assert np.linalg.norm(dT[:3, 3]) < 0.03, i


def test_evaluate_once_lm_matches_two_pass(rng):
    """The cached-NE LM loop (lm_init/lm_iteration) must reproduce the
    two-pass lm_step sequence: same accept decisions and costs."""
    world, rig, *_ = synth_ba_world(rng, n_frames=5, n_points=100,
                                    noise_px=0.8)
    world.points[: world.num_points] += rng.normal(
        0, 0.15, (world.num_points, 3)
    ).astype(np.float32)
    adj = ba.BundleAdjuster(world, rig)
    _, flat, n_obs, P_pad = _flat_prob_from_world(world, adj)

    cfg = BAConfig(cg_iterations=200, cg_tol=1e-12)
    lam = jnp.float32(cfg.lm_lambda_init)
    prob = flat
    seq_two_pass = []
    for _ in range(8):
        prob, lam, acc, c0, c1 = ba.lm_step(prob, lam, cfg)
        seq_two_pass.append((bool(acc), float(c0), float(c1)))

    carry = ba.lm_init(flat, cfg)
    seq_cached = []
    for _ in range(8):
        carry, acc, c0, c1 = ba.lm_iteration(carry, cfg)
        seq_cached.append((bool(acc), float(c0), float(c1)))

    for (a1, b1, d1), (a2, b2, d2) in zip(seq_two_pass, seq_cached):
        assert a1 == a2
        np.testing.assert_allclose(b1, b2, rtol=1e-4)
        np.testing.assert_allclose(d1, d2, rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(prob.pose6), np.asarray(carry.prob.pose6), atol=1e-5
    )


def test_ba_solve_matches_host_loop(rng):
    """The single-dispatch device-side LM loop (ba.ba_solve) must reproduce
    the host-driven lm_init/lm_iteration sequence: same iteration count
    (convergence exit included) and same final cost/params."""
    world, rig, *_ = synth_ba_world(rng, n_frames=5, n_points=100,
                                    noise_px=0.8)
    world.points[: world.num_points] += rng.normal(
        0, 0.15, (world.num_points, 3)
    ).astype(np.float32)
    adj = ba.BundleAdjuster(world, rig)
    _, flat, n_obs, P_pad = _flat_prob_from_world(world, adj)

    cfg = BAConfig(cg_iterations=200, cg_tol=1e-12)
    max_iters = 12

    carry = ba.lm_init(flat, cfg)
    host_iters = 0
    for _ in range(max_iters):
        carry, acc, c0, c1 = ba.lm_iteration(carry, cfg)
        host_iters += 1
        if (bool(acc) and float(c0) > 0
                and (float(c0) - float(c1)) < cfg.function_tolerance * float(c0)):
            break

    dcarry, dev_iters, cost_init = ba.ba_solve(flat, jnp.int32(max_iters), cfg)
    assert int(dev_iters) == host_iters
    assert float(cost_init) > float(dcarry.cost)  # solve reduced the cost
    np.testing.assert_allclose(float(dcarry.cost), float(carry.cost),
                               rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(dcarry.prob.pose6), np.asarray(carry.prob.pose6), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(dcarry.prob.points), np.asarray(carry.prob.points),
        atol=1e-4
    )


def test_ba_resume_chunks_match_single_dispatch(rng):
    """lm_init + chunked ba_resume (the watchdog-safe path huge global
    solves take, backend.ba.BundleAdjuster._solve loop) must walk the exact
    LM schedule of the single-dispatch ba_solve."""
    import jax.numpy as jnp

    from stereo_orb_slam_tpu.backend.ba import (
        ba_resume, ba_solve, lm_init,
    )
    from stereo_orb_slam_tpu.worldmap import WorldMap  # noqa: F401

    world, rig, gt_poses, pts_gt = synth_ba_world(rng)
    world.points[: world.num_points] += rng.normal(
        0, 0.2, (world.num_points, 3)
    ).astype(np.float32)
    adj = ba.BundleAdjuster(world, rig, BAConfig())
    problem = world.ba_problem(0, world.num_frames)
    # Build the same padded BAProblem the adjuster would (matrix-free).
    from stereo_orb_slam_tpu.backend.ba import BAProblem, _pad_to, _pad_to_fine
    from stereo_orb_slam_tpu.geometry import se3_np

    n_obs = len(problem["obs_cam"])
    C = len(problem["frame_ids"])
    P_real = len(problem["point_ids"])
    P_pad = _pad_to_fine(P_real)
    O_pad = _pad_to(n_obs)
    pose6 = se3_np.matrix_to_pose6_np(se3_np.inverse_np(problem["cam_world"]))
    points = np.zeros((P_pad, 3), np.float32)
    points[:P_real] = problem["point_xyz"]
    oc = np.zeros(O_pad, np.int32)
    op = np.zeros(O_pad, np.int32)
    uv = np.zeros((O_pad, 4), np.float32)
    ow = np.zeros(O_pad, np.float32)
    oc[:n_obs] = problem["obs_cam"]
    op[:n_obs] = problem["obs_point"]
    uv[:n_obs] = problem["obs_uv"]
    ow[:n_obs] = 1.0
    cam_mask = np.ones(C, np.float32)
    cam_mask[0] = 0.0
    pm = np.zeros(P_pad, np.float32)
    pm[:P_real] = 1.0
    prob = BAProblem(
        pose6=jnp.asarray(pose6.astype(np.float32)),
        points=jnp.asarray(points), obs_cam=jnp.asarray(oc),
        obs_point=jnp.asarray(op), obs_uv=jnp.asarray(uv),
        obs_weight=jnp.asarray(ow), cam_mask=jnp.asarray(cam_mask),
        point_mask=jnp.asarray(pm), P_l=adj.P_l, P_r=adj.P_r,
    )
    cfg = BAConfig(cg_iterations=30)
    carry_a, n_a, cost0_a = ba_solve(prob, jnp.int32(9), cfg)

    carry = lm_init(prob, cfg)
    cost0_b = carry.cost
    total = 0
    for chunk in (4, 4, 4):
        carry, k, conv = ba_resume(carry, jnp.int32(min(chunk, 9 - total)),
                                   cfg)
        total += int(k)
        if bool(conv) or total >= 9:
            break
    assert total == int(n_a)
    np.testing.assert_allclose(np.asarray(carry.prob.pose6),
                               np.asarray(carry_a.prob.pose6), atol=1e-6)
    np.testing.assert_allclose(float(cost0_b), float(cost0_a), rtol=1e-6)
    np.testing.assert_allclose(float(carry.cost), float(carry_a.cost),
                               rtol=1e-5)


def test_banded_schur_matches_dense(rng):
    """Banded assembly (band_plan feasible on a track-local problem) must
    reproduce the dense expansion's solve: same accept path, near-identical
    parameters (same math, different accumulation grouping)."""
    from stereo_orb_slam_tpu.backend import schur_dense
    from stereo_orb_slam_tpu.backend.ba import BAProblem, ba_solve

    C, P = 64, 8192
    fx, cx, cy, b = 240.0, 160.0, 120.0, 0.6
    P_l = np.array([[fx, 0, cx, 0], [0, fx, cy, 0], [0, 0, 1, 0]],
                   np.float32)
    P_r = P_l.copy()
    P_r[0, 3] = -fx * b
    pts = np.stack([rng.uniform(-10, 10, P), rng.uniform(-4, 4, P),
                    rng.uniform(4, 30, P)], 1).astype(np.float32)
    pose6 = rng.normal(0, 0.005, (C, 6)).astype(np.float32)
    c0 = (np.arange(P, dtype=np.int64) * C // P).astype(np.int32)
    tlen = rng.integers(1, 7, P)
    tlen = np.minimum(tlen, C - c0)
    obs_point = np.repeat(np.arange(P, dtype=np.int32), tlen)
    offs = np.concatenate([np.arange(t) for t in tlen]).astype(np.int32)
    obs_cam = (np.repeat(c0, tlen) + offs).astype(np.int32)
    O = len(obs_point)
    Xh = np.concatenate([pts[obs_point], np.ones((O, 1), np.float32)], 1)

    def proj(Pm):
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
    plan = schur_dense.band_plan(obs_point, obs_cam, P, O, C, K)
    assert plan is not None, "track-local problem must be band-feasible"
    bases, B, Pc = plan
    assert B < C  # the band actually narrows the expansion

    cfg = BAConfig()
    cd, itd, _ = ba_solve(prob, jnp.int32(5), cfg, dense_slots=slots)
    cb, itb, _ = ba_solve(prob, jnp.int32(5), cfg, dense_slots=slots,
                          band_bases=jnp.asarray(bases), band_B=B,
                          band_Pc=Pc)
    assert int(itd) == int(itb)
    np.testing.assert_allclose(np.asarray(cd.prob.pose6),
                               np.asarray(cb.prob.pose6), atol=1e-5)
    np.testing.assert_allclose(np.asarray(cd.prob.points),
                               np.asarray(cb.prob.points), atol=1e-3)
    np.testing.assert_allclose(float(cd.cost), float(cb.cost), rtol=1e-4)
