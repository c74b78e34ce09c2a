"""Full-system integration: SlamSystem over a synthetic sequence, including
BA refinement, export artifacts, and the evaluator."""

import os

import numpy as np

from stereo_orb_slam_tpu.apps.slam import SlamSystem
from stereo_orb_slam_tpu.config import SlamConfig, LoopConfig
from stereo_orb_slam_tpu.utils import evaluate
from tests.synth import PlaneScene


def small_cfg():
    return SlamConfig().replace(refine_interval=4)


def test_slam_system_end_to_end(rng, tmp_path):
    scene = PlaneScene(rng)
    rig = scene.make_rig()
    system = SlamSystem(rig, small_cfg(), vocab_train_frames=10**9)  # no vocab

    step = 0.2
    n_frames = 9
    for i in range(n_frames):
        system.process(
            scene.render(i * step), scene.render(i * step, right=True)
        )
    stats = system.finish()
    assert "final_ba" in stats

    w = system.world
    assert w.num_frames == n_frames
    xs = w.pose_global[: w.num_frames][:, 0, 3]
    np.testing.assert_allclose(xs, np.arange(n_frames) * step, atol=0.05)

    # ATE vs ground truth trajectory.
    gt = np.tile(np.eye(4, dtype=np.float32), (n_frames, 1, 1))
    gt[:, 0, 3] = np.arange(n_frames) * step
    ate = evaluate.ate_rmse(w.pose_global[: w.num_frames], gt, align=False)
    assert ate < 0.05

    # Export artifacts.
    out = str(tmp_path)
    system.export(out, "test")
    for f in [
        "poses.txt", "points.txt", "constraints.txt",
        "waypoints_test.ply", "map_test.ply", "pose_graph_test.ply",
        "trajectory_test.txt",
    ]:
        assert os.path.exists(os.path.join(out, f)), f


def test_slam_ba_improves_map(rng):
    """Sliding-window BA must not corrupt a good trajectory and should keep
    reprojection cost low."""
    scene = PlaneScene(rng)
    rig = scene.make_rig()
    system = SlamSystem(rig, small_cfg(), vocab_train_frames=10**9)
    for i in range(8):
        system.process(scene.render(i * 0.2), scene.render(i * 0.2, right=True))
    system.finish()
    stats = system.ba.last_stats
    assert stats["cost_final"] <= stats["cost_initial"]
    # Mean reprojection residual per observation should be subpixel-ish.
    import math
    mean_r = math.sqrt(2 * stats["cost_final"] / max(stats["num_obs"], 1))
    assert mean_r < 1.0


def test_evaluator_identity():
    poses = np.tile(np.eye(4), (10, 1, 1))
    poses[:, 2, 3] = np.arange(10)
    assert evaluate.ate_rmse(poses, poses) < 1e-9
    t, r = evaluate.rpe(poses, poses)
    assert t < 1e-9 and r < 1e-6


def test_evaluator_alignment_invariance(rng):
    from scipy.spatial.transform import Rotation

    poses = np.tile(np.eye(4), (20, 1, 1))
    poses[:, :3, 3] = rng.normal(size=(20, 3)) * 5
    R = Rotation.from_rotvec([0.3, -0.2, 0.5]).as_matrix()
    T = np.eye(4)
    T[:3, :3] = R
    T[:3, 3] = [1, 2, 3]
    moved = np.einsum("ij,njk->nik", T, poses)
    assert evaluate.ate_rmse(moved, poses, align=True) < 1e-6
