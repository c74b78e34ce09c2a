"""Checkpoint round-trips: txt dump restore and exact npz resume; offline
global BA over a restored dump must still converge."""

import numpy as np

from stereo_orb_slam_tpu.backend.ba import BundleAdjuster
from stereo_orb_slam_tpu.config import BAConfig
from stereo_orb_slam_tpu.io import checkpoint, export
from tests.test_ba import synth_ba_world


def test_txt_restore_roundtrip(rng, tmp_path):
    world, rig, gt_poses, _ = synth_ba_world(rng)
    export.dump_world(str(tmp_path), world)
    back = checkpoint.restore_world(str(tmp_path))
    assert back.num_frames == world.num_frames
    assert back.num_points == world.num_points
    assert back.num_obs == world.num_obs
    np.testing.assert_allclose(
        back.pose_global[: back.num_frames],
        world.pose_global[: world.num_frames], atol=1e-3,
    )
    np.testing.assert_allclose(
        back.points[: back.num_points],
        world.points[: world.num_points], atol=1e-3,
    )


def test_npz_exact_resume(rng, tmp_path):
    world, rig, *_ = synth_ba_world(rng)
    p = str(tmp_path / "state.npz")
    checkpoint.save_npz(p, world)
    back = checkpoint.load_npz(p)
    np.testing.assert_array_equal(
        back.pose_global[: back.num_frames],
        world.pose_global[: world.num_frames],
    )
    np.testing.assert_array_equal(
        back.obs_uv[: back.num_obs], world.obs_uv[: world.num_obs]
    )
    np.testing.assert_array_equal(
        back.point_parent[: back.num_points],
        world.point_parent[: world.num_points],
    )


def test_offline_ba_on_restored_dump(rng, tmp_path):
    world, rig, gt_poses, pts_gt = synth_ba_world(rng)
    world.points[: world.num_points] += rng.normal(
        0, 0.2, (world.num_points, 3)
    ).astype(np.float32)
    export.dump_world(str(tmp_path), world)

    back = checkpoint.restore_world(str(tmp_path))
    adj = BundleAdjuster(back, rig, BAConfig(max_iterations=15))
    stats = adj.optimize(0, back.num_frames)
    assert stats["cost_final"] < stats["cost_initial"] * 0.1
