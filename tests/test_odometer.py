"""End-to-end visual odometry on a synthetic sequence with known motion."""

import numpy as np

from stereo_orb_slam_tpu.frontend.odometer import VisualOdometer
from stereo_orb_slam_tpu.worldmap import WorldMap
from tests.synth import PlaneScene


def run_sequence(rng, step_x=0.2, n_frames=6):
    scene = PlaneScene(rng)
    rig = scene.make_rig()
    world = WorldMap()
    vo = VisualOdometer(world, rig, seed=0)

    transforms = []
    for i in range(n_frames):
        cam_x = i * step_x
        img_l = scene.render(cam_x)
        img_r = scene.render(cam_x, right=True)
        transforms.append(vo.track(img_l, img_r))
    return world, vo, transforms, scene


def test_vo_recovers_lateral_motion(rng):
    step = 0.2
    world, vo, transforms, scene = run_sequence(rng, step_x=step)
    assert vo.success
    # Frame 0 is identity; subsequent transforms: X_prev = T @ X_curr with the
    # camera moving +x, so T translation ≈ (+step, 0, 0).
    for T in transforms[1:]:
        np.testing.assert_allclose(T[:3, 3], [step, 0, 0], atol=0.02)
        np.testing.assert_allclose(T[:3, :3], np.eye(3), atol=0.01)
    # Integrated trajectory: global pose x ≈ i*step.
    xs = world.pose_global[: world.num_frames][:, 0, 3]
    np.testing.assert_allclose(xs, np.arange(len(xs)) * step, atol=0.05)


def test_vo_map_consistency(rng):
    world, vo, _, scene = run_sequence(rng)
    n = world.num_frames
    assert n == 6
    assert world.num_points > 100
    assert world.num_obs > world.num_points  # tracked points re-observed
    # Landmarks lie on the plane z = depth (world frame = frame-0 camera).
    pts = world.points[: world.num_points]
    live = world.point_obs_count[: world.num_points] > 0
    z_err = np.abs(pts[live][:, 2] - scene.depth)
    assert np.percentile(z_err, 90) < 0.3
    # Observations reference in-range frames and points.
    assert world.obs_frame[: world.num_obs].max() == n - 1
    assert world.obs_point[: world.num_obs].max() < world.num_points


def test_vo_tracks_landmarks_across_frames(rng):
    world, _, _, _ = run_sequence(rng)
    counts = world.point_obs_count[: world.num_points]
    # A healthy fraction of landmarks should be observed 2+ times.
    assert (counts >= 2).mean() > 0.3


def test_vo_failure_on_blank_frames(rng):
    scene = PlaneScene(rng)
    rig = scene.make_rig()
    world = WorldMap()
    vo = VisualOdometer(world, rig, seed=0)
    blank = np.zeros((240, 320), np.float32)
    T = vo.track(blank, blank)
    # No features -> identity transform, no frame recorded (ref :117-121).
    np.testing.assert_allclose(T, np.eye(4), atol=1e-6)
    assert not vo.success
    assert world.num_frames == 0
    # Pipeline recovers on the next good pair.
    T2 = vo.track(scene.render(0.0), scene.render(0.0, right=True))
    assert world.num_frames == 1
