"""WorldMap SoA state: pose chaining, point dragging, merge remap."""

import numpy as np
from scipy.spatial.transform import Rotation

from stereo_orb_slam_tpu.worldmap import WorldMap


def rt(w, t):
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = Rotation.from_rotvec(w).as_matrix()
    T[:3, 3] = t
    return T


def test_pose_chaining():
    wm = WorldMap()
    T1 = rt([0, 0, 0.1], [1, 0, 0])
    T2 = rt([0, 0.05, 0], [0, 0, 2])
    wm.add_frame(np.eye(4, dtype=np.float32))
    wm.add_frame(T1)
    wm.add_frame(T2)
    np.testing.assert_allclose(wm.pose_global[2], T1 @ T2, atol=1e-5)


def test_set_global_drags_first_observed_points():
    """Frame::GlobalPose(p) semantics (ref camera_frame.h:32-49)."""
    wm = WorldMap()
    wm.add_frame(np.eye(4, dtype=np.float32))
    ids = wm.add_points(np.asarray([[1.0, 0, 5], [2, 1, 7]], np.float32), 0)
    wm.add_observations(0, ids, np.zeros((2, 4), np.float32))
    new_pose = rt([0, 0, 0], [10, 0, 0])
    wm.set_global_poses(np.asarray([0]), new_pose[None])
    np.testing.assert_allclose(
        wm.points[:2], [[11, 0, 5], [12, 1, 7]], atol=1e-5
    )


def test_propagate_tail():
    """UpdatePose() chain propagation (ref pose_graph_optimizer.cpp:89-92)."""
    wm = WorldMap()
    wm.add_frame(np.eye(4, dtype=np.float32))
    wm.add_frame(rt([0, 0, 0], [0, 0, 1]))
    wm.add_frame(rt([0, 0, 0], [0, 0, 1]))
    # Move frame 1; frame 2 must follow with its rel pose intact.
    new1 = rt([0, 0, 0], [5, 0, 1])
    wm.set_global_poses(np.asarray([1]), new1[None])
    wm.propagate_tail(2)
    np.testing.assert_allclose(wm.pose_global[2], new1 @ wm.pose_rel[2], atol=1e-5)
    np.testing.assert_allclose(wm.pose_global[2][:3, 3], [5, 0, 2], atol=1e-5)


def test_merge_points_union_find():
    wm = WorldMap()
    wm.add_frame(np.eye(4, dtype=np.float32))
    ids = wm.add_points(np.random.randn(6, 3).astype(np.float32), 0)
    wm.add_observations(0, ids, np.zeros((6, 4), np.float32))
    wm.merge_points(np.asarray([3]), np.asarray([1]))
    wm.merge_points(np.asarray([5]), np.asarray([3]))  # chains to 1
    roots = wm.canonical(np.asarray([1, 3, 5]))
    np.testing.assert_array_equal(roots, [1, 1, 1])
    assert wm.point_obs_count[1] == 6  # 2 each from add_points+obs, absorbed


def test_ba_problem_dedup():
    wm = WorldMap()
    wm.add_frame(np.eye(4, dtype=np.float32))
    wm.add_frame(rt([0, 0, 0], [0, 0, 1]))
    ids = wm.add_points(np.random.randn(3, 3).astype(np.float32), 0)
    wm.add_observations(0, ids, np.zeros((3, 4), np.float32))
    wm.add_observations(1, ids[:2], np.ones((2, 4), np.float32))
    prob = wm.ba_problem(0, 2)
    assert prob["cam_world"].shape == (2, 4, 4)
    assert len(prob["point_ids"]) == 3
    assert len(prob["obs_cam"]) == 5
    # local obs indices must be consistent
    assert prob["obs_point"].max() == 2
    assert prob["obs_cam"].max() == 1


def test_global_writeback_vectorized_fast():
    """The global-BA writeback path (set_global_poses over every frame +
    propagate_tail) must stay vectorized: at 4,096 frames it runs per
    batch-boundary on the live critical path, and the r3 per-frame Python
    loops cost O(N) * ~100 us there (r3 verdict weak #4 / directive 9)."""
    import time

    n = 4096
    wm = WorldMap(frame_capacity=n + 1)
    step = rt([0, 0, 1e-4], [0.01, 0, 0.1])
    for _ in range(n):
        wm.add_frame(step)
    ids = wm.add_points(np.random.randn(1000, 3).astype(np.float32), 5)
    wm.add_observations(5, ids, np.zeros((1000, 4), np.float32))

    new_poses = wm.pose_global[: n - 1].copy()
    new_poses[:, 0, 3] += 0.5
    t0 = time.perf_counter()
    wm.set_global_poses(np.arange(n - 1, dtype=np.int32), new_poses)
    wm.propagate_tail(n - 1)
    dt = time.perf_counter() - t0
    # Semantics: tail frame follows with rel pose intact; rotations stay
    # orthonormal after the one-shot batch renormalization.
    np.testing.assert_allclose(
        wm.pose_global[n - 1], wm.pose_global[n - 2] @ wm.pose_rel[n - 1],
        atol=1e-4,
    )
    R = wm.pose_global[n - 1][:3, :3]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
    assert dt < 0.25, f"global writeback took {dt*1e3:.0f} ms (budget 250)"


def test_capacity_growth():
    wm = WorldMap(frame_capacity=2, point_capacity=4, obs_capacity=4)
    for i in range(10):
        wm.add_frame(np.eye(4, dtype=np.float32))
    ids = wm.add_points(np.zeros((50, 3), np.float32), 0)
    wm.add_observations(0, ids, np.zeros((50, 4), np.float32))
    assert wm.num_frames == 10 and wm.num_points == 50 and wm.num_obs == 50
    # union-find parents must stay identity for fresh points
    np.testing.assert_array_equal(wm.canonical(ids), ids)
