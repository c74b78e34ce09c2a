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


def test_capacity_growth():
    wm = WorldMap(frame_capacity=2, point_capacity=4, obs_capacity=4)
    for i in range(10):
        wm.add_frame(np.eye(4, dtype=np.float32))
    ids = wm.add_points(np.zeros((50, 3), np.float32), 0)
    wm.add_observations(0, ids, np.zeros((50, 4), np.float32))
    assert wm.num_frames == 10 and wm.num_points == 50 and wm.num_obs == 50
    # union-find parents must stay identity for fresh points
    np.testing.assert_array_equal(wm.canonical(ids), ids)
