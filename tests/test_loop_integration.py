"""Full-system loop closure: an out-and-back trajectory through SlamSystem
must raise the loop probability on revisit, commit edges, run the pose-graph
optimizer at finish, and merge revisited landmark identities."""

import numpy as np

from stereo_orb_slam_tpu.apps.slam import SlamSystem
from stereo_orb_slam_tpu.config import (
    FrontendConfig,
    LoopConfig,
    RansacConfig,
    SlamConfig,
)
from tests.synth import PlaneScene


def test_slam_loop_closure_end_to_end(rng):
    scene = PlaneScene(rng)
    rig = scene.make_rig()

    cfg = SlamConfig(
        frontend=FrontendConfig(num_features=256),
        ransac=RansacConfig(num_hypotheses=64),
        loop=LoopConfig(
            distant_frame_thresh=10,
            adjacent_frame_thresh=3,
            database_capacity=64,
            # Larger query so the revisited early frames stay in the top-k
            # even once the dwell frames rank each other first.
            query_size=8,
        ),
        refine_interval=10 ** 6,   # disable window BA for speed
        per_frame_ba=False,
    )
    system = SlamSystem(rig, cfg, vocab_train_frames=8)

    # Trajectory: 12 frames out (+x), 12 back, then dwelling near the start
    # long enough for the Bayes filter (x2 per matched frame from 0.005) to
    # cross the 0.9 loop threshold.
    step = 0.2
    xs = (
        [i * step for i in range(12)]
        + [(11 - i) * step for i in range(12)]
        + [0.02 * (i % 3) for i in range(14)]
    )
    for x in xs:
        system.process(scene.render(x), scene.render(x, right=True))

    assert system.loop is not None, "vocabulary should have trained"
    # Revisit must have driven the Bayes filter into a loop.
    assert max(system.loop.probabilities) > 0.9
    assert system.loop.in_loop or system.pgo.loop_edges

    stats = system.finish()
    pg = stats["pose_graph"]
    assert pg["num_loop_edges"] >= 1, pg
    assert pg["num_vertices"] == len(xs)

    # Loop-closure landmark merging: some later-frame landmarks now resolve
    # to earlier canonical ids.
    w = system.world
    ids = np.arange(w.num_points, dtype=np.int32)
    roots = w.canonical(ids)
    assert (roots != ids).sum() > 10

    # Trajectory still sane after pose graph + global BA.
    est_x = w.pose_global[: w.num_frames][:, 0, 3]
    np.testing.assert_allclose(est_x, xs, atol=0.12)
