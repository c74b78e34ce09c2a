"""Batched live-loop equivalence: track_batch / process_batch vs sequential.

The TPU hot loop processes K frames per dispatch (frontend_chain scan + one
BoW program + one BA solve). These tests pin that the batched paths replay
the EXACT single-frame semantics: identical per-frame RNG (fold_in schedule),
identical swap/record state machine, identical Bayes-filter trajectories.
"""

import numpy as np

from synth import CloudScene, forward_yaw_trajectory

from stereo_orb_slam_tpu.config import (
    FrontendConfig, LoopConfig, RansacConfig, SlamConfig,
)
from stereo_orb_slam_tpu.frontend.odometer import VisualOdometer
from stereo_orb_slam_tpu.loop import LoopDetector, OrbVocabulary
from stereo_orb_slam_tpu.utils import evaluate
from stereo_orb_slam_tpu.worldmap import WorldMap

FE = FrontendConfig(num_features=128)
RC = RansacConfig(final_model_fitting=True)


def _make_seq(n, blank=()):
    traj = forward_yaw_trajectory(n, speed=0.25, yaw_rate_deg=1.5)
    scene = CloudScene(
        np.random.default_rng(1), traj, fx=240.0, baseline=0.6,
        depth_range=(4.0, 14.0), n_per_anchor=40, anchor_stride=4,
    )
    seq = scene.render_sequence(traj)
    for b in blank:
        # Texture-free frames: < min_stereo_matches -> not recorded.
        seq[b] = (np.full_like(seq[b][0], 96.0), np.full_like(seq[b][1], 96.0))
    return traj, scene, seq


def test_track_batch_equals_sequential():
    """K-frame scan + consolidated readback is bitwise the same trajectory
    as K single-frame dispatches (same fold_in key schedule), including a
    not-recorded blank frame mid-batch."""
    n = 12
    traj, scene, seq = _make_seq(n, blank=(7,))
    rig = scene.make_rig()

    w1 = WorldMap(feat_slots=FE.num_features)
    vo1 = VisualOdometer(w1, rig, FE, RC, seed=3)
    for il, ir in seq:
        vo1.track(il, ir)

    w2 = WorldMap(feat_slots=FE.num_features)
    vo2 = VisualOdometer(w2, rig, FE, RC, seed=3)
    out = []
    for s in range(0, n, 4):
        imgs_l = np.stack([seq[i][0] for i in range(s, s + 4)])
        imgs_r = np.stack([seq[i][1] for i in range(s, s + 4)])
        out += vo2.track_batch(imgs_l, imgs_r)

    assert vo2.last_batch_recorded is not None
    assert w1.num_frames == w2.num_frames == n - 1  # blank frame dropped
    np.testing.assert_array_equal(
        w1.pose_global[: w1.num_frames], w2.pose_global[: w2.num_frames]
    )
    assert w1.num_points == w2.num_points
    np.testing.assert_array_equal(
        w1.points[: w1.num_points], w2.points[: w2.num_points]
    )
    assert w1.num_obs == w2.num_obs
    np.testing.assert_array_equal(
        w1.obs_point[: w1.num_obs], w2.obs_point[: w2.num_obs]
    )


def test_loop_detector_batch_equivalence(rng):
    """process_batch (one scoring dispatch per K frames) reproduces the
    sequential query()+track() Bayes trajectory exactly, including the
    masking of unrecorded frames."""
    n_frames, n_feat = 40, 64
    corpus = rng.integers(0, 2 ** 32, (4096, 8), dtype=np.uint32)
    vocab = OrbVocabulary.train(corpus, num_words=128, iterations=3)

    # Frame descriptors: revisit -> frames 30+ reuse frames 0+'s descriptors.
    frames = []
    for i in range(n_frames):
        if i >= 30:
            d = frames[i - 30][0].copy()
        else:
            d = rng.integers(0, 2 ** 32, (n_feat, 8), dtype=np.uint32)
        frames.append((d, np.ones(n_feat, bool)))
    recorded = np.ones(n_frames, bool)
    recorded[[5, 17]] = False

    cfg = LoopConfig(distant_frame_thresh=20, database_capacity=16)
    d1 = LoopDetector(vocab, cfg)
    for i in range(n_frames):
        if recorded[i]:
            d1.query(*frames[i])
            d1.track(*frames[i])

    d2 = LoopDetector(vocab, cfg)
    k = 8
    for s in range(0, n_frames, k):
        chunk = frames[s : s + k]
        d2.process_batch(
            np.stack([c[0] for c in chunk]),
            np.stack([c[1] for c in chunk]),
            recorded[s : s + k],
        )

    assert d1.db_size == d2.db_size == int(recorded.sum())
    assert d1.matches == d2.matches
    assert np.allclose(d1.frame_scores, d2.frame_scores, atol=1e-5)
    assert np.allclose(d1.probabilities, d2.probabilities, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(d1.database[: d1.db_size]),
        np.asarray(d2.database[: d2.db_size]), atol=1e-6,
    )


def test_fused_bow_batch_equals_sequential_loop(rng):
    """process_batch with a vocabulary (BoW scoring FUSED into the front-end
    device program, top-k riding the packed readback) reproduces the
    sequential process() Bayes trajectory and database exactly. BA disabled
    so the two cadences are bitwise-comparable."""
    from stereo_orb_slam_tpu.apps.slam import SlamSystem

    n = 16
    traj, scene, seq = _make_seq(n, blank=(9,))
    corpus = rng.integers(0, 2 ** 32, (4096, 8), dtype=np.uint32)
    vocab = OrbVocabulary.train(corpus, num_words=128, iterations=3)
    cfg = SlamConfig().replace(
        frontend=FE, ransac=RC, per_frame_ba=False,
        refine_interval=10 ** 6, batch_frames=4,
        loop=LoopConfig(vocab_words=128, database_capacity=8,
                        distant_frame_thresh=6, adjacent_frame_thresh=2),
    )

    s1 = SlamSystem(scene.make_rig(), cfg, vocab=vocab)
    for il, ir in seq:
        s1.process(il, ir)

    s2 = SlamSystem(scene.make_rig(), cfg, vocab=vocab)
    for s in range(0, n, 4):
        s2.process_batch(
            np.stack([seq[i][0] for i in range(s, s + 4)]),
            np.stack([seq[i][1] for i in range(s, s + 4)]),
        )
    s2.flush()  # drain the 2-deep pipeline

    assert s1.loop.db_size == s2.loop.db_size == n - 1
    assert s1.loop.matches == s2.loop.matches
    assert np.allclose(s1.loop.probabilities, s2.loop.probabilities, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(s1.loop.database[: s1.loop.db_size]),
        np.asarray(s2.loop.database[: s2.loop.db_size]), atol=1e-5,
    )
    np.testing.assert_array_equal(
        s1.world.pose_global[: s1.world.num_frames],
        s2.world.pose_global[: s2.world.num_frames],
    )


def test_vocab_trains_midflight_database_consistent(rng):
    """The default CLI path (no --vocab, batch_frames>1) trains the
    vocabulary while a bow-less batch is in flight. The pipeline must drain
    BEFORE the device database snapshot is built, or the next fused dispatch
    scores/appends against a snapshot missing the pending batch's rows and
    ingest_batch_topk clobbers the host-replayed rows (advisor r2, high).

    Invariant pinned here: at the end, database row f == the recomputed BoW
    vector of recorded frame f's stored descriptors, for EVERY frame."""
    import jax.numpy as jnp

    from stereo_orb_slam_tpu.apps.slam import SlamSystem
    from stereo_orb_slam_tpu.config import SlamConfig

    n = 24
    traj, scene, seq = _make_seq(n)
    cfg = SlamConfig().replace(
        frontend=FE, ransac=RC, per_frame_ba=False,
        refine_interval=10 ** 6, batch_frames=4,
        loop=LoopConfig(vocab_words=128, vocab_iterations=2,
                        database_capacity=8, distant_frame_thresh=6,
                        adjacent_frame_thresh=2),
    )
    system = SlamSystem(scene.make_rig(), cfg, vocab=None,
                        vocab_train_frames=10)
    out = []
    for s in range(0, n, 4):
        out += system.process_batch(
            np.stack([seq[i][0] for i in range(s, s + 4)]),
            np.stack([seq[i][1] for i in range(s, s + 4)]),
        )
    out += system.flush()

    assert system.loop is not None, "vocabulary never trained"
    # No transform dropped anywhere (advisor r2, low: the resize/drain paths
    # must forward the drained batch's transforms to the caller).
    assert len(out) == n
    w = system.world
    assert system.loop.db_size == w.num_frames
    # Descriptors live in the device banks on the fused path; pull them
    # down once before reading the host mirror.
    system.sync_feature_banks()
    assert not w.frame_desc_stale
    db = np.asarray(system.loop.database)[: system.loop.db_size]
    for f in range(w.num_frames):
        expected = np.asarray(system.vocab.bow_vector(
            jnp.asarray(w.frame_desc[f]), jnp.asarray(w.frame_feat_valid[f])
        ))
        np.testing.assert_allclose(
            db[f], expected, atol=1e-5,
            err_msg=f"database row {f} diverged from frame {f}'s BoW vector",
        )


def test_pipelined_ba_is_bitwise_neutral():
    """The live loop pipelines two batches deep: the front-end chain of
    batch i is dispatched before batch i-1's results are collected, and
    each batch's BA writeback lands at the start of the next call. All
    host bookkeeping replays in dispatch order, so draining the pipeline
    after every single batch must produce the identical world."""
    from stereo_orb_slam_tpu.apps.slam import SlamSystem

    n = 24
    traj, scene, seq = _make_seq(n)
    cfg = SlamConfig().replace(
        frontend=FE, ransac=RC, refine_interval=8, batch_frames=6
    )

    def run(force_sync):
        system = SlamSystem(scene.make_rig(), cfg, vocab=None,
                            vocab_train_frames=10 ** 9)
        for s in range(0, n, 6):
            system.process_batch(
                np.stack([seq[i][0] for i in range(s, s + 6)]),
                np.stack([seq[i][1] for i in range(s, s + 6)]),
            )
            if force_sync:
                system.flush()
        system.finish()
        return system.world

    w1 = run(True)
    w2 = run(False)
    np.testing.assert_array_equal(
        w1.pose_global[: w1.num_frames], w2.pose_global[: w2.num_frames]
    )
    np.testing.assert_array_equal(
        w1.points[: w1.num_points], w2.points[: w2.num_points]
    )


def test_slam_process_batch_ate():
    """Full SLAM through process_batch (batched BA window) stays within the
    accuracy bound of the sequential path."""
    from stereo_orb_slam_tpu.apps.slam import SlamSystem

    n = 24
    traj, scene, seq = _make_seq(n)
    cfg = SlamConfig().replace(
        frontend=FE, ransac=RC, refine_interval=8, batch_frames=6
    )
    system = SlamSystem(scene.make_rig(), cfg, vocab=None,
                        vocab_train_frames=10 ** 9)
    for s in range(0, n, 6):
        system.process_batch(
            np.stack([seq[i][0] for i in range(s, s + 6)]),
            np.stack([seq[i][1] for i in range(s, s + 6)]),
        )
    system.finish()
    w = system.world
    assert w.num_frames == n
    ate = evaluate.ate_rmse(w.pose_global[: w.num_frames], traj)
    assert ate < 0.15, f"batched SLAM ATE {ate:.3f} m"


def test_bow_batch_then_sequential_remainder(rng):
    """Mode switch batched->sequential mid-run (the endurance harness's
    remainder frames, frames % batch != 0): in live/BoW batches the packed
    readback drops descriptors (device-resident banks), so the host prev
    mirror has desc=None — the sequential track() must recover the swapped
    frame's descriptors from the device scan carry and reproduce the fully
    sequential trajectory exactly (r5 regression: AttributeError on
    prev.desc in ops/match)."""
    from stereo_orb_slam_tpu.apps.slam import SlamSystem

    n = 16
    traj, scene, seq = _make_seq(n)
    corpus = rng.integers(0, 2 ** 32, (4096, 8), dtype=np.uint32)
    vocab = OrbVocabulary.train(corpus, num_words=128, iterations=3)
    cfg = SlamConfig().replace(
        frontend=FE, ransac=RC, per_frame_ba=False,
        refine_interval=10 ** 6, batch_frames=4,
        loop=LoopConfig(vocab_words=128, database_capacity=8,
                        distant_frame_thresh=6, adjacent_frame_thresh=2),
    )

    s1 = SlamSystem(scene.make_rig(), cfg, vocab=vocab)
    for il, ir in seq:
        s1.process(il, ir)

    s2 = SlamSystem(scene.make_rig(), cfg, vocab=vocab)
    for s in range(0, 12, 4):
        s2.process_batch(
            np.stack([seq[i][0] for i in range(s, s + 4)]),
            np.stack([seq[i][1] for i in range(s, s + 4)]),
        )
    for i in range(12, n):  # remainder frames through the sequential path
        s2.process(*seq[i])
    s2.flush()

    assert s1.loop.db_size == s2.loop.db_size == n
    assert np.allclose(s1.loop.probabilities, s2.loop.probabilities,
                       atol=1e-6)
    np.testing.assert_array_equal(
        s1.world.pose_global[: s1.world.num_frames],
        s2.world.pose_global[: s2.world.num_frames],
    )
    np.testing.assert_array_equal(
        s1.world.frame_desc[: s1.world.num_frames],
        s2.world.frame_desc[: s2.world.num_frames],
    )
