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


def test_loop_closure_with_offline_vocabulary(rng, tmp_path):
    """Offline-vocabulary workflow (ref src/slam.cpp:101,171): the codebook
    is trained on a SEPARATE corpus (different texture seed), saved, loaded,
    and loop closure still fires — no train-on-query-set contamination."""
    import jax.numpy as jnp

    from stereo_orb_slam_tpu.frontend.odometer import detect_and_describe
    from stereo_orb_slam_tpu.loop import OrbVocabulary

    # Corpus scene: unrelated texture (different seed/scale).
    fe = FrontendConfig(num_features=256)
    corpus_scene = PlaneScene(np.random.default_rng(999), tex_scale=0.03)
    descs = []
    for x in np.linspace(0, 3.0, 10):
        img = corpus_scene.render(x)
        _, v, d = detect_and_describe(jnp.asarray(img), fe)
        descs.append(np.asarray(d)[np.asarray(v)])
    corpus = np.concatenate(descs)
    vocab = OrbVocabulary.train(corpus, num_words=256, iterations=4)
    path = str(tmp_path / "vocab.npz")
    vocab.save(path)
    loaded = OrbVocabulary.load(path)

    scene = PlaneScene(rng)
    cfg = SlamConfig(
        frontend=fe,
        ransac=RansacConfig(num_hypotheses=64),
        loop=LoopConfig(
            distant_frame_thresh=10, adjacent_frame_thresh=3,
            database_capacity=64, query_size=8, vocab_words=256,
        ),
        refine_interval=10 ** 6,
        per_frame_ba=False,
    )
    system = SlamSystem(scene.make_rig(), cfg, vocab=loaded,
                        vocab_train_frames=10 ** 9)

    step = 0.2
    # Longer dwell than the online-vocab test: a foreign-corpus codebook is
    # less discriminative on this scene, so the Bayes filter needs a few
    # more revisit hits to cross the 0.9 loop threshold.
    xs = (
        [i * step for i in range(12)]
        + [(11 - i) * step for i in range(12)]
        + [0.02 * (i % 3) for i in range(24)]
    )
    for x in xs:
        system.process(scene.render(x), scene.render(x, right=True))

    assert max(system.loop.probabilities) > 0.9
    stats = system.finish()
    assert stats["pose_graph"]["num_loop_edges"] >= 1


def test_batched_loop_matcher_equals_serial(rng):
    """make_loop_matcher.batch(E edges) — one device program for all edges —
    must produce the same transforms, flags, and landmark merges as E
    per-edge calls (the path the reference runs serially at
    ref pose_graph_optimizer.cpp:175-249)."""
    import copy

    from stereo_orb_slam_tpu.apps.slam import make_loop_matcher

    scene = PlaneScene(rng)
    rig = scene.make_rig()
    cfg = SlamConfig(
        frontend=FrontendConfig(num_features=256),
        ransac=RansacConfig(num_hypotheses=64),
        refine_interval=10 ** 6,
        per_frame_ba=False,
    )
    system = SlamSystem(rig, cfg, vocab_train_frames=10 ** 9)
    step = 0.2
    xs = [i * step for i in range(8)] + [(7 - i) * step for i in range(8)]
    for x in xs:
        system.process(scene.render(x), scene.render(x, right=True))

    # Out-and-back: frame 15 revisits frame 0's view, 14 revisits 1, ...
    edges = [(0, 15), (1, 14), (2, 13), (3, 12)]

    world_a = system.world
    world_b = copy.deepcopy(system.world)

    m_serial = make_loop_matcher(world_a, rig, cfg, seed=77)
    m_batch = make_loop_matcher(world_b, rig, cfg, seed=77)

    serial = [m_serial(s, d) for (s, d) in edges]
    batch = m_batch.batch(edges)

    assert any(ok for _, ok in serial), "expected at least one measured edge"
    for (Zs, oks), (Zb, okb) in zip(serial, batch):
        assert oks == okb
        if oks:
            np.testing.assert_array_equal(Zs, Zb)

    # Landmark merges replayed identically.
    np.testing.assert_array_equal(world_a.point_parent, world_b.point_parent)
    np.testing.assert_array_equal(
        world_a.point_obs_count, world_b.point_obs_count
    )
