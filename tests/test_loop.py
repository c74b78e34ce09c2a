"""Loop detection: vocabulary training, BoW scoring, Bayes filter."""

import numpy as np
import jax.numpy as jnp

from stereo_orb_slam_tpu.config import LoopConfig
from stereo_orb_slam_tpu.loop import LoopDetector, OrbVocabulary
from stereo_orb_slam_tpu.loop.vocab import assign_words, l1_scores


def clustered_descriptors(rng, n_clusters=32, per_cluster=40, flip_bits=8):
    """Descriptors in tight Hamming clusters."""
    centers = rng.integers(0, 2, (n_clusters, 256)).astype(np.uint8)
    descs, labels = [], []
    for c in range(n_clusters):
        for _ in range(per_cluster):
            d = centers[c].copy()
            flips = rng.choice(256, flip_bits, replace=False)
            d[flips] ^= 1
            descs.append(d)
            labels.append(c)
    bits = np.asarray(descs, np.uint8)
    packed = np.zeros((len(bits), 8), np.uint32)
    for w in range(8):
        for b in range(32):
            packed[:, w] |= bits[:, w * 32 + b].astype(np.uint32) << b
    return packed, np.asarray(labels)


def frame_descs(rng, base, n=64, flip=6):
    """A 'view' of scene `base`: its descriptors with a few bit flips."""
    out = base.copy()
    for i in range(len(out)):
        flips = rng.choice(256, flip, replace=False)
        for f in flips:
            out[i, f // 32] ^= np.uint32(1) << np.uint32(f % 32)
    return out


def test_vocab_separates_clusters(rng):
    packed, labels = clustered_descriptors(rng)
    vocab = OrbVocabulary.train(packed, num_words=64, iterations=6, seed=1)
    word, _ = assign_words(
        jnp.asarray(packed), jnp.ones(len(packed), bool), vocab.centroids
    )
    word = np.asarray(word)
    # Same-cluster descriptors should land on the same word most of the time.
    purity = 0.0
    for c in np.unique(labels):
        w = word[labels == c]
        purity += (w == np.bincount(w).argmax()).mean()
    purity /= len(np.unique(labels))
    assert purity > 0.8


def test_bow_scores_same_scene_higher(rng):
    packed, labels = clustered_descriptors(rng)
    vocab = OrbVocabulary.train(packed, num_words=64, iterations=6, seed=1)

    sceneA = packed[rng.choice(len(packed), 64, replace=False)]
    sceneB = packed[rng.choice(len(packed), 64, replace=False)]
    vA1 = vocab.bow_vector(jnp.asarray(frame_descs(rng, sceneA)), jnp.ones(64, bool))
    vA2 = vocab.bow_vector(jnp.asarray(frame_descs(rng, sceneA)), jnp.ones(64, bool))
    vB = vocab.bow_vector(jnp.asarray(frame_descs(rng, sceneB)), jnp.ones(64, bool))
    db = jnp.stack([vA2, vB])
    scores = np.asarray(l1_scores(vA1, db))
    assert scores[0] > scores[1]
    assert scores[0] > 0.5


def test_vocab_save_load(tmp_path, rng):
    packed, _ = clustered_descriptors(rng, n_clusters=8, per_cluster=20)
    vocab = OrbVocabulary.train(packed, num_words=32, iterations=3)
    p = str(tmp_path / "vocab.npz")
    vocab.save(p)
    v2 = OrbVocabulary.load(p)
    np.testing.assert_array_equal(np.asarray(vocab.centroids), np.asarray(v2.centroids))
    np.testing.assert_allclose(np.asarray(vocab.idf), np.asarray(v2.idf))


class FakeOptimizer:
    def __init__(self):
        self.edges = []
        self.optimize_calls = 0

    def add_loop_edge(self, a, b):
        self.edges.append((a, b))

    def optimize(self, live=False):
        self.optimize_calls += 1


def test_loop_filter_detects_revisit(rng):
    """Drive the Bayes filter through a revisit scenario: distinct scenes,
    then return to scene 0 -> probability must rise, edges committed,
    optimizer triggered on loop exit."""
    n_scenes = 70
    # Simulate a smooth trajectory: frame i sees a sliding window over a
    # long strip of world descriptors, so ADJACENT frames overlap strongly
    # (as in real video) while distant frames share nothing — the property
    # the reference's z-score match test relies on.
    strip = rng.integers(0, 2**32, (n_scenes * 8 + 64, 8), dtype=np.uint32)
    scenes = [strip[i * 8 : i * 8 + 64] for i in range(n_scenes)]
    vocab = OrbVocabulary.train(strip, num_words=128, iterations=5, seed=2)

    cfg = LoopConfig(distant_frame_thresh=50, database_capacity=256)
    opt = FakeOptimizer()
    det = LoopDetector(vocab, cfg, optimizer=opt)
    valid = np.ones(64, bool)

    # Pass 1: 70 distinct frames.
    for i in range(n_scenes):
        det.query(frame_descs(rng, scenes[i]), valid)
        det.track(frame_descs(rng, scenes[i]), valid)

    # No loop declared during the first pass (occasional spurious distant
    # hits may bump p, but never near the loop threshold).
    assert det.loop_probability < 0.5
    assert not det.in_loop

    # Revisit scenes 0..8 -> distant hits.
    for i in range(9):
        det.query(frame_descs(rng, scenes[i]), valid)
        det.track(frame_descs(rng, scenes[i]), valid)
    p_during = det.loop_probability
    assert p_during > 0.5, f"loop probability stayed at {p_during}"

    # Leave: new scenes again; probability decays, loop exits, optimizer runs.
    fresh = [
        rng.integers(0, 2**32, (64, 8), dtype=np.uint32) for _ in range(12)
    ]
    for d in fresh:
        det.query(d, valid)
        det.track(d, valid)
    assert det.loop_probability < 0.1
    assert opt.optimize_calls >= 1
    assert len(opt.edges) >= 1
    # Edges link a revisit frame (>=70) back to an early frame (<10).
    a, b = opt.edges[0]
    assert a < 10 and b >= 70


def test_loop_trace_format(tmp_path, rng):
    packed, _ = clustered_descriptors(rng, n_clusters=8, per_cluster=10)
    vocab = OrbVocabulary.train(packed, num_words=16, iterations=2)
    det = LoopDetector(vocab, LoopConfig(database_capacity=16))
    valid = np.ones(16, bool)
    for i in range(3):
        d = packed[rng.choice(len(packed), 16, replace=False)]
        det.query(d, valid)
        det.track(d, valid)
    p = str(tmp_path / "loop_matches.txt")
    det.save_trace(p)
    lines = open(p).read().splitlines()
    assert len(lines) == 3
    assert lines[0].startswith("frame 0 matches with frame")
