"""Flat ORB vocabulary: binary k-medians + tf-idf bag-of-words on TPU.

Replaces DBoW2 (ref `src/loop_detector.h:5-16`, vocabulary branching 9 /
depth 3 = 729 leaves, TF_IDF weighting, L1 scoring per the commented ctor at
ref `src/loop_detector.cpp:8-16`, yml.gz persistence at ref
`src/loop_detector.cpp:156-165`).

TPU-first re-design: a FLAT codebook of `words` 256-bit centroids instead of
a k-ary tree. Tree traversal is a pointer-chasing CPU structure; on TPU,
nearest-word assignment for all N descriptors against all W words is a
single [N,256]x[256,W] matmul on the MXU (the ops/match.py Hamming
formulation), which is faster than a depth-3 tree walk for any practical
vocabulary size — and exact rather than greedy-approximate.

Training is Lloyd's algorithm in Hamming space: assignment by MXU matmul,
centroid update by per-cluster bitwise majority vote (segment-sum of
unpacked bits), empty clusters re-seeded deterministically.

Scoring matches DBoW2's L1 similarity on L1-normalized tf-idf vectors:
    s(v, w) = 1 - 0.5 * |v - w|_1 = sum_i min(v_i, w_i)
(the second equality holds for L1-normalized non-negative vectors), so a
query against the whole frame database is one broadcast min + row-sum.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from stereo_orb_slam_tpu.ops import match, orb


@partial(jax.jit, static_argnames=())
def assign_words(desc, valid, centroids):
    """Nearest-centroid assignment by Hamming distance.

    desc [N,8] uint32, centroids [W,8] uint32 -> (word [N] int32, dist [N]).
    Invalid rows assign to word 0 with dist 257 (mask downstream).
    """
    dist = match.hamming_matrix(desc, centroids, valid_q=valid)
    word = jnp.argmin(dist, axis=1).astype(jnp.int32)
    return word, jnp.min(dist, axis=1)


@partial(jax.jit, static_argnames=("num_words",))
def _kmedians_iter(desc_bits, valid, centroids, num_words: int):
    """One Lloyd iteration in Hamming space.

    desc_bits: [N,256] {0,1} float; centroids packed [W,8].
    Returns new packed centroids and per-word counts.
    """
    desc_packed = orb.pack_bits(desc_bits > 0.5)
    word, _ = assign_words(desc_packed, valid, centroids)
    w = valid.astype(jnp.float32)
    sums = jax.ops.segment_sum(desc_bits * w[:, None], word, num_segments=num_words)
    counts = jax.ops.segment_sum(w, word, num_segments=num_words)
    maj = sums > 0.5 * jnp.maximum(counts[:, None], 1e-6)
    return orb.pack_bits(maj), counts


class OrbVocabulary:
    """Flat binary codebook with tf-idf weights."""

    def __init__(self, centroids: np.ndarray, idf: np.ndarray):
        self.centroids = jnp.asarray(centroids)  # [W,8] uint32
        self.idf = jnp.asarray(idf)              # [W] float32
        self.num_words = centroids.shape[0]

    @staticmethod
    def train(descriptors: np.ndarray, num_words: int = 1024,
              iterations: int = 8, seed: int = 0) -> "OrbVocabulary":
        """Binary k-medians over a descriptor corpus [M,8] uint32."""
        rng = np.random.default_rng(seed)
        M = len(descriptors)
        if M < num_words:
            # Duplicate-pad tiny corpora so every word has a seed.
            reps = -(-num_words // max(M, 1))
            descriptors = np.tile(descriptors, (reps, 1))[: max(num_words, M)]
            M = len(descriptors)
        init_idx = rng.choice(M, num_words, replace=False)
        centroids = jnp.asarray(descriptors[init_idx])

        desc_bits = orb.unpack_bits(jnp.asarray(descriptors))
        valid = jnp.ones(M, bool)
        for _ in range(iterations):
            centroids_new, counts = _kmedians_iter(
                desc_bits, valid, centroids, num_words
            )
            # Re-seed empty words from random descriptors (host-side).
            counts_np = np.asarray(counts)
            empty = np.where(counts_np == 0)[0]
            cent_np = np.array(centroids_new)  # writable copy
            if len(empty):
                cent_np[empty] = descriptors[
                    rng.choice(M, len(empty), replace=False)
                ]
            centroids = jnp.asarray(cent_np)

        # idf from training corpus occupancy: rare words score higher.
        word, _ = assign_words(
            jnp.asarray(descriptors), valid, centroids
        )
        occ = np.bincount(np.asarray(word), minlength=num_words).astype(np.float64)
        idf = np.log(M / (occ + 1.0)).astype(np.float32)
        return OrbVocabulary(np.asarray(centroids), idf)

    def bow_vector(self, desc, valid):
        """L1-normalized tf-idf BoW vector [W] for one frame's descriptors."""
        word, _ = assign_words(desc, valid, self.centroids)
        w = valid.astype(jnp.float32)
        tf = jax.ops.segment_sum(w, word, num_segments=self.num_words)
        v = tf * self.idf
        return v / jnp.maximum(jnp.sum(jnp.abs(v)), 1e-12)

    def save(self, path: str):
        np.savez_compressed(
            path, centroids=np.asarray(self.centroids), idf=np.asarray(self.idf)
        )

    @staticmethod
    def load(path: str) -> "OrbVocabulary":
        data = np.load(path)
        return OrbVocabulary(data["centroids"], data["idf"])


@jax.jit
def l1_scores(query_vec, database):
    """DBoW2 L1 similarity of one BoW vector against all database rows.

    query_vec [W], database [F,W] (rows L1-normalized) -> [F] scores in [0,1].
    """
    return jnp.sum(jnp.minimum(query_vec[None, :], database), axis=1)
