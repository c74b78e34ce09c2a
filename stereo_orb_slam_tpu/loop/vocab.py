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


@partial(jax.jit, static_argnames=("query_size",))
def batch_score_update(desc, valid, recorded, centroids, idf, database,
                       db_size, query_size: int = 4):
    """K frames of BoW scoring + database append in ONE device program.

    The live-loop equivalent of K sequential Query()+Track() calls
    (ref `src/loop_detector.cpp:51-91`), batched so the SLAM hot loop pays
    one dispatch per K frames instead of two per frame:

      - BoW vectors for all K frames (vmapped tf-idf).
      - Each recorded frame j scores against every EARLIER recorded frame:
        the existing database rows [0, db_size) plus recorded batch frames
        before j (the reference queries before tracking, so the database
        never contains the current frame, ref src/slam.cpp:131-134).
      - Recorded frames are appended to the database in order.

    Args:
      desc:      [K, N, 8] uint32 descriptor banks.
      valid:     [K, N] bool.
      recorded:  [K] bool — frames the tracker actually recorded; others are
                 masked out of both scoring and the append.
      database:  [cap, W] L1-normalized BoW rows.
      db_size:   int32 — rows currently occupied.

    Returns:
      top_ids:    [K, query_size] int32 candidate frame ids (-1 padding),
                  sorted by score descending. Ids equal world frame ids.
      top_scores: [K, query_size] float32.
      new_database: [cap, W] with the recorded frames' rows written.
    """
    K = desc.shape[0]
    cap, W = database.shape

    def one_bow(d, v):
        word, _ = assign_words(d, v, centroids)
        w = v.astype(jnp.float32)
        tf = jax.ops.segment_sum(w, word, num_segments=W)
        vec = tf * idf
        return vec / jnp.maximum(jnp.sum(jnp.abs(vec)), 1e-12)

    bows = jax.vmap(one_bow)(desc, valid)  # [K, W]

    rec_i = recorded.astype(jnp.int32)
    prefix = jnp.cumsum(rec_i) - rec_i          # recorded frames before j
    rows = db_size + prefix                     # db row / frame id if recorded

    # Scores vs existing database rows, one query at a time (a [K,cap,W]
    # broadcast would blow VMEM/HBM for large capacities).
    db_scores = jax.lax.map(lambda b: l1_scores(b, database), bows)  # [K,cap]
    col = jnp.arange(cap)[None, :]
    db_valid = col < db_size

    # Intra-batch scores: query j vs earlier recorded batch frame i.
    cross = jnp.sum(
        jnp.minimum(bows[:, None, :], bows[None, :, :]), axis=-1
    )  # [K, K]
    ii = jnp.arange(K)
    batch_valid = recorded[None, :] & (ii[None, :] < ii[:, None])

    neg = jnp.float32(-1.0)
    all_scores = jnp.concatenate(
        [jnp.where(db_valid, db_scores, neg),
         jnp.where(batch_valid, cross, neg)], axis=1
    )  # [K, cap+K]
    all_ids = jnp.concatenate(
        [jnp.broadcast_to(col, (K, cap)),
         jnp.broadcast_to(rows[None, :], (K, K))], axis=1
    )
    top_scores, top_idx = jax.lax.top_k(all_scores, query_size)
    top_ids = jnp.take_along_axis(all_ids, top_idx, axis=1).astype(jnp.int32)
    top_ids = jnp.where(top_scores >= 0.0, top_ids, -1)

    # Append recorded rows; unrecorded rows are parked on a scratch row that
    # is sliced off (duplicate-index scatter order is then immaterial).
    padded = jnp.concatenate([database, jnp.zeros((1, W), database.dtype)], 0)
    safe_rows = jnp.where(recorded, rows, cap)
    new_database = padded.at[safe_rows].set(bows)[:cap]
    return top_ids, top_scores, new_database
