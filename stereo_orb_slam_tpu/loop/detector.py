"""Bayesian loop detector over the BoW frame database.

Faithful re-implementation of the reference's loop filter
(ref `src/loop_detector.cpp:51-197`), with its quirks handled deliberately
(SURVEY.md §7):

- `query()` is called BEFORE `track()` each frame, so the database never
  contains the current frame at query time (ref `src/slam.cpp:131-134`).
- top-`query_size` database hits; hits within `adjacent_frame_thresh`
  maintain the running adjacent-score estimate; hits beyond
  `distant_frame_thresh` are loop candidates (ref :83-114).
- candidate probability = erf of the z-score of the hit's score against the
  adjacent scores around the candidate frame (ref `MatchProbability`,
  :172-197). FIXED vs the reference: the score window is indexed by frame id
  into a per-frame array (the reference appends to `m_scores` only on
  adjacent hits, then indexes it by frame id — unguarded and misaligned,
  ref :86-91,179-183); we record one score per frame and clamp the window.
- Bayes update p <- p * match_p / score_p with the score prior stubbed at
  0.5 exactly as the reference does (ref `ScoreProbability`, :167-170),
  clamped to [min, max]; decay by 0.75 on miss (ref :116-120).
- entering a loop (p > is_loop) commits the queued candidate edges once;
  leaving it (p < not_loop) commits the remainder and TRIGGERS the
  pose-graph optimizer (ref :123-151).

The database itself is a device-resident [capacity, W] matrix of
L1-normalized BoW rows; a query is one broadcast-min matmul-shaped reduction
(loop/vocab.py) — the TPU replacement for DBoW2's inverted index.
"""

from __future__ import annotations

import math
from typing import Optional

import jax.numpy as jnp
import numpy as np

from stereo_orb_slam_tpu.config import LoopConfig
from stereo_orb_slam_tpu.loop.vocab import OrbVocabulary, l1_scores


class LoopDetector:
    def __init__(self, vocab: OrbVocabulary, cfg: Optional[LoopConfig] = None,
                 optimizer=None):
        self.vocab = vocab
        self.cfg = cfg or LoopConfig()
        self.optimizer = optimizer  # PoseGraphOptimizer or None

        cap = self.cfg.database_capacity
        self.database = jnp.zeros((cap, vocab.num_words), jnp.float32)
        self.db_size = 0

        self.loop_probability = self.cfg.min_loop_probability
        self.in_loop = False
        self.potential_edges: list = []
        self.frame_scores: list = []   # per-frame adjacent-match score
        self.matches: list = []        # (best_id, best_score) per query
        self.probabilities: list = []  # p trace per query

    # ------------------------------------------------------------------ DB ops
    def _ensure_capacity(self, need: int):
        cap = self.database.shape[0]
        if need <= cap:
            return
        new_cap = cap
        while new_cap < need:
            new_cap *= 2
        bigger = jnp.zeros((new_cap, self.vocab.num_words), jnp.float32)
        self.database = bigger.at[:cap].set(self.database)

    def track(self, desc, valid):
        """Add the frame's BoW vector to the database (ref :51-54)."""
        self._ensure_capacity(self.db_size + 1)
        vec = self.vocab.bow_vector(jnp.asarray(desc), jnp.asarray(valid))
        self.database = self.database.at[self.db_size].set(vec)
        self.db_size += 1

    def query(self, desc, valid) -> Optional[tuple]:
        """Score against all prior frames; run the Bayes loop filter.

        Returns (best_id, best_score) or None if the DB is empty.
        """
        if self.db_size == 0:
            return self._filter_update([])

        vec = self.vocab.bow_vector(jnp.asarray(desc), jnp.asarray(valid))
        # Score against the FULL fixed-capacity database and slice on host:
        # slicing the device array to db_size would change the jit shape
        # every frame and recompile the scoring program per frame.
        scores = np.asarray(l1_scores(vec, self.database))[: self.db_size]
        k = min(self.cfg.query_size, len(scores))
        top_ids = np.argsort(-scores)[:k]
        return self._filter_update(
            [(int(i), float(scores[i])) for i in top_ids]
        )

    def process_batch(self, desc_stack, valid_stack, recorded) -> list:
        """K frames of Query()+Track() with ONE device dispatch.

        desc_stack [K,N,8], valid_stack [K,N], recorded [K] bool (frames the
        tracker recorded; others are skipped entirely — a deliberate fix of
        the reference, which queries/tracks a STALE feature container on
        failed frames and lets database ids drift off frame ids,
        ref src/slam.cpp:131-134 + src/loop_detector.cpp:58).

        Equivalent to the sequential path: candidate masking inside
        vocab.batch_score_update reproduces query-before-track ordering.
        Returns a list of K results ((best_id, best_score) | None).
        """
        from stereo_orb_slam_tpu.loop.vocab import batch_score_update

        recorded = np.asarray(recorded, bool)
        k = len(recorded)
        self._ensure_capacity(self.db_size + int(recorded.sum()))
        top_ids, top_scores, new_db = batch_score_update(
            jnp.asarray(desc_stack), jnp.asarray(valid_stack),
            jnp.asarray(recorded), self.vocab.centroids, self.vocab.idf,
            self.database, jnp.int32(self.db_size),
            query_size=self.cfg.query_size,
        )
        ti = np.asarray(top_ids)      # small consolidated readback
        ts = np.asarray(top_scores)
        return self.ingest_batch_topk(ti, ts, recorded, new_db)

    def ingest_batch_topk(self, top_ids, top_scores, recorded,
                          new_database) -> list:
        """Host Bayes-filter replay from a batch's top-k candidates.

        Used by both process_batch and the fused front-end path
        (odometer.frontend_chain_packed_bow), where the device program has
        already scored + appended the recorded frames: `new_database` is
        adopted as-is and db_size advances one per recorded frame.
        """
        self.database = new_database
        results = []
        for j in range(len(recorded)):
            if not recorded[j]:
                results.append(None)
                continue
            top = [(int(i), float(s))
                   for i, s in zip(top_ids[j], top_scores[j]) if i >= 0]
            results.append(self._filter_update(top))
            self.db_size += 1  # the device program already appended the row
        return results

    def _filter_update(self, top: list) -> Optional[tuple]:
        """One Bayes-filter step given the top-k (frame_id, score) candidates
        for the CURRENT frame (id = db_size). Shared by the sequential and
        batched query paths (ref :83-151)."""
        cfg = self.cfg
        curr_id = self.db_size

        if not top:
            self.matches.append((-1, 0.0))
            self.frame_scores.append(0.0)
            self.probabilities.append(self.loop_probability)
            return None

        self.matches.append(top[0])

        # Adjacent hit -> update the running per-frame score (ref :83-91).
        adjacent_score = 0.0
        for fid, score in top:
            if curr_id - fid < cfg.adjacent_frame_thresh:
                adjacent_score = score
                break
        self.frame_scores.append(adjacent_score)

        # Distant hit -> loop candidate (ref :93-114).
        matched = False
        for fid, score in top:
            if curr_id - fid > cfg.distant_frame_thresh:
                p = self._match_probability(int(fid), score)
                if p > cfg.match_probability_thresh:
                    self.loop_probability = min(
                        self.loop_probability * p / cfg.score_probability,
                        cfg.max_loop_probability,
                    )
                    self.potential_edges.append((int(fid), curr_id))
                    matched = True
                    break

        if not matched:
            self.loop_probability = max(
                self.loop_probability * cfg.decay_rate,
                cfg.min_loop_probability,
            )

        if self.loop_probability > cfg.is_loop_thresh and not self.in_loop:
            # Entering a loop: commit queued edges once (ref :123-134).
            self._commit_edges()
            self.in_loop = True

        if self.loop_probability < cfg.not_loop_thresh:
            # Leaving / denying (ref :137-151).
            if self.in_loop:
                self._commit_edges()
                self.in_loop = False
                if self.optimizer is not None:
                    # Mid-run solve on the live critical path: global BA is
                    # wall-capped (PoseGraphConfig.live_ba_max_seconds).
                    self.optimizer.optimize(live=True)
            self.potential_edges.clear()

        self.probabilities.append(self.loop_probability)
        return top[0]

    # ------------------------------------------------------------- internals
    def _commit_edges(self):
        if self.optimizer is not None:
            for (a, b) in self.potential_edges:
                self.optimizer.add_loop_edge(a, b)
        self.potential_edges.clear()

    def _match_probability(self, fid: int, score: float) -> float:
        """erf z-score of the candidate score vs adjacent scores near fid
        (ref :172-197, window clamped + variance floored)."""
        w = self.cfg.score_window
        lo = max(0, min(fid, len(self.frame_scores) - 1))
        window = self.frame_scores[lo : lo + w]
        if not window:
            return 0.0
        arr = np.asarray(window, np.float64)
        avg = arr.mean()
        var = max(arr.var(), 1e-8)
        dev = (score - avg) / math.sqrt(var)
        return math.erf(dev)

    def save_trace(self, path: str):
        """loop_matches.txt equivalent (ref :36-49)."""
        with open(path, "w") as f:
            for i, ((fid, s), p) in enumerate(
                zip(self.matches, self.probabilities)
            ):
                f.write(
                    f"frame {i} matches with frame {fid} at score {s:.6g} "
                    f"probability = {p:.6g}\n"
                )
