"""stereo_orb_slam_tpu — a TPU-native stereo visual SLAM framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
C++ pipeline (Victor-YG/stereo_orb_slam): ORB front-end tracking, batched
RANSAC visual odometry, Schur-complement bundle adjustment, bag-of-words loop
detection, and SE(3) pose-graph optimization — built for TPU hardware
(MXU-friendly matmuls, static shapes, `shard_map` distribution) rather than
translated from the reference's OpenCV/Ceres/g2o stack.

Layer map (mirrors reference SURVEY.md §1, re-architected):

  L1 geometry/ io/ config  — SE(3), camera models, loaders, calib, export
  L2 worldmap/             — SoA map state (poses / landmarks / observations)
  L3 frontend/ ops/        — detection, ORB, matching, RANSAC odometry
  L4 loop/                 — BoW vocabulary + Bayesian loop filter
  L5 backend/              — bundle adjustment + pose-graph optimizer
  L6 apps/                 — visual_odometry and slam CLI entry points
  ∥  parallel/             — device-mesh sharded BA / pose-graph solvers
"""

__version__ = "0.1.0"

from stereo_orb_slam_tpu.config import (
    BAConfig,
    FrontendConfig,
    LoopConfig,
    PoseGraphConfig,
    RansacConfig,
    SlamConfig,
)

__all__ = [
    "BAConfig",
    "FrontendConfig",
    "LoopConfig",
    "PoseGraphConfig",
    "RansacConfig",
    "SlamConfig",
]
