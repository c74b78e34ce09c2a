from stereo_orb_slam_tpu.utils import evaluate, logging, profiling

__all__ = ["evaluate", "logging", "profiling"]
