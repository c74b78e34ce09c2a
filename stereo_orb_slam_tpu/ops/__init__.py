from stereo_orb_slam_tpu.ops import detect, match, orb

__all__ = ["detect", "match", "orb"]
