from stereo_orb_slam_tpu.geometry import camera, se3

__all__ = ["camera", "se3"]
