from stereo_orb_slam_tpu.frontend import odometer, ransac

__all__ = ["odometer", "ransac"]
