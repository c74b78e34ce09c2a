from stereo_orb_slam_tpu.frontend import ransac

__all__ = ["ransac"]
