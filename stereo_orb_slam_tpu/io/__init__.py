from stereo_orb_slam_tpu.io import calib, datasets, export

__all__ = ["calib", "datasets", "export"]
