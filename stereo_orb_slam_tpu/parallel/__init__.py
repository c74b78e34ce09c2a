from stereo_orb_slam_tpu.parallel import dist_ba, mesh

__all__ = ["dist_ba", "mesh"]
