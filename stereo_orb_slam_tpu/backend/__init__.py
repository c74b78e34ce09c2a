from stereo_orb_slam_tpu.backend import ba, pose_graph, residuals

__all__ = ["ba", "pose_graph", "residuals"]
