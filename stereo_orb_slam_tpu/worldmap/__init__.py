from stereo_orb_slam_tpu.worldmap.world import WorldMap

__all__ = ["WorldMap"]
