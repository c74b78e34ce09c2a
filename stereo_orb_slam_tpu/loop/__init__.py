from stereo_orb_slam_tpu.loop.detector import LoopDetector
from stereo_orb_slam_tpu.loop.vocab import OrbVocabulary

__all__ = ["LoopDetector", "OrbVocabulary"]
