"""Utilities: h5 result IO, viz, timing, profiling."""
from .h5io import SceneResults, pair_key, save_scene_results, stem
from .timer import AverageTimer, VideoStreamer
from .profiling import benchmark, speed_of_light, trace

__all__ = ["SceneResults", "pair_key", "save_scene_results", "stem",
           "AverageTimer", "VideoStreamer", "benchmark", "speed_of_light",
           "trace"]
