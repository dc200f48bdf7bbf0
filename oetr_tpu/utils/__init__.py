"""Utilities: h5 result IO, logging, visualization."""
from .h5io import SceneResults, pair_key, save_scene_results, stem

__all__ = ["SceneResults", "pair_key", "save_scene_results", "stem"]
