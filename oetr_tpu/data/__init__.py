"""Data layer: pair lists, image service, MegaDepth dataset."""
from .images import PreparedImage, batch_pairs, prepare_image, read_image
from .pairs import (EvalPair, PairRecord, load_eval_pairs, load_pairs,
                    names_to_pair, parse_eval_pairs_line, parse_pairs_line)

__all__ = [
    "PreparedImage", "batch_pairs", "prepare_image", "read_image",
    "EvalPair", "PairRecord", "load_eval_pairs", "load_pairs",
    "names_to_pair", "parse_eval_pairs_line", "parse_pairs_line",
]
