"""Data layer: pair lists, image service, MegaDepth dataset, GT geometry."""
from .gt import overlap_bbox_np
from .images import PreparedImage, batch_pairs, prepare_image, read_image
from .megadepth import MegaDepthPairsDataset, central_crop, resize_dataset
from .pairs import (EvalPair, PairRecord, load_eval_pairs, load_pairs,
                    names_to_pair, parse_eval_pairs_line, parse_pairs_line)

__all__ = [
    "overlap_bbox_np", "PreparedImage", "batch_pairs", "prepare_image",
    "read_image", "MegaDepthPairsDataset", "central_crop", "resize_dataset",
    "EvalPair", "PairRecord", "load_eval_pairs", "load_pairs",
    "names_to_pair", "parse_eval_pairs_line", "parse_pairs_line",
]
