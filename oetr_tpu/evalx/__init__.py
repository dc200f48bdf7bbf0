"""Benchmark evaluation layer (MegaDepth / IMC / HPatches parity)."""
from .metrics import (error_summary, iou_recalls, pose_acc, pose_auc,
                      pose_mAA)

__all__ = ["error_summary", "iou_recalls", "pose_acc", "pose_auc", "pose_mAA"]
