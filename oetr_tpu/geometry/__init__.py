"""Geometry layer: box algebra, epipolar geometry, overlap warping, RANSAC."""
from .boxes import (bbox_overlaps_aligned, bbox_overlaps_pairwise, bbox_oiou,
                    box_cxywh_to_xyxy, box_tlbr_to_xyxy, box_xywh_to_xyxy,
                    box_xyxy_to_cxywh, compute_locations, delta2bbox,
                    giou_loss, iou_loss, mask2bbox, mesh_grid_centers,
                    oiou_loss, pair_overlap_loss)
from .epipolar import (angle_error_mat, angle_error_vec, essential_from_pose,
                       normalize_keypoints, pose_error, project_points,
                       sampson_error, skew, symmetric_epipolar_error,
                       to_homogeneous, transform_points, unnormalize_keypoints)
from .overlap import overlap_bbox, warp_grid_via_depth
from .ransac import (decompose_essential, essential_8pt, estimate_pose,
                     ransac_essential, recover_pose)

__all__ = [k for k in dir() if not k.startswith("_")]
