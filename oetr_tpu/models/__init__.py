"""Model zoo: OETR (overlap), SuperPoint, SuperGlue, LoFTR, NN matcher."""
from .aslfeat import ASLFeat
from .cotr import COTR, cotr_match, make_composite
from .d2net import D2Net, VGGConv4, d2net_scores
from .disk import DISK, DiskUNet
from .icp import foreground_mask, icp_match, icp_register
from .loftr import LoFTR, LoFTREncoderLayer, LoFTRModule, ResNetFPN_8_2
from .matchers import find_nn, mutual_check, nearest_neighbor_match
from .oetr import (OETR, PatchEmbed, PatchMerging, build_oetr,
                   detr_position_embedding, sine_position_encoding)
from .resnet import ResNetEncoder, backbone_channels
from .superglue import AttentionalPropagation, KeypointEncoder, SuperGlue
from .r2d2 import R2D2, R2D2Trunk
from .sift_based import (ContextDesc, ContextDescAugmenter, contextdesc_extract,
                         landmark_extract, sift_keypoints)
from .superpoint import SuperPoint, SuperPointNet, grayscale
from .transformer import (DecoderLayer, EncoderLayer, MultiHeadAttention,
                          QueryTransformer)
from . import registry

__all__ = [
    "OETR", "PatchEmbed", "PatchMerging", "build_oetr",
    "detr_position_embedding", "sine_position_encoding",
    "ResNetEncoder", "backbone_channels", "DecoderLayer", "EncoderLayer",
    "MultiHeadAttention", "QueryTransformer", "SuperPoint", "SuperPointNet",
    "grayscale", "SuperGlue", "AttentionalPropagation", "KeypointEncoder",
    "LoFTR", "LoFTREncoderLayer", "LoFTRModule", "ResNetFPN_8_2",
    "find_nn", "mutual_check", "nearest_neighbor_match", "registry",
    "ASLFeat", "D2Net", "VGGConv4", "d2net_scores", "DISK", "DiskUNet",
    "foreground_mask", "icp_match", "icp_register", "R2D2", "R2D2Trunk",
    "ContextDescAugmenter", "contextdesc_extract", "landmark_extract",
    "sift_keypoints", "COTR", "cotr_match", "make_composite",
]
