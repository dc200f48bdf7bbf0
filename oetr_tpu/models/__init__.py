"""Model zoo: OETR (overlap), SuperPoint, SuperGlue, LoFTR, NN matcher."""
from .loftr import LoFTR, LoFTREncoderLayer, LoFTRModule, ResNetFPN_8_2
from .matchers import find_nn, mutual_check, nearest_neighbor_match
from .oetr import OETR, PatchMerging, build_oetr, sine_position_encoding
from .resnet import ResNetEncoder, backbone_channels
from .superglue import AttentionalPropagation, KeypointEncoder, SuperGlue
from .superpoint import SuperPoint, SuperPointNet, grayscale
from .transformer import (DecoderLayer, EncoderLayer, MultiHeadAttention,
                          QueryTransformer)
from . import registry

__all__ = [
    "OETR", "PatchMerging", "build_oetr", "sine_position_encoding",
    "ResNetEncoder", "backbone_channels", "DecoderLayer", "EncoderLayer",
    "MultiHeadAttention", "QueryTransformer", "SuperPoint", "SuperPointNet",
    "grayscale", "SuperGlue", "AttentionalPropagation", "KeypointEncoder",
    "LoFTR", "LoFTREncoderLayer", "LoFTRModule", "ResNetFPN_8_2",
    "find_nn", "mutual_check", "nearest_neighbor_match", "registry",
]
