"""Model zoo: OETR (overlap), extractors and matchers (added per round)."""
from .oetr import OETR, PatchMerging, build_oetr, sine_position_encoding
from .resnet import ResNetEncoder, backbone_channels
from .transformer import (DecoderLayer, EncoderLayer, MultiHeadAttention,
                          QueryTransformer)

__all__ = [
    "OETR", "PatchMerging", "build_oetr", "sine_position_encoding",
    "ResNetEncoder", "backbone_channels", "DecoderLayer", "EncoderLayer",
    "MultiHeadAttention", "QueryTransformer",
]
