"""Typed configuration system (replaces the reference's yacs tree).

Mirrors the option surface of /root/reference/src/config/default.py:1-76
(OETR.{BACKBONE,NECK,HEAD,LOSS} + DATASET.{TRAIN,VAL}) as frozen
dataclasses: hashable (usable as jit static args), self-documenting, and
composable without string-keyed mutation.
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field


@dataclass(frozen=True)
class BackboneConfig:
    """Ref: src/config/default.py:12-18 + src/models/backbone.py:130-174."""
    depth: int = 50                 # resnet 18/34/50/101/152
    stop_layer: str = "layer3"      # 'layer3' (stride 16) | 'layer4' (stride 32)
    last_layer: int = 1024          # channels at stop_layer (cfg.BACKBONE.LAST_LAYER)
    norm: str = "gn"                # 'gn' (TPU-friendly default) | 'ln'
                                    # | 'bn' (frozen stats; converted ckpts)
    stem_s2d: bool = False          # space-to-depth stem (resnet.py) —
                                    # exact 7x7/s2 equivalent, 4x MXU
                                    # occupancy on the 3-channel stem
    fused_stem: bool = False        # Pallas fused GN+ReLU+maxpool stem
                                    # (ops/pallas_norm.py), ckpt-compatible
    norm_input: bool = True         # (x - 0.45) / 0.225, backbone.py:162-163


@dataclass(frozen=True)
class NeckConfig:
    """Ref: src/config/default.py:20-28."""
    d_model: int = 256              # last_layer // 4 (src/model.py:44)
    attention: str = "linear"
    # 'linear' | 'full' (default.py:24).
    # ':pallas' suffix = fused TPU kernels (ops/pallas_attention.py).
    # Measured on real v5e (PERF.md): the fused linear kernel wins the
    # isolated microbench 1.65x at the flagship shape, but end-to-end the
    # model is ~3% FASTER with the XLA op (the pallas_call boundary
    # blocks XLA from fusing the surrounding norm/PE adds), so 'linear'
    # stays the default; ':pallas' is the right choice when attention
    # dominates (full @ 676+ tokens: 1.28x end-kernel win).
    # 'full:flash' = streaming KV-blocked kernel (long stride-16 maps,
    # 1.16-1.20x over XLA at 4k-10k tokens);
    # 'full:ring' = sequence-parallel over a mesh (parallel.ring_context).
    max_shape: tuple[int, int] = (100, 100)  # positional-encoding grid cap
    patch_sizes: tuple[int, ...] = (4, 8, 16)  # PatchMerging kernels (model.py:51-56)
    nhead: int = 8
    num_layers: int = 4             # encoder depth multiplier (self+cross pairs)
    num_decoder_layers: int = 2
    legacy_pos_enc: bool = True     # reproduce the reference div_term expression
                                    # (src/models/utils.py:188-190) exactly


@dataclass(frozen=True)
class LossConfig:
    """Ref: src/config/default.py:33-38."""
    oiou: bool = False
    cycle_overlap: bool = False
    focal_alpha: float = 0.25
    focal_gamma: float = 2.0


@dataclass(frozen=True)
class OETRConfig:
    backbone: BackboneConfig = field(default_factory=BackboneConfig)
    neck: NeckConfig = field(default_factory=NeckConfig)
    loss: LossConfig = field(default_factory=LossConfig)
    dtype: str = "float32"          # compute dtype: 'float32' | 'bfloat16'

    @property
    def d_model(self) -> int:
        return self.neck.d_model


@dataclass(frozen=True)
class TrainConfig:
    """Ref: train.py:75-78 + scripts/train.sh + configs/baseline/oetr_config.py."""
    batch_size: int = 8             # global (reference: 4/GPU x 2 GPUs)
    image_size: tuple[int, int] = (640, 640)
    epochs: int = 35
    lr: float = 1e-4
    weight_decay: float = 1e-2
    lr_milestones: tuple[int, ...] = (15, 30)   # MultiStepLR epochs
    lr_gamma: float = 0.1
    pairs_per_epoch: int = 128_000  # oetr_config.py:19
    seed: int = 42
    checkpoint_dir: str = "checkpoints"
    data_axis: str = "data"         # mesh axis name for DP sharding


def replace(cfg, **kwargs):
    """Functional config update: ``replace(cfg, dtype='bfloat16')``."""
    return dataclasses.replace(cfg, **kwargs)


# Named presets mirroring configs/baseline/*.py.
def oetr_r50_config() -> OETRConfig:
    """configs/baseline/oetr_config.py — ResNet50 layer3, 1024ch, d=256."""
    return OETRConfig()


def oetr_fc_r50_config() -> OETRConfig:
    """configs/baseline/oetr_fc_config.py — ResNet50 layer4, 2048ch, d=512."""
    return OETRConfig(
        backbone=BackboneConfig(stop_layer="layer4", last_layer=2048),
        neck=NeckConfig(d_model=512),
    )
