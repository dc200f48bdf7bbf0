"""Shims that let the unmodified reference OETR run on plain torch-CPU.

The reference (/root/reference/src/model.py) imports three packages that
are not installed here: ``torchvision`` (ResNet constructors,
backbone.py:13), ``kornia`` (create_meshgrid, model.py:13) and ``timm``
(to_2tuple, backbone.py:15). This module installs minimal stand-ins into
``sys.modules`` — a from-scratch plain-torch ResNet in torchvision's
standard attribute layout (conv1/bn1/relu/maxpool/layer1..4), kornia's
pixel-grid helper, and the trivial tuple helper — so the reference's own
model code executes verbatim for baseline timing and numerical parity
tests. Nothing here is copied from the reference; the ResNet is the
textbook architecture (He et al. 2015) in torchvision's naming so that
checkpoint state_dict keys line up.
"""
from __future__ import annotations

import sys
import types

import torch
import torch.nn as nn

REFERENCE_ROOT = "/root/reference"


# ---------------------------------------------------------------- resnet
class BasicBlock(nn.Module):
    expansion = 1

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.relu = nn.ReLU(inplace=True)
        self.conv2 = nn.Conv2d(planes, planes, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.downsample = downsample

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class Bottleneck(nn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.relu = nn.ReLU(inplace=True)
        self.downsample = downsample

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class _ResNet(nn.Module):
    """torchvision-layout ResNet (attribute names match torchvision)."""

    def __init__(self, block, layers):
        super().__init__()
        self.inplanes = 64
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        self.layer1 = self._make_layer(block, 64, layers[0])
        self.layer2 = self._make_layer(block, 128, layers[1], stride=2)
        self.layer3 = self._make_layer(block, 256, layers[2], stride=2)
        self.layer4 = self._make_layer(block, 512, layers[3], stride=2)
        self.avgpool = nn.AdaptiveAvgPool2d(1)
        self.fc = nn.Linear(512 * block.expansion, 1000)

    def _make_layer(self, block, planes, blocks, stride=1):
        downsample = None
        if stride != 1 or self.inplanes != planes * block.expansion:
            downsample = nn.Sequential(
                nn.Conv2d(self.inplanes, planes * block.expansion, 1,
                          stride, bias=False),
                nn.BatchNorm2d(planes * block.expansion),
            )
        layers = [block(self.inplanes, planes, stride, downsample)]
        self.inplanes = planes * block.expansion
        for _ in range(1, blocks):
            layers.append(block(self.inplanes, planes))
        return nn.Sequential(*layers)


def resnet18(pretrained=False, **kw):
    return _ResNet(BasicBlock, [2, 2, 2, 2])


def resnet34(pretrained=False, **kw):
    return _ResNet(BasicBlock, [3, 4, 6, 3])


def resnet50(pretrained=False, **kw):
    return _ResNet(Bottleneck, [3, 4, 6, 3])


def resnet101(pretrained=False, **kw):
    return _ResNet(Bottleneck, [3, 4, 23, 3])


def resnet152(pretrained=False, **kw):
    return _ResNet(Bottleneck, [3, 8, 36, 3])


# ---------------------------------------------------------------- kornia
def create_meshgrid(height, width, normalized_coordinates=True,
                    device=None, dtype=None):
    """(1, H, W, 2) xy-order pixel grid, kornia.utils semantics."""
    dtype = dtype or torch.float32
    xs = torch.arange(width, device=device, dtype=dtype)
    ys = torch.arange(height, device=device, dtype=dtype)
    if normalized_coordinates:
        xs = xs / max(width - 1, 1) * 2 - 1
        ys = ys / max(height - 1, 1) * 2 - 1
    gy, gx = torch.meshgrid(ys, xs, indexing="ij")
    return torch.stack([gx, gy], dim=-1).unsqueeze(0)


def to_2tuple(x):
    return x if isinstance(x, tuple) else (x, x)


def install() -> None:
    """Install torchvision/kornia/timm stand-ins into sys.modules."""
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv_models = types.ModuleType("torchvision.models")
        for name in ("resnet18", "resnet34", "resnet50", "resnet101",
                     "resnet152"):
            setattr(tv_models, name, globals()[name])
        tv.models = tv_models
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.models"] = tv_models
    if "kornia" not in sys.modules:
        kornia = types.ModuleType("kornia")
        kutils = types.ModuleType("kornia.utils")
        kutils.create_meshgrid = create_meshgrid
        kornia.utils = kutils
        sys.modules["kornia"] = kornia
        sys.modules["kornia.utils"] = kutils
    if "timm" not in sys.modules:
        timm = types.ModuleType("timm")
        tmodels = types.ModuleType("timm.models")
        tlayers = types.ModuleType("timm.models.layers")
        tlayers.to_2tuple = to_2tuple
        tmodels.layers = tlayers
        timm.models = tmodels
        sys.modules["timm"] = timm
        sys.modules["timm.models"] = tmodels
        sys.modules["timm.models.layers"] = tlayers


class _Node(types.SimpleNamespace):
    pass


def reference_cfg(depth=50, layer="layer3", last_layer=1024,
                  max_shape=(100, 100), oiou=False, cycle=False):
    """Attribute-tree config matching /root/reference/src/config/default.py."""
    return _Node(
        NORM_INPUT=True,
        BACKBONE=_Node(NUM_LAYERS=depth, LAYER=layer, LAST_LAYER=last_layer),
        NECK=_Node(MAX_SHAPE=tuple(max_shape)),
        LOSS=_Node(OIOU=oiou, CYCLE_OVERLAP=cycle),
    )


def load_reference_oetr(depth=50, layer="layer3", last_layer=1024,
                        seed=0):
    """Instantiate the reference OETR (src/model.py:38) on torch-CPU.

    Returns the eval-mode model. Random init (shim ResNet has no
    pretrained weights); BatchNorm runs with its init running stats,
    which is exactly the frozen-stats regime our converter targets.
    """
    install()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    torch.manual_seed(seed)
    from src.model import OETR  # noqa: E402  (reference package)
    cfg = reference_cfg(depth=depth, layer=layer, last_layer=last_layer)
    model = OETR(cfg)
    model.eval()
    return model
