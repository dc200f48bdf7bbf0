"""Reference OETR ``state_dict`` -> flax params converter.

The weight-loading story for the reference's released checkpoints
(/root/reference/dloc/core/overlap_features.py:30-42): take a torch
``state_dict`` of the reference OETR (src/model.py:38) and produce the
exact param pytree of our flax OETR built with
``BackboneConfig(norm='bn')`` (FrozenBatchNorm backbone — torchvision's
BatchNorm running stats are folded into per-channel scale/shift).

Layout transforms:
  torch Conv2d  (O, I, kh, kw)  -> flax kernel (kh, kw, I, O)
  torch Linear  (O, I)          -> flax kernel (I, O)
  torch *Norm   weight/bias/running_mean/running_var
                                -> scale/bias/mean/var (FrozenBatchNorm)
                                   or scale/bias (LayerNorm/GroupNorm)

Name map (torch -> flax), verified against both module trees:
  backbone.encoder.conv1/bn1          -> backbone/Conv_0, FrozenBatchNorm_0
  backbone.encoder.layerL.b.*         -> backbone/<Block>_n/* with
                                         n = blocks-before-layerL + b
  input_proj(2)                       -> input_proj(2)
  patchmerging.norm / reductions.i    -> patchmerging/LayerNorm_0 / reduction_i
  query_embedK.weight                 -> query_embedK
  transformer.encoder.{2i}|{2i+1}     -> transformer/enc_self_i | enc_cross_i
  transformer.decoder.layers.j        -> transformer/dec_j
    (self_attn | multihead_attn)      ->   (self_attn | cross_attn)
    mlp.0 / mlp.2                     ->   Dense_0 / Dense_1
  heatmap_conv.0/1/3                  -> hm_conv1 / hm_gn / hm_conv2
  tlbr_reg.0 / tlbr_reg.2             -> tlbr_fc1 / tlbr_fc2

Skipped torch keys: the duplicate ``backbone.layer0..4.*`` aliases of
``backbone.encoder.*`` (ResnetEncoder keeps both, backbone.py:148-155),
the classifier head ``encoder.fc``, and the *declared-but-unused*
projections on DecoderLayer itself (transformer.py:197-203 creates
q_proj/k_proj/v_proj/merge that its forward never calls).
"""
from __future__ import annotations

import numpy as np

from ..models.resnet import RESNET_SPECS


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t, np.float32)


def _conv(w) -> np.ndarray:
    return _np(w).transpose(2, 3, 1, 0)


def _lin(w) -> np.ndarray:
    return _np(w).transpose(1, 0)


class _Missing(KeyError):
    pass


def convert_oetr_state_dict(state_dict, depth: int = 50,
                            stop_layer: str = "layer3",
                            num_layers: int = 4,
                            num_decoder_layers: int = 2) -> dict:
    """Convert a reference OETR ``state_dict`` to flax ``{'params': ...}``."""
    sd = dict(state_dict)

    def get(key):
        if key not in sd:
            raise _Missing(f"reference state_dict missing {key!r}")
        return sd[key]

    out: dict = {}

    def put(path: str, value: np.ndarray):
        node = out
        parts = path.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value

    def bn(flax_prefix: str, torch_prefix: str):
        put(f"{flax_prefix}/scale", _np(get(f"{torch_prefix}.weight")))
        put(f"{flax_prefix}/bias", _np(get(f"{torch_prefix}.bias")))
        put(f"{flax_prefix}/mean", _np(get(f"{torch_prefix}.running_mean")))
        put(f"{flax_prefix}/var", _np(get(f"{torch_prefix}.running_var")))

    def ln(flax_prefix: str, torch_prefix: str):
        put(f"{flax_prefix}/scale", _np(get(f"{torch_prefix}.weight")))
        put(f"{flax_prefix}/bias", _np(get(f"{torch_prefix}.bias")))

    def linear(flax_prefix: str, torch_prefix: str, bias: bool):
        put(f"{flax_prefix}/kernel", _lin(get(f"{torch_prefix}.weight")))
        if bias:
            put(f"{flax_prefix}/bias", _np(get(f"{torch_prefix}.bias")))

    def conv(flax_prefix: str, torch_prefix: str, bias: bool):
        put(f"{flax_prefix}/kernel", _conv(get(f"{torch_prefix}.weight")))
        if bias:
            put(f"{flax_prefix}/bias", _np(get(f"{torch_prefix}.bias")))

    # ------------------------------------------------------------ backbone
    enc = "backbone.encoder"
    conv("backbone/Conv_0", f"{enc}.conv1", bias=False)
    bn("backbone/FrozenBatchNorm_0", f"{enc}.bn1")

    kind, stages = RESNET_SPECS[depth]
    block_name = "BasicBlock" if kind == "basic" else "Bottleneck"
    n_convs = 2 if kind == "basic" else 3
    n_stages = {"layer1": 1, "layer2": 2, "layer3": 3, "layer4": 4}[stop_layer]
    n = 0
    for stage in range(n_stages):
        for b in range(stages[stage]):
            t = f"{enc}.layer{stage + 1}.{b}"
            f = f"backbone/{block_name}_{n}"
            for c in range(n_convs):
                conv(f"{f}/Conv_{c}", f"{t}.conv{c + 1}", bias=False)
                bn(f"{f}/FrozenBatchNorm_{c}", f"{t}.bn{c + 1}")
            if f"{t}.downsample.0.weight" in sd:
                conv(f"{f}/Conv_{n_convs}", f"{t}.downsample.0", bias=False)
                bn(f"{f}/FrozenBatchNorm_{n_convs}", f"{t}.downsample.1")
            n += 1

    # ---------------------------------------------------------- neck/heads
    conv("input_proj", "input_proj", bias=True)
    conv("input_proj2", "input_proj2", bias=True)
    ln("patchmerging/LayerNorm_0", "patchmerging.norm")
    i = 0
    while f"patchmerging.reductions.{i}.weight" in sd:
        conv(f"patchmerging/reduction_{i}", f"patchmerging.reductions.{i}",
             bias=True)
        i += 1

    put("query_embed1", _np(get("query_embed1.weight")))
    put("query_embed2", _np(get("query_embed2.weight")))

    conv("hm_conv1", "heatmap_conv.0", bias=True)
    ln("hm_gn", "heatmap_conv.1")
    conv("hm_conv2", "heatmap_conv.3", bias=True)

    linear("tlbr_fc1", "tlbr_reg.0", bias=False)
    linear("tlbr_fc2", "tlbr_reg.2", bias=True)

    # ---------------------------------------------------------- transformer
    def encoder_layer(flax_prefix: str, torch_prefix: str):
        for p in ("q_proj", "k_proj", "v_proj", "merge"):
            linear(f"{flax_prefix}/{p}", f"{torch_prefix}.{p}", bias=False)
        linear(f"{flax_prefix}/Dense_0", f"{torch_prefix}.mlp.0", bias=False)
        linear(f"{flax_prefix}/Dense_1", f"{torch_prefix}.mlp.2", bias=False)
        for nm in ("pre_norm_q", "pre_norm_kv", "norm2"):
            ln(f"{flax_prefix}/{nm}", f"{torch_prefix}.{nm}")

    for li in range(num_layers):
        encoder_layer(f"transformer/enc_self_{li}",
                      f"transformer.encoder.{2 * li}")
        encoder_layer(f"transformer/enc_cross_{li}",
                      f"transformer.encoder.{2 * li + 1}")

    def mha(flax_prefix: str, torch_prefix: str):
        for p in ("q_proj", "k_proj", "v_proj"):
            linear(f"{flax_prefix}/{p}", f"{torch_prefix}.{p}", bias=True)
        linear(f"{flax_prefix}/merge", f"{torch_prefix}.merge", bias=False)

    for lj in range(num_decoder_layers):
        t = f"transformer.decoder.layers.{lj}"
        f = f"transformer/dec_{lj}"
        mha(f"{f}/self_attn", f"{t}.self_attn")
        mha(f"{f}/cross_attn", f"{t}.multihead_attn")
        linear(f"{f}/Dense_0", f"{t}.mlp.0", bias=False)
        linear(f"{f}/Dense_1", f"{t}.mlp.2", bias=False)
        for nm in ("norm1", "norm2", "norm3"):
            ln(f"{f}/{nm}", f"{t}.{nm}")

    return {"params": out}


def load_reference_checkpoint(path: str, **kw) -> dict:
    """Load a torch checkpoint file and convert (torch required)."""
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    sd = {k.removeprefix("module."): v for k, v in sd.items()}
    return convert_oetr_state_dict(sd, **kw)
