"""Numerical parity: reference torch OETR == converted flax OETR.

The strongest accuracy evidence available without released weights: the
*unmodified* reference model (/root/reference/src/model.py:38, run via
interop.refshim's torchvision/kornia stand-ins) and our flax OETR with
``convert_oetr_state_dict``-converted weights must produce the same
overlap boxes on the same inputs. This validates the whole chain the
reference checkpoint would flow through — backbone (BatchNorm frozen
stats), patch merging, legacy positional encoding, linear attention,
decoder, soft-argmax heatmap head, tlbr regression — to sub-0.1px.
"""
import os

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    not os.path.isdir("/root/reference/src"),
    reason="reference repo not mounted")

torch = pytest.importorskip("torch")


def _pair(rng, b, hw):
    im1 = rng.uniform(0, 1, (b, hw, hw, 3)).astype(np.float32)
    im2 = rng.uniform(0, 1, (b, hw, hw, 3)).astype(np.float32)
    return im1, im2


def _flax_boxes(params_np, cfg, im1, im2):
    import jax
    import jax.numpy as jnp

    from oetr_tpu.models import build_oetr
    model = build_oetr(cfg)
    params = {"params": jax.tree.map(jnp.asarray, params_np["params"])}
    out = model.apply(params, jnp.asarray(im1), jnp.asarray(im2),
                      deterministic=True)
    return np.asarray(out["pred_bbox1"]), np.asarray(out["pred_bbox2"])


def _run_parity(depth, layer, last_layer, hw=160, batch=2, seed=3):
    from oetr_tpu.config import BackboneConfig, NeckConfig, OETRConfig
    from oetr_tpu.interop.refshim import load_reference_oetr
    from oetr_tpu.interop.torch_convert import convert_oetr_state_dict

    ref = load_reference_oetr(depth=depth, layer=layer,
                              last_layer=last_layer, seed=seed)
    rng = np.random.default_rng(0)
    im1, im2 = _pair(rng, batch, hw)
    with torch.inference_mode():
        tb1, tb2 = ref.forward_dummy(torch.from_numpy(im1),
                                     torch.from_numpy(im2))

    params = convert_oetr_state_dict(ref.state_dict(), depth=depth,
                                     stop_layer=layer)
    cfg = OETRConfig(
        backbone=BackboneConfig(depth=depth, stop_layer=layer,
                                last_layer=last_layer, norm="bn"),
        neck=NeckConfig(d_model=last_layer // 4),
    )
    jb1, jb2 = _flax_boxes(params, cfg, im1, im2)
    np.testing.assert_allclose(jb1, tb1.numpy(), atol=0.1)
    np.testing.assert_allclose(jb2, tb2.numpy(), atol=0.1)


@pytest.mark.quick
def test_parity_resnet18_layer3():
    _run_parity(18, "layer3", 256)


@pytest.mark.slow
def test_parity_resnet50_layer3_flagship():
    _run_parity(50, "layer3", 1024, batch=1)


@pytest.mark.slow
def test_parity_resnet18_layer4():
    # layer4 stop covers the oetr_fc-style truncation (stride 32).
    _run_parity(18, "layer4", 512, batch=1)


def test_converter_rejects_missing_keys():
    from oetr_tpu.interop.torch_convert import convert_oetr_state_dict
    with pytest.raises(KeyError):
        convert_oetr_state_dict({}, depth=18)
