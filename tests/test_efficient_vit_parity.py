"""Exact-architecture parity for EfficientViT backbones (b-series and
large: ConvLayer/DSConv/MBConv/FusedMBConv/ResBlock stacks + LiteMLA
multi-scale relu linear attention) against the reference torch
implementation."""

import sys
import types

import numpy as np
import pytest

sys.path.append("/root/reference")
sys.modules.setdefault("kornia_rs", types.ModuleType("kornia_rs"))

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from kornia_tpu.models.efficient_vit import (EfficientViT,
                                             EfficientViTConfig, forward,
                                             load_torch_weights)

pytestmark = pytest.mark.slow  # heavy leg: run with --runslow


def _randomize_bn(model):
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.2)
                m.running_var.uniform_(0.5, 1.5)
                m.weight.uniform_(0.5, 1.5)
                m.bias.normal_(0, 0.1)


def _check(ref, cfg, hw=(64, 64), seed=0, atol=5e-4):
    x = torch.rand(2, 3, *hw, generator=torch.Generator().manual_seed(seed))
    with torch.no_grad():
        want = ref(x)
    params = load_torch_weights(ref.state_dict(), cfg, prefix="")
    got = forward(params, cfg, jnp.asarray(x.numpy()))
    for k in want:
        np.testing.assert_allclose(np.asarray(got[k]), want[k].numpy(),
                                   atol=atol, rtol=1e-2, err_msg=k)


class TestEfficientViTParity:
    def test_b_series(self):
        from kornia.models.efficient_vit.backbone import EfficientViTBackbone
        torch.manual_seed(0)
        ref = EfficientViTBackbone(width_list=[8, 16, 16, 32, 32],
                                   depth_list=[1, 1, 2, 1, 2],
                                   dim=8).eval()
        _randomize_bn(ref)
        cfg = EfficientViTConfig((8, 16, 16, 32, 32), (1, 1, 2, 1, 2), dim=8)
        _check(ref, cfg)

    def test_large(self):
        from kornia.models.efficient_vit.backbone import \
            EfficientViTLargeBackbone
        torch.manual_seed(1)
        ref = EfficientViTLargeBackbone(width_list=[8, 16, 16, 32, 32],
                                        depth_list=[1, 1, 1, 2, 2],
                                        qkv_dim=8).eval()
        _randomize_bn(ref)
        cfg = EfficientViTConfig((8, 16, 16, 32, 32), (1, 1, 1, 2, 2), dim=8,
                                 large=True)
        _check(ref, cfg, seed=2)

    def test_wrapper(self):
        net = EfficientViT(EfficientViTConfig((4, 8, 8, 16, 16),
                                              (1, 1, 1, 1, 1), dim=8))
        out = net(jnp.zeros((1, 3, 32, 32)))
        assert set(out) >= {"input", "stage0", "stage4", "stage_final"}
