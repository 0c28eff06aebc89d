"""Exact-architecture parity for TinyViT (ConvBN stem, MBConv stage,
window attention with relative attention biases, PatchMerging, MobileSAM
neck) against the reference torch implementation."""

import sys
import types

import numpy as np
import pytest

sys.path.append("/root/reference")
sys.modules.setdefault("kornia_rs", types.ModuleType("kornia_rs"))

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from kornia_tpu.models.tiny_vit import (TinyViT, TinyViTConfig, classify,
                                        encode_image, load_torch_weights)

pytestmark = pytest.mark.slow  # heavy leg: run with --runslow


def _randomize(model):
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.2)
                m.running_var.uniform_(0.5, 1.5)
                m.weight.uniform_(0.5, 1.5)
                m.bias.normal_(0, 0.1)
        for n, prm in model.named_parameters():
            if "attention_biases" in n:
                prm.normal_(0, 0.5)


def _build(mobile_sam, img_size=64):
    from kornia.models.tiny_vit import TinyViT as TorchTinyViT
    torch.manual_seed(11)
    net = TorchTinyViT(
        img_size=img_size, num_classes=5, embed_dims=(16, 32, 32, 64),
        depths=(1, 1, 2, 1), num_heads=(2, 4, 4, 8),
        window_sizes=(3, 3, 3, 3), mobile_sam=mobile_sam)
    _randomize(net)
    net.eval()  # AFTER randomize: Attention caches its bias table on eval
    cfg = TinyViTConfig(img_size=img_size, num_classes=5,
                        embed_dims=(16, 32, 32, 64), depths=(1, 1, 2, 1),
                        num_heads=(2, 4, 4, 8), window_sizes=(3, 3, 3, 3),
                        mobile_sam=mobile_sam)
    return net, cfg


class TestTinyViTParity:
    def test_classification(self):
        net, cfg = _build(mobile_sam=False)
        x = torch.rand(2, 3, 64, 64, generator=torch.Generator().manual_seed(0))
        with torch.no_grad():
            want = net(x)
        params = load_torch_weights(net.state_dict(), cfg)
        got = classify(params, cfg, jnp.asarray(x.numpy()))
        np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=2e-4,
                                   rtol=1e-3)

    def test_mobile_sam_encoder(self):
        net, cfg = _build(mobile_sam=True)
        x = torch.rand(1, 3, 64, 64, generator=torch.Generator().manual_seed(1))
        with torch.no_grad():
            want = net(x)
        params = load_torch_weights(net.state_dict(), cfg)
        got = encode_image(params, cfg, jnp.asarray(x.numpy()))
        np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2),
                                   want.numpy(), atol=2e-4, rtol=1e-3)

    def test_wrapper_shapes(self):
        net = TinyViT(TinyViTConfig(img_size=64, num_classes=5,
                                    embed_dims=(16, 32, 32, 64),
                                    depths=(1, 1, 2, 1),
                                    num_heads=(2, 4, 4, 8),
                                    window_sizes=(3, 3, 3, 3),
                                    mobile_sam=True))
        out = net(jnp.zeros((1, 3, 64, 64)))
        assert out.shape == (1, 256, 4, 4)
