"""Exact-architecture parity for RT-DETR (ResNet-D + HGNetV2 backbones,
hybrid encoder, deformable-DETR head, post-processor) against the reference
torch implementation (random init + randomized BN stats; the published COCO
checkpoints load through the same `load_torch_weights` path)."""

import sys
import types

import numpy as np
import pytest

sys.path.append("/root/reference")
sys.modules.setdefault("kornia_rs", types.ModuleType("kornia_rs"))

torch = pytest.importorskip("torch")

import jax.numpy as jnp

pytestmark = pytest.mark.slow  # heavy leg: run with --runslow


def _randomize_bn(module):
    with torch.no_grad():
        for m in module.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.2)
                m.running_var.uniform_(0.5, 1.5)
                m.weight.uniform_(0.5, 1.5)
                m.bias.normal_(0, 0.1)


def _tpu_cfg(**kw):
    from kornia_tpu.models.rt_detr import RTDETRConfig
    return RTDETRConfig(num_classes=7, neck_hidden_dim=64,
                        neck_dim_feedforward=96, neck_expansion=0.5,
                        head_hidden_dim=64, head_num_queries=20,
                        head_num_decoder_layers=2, **kw)


def _torch_model(backbone):
    from kornia.models.rt_detr.architecture.hybrid_encoder import HybridEncoder
    from kornia.models.rt_detr.architecture.rtdetr_head import RTDETRHead
    from kornia.models.rt_detr.model import RTDETR as TorchRTDETR

    encoder = HybridEncoder(backbone.out_channels, 64, 96, expansion=0.5)
    head = RTDETRHead(num_classes=7, hidden_dim=64, num_queries=20,
                      in_channels=[64] * 3, num_decoder_layers=2)
    net = TorchRTDETR(backbone, encoder, head).eval()
    _randomize_bn(net)
    return net


def _check_parity(ref, cfg, hw=(160, 160), seed=3, atol=2e-3):
    from kornia_tpu.models.rt_detr import RTDETR, load_torch_weights

    x = torch.rand(2, 3, *hw, generator=torch.Generator().manual_seed(seed))
    with torch.no_grad():
        want_logits, want_boxes = ref(x)
    net = RTDETR(cfg, load_torch_weights(ref.state_dict(), cfg))
    got_logits, got_boxes = net(jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(got_boxes), want_boxes.numpy(),
                               atol=atol, rtol=1e-2)
    np.testing.assert_allclose(np.asarray(got_logits), want_logits.numpy(),
                               atol=atol, rtol=1e-2)


class TestRTDETRParity:
    def test_resnetd_basic(self):
        from kornia.models.rt_detr.architecture.resnet_d import (
            BasicBlockD, ResNetD)
        torch.manual_seed(0)
        ref = _torch_model(ResNetD([1, 1, 1, 1], BasicBlockD))
        _check_parity(ref, _tpu_cfg(resnet_n_blocks=[1, 1, 1, 1]))

    def test_resnetd_bottleneck(self):
        from kornia.models.rt_detr.architecture.resnet_d import (
            BottleneckD, ResNetD)
        torch.manual_seed(1)
        ref = _torch_model(ResNetD([1, 1, 1, 1], BottleneckD))
        _check_parity(ref, _tpu_cfg(resnet_n_blocks=[1, 1, 1, 1],
                                    resnet_bottleneck=True))

    def test_hgnetv2(self):
        from kornia.models.rt_detr.architecture.hgnetv2 import (
            PPHGNetV2, StageConfig)
        from kornia_tpu.models.rt_detr import HGNetStageConfig

        stages = [
            (16, 8, 32, 1, False, False, 3, 2),
            (32, 12, 48, 1, True, False, 3, 2),
            (48, 16, 64, 2, True, True, 5, 2),
            (64, 24, 96, 1, True, True, 5, 2),
        ]
        torch.manual_seed(2)
        # patch out_channels check: PPHGNetV2 ctor takes any 4 stages
        ref = _torch_model(
            PPHGNetV2([3, 8, 16], [StageConfig(*s) for s in stages]))
        cfg = _tpu_cfg(hgnet_stem=[3, 8, 16],
                       hgnet_stages=[HGNetStageConfig(*s) for s in stages])
        _check_parity(ref, cfg, seed=5)

    def test_backbone_only_resnet(self):
        """Backbone feature maps match exactly (tighter tolerance)."""
        from kornia.models.rt_detr.architecture.resnet_d import (
            BasicBlockD, ResNetD)
        from kornia_tpu.models.rt_detr import (
            _resnetd_forward, load_torch_weights)

        torch.manual_seed(4)
        ref = _torch_model(ResNetD([1, 1, 1, 1], BasicBlockD))
        cfg = _tpu_cfg(resnet_n_blocks=[1, 1, 1, 1])
        params = load_torch_weights(ref.state_dict(), cfg)
        x = torch.rand(1, 3, 96, 128, generator=torch.Generator().manual_seed(6))
        with torch.no_grad():
            want = ref.backbone(x)
        got = _resnetd_forward(params, cfg,
                               jnp.transpose(jnp.asarray(x.numpy()),
                                             (0, 2, 3, 1)))
        for g, w in zip(got, want):
            np.testing.assert_allclose(np.asarray(g).transpose(0, 3, 1, 2),
                                       w.numpy(), atol=1e-4, rtol=1e-3)

    def test_postprocessor_parity(self):
        from kornia.models.rt_detr.post_processor import DETRPostProcessor as TorchPost
        from kornia_tpu.models.rt_detr import DETRPostProcessor

        g = torch.Generator().manual_seed(7)
        logits = torch.randn(2, 30, 7, generator=g)
        boxes = torch.rand(2, 30, 4, generator=g) * 0.5 + 0.25
        sizes = torch.tensor([[120, 160], [120, 160]])
        ref = TorchPost(confidence_threshold=0.3, num_classes=7,
                        num_top_queries=25, filter_as_zero=True)
        with torch.no_grad():
            want = ref(logits, boxes, sizes)
        post = DETRPostProcessor(0.3, num_classes=7, num_top_queries=25)
        got = post(jnp.asarray(logits.numpy()), jnp.asarray(boxes.numpy()),
                   [(120, 160), (120, 160)])
        np.testing.assert_allclose(np.asarray(got), want.numpy(),
                                   atol=1e-5, rtol=1e-5)
