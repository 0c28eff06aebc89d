"""Exact-architecture parity for MobileViT (MV2 inverted residuals +
patch-unfolded transformers with (B, P, N, D) token layout) against the
reference torch implementation."""

import sys
import types

import numpy as np
import pytest

sys.path.append("/root/reference")
sys.modules.setdefault("kornia_rs", types.ModuleType("kornia_rs"))

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from kornia_tpu.models.mobile_vit import (MobileViT, MobileViTConfig,
                                          forward, load_torch_weights)

pytestmark = pytest.mark.slow  # heavy leg: run with --runslow


def _randomize_bn(model):
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.2)
                m.running_var.uniform_(0.5, 1.5)
                m.weight.uniform_(0.5, 1.5)
                m.bias.normal_(0, 0.1)


@pytest.mark.parametrize("mode", ["xxs", "xs"])
def test_mobilevit_parity(mode):
    from kornia.models.vit_mobile import MobileViT as TorchMobileViT
    torch.manual_seed(2)
    ref = TorchMobileViT(mode=mode).eval()
    _randomize_bn(ref)
    cfg = MobileViTConfig(mode=mode)
    params = load_torch_weights(ref.state_dict(), cfg)
    x = torch.rand(1, 3, 64, 64, generator=torch.Generator().manual_seed(0))
    with torch.no_grad():
        want = ref(x)
    got = forward(params, cfg, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=1e-3,
                               rtol=1e-2)


def test_wrapper():
    m = MobileViT("xxs")
    out = m(jnp.zeros((1, 3, 64, 64)))
    assert out.shape == (1, 320, 2, 2)
