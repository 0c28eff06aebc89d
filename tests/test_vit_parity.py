"""Exact-architecture parity for VisionTransformer (patch embedding with
cls token + learned positions, pre-norm fused-qkv blocks, final norm)
against the reference torch implementation. The same converter loads the
published AugReg checkpoints."""

import sys
import types

import numpy as np
import pytest

sys.path.append("/root/reference")
sys.modules.setdefault("kornia_rs", types.ModuleType("kornia_rs"))

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from kornia_tpu.models.vit import (ViTConfig, VisionTransformer, forward,
                                   load_torch_weights)

pytestmark = pytest.mark.slow  # heavy leg: run with --runslow


class TestViTParity:
    def test_tokens(self):
        from kornia.models.vit import VisionTransformer as TorchViT
        torch.manual_seed(3)
        ref = TorchViT(image_size=32, patch_size=8, embed_dim=48, depth=2,
                       num_heads=4).eval()
        cfg = ViTConfig(image_size=32, patch_size=8, dim=48, depth=2,
                        num_heads=4)
        x = torch.rand(2, 3, 32, 32, generator=torch.Generator().manual_seed(0))
        with torch.no_grad():
            want = ref(x)
        params = load_torch_weights(ref.state_dict(), cfg)
        got = forward(params, cfg, jnp.asarray(x.numpy()))
        np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=2e-4,
                                   rtol=1e-3)

    def test_intermediates(self):
        from kornia.models.vit import VisionTransformer as TorchViT
        torch.manual_seed(4)
        ref = TorchViT(image_size=32, patch_size=8, embed_dim=48, depth=3,
                       num_heads=4).eval()
        cfg = ViTConfig(image_size=32, patch_size=8, dim=48, depth=3,
                        num_heads=4)
        x = torch.rand(1, 3, 32, 32, generator=torch.Generator().manual_seed(1))
        with torch.no_grad():
            ref(x)
        params = load_torch_weights(ref.state_dict(), cfg)
        _, results = forward(params, cfg, jnp.asarray(x.numpy()),
                             return_intermediates=True)
        assert len(results) == len(ref.encoder_results) == 3
        for got, want in zip(results, ref.encoder_results):
            np.testing.assert_allclose(np.asarray(got), want.numpy(),
                                       atol=2e-4, rtol=1e-3)

    def test_head_wrapper(self):
        import jax
        vit = VisionTransformer(ViTConfig(image_size=32, patch_size=8,
                                          dim=32, depth=1, num_heads=2,
                                          num_classes=5))
        out = vit(jax.random.uniform(jax.random.PRNGKey(0), (2, 3, 32, 32)))
        assert out.shape == (2, 5)
