"""Exact-architecture parity for the VLM family against the reference
torch implementations: Qwen2-VL vision tower, KimiVL (MoonViT + pixel-
unshuffle projector), SigLip2 vision model, PaliGemma (SigLip2 tower +
Gemma GQA decoder), and the SmolVLM2 scaffold."""

import sys
import types

import numpy as np
import pytest

sys.path.append("/root/reference")
sys.modules.setdefault("kornia_rs", types.ModuleType("kornia_rs"))

torch = pytest.importorskip("torch")

import jax.numpy as jnp

pytestmark = pytest.mark.slow  # heavy leg: run with --runslow


def _np(t):
    return t.detach().cpu().numpy()


class TestQwen2VLParity:
    def test_vision_tower(self):
        from kornia.models.qwen25.qwen2_vl import Qwen2VLVisionTransformer
        from kornia_tpu.models.qwen2_vl import (Qwen2VLConfig, forward,
                                                load_torch_weights)
        torch.manual_seed(0)
        ref = Qwen2VLVisionTransformer(embed_dim=64, depth=2,
                                       num_heads=4).eval()
        cfg = Qwen2VLConfig(embed_dim=64, depth=2, num_heads=4)
        params = load_torch_weights(ref.state_dict(), cfg)
        x = torch.rand(2, 3, 56, 56, generator=torch.Generator().manual_seed(1))
        with torch.no_grad():
            want = ref(x)
        got = forward(params, cfg, jnp.asarray(x.numpy()))
        np.testing.assert_allclose(np.asarray(got), _np(want), atol=2e-4,
                                   rtol=1e-3)


class TestKimiVLParity:
    def test_moonvit_and_projector(self):
        from kornia.models.kimi_vl.config import (KimiVLConfig as TKimiCfg,
                                                  KimiVLProjectorConfig,
                                                  MoonViTConfig as TMoonCfg)
        from kornia.models.kimi_vl.model import KimiVLModel as TorchKimi
        from kornia_tpu.models.kimi_vl import (KimiVLConfig, KimiVLModel,
                                               KimiVLProjectorConfig as PCfg,
                                               MoonViTConfig,
                                               load_torch_weights)
        torch.manual_seed(2)
        tcfg = TKimiCfg(
            vision_config=TMoonCfg(image_size=56, patch_size=14,
                                   hidden_size=64, num_hidden_layers=2,
                                   num_attention_heads=4,
                                   intermediate_size=128),
            projector_config=KimiVLProjectorConfig(input_dim=64,
                                                   hidden_dim=96,
                                                   output_dim=48))
        ref = TorchKimi(tcfg).eval()
        cfg = KimiVLConfig(
            vision=MoonViTConfig(image_size=56, patch_size=14,
                                 hidden_size=64, num_hidden_layers=2,
                                 num_attention_heads=4,
                                 intermediate_size=128),
            projector=PCfg(input_dim=64, hidden_dim=96, output_dim=48))
        params = load_torch_weights(ref.state_dict(), cfg)
        x = torch.rand(2, 3, 56, 56, generator=torch.Generator().manual_seed(3))
        with torch.no_grad():
            want = ref(x)
        got = KimiVLModel(cfg, params)(jnp.asarray(x.numpy()))
        np.testing.assert_allclose(np.asarray(got), _np(want), atol=2e-4,
                                   rtol=1e-3)


def _siglip_cfgs():
    from kornia.models.siglip2.config import \
        SigLip2VisionConfig as TVisionCfg
    from kornia_tpu.models.siglip2_vision import SigLip2VisionModelConfig
    kw = dict(image_size=32, patch_size=8, hidden_size=64,
              num_hidden_layers=2, num_attention_heads=4,
              intermediate_size=128)
    return TVisionCfg(**kw), SigLip2VisionModelConfig(**kw)


class TestSigLip2VisionParity:
    def test_pooled_and_hidden(self):
        from kornia.models.siglip2.vision_encoder import SigLip2VisionModel
        from kornia_tpu.models.siglip2_vision import (load_torch_weights,
                                                      vision_forward)
        tcfg, cfg = _siglip_cfgs()
        torch.manual_seed(4)
        ref = SigLip2VisionModel(tcfg).eval()
        params = load_torch_weights(ref.state_dict(), cfg)
        x = torch.rand(2, 3, 32, 32, generator=torch.Generator().manual_seed(5))
        with torch.no_grad():
            want_pooled, want_hidden = ref(x)
        pooled, hidden = vision_forward(params, cfg, jnp.asarray(x.numpy()))
        np.testing.assert_allclose(np.asarray(hidden), _np(want_hidden),
                                   atol=2e-4, rtol=1e-3)
        np.testing.assert_allclose(np.asarray(pooled), _np(want_pooled),
                                   atol=2e-4, rtol=1e-3)


class TestPaliGemmaParity:
    def test_end_to_end(self):
        from kornia.models.paligemma.configuration_paligemma import \
            PaliGemmaConfig as TPGCfg
        from kornia.models.paligemma.modeling_paligemma import \
            PaliGemma as TorchPG
        from kornia_tpu.models.paligemma import (PaliGemma, PaliGemmaConfig,
                                                 load_torch_weights)
        tvision, vision = _siglip_cfgs()
        torch.manual_seed(6)
        tcfg = TPGCfg(vision_config=tvision, vocab_size=101, hidden_size=48,
                      intermediate_size=96, num_hidden_layers=2,
                      num_attention_heads=4, num_key_value_heads=2,
                      head_dim=12)
        ref = TorchPG(tcfg).eval()
        with torch.no_grad():  # non-trivial RMSNorm weights (zero-init)
            for n, prm in ref.named_parameters():
                if "layernorm.weight" in n or n == "norm.weight":
                    if prm.ndim == 1 and "vision_tower" not in n:
                        prm.uniform_(-0.3, 0.3)
        cfg = PaliGemmaConfig(vision=vision, vocab_size=101, hidden_size=48,
                              intermediate_size=96, num_hidden_layers=2,
                              num_attention_heads=4, num_key_value_heads=2,
                              head_dim=12)
        params = load_torch_weights(ref.state_dict(), cfg)
        g = torch.Generator().manual_seed(7)
        pix = torch.rand(2, 3, 32, 32, generator=g)
        ids = torch.randint(0, 101, (2, 5), generator=g)
        with torch.no_grad():
            want = ref(ids, pix)
        got = PaliGemma(cfg, params)(jnp.asarray(ids.numpy()),
                                     jnp.asarray(pix.numpy()))
        np.testing.assert_allclose(np.asarray(got), _np(want), atol=1e-3,
                                   rtol=1e-2)


class TestSmolVLM2Parity:
    def test_scaffold(self):
        from kornia.models.smolvlm2.smolvlm2 import SmolVLM2 as TorchSmol
        from kornia_tpu.models.smolvlm2 import SmolVLM2, load_torch_weights
        torch.manual_seed(8)
        ref = TorchSmol(vision_dim=16, text_dim=16).eval()
        params = load_torch_weights(ref.state_dict(), 16, 16)
        g = torch.Generator().manual_seed(9)
        v = torch.rand(2, 4, 16, generator=g)
        t = torch.rand(2, 4, 16, generator=g)
        with torch.no_grad():
            want = ref(v, t)
        got = SmolVLM2(16, 16, params)(jnp.asarray(v.numpy()),
                                       jnp.asarray(t.numpy()))
        np.testing.assert_allclose(np.asarray(got), _np(want), atol=1e-5,
                                   rtol=1e-5)
