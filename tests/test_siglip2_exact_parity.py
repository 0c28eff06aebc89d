"""Exact parity for the full SigLip2 two-tower model (text encoder with
pair-masked attention, projections, clamped logit scale + bias) against
the reference torch implementation."""

import sys
import types

import numpy as np
import pytest

sys.path.append("/root/reference")
sys.modules.setdefault("kornia_rs", types.ModuleType("kornia_rs"))

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from kornia_tpu.models.siglip2_exact import (SigLip2Exact,
                                             SigLip2ExactConfig,
                                             SigLip2TextModelConfig,
                                             load_torch_weights,
                                             text_forward)
from kornia_tpu.models.siglip2_vision import SigLip2VisionModelConfig

pytestmark = pytest.mark.slow  # heavy leg: run with --runslow


def _cfgs():
    from kornia.models.siglip2.config import (SigLip2Config,
                                              SigLip2TextConfig,
                                              SigLip2VisionConfig)
    vkw = dict(image_size=32, patch_size=8, hidden_size=64,
               num_hidden_layers=2, num_attention_heads=4,
               intermediate_size=128)
    tkw = dict(vocab_size=100, hidden_size=48, num_hidden_layers=2,
               num_attention_heads=4, intermediate_size=96,
               max_position_embeddings=16)
    tcfg = SigLip2Config(vision_config=SigLip2VisionConfig(**vkw),
                         text_config=SigLip2TextConfig(**tkw),
                         projection_dim=32)
    cfg = SigLip2ExactConfig(vision=SigLip2VisionModelConfig(**vkw),
                             text=SigLip2TextModelConfig(**tkw),
                             projection_dim=32)
    return tcfg, cfg


class TestSigLip2ExactParity:
    def test_text_model(self):
        from kornia.models.siglip2.text_encoder import SigLip2TextModel
        tcfg, cfg = _cfgs()
        torch.manual_seed(10)
        ref = SigLip2TextModel(tcfg.text_config).eval()
        from kornia_tpu.models.siglip2_exact import text_param_specs
        merged = {k: v for k, v in ref.state_dict().items()}
        params = {}
        for k, (kind, shape) in text_param_specs(cfg.text).items():
            v = merged[k].detach().numpy()
            params[k] = jnp.asarray(v.T) if kind == "lin" \
                else jnp.asarray(v)
        g = torch.Generator().manual_seed(11)
        ids = torch.randint(0, 100, (2, 9), generator=g)
        mask = torch.tensor([[1] * 9, [1] * 6 + [0] * 3])
        with torch.no_grad():
            want_pooled, want_hidden = ref(ids, attention_mask=mask)
        pooled, hidden = text_forward(params, cfg.text,
                                      jnp.asarray(ids.numpy()),
                                      jnp.asarray(mask.numpy()))
        np.testing.assert_allclose(np.asarray(hidden),
                                   want_hidden.numpy(), atol=2e-4,
                                   rtol=1e-3)
        np.testing.assert_allclose(np.asarray(pooled),
                                   want_pooled.numpy(), atol=2e-4,
                                   rtol=1e-3)

    def test_two_tower(self):
        from kornia.models.siglip2.model import SigLip2Model
        tcfg, cfg = _cfgs()
        torch.manual_seed(12)
        ref = SigLip2Model(tcfg).eval()
        with torch.no_grad():
            ref.logit_bias.fill_(-5.0)
        params = load_torch_weights(ref.state_dict(), cfg)
        g = torch.Generator().manual_seed(13)
        pix = torch.rand(3, 3, 32, 32, generator=g)
        ids = torch.randint(0, 100, (3, 7), generator=g)
        with torch.no_grad():
            want = ref(pixel_values=pix, input_ids=ids)
        got = SigLip2Exact(cfg, params)(jnp.asarray(pix.numpy()),
                                        jnp.asarray(ids.numpy()))
        np.testing.assert_allclose(np.asarray(got["image_embeds"]),
                                   want.image_embeds.numpy(), atol=2e-4,
                                   rtol=1e-3)
        np.testing.assert_allclose(np.asarray(got["text_embeds"]),
                                   want.text_embeds.numpy(), atol=2e-4,
                                   rtol=1e-3)
        np.testing.assert_allclose(np.asarray(got["logits_per_text"]),
                                   want.logits_per_text.numpy(), atol=1e-3,
                                   rtol=1e-2)
