"""DeDoDe-G: DINOv2 backbone parity + converter round-trip
(VERDICT round-1 item 7; reference: kornia/feature/dedode/transformer/
dinov2.py DinoVisionTransformer, encoder.py:71 FrozenDINOv2,
dedode_models.py:131 dedode_descriptor_G)."""

import sys
import types

import numpy as np
import pytest

sys.path.append("/root/reference")
sys.modules.setdefault("kornia_rs", types.ModuleType("kornia_rs"))

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from kornia_tpu.feature.dinov2 import DinoV2ViT, load_dinov2_torch_weights

pytestmark = pytest.mark.slow  # heavy leg: run with --runslow

TINY = dict(patch_size=14, embed_dim=64, depth=3, num_heads=4,
            mlp_ratio=2.0, init_values=1.0)


def _ref_tiny():
    from functools import partial

    from kornia.feature.dedode.transformer.dinov2 import (
        Block, DinoVisionTransformer, MemEffAttention)
    torch.manual_seed(0)
    m = DinoVisionTransformer(
        img_size=518, patch_size=14, embed_dim=TINY["embed_dim"],
        depth=TINY["depth"], num_heads=TINY["num_heads"],
        mlp_ratio=TINY["mlp_ratio"], init_values=1.0, ffn_layer="mlp",
        block_chunks=0,
        block_fn=partial(Block, attn_class=MemEffAttention)).eval()
    # randomize (init leaves pos_embed/cls zeros; give them signal)
    sd = m.state_dict()
    g = torch.Generator().manual_seed(1)
    for k, v in sd.items():
        if "mask_token" in k:
            continue
        sd[k] = torch.randn(v.shape, generator=g) * 0.05
    m.load_state_dict(sd)
    return m


def test_dinov2_converter_roundtrip_matches_torch():
    """Synthetic checkpoint through the converter: x_norm_patchtokens of
    the reference == our patch-token grid (dinov2.py forward_features)."""
    ref = _ref_tiny()
    x = torch.randn(2, 3, 56, 70, generator=torch.Generator().manual_seed(2))
    with torch.no_grad():
        out = ref.forward_features(x)["x_norm_patchtokens"]  # (B, N, D)
    pos_grid = int(np.sqrt(ref.pos_embed.shape[1] - 1))
    ours = DinoV2ViT(**TINY, pos_grid=pos_grid)
    params = load_dinov2_torch_weights(
        {k: v.numpy() for k, v in ref.state_dict().items()},
        depth=TINY["depth"])
    xj = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    got = ours.apply(params, xj)  # (B, gh, gw, D)
    got_tok = np.asarray(got.reshape(got.shape[0], -1, got.shape[-1]))
    np.testing.assert_allclose(got_tok, out.numpy(), atol=2e-4, rtol=1e-3)


def test_dedode_g_shapes():
    from kornia_tpu.feature.dedode import DeDoDe
    tiny = dict(TINY, pos_grid=37)
    m = DeDoDe(descriptor="G", num_keypoints=128, vit_cfg=tiny)
    x = jax.random.uniform(jax.random.PRNGKey(0), (1, 3, 56, 112))
    kps, scores, descs = m(x)
    assert kps.shape == (1, 128, 2)
    assert scores.shape == (1, 128)
    assert descs.shape == (1, 128, 256)  # reference desc_dim NUM_PROTOTYPES
    assert bool(jnp.all(jnp.isfinite(descs)))
