"""Exact-architecture parity for SAM-3 (Hiera-named ViT encoder,
sinusoidal prompt encoder, cross-attention mask decoder — including the
reference's Phase-2 stub behaviors) against the reference torch
implementation."""

import sys
import types

import numpy as np
import pytest

sys.path.append("/root/reference")
sys.modules.setdefault("kornia_rs", types.ModuleType("kornia_rs"))

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from kornia_tpu.models.sam3 import (Sam3Config, decode_masks, encode_image,
                                    encode_masks, encode_points,
                                    load_torch_weights, no_mask_embed)

pytestmark = pytest.mark.slow  # heavy leg: run with --runslow

CFG = Sam3Config(img_size=64, patch_size=16, encoder_embed_dim=64,
                 encoder_depth=2, encoder_num_heads=4,
                 prompt_embed_dim=32, mask_in_chans=8,
                 iou_head_hidden_dim=16)


@pytest.fixture(scope="module")
def ref():
    from kornia.models.sam3.architecture.image_encoder import \
        ImageEncoderHiera
    from kornia.models.sam3.architecture.mask_decoder import MaskDecoder
    from kornia.models.sam3.architecture.prompt_encoder import PromptEncoder

    torch.manual_seed(21)
    enc = ImageEncoderHiera(img_size=64, patch_size=16, embed_dim=64,
                            depth=2, num_heads=4)
    pe = PromptEncoder(embed_dim=32, input_image_size=64, mask_in_chans=8)
    md = MaskDecoder(embed_dim=32, num_multimask_outputs=3,
                     iou_head_hidden_dim=16)
    enc.eval(), pe.eval(), md.eval()
    return enc, pe, md


@pytest.fixture(scope="module")
def params(ref):
    enc, pe, md = ref
    merged = {}
    for prefix, mod in (("image_encoder.", enc), ("prompt_encoder.", pe),
                        ("mask_decoder.", md)):
        for k, v in mod.state_dict().items():
            merged[prefix + k] = v
    return load_torch_weights(merged, CFG)


def _np(t):
    return t.detach().cpu().numpy()


class TestSam3Parity:
    def test_image_encoder(self, ref, params):
        enc, _, _ = ref
        x = torch.rand(2, 3, 64, 64, generator=torch.Generator().manual_seed(0))
        with torch.no_grad():
            want = enc(x)
        got = encode_image(params, CFG, jnp.asarray(x.numpy()))
        np.testing.assert_allclose(np.asarray(got), _np(want), atol=2e-4,
                                   rtol=1e-3)

    def test_point_prompts(self, ref, params):
        _, pe, _ = ref
        g = torch.Generator().manual_seed(1)
        coords = torch.rand(2, 3, 2, generator=g)
        labels = torch.tensor([[1, 0, 1], [0, 1, 0]])
        with torch.no_grad():
            want_sparse, want_dense = pe(points=(coords, labels))
        got = encode_points(params, CFG, jnp.asarray(coords.numpy()),
                            jnp.asarray(labels.numpy()))
        np.testing.assert_allclose(np.asarray(got), _np(want_sparse),
                                   atol=1e-5, rtol=1e-4)
        got_dense = no_mask_embed(params, CFG, 2)
        np.testing.assert_allclose(
            np.asarray(got_dense).transpose(0, 3, 1, 2), _np(want_dense),
            atol=1e-6, rtol=1e-6)

    def test_mask_prompts(self, ref, params):
        _, pe, _ = ref
        m = torch.rand(1, 1, 32, 32, generator=torch.Generator().manual_seed(2))
        with torch.no_grad():
            _, want = pe(points=None, masks=m)
        got = encode_masks(params, CFG, jnp.asarray(m.numpy()))
        np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2),
                                   _np(want), atol=1e-4, rtol=1e-3)

    def test_mask_decoder(self, ref, params):
        _, pe, md = ref
        g = torch.Generator().manual_seed(3)
        emb = torch.rand(2, 16, 32, generator=g)  # (B, 4x4 tokens, P)
        sparse = torch.rand(2, 3, 32, generator=g)
        dense = torch.rand(2, 32, 16, 16, generator=g)
        with torch.no_grad():
            want_m, want_iou = md(emb, sparse, dense)
        got_m, got_iou = decode_masks(
            params, CFG, jnp.asarray(emb.numpy()),
            jnp.asarray(sparse.numpy()),
            jnp.asarray(dense.numpy()).transpose(0, 2, 3, 1))
        np.testing.assert_allclose(np.asarray(got_m), _np(want_m),
                                   atol=2e-4, rtol=1e-3)
        np.testing.assert_allclose(np.asarray(got_iou), _np(want_iou),
                                   atol=2e-4, rtol=1e-3)
