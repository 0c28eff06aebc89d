"""Exact-architecture parity for SAM (ViTDet image encoder with windowed
attention + decomposed rel-pos, random-PE prompt encoder, two-way
transformer, mask decoder) against the reference torch implementation
(random init; the published sam_vit_b/l/h checkpoints load through the
same `load_torch_weights` path)."""

import sys
import types

import numpy as np
import pytest

sys.path.append("/root/reference")
sys.modules.setdefault("kornia_rs", types.ModuleType("kornia_rs"))

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from kornia_tpu.models.sam import (Sam, SamConfig, boxes_to_points,
                                   dense_pe, decode_masks, encode_image,
                                   encode_masks, encode_points,
                                   load_torch_weights, no_mask_embed)

pytestmark = pytest.mark.slow  # heavy leg: run with --runslow

CFG = SamConfig(image_size=64, patch_size=16, encoder_embed_dim=64,
                encoder_depth=3, encoder_num_heads=2,
                encoder_global_attn_indexes=(1,), window_size=3,
                prompt_embed_dim=32, mask_in_chans=8, decoder_num_heads=2,
                decoder_mlp_dim=64, iou_head_hidden_dim=16)


@pytest.fixture(scope="module")
def ref():
    from kornia.models.sam.architecture.common import LayerNorm
    from kornia.models.sam.architecture.image_encoder import ImageEncoderViT
    from kornia.models.sam.architecture.mask_decoder import MaskDecoder
    from kornia.models.sam.architecture.prompt_encoder import PromptEncoder
    from kornia.models.sam.architecture.transformer import TwoWayTransformer
    from kornia.models.sam.model import Sam as TorchSam

    torch.manual_seed(7)
    model = TorchSam(
        image_encoder=ImageEncoderViT(
            img_size=64, patch_size=16, embed_dim=64, depth=3, num_heads=2,
            mlp_ratio=4, out_chans=32, qkv_bias=True, norm_layer=LayerNorm,
            use_rel_pos=True, window_size=3, global_attn_indexes=(1,)),
        prompt_encoder=PromptEncoder(
            embed_dim=32, image_embedding_size=(4, 4),
            input_image_size=(64, 64), mask_in_chans=8),
        mask_decoder=MaskDecoder(
            transformer_dim=32,
            transformer=TwoWayTransformer(depth=2, embedding_dim=32,
                                          mlp_dim=64, num_heads=2),
            num_multimask_outputs=3, iou_head_depth=3,
            iou_head_hidden_dim=16),
    ).eval()
    with torch.no_grad():  # non-trivial rel-pos / pos-embed / tokens
        for n, prm in model.named_parameters():
            if "rel_pos" in n or "pos_embed" in n:
                prm.normal_(0, 0.5)
    return model


@pytest.fixture(scope="module")
def params(ref):
    return load_torch_weights(ref.state_dict(), CFG)


def _np(t):
    return t.detach().cpu().numpy()


class TestSamParity:
    def test_image_encoder(self, ref, params):
        x = torch.rand(2, 3, 64, 64, generator=torch.Generator().manual_seed(0))
        with torch.no_grad():
            want = ref.image_encoder(x)
        got = encode_image(params, CFG, jnp.asarray(x.numpy()))
        np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2),
                                   _np(want), atol=2e-4, rtol=1e-3)

    def test_dense_pe(self, ref, params):
        with torch.no_grad():
            want = ref.prompt_encoder.get_dense_pe()
        got = dense_pe(params, CFG)
        np.testing.assert_allclose(np.asarray(got).transpose(2, 0, 1),
                                   _np(want)[0], atol=1e-5, rtol=1e-5)

    def test_point_prompts(self, ref, params):
        g = torch.Generator().manual_seed(1)
        pts = torch.rand(2, 3, 2, generator=g) * 64
        lbl = torch.tensor([[1, 0, 1], [1, -1, -1]])
        with torch.no_grad():
            want, want_dense = ref.prompt_encoder(
                points=(pts, lbl), boxes=None, masks=None)
        got = encode_points(params, CFG, jnp.asarray(pts.numpy()),
                            jnp.asarray(lbl.numpy()), pad=True)
        np.testing.assert_allclose(np.asarray(got), _np(want), atol=1e-5,
                                   rtol=1e-4)
        got_dense = no_mask_embed(params, CFG, 2)
        np.testing.assert_allclose(
            np.asarray(got_dense).transpose(0, 3, 1, 2), _np(want_dense),
            atol=1e-6, rtol=1e-6)

    def test_box_prompts(self, ref, params):
        boxes = torch.tensor([[4.0, 6.0, 40.0, 50.0], [0.0, 0.0, 63.0, 63.0]])
        with torch.no_grad():
            want, _ = ref.prompt_encoder(points=None, boxes=boxes, masks=None)
        bpts, blbl = boxes_to_points(jnp.asarray(boxes.numpy()))
        got = encode_points(params, CFG, bpts, blbl, pad=False)
        np.testing.assert_allclose(np.asarray(got), _np(want), atol=1e-5,
                                   rtol=1e-4)

    def test_mask_prompts(self, ref, params):
        m = torch.rand(2, 1, 16, 16, generator=torch.Generator().manual_seed(2))
        with torch.no_grad():
            _, want = ref.prompt_encoder(points=None, boxes=None, masks=m)
        got = encode_masks(params, jnp.asarray(m.numpy()))
        np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2),
                                   _np(want), atol=1e-5, rtol=1e-4)

    @pytest.mark.parametrize("multimask", [True, False])
    def test_mask_decoder(self, ref, params, multimask):
        g = torch.Generator().manual_seed(3)
        emb = torch.rand(1, 32, 4, 4, generator=g)
        sparse = torch.rand(2, 3, 32, generator=g)
        dense = torch.rand(2, 32, 4, 4, generator=g)
        with torch.no_grad():
            want_m, want_iou = ref.mask_decoder(
                image_embeddings=emb, image_pe=ref.prompt_encoder.get_dense_pe(),
                sparse_prompt_embeddings=sparse,
                dense_prompt_embeddings=dense, multimask_output=multimask)
        got_m, got_iou = decode_masks(
            params, CFG,
            jnp.broadcast_to(jnp.asarray(emb.numpy()).transpose(0, 2, 3, 1),
                             (2, 4, 4, 32)),
            dense_pe(params, CFG), jnp.asarray(sparse.numpy()),
            jnp.asarray(dense.numpy()).transpose(0, 2, 3, 1),
            multimask_output=multimask)
        np.testing.assert_allclose(np.asarray(got_m), _np(want_m), atol=2e-4,
                                   rtol=1e-3)
        np.testing.assert_allclose(np.asarray(got_iou), _np(want_iou),
                                   atol=2e-4, rtol=1e-3)

    def test_end_to_end(self, ref, params):
        g = torch.Generator().manual_seed(4)
        img = torch.rand(2, 3, 64, 64, generator=g)
        pts = torch.rand(2, 2, 2, generator=g) * 64
        lbl = torch.tensor([[1, 0], [1, 1]])
        with torch.no_grad():
            results = ref(img, [
                {"points": (pts[i:i + 1], lbl[i:i + 1])} for i in range(2)
            ], multimask_output=True)
        want_m = torch.cat([r.logits for r in results])
        want_iou = torch.cat([r.scores for r in results])
        net = Sam(CFG, params)
        got_m, got_iou = net(jnp.asarray(img.numpy()),
                             jnp.asarray(pts.numpy()),
                             jnp.asarray(lbl.numpy()))
        np.testing.assert_allclose(np.asarray(got_m), _np(want_m), atol=5e-4,
                                   rtol=1e-3)
        np.testing.assert_allclose(np.asarray(got_iou), _np(want_iou),
                                   atol=5e-4, rtol=1e-3)


class TestMobileSamParity:
    def test_end_to_end(self):
        from kornia.models.sam.architecture.mask_decoder import MaskDecoder
        from kornia.models.sam.architecture.prompt_encoder import \
            PromptEncoder
        from kornia.models.sam.architecture.transformer import \
            TwoWayTransformer
        from kornia.models.sam.model import Sam as TorchSam
        from kornia.models.tiny_vit import TinyViT as TorchTinyViT

        torch.manual_seed(5)
        ref = TorchSam(
            image_encoder=TorchTinyViT(
                img_size=64, embed_dims=(16, 32, 32, 64),
                depths=(1, 1, 2, 1), num_heads=(2, 4, 4, 8),
                window_sizes=(3, 3, 3, 3), mobile_sam=True),
            prompt_encoder=PromptEncoder(
                embed_dim=256, image_embedding_size=(4, 4),
                input_image_size=(64, 64), mask_in_chans=16),
            mask_decoder=MaskDecoder(
                transformer_dim=256,
                transformer=TwoWayTransformer(depth=2, embedding_dim=256,
                                              mlp_dim=256, num_heads=8),
                num_multimask_outputs=3, iou_head_depth=3,
                iou_head_hidden_dim=32))
        with torch.no_grad():
            for m in ref.modules():
                if isinstance(m, torch.nn.BatchNorm2d):
                    m.running_mean.normal_(0, 0.2)
                    m.running_var.uniform_(0.5, 1.5)
        ref.eval()

        cfg = SamConfig(image_size=64, prompt_embed_dim=256,
                        decoder_mlp_dim=256, iou_head_hidden_dim=32,
                        tiny_vit_variant="custom",
                        tiny_vit_dims=(16, 32, 32, 64),
                        tiny_vit_depths=(1, 1, 2, 1),
                        tiny_vit_heads=(2, 4, 4, 8),
                        tiny_vit_windows=(3, 3, 3, 3))
        params = load_torch_weights(ref.state_dict(), cfg)

        g = torch.Generator().manual_seed(6)
        img = torch.rand(1, 3, 64, 64, generator=g)
        pts = torch.rand(1, 2, 2, generator=g) * 64
        lbl = torch.tensor([[1, 0]])
        with torch.no_grad():
            results = ref(img, [{"points": (pts, lbl)}],
                          multimask_output=True)
        net = Sam(cfg, params)
        got_m, got_iou = net(jnp.asarray(img.numpy()),
                             jnp.asarray(pts.numpy()),
                             jnp.asarray(lbl.numpy()))
        np.testing.assert_allclose(np.asarray(got_m),
                                   _np(results[0].logits), atol=1e-3,
                                   rtol=1e-2)
        np.testing.assert_allclose(np.asarray(got_iou),
                                   _np(results[0].scores), atol=1e-3,
                                   rtol=1e-2)


class TestVisualPrompter:
    def test_predict_loop(self):
        import jax

        from kornia_tpu.models.sam import VisualPrompter
        vp = VisualPrompter(Sam(CFG))
        img = jax.random.uniform(jax.random.PRNGKey(0), (3, 48, 40))
        vp.set_image(img)
        assert vp.is_image_set
        logits, scores = vp.predict(jnp.asarray([[[20.0, 24.0]]]),
                                    jnp.asarray([[1]]))
        assert logits.shape == (1, 3, 16, 16)
        assert scores.shape == (1, 3)
        boxes = jnp.asarray([[2.0, 2.0, 30.0, 40.0]])
        logits, scores = vp.predict(jnp.asarray([[[20.0, 24.0]]]),
                                    jnp.asarray([[1]]), boxes=boxes)
        assert logits.shape == (1, 3, 16, 16)
        vp.reset_image()
        assert not vp.is_image_set
