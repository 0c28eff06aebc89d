"""SAM-3 components (Hiera-style encoder + prompt/mask decoder), TPU-native.

Reference behavior: kornia/models/sam3/architecture/ — image_encoder.py:116
ImageEncoderHiera (patch embed + pos embed + ViT blocks + final LN,
token-sequence output), prompt_encoder.py:96 PromptEncoder (sinusoidal
random-Fourier positional point encoding, 4 learned type embeddings:
fg/bg/box-tl/box-br, mask downscaling to a dense embedding, no-mask
embedding), mask_decoder.py:89 MaskDecoder (cross-attention transformer +
2x2 transposed-conv upscaling + IoU MLP head).

TPU-first notes: flax/NHWC, everything static-shape and jittable; point
prompts are padded fixed-N with labels (-1 = padding, matching the SAM
convention). The SAM-1 style two-way decoder lives in models/sam.py; this
module mirrors the SAM-3 file layout for parity.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .common import nchw_to_nhwc

__all__ = ["ImageEncoderHiera", "PromptEncoder3", "MaskDecoder3", "Sam3"]


class ImageEncoderHiera(nn.Module):
    """(B, H, W, 3) -> (B, N_patches, D) tokens (image_encoder.py:116)."""

    patch_size: int = 16
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x):
        p = self.patch_size
        x = nn.Conv(self.embed_dim, (p, p), strides=(p, p),
                    name="patch_embed")(x)
        B, h, w, D = x.shape
        x = x.reshape(B, h * w, D)
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (h * w, D))
        x = x + pos
        for i in range(self.depth):
            hN = nn.LayerNorm()(x)
            x = x + nn.MultiHeadDotProductAttention(
                num_heads=self.num_heads, name=f"attn{i}")(hN, hN)
            hN = nn.LayerNorm()(x)
            hN = nn.gelu(nn.Dense(int(D * self.mlp_ratio))(hN))
            x = x + nn.Dense(D)(hN)
        return nn.LayerNorm(name="final_ln")(x)


class PromptEncoder3(nn.Module):
    """Point/box/mask prompts -> (sparse (B, M, D), dense (B, h, w, D))
    (prompt_encoder.py:96)."""

    embed_dim: int = 256
    mask_in_chans: int = 16

    @nn.compact
    def __call__(self, coords, labels, grid_hw, mask=None):
        """coords (B, M, 2) in [0, 1]; labels (B, M) in {-1 pad, 0 bg,
        1 fg, 2 box-tl, 3 box-br}; mask optional (B, 4h, 4w, 1)."""
        D = self.embed_dim
        B, M, _ = coords.shape
        h, w = grid_hw
        # random-Fourier positional encoding (PositionalEncoding:32)
        W = self.param("pe_gaussian", nn.initializers.normal(1.0),
                       (2, D // 2))
        proj = (2.0 * coords - 1.0) @ W * (2.0 * jnp.pi)
        pe = jnp.concatenate([jnp.sin(proj), jnp.cos(proj)], -1)
        type_emb = self.param("point_embeddings",
                              nn.initializers.normal(0.02), (4, D))
        lab = jnp.clip(labels, 0, 3)
        sparse = pe + type_emb[lab]
        sparse = sparse * (labels >= 0)[..., None]
        if mask is not None:
            m = nn.Conv(self.mask_in_chans // 4, (2, 2), strides=2)(mask)
            m = nn.GroupNorm(num_groups=1)(m)
            m = nn.Conv(self.mask_in_chans, (2, 2), strides=2)(m)
            m = nn.GroupNorm(num_groups=1)(m)
            dense = nn.Conv(D, (1, 1))(m)
        else:
            no_mask = self.param("no_mask_embed",
                                 nn.initializers.normal(0.02), (D,))
            dense = jnp.broadcast_to(no_mask, (B, h, w, D))
        return sparse, dense


class MaskDecoder3(nn.Module):
    """Image + prompt embeddings -> (masks (B, K, 4h, 4w), iou (B, K))
    (mask_decoder.py:89)."""

    embed_dim: int = 256
    num_multimask_outputs: int = 3
    iou_head_hidden_dim: int = 256

    @nn.compact
    def __call__(self, image_tokens, sparse, dense, grid_hw):
        D = self.embed_dim
        h, w = grid_hw
        B = image_tokens.shape[0]
        img = image_tokens + dense.reshape(B, h * w, D)
        # cross-attention transformer (CrossAttentionTransformer:34)
        q = sparse
        for i in range(2):
            qn = nn.LayerNorm()(q)
            q = q + nn.MultiHeadDotProductAttention(
                num_heads=8, name=f"self{i}")(qn, qn)
            qn = nn.LayerNorm()(q)
            q = q + nn.MultiHeadDotProductAttention(
                num_heads=8, name=f"cross{i}")(qn, nn.LayerNorm()(img))
            qn = nn.LayerNorm()(q)
            q = q + nn.Dense(D)(nn.gelu(nn.Dense(2 * D)(qn)))
            imn = nn.LayerNorm()(img)
            img = img + nn.MultiHeadDotProductAttention(
                num_heads=8, name=f"img_cross{i}")(imn, nn.LayerNorm()(q))
        feat = img.reshape(B, h, w, D)
        feat = nn.ConvTranspose(D // 4, (2, 2), strides=(2, 2))(feat)
        feat = nn.gelu(nn.GroupNorm(num_groups=1)(feat))
        feat = nn.ConvTranspose(D // 8, (2, 2), strides=(2, 2))(feat)
        K = self.num_multimask_outputs
        mask_emb = nn.Dense(K * (D // 8))(q.mean(1)).reshape(B, K, D // 8)
        masks = jnp.einsum("bkc,bhwc->bkhw", mask_emb, feat)
        iou = q.mean(1)
        iou = nn.relu(nn.Dense(self.iou_head_hidden_dim)(iou))
        iou = nn.relu(nn.Dense(self.iou_head_hidden_dim)(iou))
        iou = nn.Dense(K)(iou)
        return masks, iou


class _Sam3Net(nn.Module):
    patch_size: int = 16
    encoder_dim: int = 256
    depth: int = 4

    def setup(self):
        self.encoder = ImageEncoderHiera(self.patch_size, self.encoder_dim,
                                         self.depth, 8)
        self.prompt = PromptEncoder3(self.encoder_dim)
        self.decoder = MaskDecoder3(self.encoder_dim)

    def __call__(self, image, coords, labels):
        B, H, W, _ = image.shape
        h, w = H // self.patch_size, W // self.patch_size
        tokens = self.encoder(image)
        sparse, dense = self.prompt(coords, labels, (h, w))
        return self.decoder(tokens, sparse, dense, (h, w))


class Sam3:
    """Promptable segmentation, SAM-3 file layout (models/sam3/).

    __call__(image (B, 3, H, W) in [0, 1], point_coords (B, M, 2) in
    pixels, point_labels (B, M)) -> (masks (B, K, H/4, W/4), iou (B, K)).
    """

    def __init__(self, patch_size: int = 16, encoder_dim: int = 256,
                 depth: int = 4, params: Optional[dict] = None,
                 key: Optional[jax.Array] = None):
        self.model = _Sam3Net(patch_size, encoder_dim, depth)
        self.params = params
        self._key = key if key is not None else jax.random.PRNGKey(0)

    def __call__(self, image, point_coords, point_labels):
        B, C, H, W = image.shape
        x = nchw_to_nhwc(image)
        coords = point_coords / jnp.asarray([W, H], point_coords.dtype)
        if self.params is None:
            self.params = self.model.init(self._key, x, coords,
                                          point_labels)
        return self.model.apply(self.params, x, coords, point_labels)
