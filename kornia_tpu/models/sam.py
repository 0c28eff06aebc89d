"""SAM-style promptable segmentation
(reference: kornia/models/sam/ — image encoder architecture/
image_encoder.py:415, prompt encoder, two-way transformer
architecture/transformer.py:291, mask decoder; config/builder model.py:409;
served through contrib/visual_prompter.py:35).

A faithful-but-compact flax implementation: ViT image encoder, point/box
prompt encoder with learned type embeddings, two-way cross-attention
decoder producing multi-mask outputs + IoU predictions.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .common import MLP, TransformerEncoderLayer, nchw_to_nhwc

__all__ = ["Sam", "SamConfig", "VisualPrompter"]


@dataclasses.dataclass
class SamConfig:
    image_size: int = 256
    patch_size: int = 16
    encoder_dim: int = 256
    encoder_depth: int = 4
    encoder_heads: int = 8
    decoder_dim: int = 128
    decoder_depth: int = 2
    num_multimask_outputs: int = 3


class _TwoWayBlock(nn.Module):
    """Token↔image cross attention (reference:
    sam/architecture/transformer.py TwoWayAttentionBlock)."""

    dim: int
    heads: int

    @nn.compact
    def __call__(self, tokens, image):
        # token self-attention
        t = nn.LayerNorm()(tokens)
        tokens = tokens + nn.MultiHeadDotProductAttention(self.heads)(t, t)
        # token → image cross attention
        t = nn.LayerNorm()(tokens)
        i = nn.LayerNorm()(image)
        tokens = tokens + nn.MultiHeadDotProductAttention(self.heads)(t, i)
        # mlp
        t = nn.LayerNorm()(tokens)
        tokens = tokens + MLP(self.dim * 4, self.dim)(t)
        # image → token cross attention
        i = nn.LayerNorm()(image)
        t = nn.LayerNorm()(tokens)
        image = image + nn.MultiHeadDotProductAttention(self.heads)(i, t)
        return tokens, image


class SamModule(nn.Module):
    cfg: SamConfig

    @nn.compact
    def __call__(self, image, point_coords, point_labels):
        """image (B, 3, H, W); point_coords (B, P, 2) in pixels;
        point_labels (B, P) in {-1 pad, 0 neg, 1 pos, 2/3 box corners}."""
        cfg = self.cfg
        x = nchw_to_nhwc(image)
        # --- image encoder (ViT) ---
        x = nn.Conv(cfg.encoder_dim, (cfg.patch_size, cfg.patch_size),
                    strides=cfg.patch_size)(x)
        B, Hp, Wp, C = x.shape
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, Hp * Wp, cfg.encoder_dim))
        seq = x.reshape(B, Hp * Wp, C) + pos
        for _ in range(cfg.encoder_depth):
            seq = TransformerEncoderLayer(cfg.encoder_dim,
                                          cfg.encoder_heads)(seq)
        img_emb = nn.Dense(cfg.decoder_dim)(seq)  # (B, HW, D)

        # --- prompt encoder ---
        pc = point_coords / cfg.image_size  # normalize
        freqs = self.param("pe_freqs", nn.initializers.normal(1.0),
                           (2, cfg.decoder_dim // 2))
        proj = 2 * jnp.pi * (pc @ freqs)
        pe = jnp.concatenate([jnp.sin(proj), jnp.cos(proj)], -1)
        type_emb = self.param("type_embed", nn.initializers.normal(0.02),
                              (5, cfg.decoder_dim))  # pad/neg/pos/tl/br
        prompt = pe + type_emb[jnp.clip(point_labels + 1, 0, 4)]

        # --- mask tokens + decoder ---
        n_tokens = cfg.num_multimask_outputs + 1  # masks + iou token
        mask_tok = self.param("mask_tokens", nn.initializers.normal(0.02),
                              (1, n_tokens, cfg.decoder_dim))
        tokens = jnp.concatenate(
            [jnp.broadcast_to(mask_tok, (B, n_tokens, cfg.decoder_dim)),
             prompt], axis=1)
        img = img_emb
        for _ in range(cfg.decoder_depth):
            tokens, img = _TwoWayBlock(cfg.decoder_dim,
                                       cfg.encoder_heads)(tokens, img)
        # predict masks: per-token hypernetwork dot with upsampled features
        img_map = img.reshape(B, Hp, Wp, cfg.decoder_dim)
        up = jax.image.resize(
            img_map, (B, Hp * 4, Wp * 4, cfg.decoder_dim), "bilinear")
        up = nn.Dense(cfg.decoder_dim)(up)
        masks = []
        for i in range(cfg.num_multimask_outputs):
            hyper = MLP(cfg.decoder_dim, cfg.decoder_dim)(tokens[:, i])
            masks.append(jnp.einsum("bhwc,bc->bhw", up, hyper))
        masks = jnp.stack(masks, 1)  # (B, M, 4Hp, 4Wp)
        iou_pred = nn.sigmoid(
            MLP(cfg.decoder_dim, cfg.num_multimask_outputs)(
                tokens[:, cfg.num_multimask_outputs]))
        return masks, iou_pred


class Sam:
    def __init__(self, cfg: Optional[SamConfig] = None,
                 params: Optional[Any] = None,
                 key: Optional[jax.Array] = None):
        self.cfg = cfg or SamConfig()
        self.module = SamModule(self.cfg)
        self._params = params
        self._key = key if key is not None else jax.random.PRNGKey(0)

    def init(self):
        c = self.cfg
        dummy = jnp.zeros((1, 3, c.image_size, c.image_size))
        pts = jnp.zeros((1, 2, 2))
        lbl = jnp.zeros((1, 2), jnp.int32)
        self._params = self.module.init(self._key, dummy, pts, lbl)
        return self._params

    def __call__(self, image, point_coords, point_labels):
        if self._params is None:
            self.init()
        return self.module.apply(self._params, image, point_coords,
                                 point_labels)


class VisualPrompter:
    """SAM-style predict loop (reference: contrib/visual_prompter.py:35 —
    set_image:137 → predict:261). Caches the image; prompts re-run only
    the (cheap) decoder path — here the whole forward is jitted, and the
    cache keeps the preprocessed image."""

    def __init__(self, model: Optional[Sam] = None):
        self.model = model or Sam()
        self._image: Optional[jax.Array] = None

    def set_image(self, image: jax.Array) -> None:
        from ..ops.warp import resize
        size = self.model.cfg.image_size
        if image.ndim == 3:
            image = image[None]
        self._image = resize(image, (size, size))

    def predict(self, keypoints: jax.Array, keypoints_labels: jax.Array
                ) -> Tuple[jax.Array, jax.Array]:
        assert self._image is not None, "call set_image first"
        masks, iou = self.model(self._image, keypoints, keypoints_labels)
        return masks, iou
