"""RT-DETR-style real-time detection transformer
(reference: kornia/models/rt_detr/ — ResNet-D/HGNetV2 backbones, hybrid
encoder hybrid_encoder.py:361, DETR head rtdetr_head.py:546,
postprocessor).

Compact flax implementation with the same I/O contract: images →
(labels (B, Q), scores (B, Q), boxes xyxy (B, Q, 4)); NMS-free set
prediction with learned queries.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .common import MLP, TransformerEncoderLayer, nchw_to_nhwc

__all__ = ["RTDETR", "RTDETRConfig", "DETRPostProcessor"]


@dataclasses.dataclass
class RTDETRConfig:
    num_classes: int = 80
    num_queries: int = 100
    dim: int = 128
    num_heads: int = 8
    enc_layers: int = 1
    dec_layers: int = 3
    input_size: int = 320


class _ConvBackbone(nn.Module):
    """Strided conv stem standing in for ResNet-D/HGNetV2; same 1/16
    output stride contract."""

    dim: int

    @nn.compact
    def __call__(self, x):
        for ch in (32, 64, 128):
            x = nn.relu(nn.GroupNorm(num_groups=8)(
                nn.Conv(ch, (3, 3), strides=2, use_bias=False)(x)))
        x = nn.relu(nn.GroupNorm(num_groups=8)(
            nn.Conv(self.dim, (3, 3), strides=2, use_bias=False)(x)))
        return x  # 1/16


class _DecoderLayer(nn.Module):
    dim: int
    heads: int

    @nn.compact
    def __call__(self, q, memory):
        h = nn.LayerNorm()(q)
        q = q + nn.MultiHeadDotProductAttention(self.heads)(h, h)
        h = nn.LayerNorm()(q)
        m = nn.LayerNorm()(memory)
        q = q + nn.MultiHeadDotProductAttention(self.heads)(h, m)
        h = nn.LayerNorm()(q)
        q = q + MLP(self.dim * 4, self.dim)(h)
        return q


class RTDETRModule(nn.Module):
    cfg: RTDETRConfig

    @nn.compact
    def __call__(self, x):  # NCHW
        cfg = self.cfg
        feat = _ConvBackbone(cfg.dim)(nchw_to_nhwc(x))
        B, Hf, Wf, C = feat.shape
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, Hf * Wf, cfg.dim))
        memory = feat.reshape(B, Hf * Wf, C) + pos
        for _ in range(cfg.enc_layers):
            memory = TransformerEncoderLayer(cfg.dim, cfg.num_heads)(memory)
        queries = self.param("queries", nn.initializers.normal(0.02),
                             (1, cfg.num_queries, cfg.dim))
        q = jnp.broadcast_to(queries, (B, cfg.num_queries, cfg.dim))
        for _ in range(cfg.dec_layers):
            q = _DecoderLayer(cfg.dim, cfg.num_heads)(q, memory)
        logits = nn.Dense(cfg.num_classes)(q)
        boxes = nn.sigmoid(MLP(cfg.dim, 4, 3)(q))  # cxcywh in [0, 1]
        return logits, boxes


class DETRPostProcessor:
    """(reference: rt_detr post-processor): cxcywh → xyxy pixels, per-query
    max class, confidence filtering via score zeroing (static shapes)."""

    def __init__(self, confidence_threshold: float = 0.3):
        self.confidence_threshold = confidence_threshold

    def __call__(self, logits, boxes, image_size: Tuple[int, int]):
        H, W = image_size
        scores_all = jax.nn.sigmoid(logits)
        scores = jnp.max(scores_all, -1)
        labels = jnp.argmax(scores_all, -1)
        cx, cy, w, h = (boxes[..., 0] * W, boxes[..., 1] * H,
                        boxes[..., 2] * W, boxes[..., 3] * H)
        xyxy = jnp.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], -1)
        keep = scores > self.confidence_threshold
        return labels, jnp.where(keep, scores, 0.0), xyxy


class RTDETR:
    def __init__(self, cfg: Optional[RTDETRConfig] = None,
                 params: Optional[Any] = None,
                 key: Optional[jax.Array] = None):
        self.cfg = cfg or RTDETRConfig()
        self.module = RTDETRModule(self.cfg)
        self.post = DETRPostProcessor()
        self._params = params
        self._key = key if key is not None else jax.random.PRNGKey(0)

    def init(self):
        c = self.cfg
        dummy = jnp.zeros((1, 3, c.input_size, c.input_size))
        self._params = self.module.init(self._key, dummy)
        return self._params

    def __call__(self, images: jax.Array):
        """(B, 3, H, W) → (labels (B, Q), scores (B, Q), boxes (B, Q, 4))."""
        from ..ops.warp import resize
        B, C, H, W = images.shape
        x = resize(images, (self.cfg.input_size, self.cfg.input_size))
        if self._params is None:
            self.init()
        logits, boxes = self.module.apply(self._params, x)
        return self.post(logits, boxes, (H, W))
