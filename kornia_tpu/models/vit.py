"""Vision Transformer (reference: kornia/models/vit.py:336).

Standard pre-norm ViT in flax with TPU-friendly NHWC patching; exposes
features or classification logits.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .common import TransformerEncoderLayer, nchw_to_nhwc

__all__ = ["VisionTransformer", "ViTConfig"]


class ViTConfig:
    def __init__(self, image_size: int = 224, patch_size: int = 16,
                 dim: int = 768, depth: int = 12, num_heads: int = 12,
                 mlp_ratio: float = 4.0, num_classes: int = 0,
                 in_channels: int = 3):
        self.image_size = image_size
        self.patch_size = patch_size
        self.dim = dim
        self.depth = depth
        self.num_heads = num_heads
        self.mlp_ratio = mlp_ratio
        self.num_classes = num_classes
        self.in_channels = in_channels


class ViTModule(nn.Module):
    cfg: ViTConfig

    @nn.compact
    def __call__(self, x):  # NCHW
        cfg = self.cfg
        x = nchw_to_nhwc(x)
        x = nn.Conv(cfg.dim, (cfg.patch_size, cfg.patch_size),
                    strides=cfg.patch_size)(x)
        B, Hp, Wp, C = x.shape
        x = x.reshape(B, Hp * Wp, C)
        cls = self.param("cls_token", nn.initializers.zeros, (1, 1, cfg.dim))
        x = jnp.concatenate([jnp.broadcast_to(cls, (B, 1, cfg.dim)), x], axis=1)
        pos = self.param("pos_embedding", nn.initializers.normal(0.02),
                         (1, Hp * Wp + 1, cfg.dim))
        x = x + pos
        for _ in range(cfg.depth):
            x = TransformerEncoderLayer(cfg.dim, cfg.num_heads,
                                        cfg.mlp_ratio)(x)
        x = nn.LayerNorm()(x)
        if cfg.num_classes > 0:
            return nn.Dense(cfg.num_classes)(x[:, 0])
        return x


class VisionTransformer:
    def __init__(self, cfg: Optional[ViTConfig] = None,
                 params: Optional[Any] = None,
                 key: Optional[jax.Array] = None):
        self.cfg = cfg or ViTConfig()
        self.module = ViTModule(self.cfg)
        self._params = params
        self._key = key if key is not None else jax.random.PRNGKey(0)

    def init(self):
        c = self.cfg
        dummy = jnp.zeros((1, c.in_channels, c.image_size, c.image_size))
        self._params = self.module.init(self._key, dummy)
        return self._params

    def __call__(self, x: jax.Array) -> jax.Array:
        if self._params is None:
            self.init()
        return self.module.apply(self._params, x)
