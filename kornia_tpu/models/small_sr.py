"""Super-resolution and semantic segmentation nets
(reference: kornia/models/small_sr.py + contrib/super_resolution.py
SmallSRBuilder:228; models/segmentation/ smp bridge).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from .common import nchw_to_nhwc, nhwc_to_nchw

__all__ = ["SmallSR", "UNetSegmentor"]


class _SmallSRModule(nn.Module):
    """Residual conv SR with pixel-shuffle upsampling."""

    scale: int = 2
    ch: int = 32
    blocks: int = 4

    @nn.compact
    def __call__(self, x):  # NHWC
        h = nn.Conv(self.ch, (3, 3))(x)
        skip = h
        for _ in range(self.blocks):
            r = nn.relu(nn.Conv(self.ch, (3, 3))(h))
            h = h + nn.Conv(self.ch, (3, 3))(r)
        h = h + skip
        h = nn.Conv(3 * self.scale**2, (3, 3))(h)
        # pixel shuffle
        B, H, W, C = h.shape
        s = self.scale
        h = h.reshape(B, H, W, s, s, 3).transpose(0, 1, 3, 2, 4, 5)
        h = h.reshape(B, H * s, W * s, 3)
        up = jax.image.resize(x[..., :3], (B, H * s, W * s, 3), "bilinear")
        return h + up


class SmallSR:
    """2x/4x super-resolution (reference: contrib/super_resolution.py
    SmallSRBuilder)."""

    def __init__(self, scale: int = 2, params: Optional[Any] = None,
                 key: Optional[jax.Array] = None):
        self.module = _SmallSRModule(scale=scale)
        self.scale = scale
        self._params = params
        self._key = key if key is not None else jax.random.PRNGKey(0)

    def __call__(self, images: jax.Array) -> jax.Array:
        x = nchw_to_nhwc(images)
        if self._params is None:
            self._params = self.module.init(self._key, x)
        return nhwc_to_nchw(self.module.apply(self._params, x))


class _UNetModule(nn.Module):
    num_classes: int
    base_ch: int = 16

    @nn.compact
    def __call__(self, x):
        def block(h, ch):
            h = nn.relu(nn.GroupNorm(num_groups=4)(
                nn.Conv(ch, (3, 3), use_bias=False)(h)))
            return nn.relu(nn.GroupNorm(num_groups=4)(
                nn.Conv(ch, (3, 3), use_bias=False)(h)))

        c = self.base_ch
        d1 = block(x, c)
        d2 = block(nn.avg_pool(d1, (2, 2), (2, 2)), 2 * c)
        d3 = block(nn.avg_pool(d2, (2, 2), (2, 2)), 4 * c)
        u2 = jax.image.resize(d3, (d3.shape[0], d2.shape[1], d2.shape[2],
                                   d3.shape[3]), "bilinear")
        c2 = block(jnp.concatenate([u2, d2], -1), 2 * c)
        u1 = jax.image.resize(c2, (c2.shape[0], d1.shape[1], d1.shape[2],
                                   c2.shape[3]), "bilinear")
        c1 = block(jnp.concatenate([u1, d1], -1), c)
        return nn.Conv(self.num_classes, (1, 1))(c1)


class UNetSegmentor:
    """Semantic segmentation head (reference: models/segmentation/ — the
    smp bridge replaced by an in-tree flax UNet)."""

    def __init__(self, num_classes: int = 21, params: Optional[Any] = None,
                 key: Optional[jax.Array] = None):
        self.module = _UNetModule(num_classes)
        self._params = params
        self._key = key if key is not None else jax.random.PRNGKey(0)

    def __call__(self, images: jax.Array) -> jax.Array:
        """(B, 3, H, W) → (B, num_classes, H, W) logits."""
        x = nchw_to_nhwc(images)
        if self._params is None:
            self._params = self.module.init(self._key, x)
        return nhwc_to_nchw(self.module.apply(self._params, x))
