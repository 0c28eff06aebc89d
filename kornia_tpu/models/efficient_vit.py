"""EfficientViT-style backbone (reference: kornia/models/efficient_vit/ —
backbone + ops, ~1.4k LoC) and a TinyViT-style stage-wise hybrid
(reference: models/tiny_vit.py:772 — the SAM-HQ backbone).

Compact flax implementations preserving the reference's structural ideas:
EfficientViT's cascaded-group linear attention with depthwise positional
conv; TinyViT's conv-stage → window-attention-stage progression.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .common import MLP, nchw_to_nhwc, nhwc_to_nchw

__all__ = ["EfficientViT", "TinyViT"]


class _LiteMLA(nn.Module):
    """Lightweight multi-scale linear attention (EfficientViT core op)."""

    dim: int
    heads: int = 4

    @nn.compact
    def __call__(self, x):  # (B, H, W, C)
        B, H, W, C = x.shape
        d = self.dim // self.heads
        qkv = nn.Conv(3 * self.dim, (1, 1))(x)
        # depthwise aggregation adds the multi-scale token mixing
        qkv = qkv + nn.Conv(3 * self.dim, (3, 3),
                            feature_group_count=3 * self.dim)(qkv)
        q, k, v = jnp.split(qkv.reshape(B, H * W, 3, self.heads, d)
                            .transpose(2, 0, 3, 1, 4), 3, axis=0)
        q = jax.nn.relu(q[0])  # (B, h, N, d)
        k = jax.nn.relu(k[0])
        v = v[0]
        kv = jnp.einsum("bhnd,bhne->bhde", k, v)
        z = 1.0 / (jnp.einsum("bhnd,bhd->bhn", q, k.sum(axis=2)) + 1e-6)
        out = jnp.einsum("bhnd,bhde,bhn->bhne", q, kv, z)
        out = out.transpose(0, 2, 1, 3).reshape(B, H, W, self.dim)
        return nn.Conv(self.dim, (1, 1))(out)


class _EffViTBlock(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, x):
        x = x + _LiteMLA(self.dim)(nn.LayerNorm()(x))
        h = nn.LayerNorm()(x)
        h = nn.Conv(self.dim * 4, (1, 1))(h)
        h = nn.gelu(nn.Conv(self.dim * 4, (3, 3),
                            feature_group_count=self.dim * 4)(h))
        return x + nn.Conv(self.dim, (1, 1))(h)


@dataclasses.dataclass
class _BackboneBase:
    _params: Any = None

    def init(self, hw):
        dummy = jnp.zeros((1, 3, *hw))
        self._params = self.module.init(self._key, nchw_to_nhwc(dummy))
        return self._params

    def __call__(self, images: jax.Array) -> jax.Array:
        x = nchw_to_nhwc(images)
        if self._params is None:
            self._params = self.module.init(self._key, x)
        return nhwc_to_nchw(self.module.apply(self._params, x))


class _EfficientViTModule(nn.Module):
    dims: Sequence[int] = (32, 64, 128)
    depth: int = 2

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.dims[0], (3, 3), strides=2)(x)
        for dim in self.dims:
            x = nn.Conv(dim, (3, 3), strides=2)(x)
            for _ in range(self.depth):
                x = _EffViTBlock(dim)(x)
        return x


class EfficientViT(_BackboneBase):
    """1/16-stride feature backbone."""

    def __init__(self, dims=(32, 64, 128), depth: int = 2,
                 params=None, key=None):
        self.module = _EfficientViTModule(tuple(dims), depth)
        self._params = params
        self._key = key if key is not None else jax.random.PRNGKey(0)


class _WindowAttnBlock(nn.Module):
    dim: int
    heads: int
    window: int = 4

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        w = self.window
        h = nn.LayerNorm()(x)
        # partition into windows, attend within each
        hw = h.reshape(B, H // w, w, W // w, w, C).transpose(0, 1, 3, 2, 4, 5)
        hw = hw.reshape(-1, w * w, C)
        hw = nn.MultiHeadDotProductAttention(self.heads)(hw, hw)
        hw = hw.reshape(B, H // w, W // w, w, w, C).transpose(0, 1, 3, 2, 4, 5)
        x = x + hw.reshape(B, H, W, C)
        h = nn.LayerNorm()(x)
        return x + MLP(self.dim * 4, self.dim)(h)


class _TinyViTModule(nn.Module):
    dims: Sequence[int] = (32, 64, 128)
    heads: int = 4

    @nn.compact
    def __call__(self, x):
        # conv stage
        x = nn.gelu(nn.Conv(self.dims[0], (3, 3), strides=2)(x))
        x = nn.gelu(nn.Conv(self.dims[0], (3, 3), strides=2)(x))
        # attention stages with downsampling
        for dim in self.dims[1:]:
            x = nn.Conv(dim, (3, 3), strides=2)(x)
            x = _WindowAttnBlock(dim, self.heads)(x)
            x = _WindowAttnBlock(dim, self.heads)(x)
        return x


class TinyViT(_BackboneBase):
    """Stage-wise conv→window-attention hybrid (SAM-HQ backbone shape)."""

    def __init__(self, dims=(32, 64, 128), heads: int = 4,
                 params=None, key=None):
        self.module = _TinyViTModule(tuple(dims), heads)
        self._params = params
        self._key = key if key is not None else jax.random.PRNGKey(0)
