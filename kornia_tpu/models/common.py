"""Shared model building blocks (reference: kornia/models/common.py —
ConvNormAct, MLP, DropPath, LayerNorm2d) in flax.linen.

All models in kornia_tpu use NHWC internally (TPU-native conv layout;
channels in lanes) and expose NCHW at the public API boundary for parity
with the rest of the library.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = ["ConvNormAct", "MLP", "LayerNorm2d", "DropPath", "nchw_to_nhwc",
           "nhwc_to_nchw", "TransformerEncoderLayer"]


def nchw_to_nhwc(x: jax.Array) -> jax.Array:
    return jnp.transpose(x, (0, 2, 3, 1))


def nhwc_to_nchw(x: jax.Array) -> jax.Array:
    return jnp.transpose(x, (0, 3, 1, 2))


class ConvNormAct(nn.Module):
    """conv + norm + activation (reference: models/common.py ConvNormAct).
    Operates on NHWC."""

    out_channels: int
    kernel_size: int = 3
    stride: int = 1
    groups: int = 1
    act: Optional[Callable] = nn.relu
    norm: str = "bn"

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.out_channels, (self.kernel_size, self.kernel_size),
                    strides=self.stride, feature_group_count=self.groups,
                    use_bias=self.norm == "none")(x)
        if self.norm == "bn":
            x = nn.BatchNorm(use_running_average=not train)(x)
        elif self.norm == "ln":
            x = nn.LayerNorm()(x)
        if self.act is not None:
            x = self.act(x)
        return x


class LayerNorm2d(nn.Module):
    """Channel-wise layernorm for NHWC maps (reference: common.py
    LayerNorm2d)."""

    @nn.compact
    def __call__(self, x):
        return nn.LayerNorm()(x)


class MLP(nn.Module):
    """(reference: models/common.py MLP)."""

    hidden_dim: int
    out_dim: int
    num_layers: int = 2
    act: Callable = nn.gelu

    @nn.compact
    def __call__(self, x):
        for _ in range(self.num_layers - 1):
            x = self.act(nn.Dense(self.hidden_dim)(x))
        return nn.Dense(self.out_dim)(x)


class DropPath(nn.Module):
    """Stochastic depth (reference: common.py DropPath)."""

    rate: float = 0.0
    deterministic: bool = True

    @nn.compact
    def __call__(self, x):
        if self.deterministic or self.rate == 0.0:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("droppath")
        mask = jax.random.bernoulli(rng, keep, (x.shape[0],) + (1,) * (x.ndim - 1))
        return x * mask / keep


class TransformerEncoderLayer(nn.Module):
    """Pre-norm MHA + MLP block."""

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x, context=None):
        ctx = x if context is None else context
        h = nn.LayerNorm()(x)
        c = nn.LayerNorm()(ctx) if context is not None else h
        h = nn.MultiHeadDotProductAttention(num_heads=self.num_heads)(h, c)
        x = x + h
        h = nn.LayerNorm()(x)
        x = x + MLP(int(self.dim * self.mlp_ratio), self.dim)(h)
        return x
