"""MobileViT backbone, TPU-native.

Reference behavior: kornia/models/vit_mobile.py (MobileViT:330 — xxs/xs/s
configs; MV2Block:180 MobileNetV2 inverted residuals; MobileViTBlock:242
local conv -> patch-unfold transformer -> fold -> fuse; Transformer:136
with pre-norm attention over the (ph*pw, nh*nw) patch grid).

TPU-first redesign (NOT a port):
- flax/NHWC: the patch unfold/fold is a pure reshape/transpose pair
  (B, H, W, d) -> (B, ph*pw, nh*nw, d), free under XLA layout assignment;
  depthwise convs use `feature_group_count` so they lower to TPU
  depthwise convolutions.
- BatchNorm runs with frozen running stats (inference checkpoints).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .common import nchw_to_nhwc

__all__ = ["MobileViT"]

_CFGS = {
    # dims, channels, expansion
    "xxs": ((64, 80, 96),
            (16, 16, 24, 24, 48, 48, 64, 64, 80, 80, 320), 2),
    "xs": ((96, 120, 144),
           (16, 32, 48, 48, 64, 64, 80, 80, 96, 96, 384), 4),
    "s": ((144, 192, 240),
          (16, 32, 64, 64, 96, 96, 128, 128, 160, 160, 640), 4),
}


def _bn(x):
    return nn.BatchNorm(use_running_average=True)(x)


def _conv_nxn_bn(x, ch, k=3, stride=1):
    x = nn.Conv(ch, (k, k), strides=stride, use_bias=False)(x)
    return nn.silu(_bn(x))


def _conv_1x1_bn(x, ch):
    x = nn.Conv(ch, (1, 1), use_bias=False)(x)
    return nn.silu(_bn(x))


class _MV2Block(nn.Module):
    """Inverted residual (vit_mobile.py MV2Block:180)."""

    oup: int
    stride: int = 1
    expansion: int = 4

    @nn.compact
    def __call__(self, x):
        inp = x.shape[-1]
        hidden = inp * self.expansion
        y = x
        if self.expansion != 1:
            y = nn.silu(_bn(nn.Conv(hidden, (1, 1), use_bias=False)(y)))
        y = nn.Conv(hidden, (3, 3), strides=self.stride,
                    feature_group_count=hidden, use_bias=False)(y)
        y = nn.silu(_bn(y))
        y = _bn(nn.Conv(self.oup, (1, 1), use_bias=False)(y))
        if self.stride == 1 and inp == self.oup:
            return x + y
        return y


class _Transformer(nn.Module):
    depth: int
    heads: int = 4
    mlp_dim: int = 0

    @nn.compact
    def __call__(self, x):  # (B, P, N, d)
        for _ in range(self.depth):
            h = nn.LayerNorm()(x)
            x = x + nn.MultiHeadDotProductAttention(
                num_heads=self.heads)(h, h)
            h = nn.LayerNorm()(x)
            h = nn.gelu(nn.Dense(self.mlp_dim)(h))
            x = x + nn.Dense(x.shape[-1])(h)
        return x


class _MobileViTBlock(nn.Module):
    """Local conv + global patch transformer + fuse (MobileViTBlock:242)."""

    dim: int
    depth: int
    kernel_size: int = 3
    patch_size: Tuple[int, int] = (2, 2)
    mlp_dim: int = 0

    @nn.compact
    def __call__(self, x):  # (B, H, W, C)
        B, H, W, C = x.shape
        ph, pw = self.patch_size
        nh, nw = H // ph, W // pw
        y = x
        x = _conv_nxn_bn(x, C, self.kernel_size)
        x = _conv_1x1_bn(x, self.dim)
        # (B, H, W, d) -> (B, ph*pw, nh*nw, d): attention mixes the SAME
        # intra-patch position across all patches (reference fold layout)
        x = x.reshape(B, nh, ph, nw, pw, self.dim)
        x = x.transpose(0, 2, 4, 1, 3, 5).reshape(B, ph * pw, nh * nw,
                                                  self.dim)
        x = _Transformer(self.depth, 4, self.mlp_dim)(x)
        x = x.reshape(B, ph, pw, nh, nw, self.dim)
        x = x.transpose(0, 3, 1, 4, 2, 5).reshape(B, H, W, self.dim)
        x = _conv_1x1_bn(x, C)
        x = jnp.concatenate([x, y], -1)
        return _conv_nxn_bn(x, C, self.kernel_size)


class _MobileViTNet(nn.Module):
    mode: str = "xxs"
    patch_size: Tuple[int, int] = (2, 2)

    @nn.compact
    def __call__(self, x):  # (B, H, W, 3)
        dims, ch, exp = _CFGS[self.mode]
        x = _conv_nxn_bn(x, ch[0], stride=2)
        x = _MV2Block(ch[1], 1, exp)(x)
        x = _MV2Block(ch[2], 2, exp)(x)
        x = _MV2Block(ch[3], 1, exp)(x)
        x = _MV2Block(ch[3], 1, exp)(x)
        x = _MV2Block(ch[4], 2, exp)(x)
        x = _MobileViTBlock(dims[0], 2, 3, self.patch_size,
                            dims[0] * 2)(x)
        x = _MV2Block(ch[6], 2, exp)(x)
        x = _MobileViTBlock(dims[1], 4, 3, self.patch_size,
                            dims[1] * 4)(x)
        x = _MV2Block(ch[8], 2, exp)(x)
        x = _MobileViTBlock(dims[2], 3, 3, self.patch_size,
                            dims[2] * 4)(x)
        return _conv_1x1_bn(x, ch[10])


class MobileViT:
    """(B, 3, H, W) -> (B, C_out, H/32, W/32) feature maps
    (vit_mobile.py MobileViT:330; xxs @ 256 -> (B, 320, 8, 8))."""

    def __init__(self, mode: str = "xxs",
                 patch_size: Tuple[int, int] = (2, 2),
                 params: Optional[dict] = None,
                 key: Optional[jax.Array] = None):
        self.model = _MobileViTNet(mode, patch_size)
        self.params = params
        self._key = key if key is not None else jax.random.PRNGKey(0)

    def __call__(self, images: jax.Array) -> jax.Array:
        x = nchw_to_nhwc(images)
        if self.params is None:
            self.params = self.model.init(self._key, x)
        out = self.model.apply(self.params, x)
        return jnp.transpose(out, (0, 3, 1, 2))
