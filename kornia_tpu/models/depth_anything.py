"""DepthAnything-style monocular relative depth (ViT + DPT head), TPU-native.

Reference behavior: kornia/models/depth_estimation/depth_anything.py — the
reference ships only an ONNX-runtime wrapper (DepthAnythingONNXBuilder:27)
around externally exported weights. Here the architecture itself is
implemented natively: a DINOv2-style ViT backbone with intermediate-layer
taps feeding a DPT decoder (Ranftl et al. 2021; Yang et al. 2024
DepthAnything), so the model trains/fine-tunes and jits end-to-end on TPU.

TPU-first design:
- ViT patchify is one strided conv (MXU matmul); all four DPT reassemble
  stages batch over tokens with Dense/Conv ops, no host logic.
- Static shapes: input H, W must be multiples of `patch_size`; every
  resize is a compile-time-known scale.
- bf16-friendly via `dtype`.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..core.check import check
from .common import nchw_to_nhwc

__all__ = ["DepthAnythingConfig", "DPTHead", "DepthAnythingNet",
           "DepthAnything"]


@dataclasses.dataclass(frozen=True)
class DepthAnythingConfig:
    patch_size: int = 14
    hidden_size: int = 384            # ViT-S
    num_layers: int = 12
    num_heads: int = 6
    mlp_ratio: float = 4.0
    out_indices: Tuple[int, int, int, int] = (2, 5, 8, 11)
    reassemble_channels: Tuple[int, int, int, int] = (48, 96, 192, 384)
    fusion_channels: int = 64

    @classmethod
    def tiny(cls) -> "DepthAnythingConfig":
        return cls(patch_size=8, hidden_size=64, num_layers=4, num_heads=4,
                   out_indices=(0, 1, 2, 3),
                   reassemble_channels=(16, 24, 32, 48), fusion_channels=16)


class _ViTBlock(nn.Module):
    heads: int
    mlp_ratio: float
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.LayerNorm(dtype=self.dtype)(x)
        x = x + nn.MultiHeadDotProductAttention(
            num_heads=self.heads, dtype=self.dtype)(h, h)
        h = nn.LayerNorm(dtype=self.dtype)(x)
        h = nn.Dense(int(x.shape[-1] * self.mlp_ratio), dtype=self.dtype)(h)
        h = nn.gelu(h, approximate=True)
        return x + nn.Dense(x.shape[-1], dtype=self.dtype)(h)


class _ResidualConvUnit(nn.Module):
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.features, (3, 3), dtype=self.dtype)(nn.relu(x))
        h = nn.Conv(self.features, (3, 3), dtype=self.dtype)(nn.relu(h))
        return x + h


def _up2(x: jax.Array) -> jax.Array:
    B, H, W, C = x.shape
    return jax.image.resize(x, (B, 2 * H, 2 * W, C), "bilinear")


class DPTHead(nn.Module):
    """DPT decoder: reassemble 4 ViT taps to a pyramid, fuse coarse-to-fine,
    predict relative depth (Ranftl et al. 2021 §3)."""

    cfg: DepthAnythingConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, taps: Sequence[jax.Array], grid_hw: Tuple[int, int]):
        c = self.cfg
        h, w = grid_hw
        # reassemble: tokens -> spatial maps at strides 4, 8, 16, 32
        # (relative to patch grid: x4, x2, x1, x0.5)
        feats = []
        for i, t in enumerate(taps):
            B, N, D = t.shape
            f = nn.Dense(c.reassemble_channels[i], dtype=self.dtype,
                         name=f"proj{i}")(t).reshape(
                             B, h, w, c.reassemble_channels[i])
            if i == 0:
                f = nn.ConvTranspose(c.reassemble_channels[i], (4, 4),
                                     strides=(4, 4), dtype=self.dtype,
                                     name="up0")(f)
            elif i == 1:
                f = nn.ConvTranspose(c.reassemble_channels[i], (2, 2),
                                     strides=(2, 2), dtype=self.dtype,
                                     name="up1")(f)
            elif i == 3:
                f = nn.Conv(c.reassemble_channels[i], (3, 3), strides=2,
                            dtype=self.dtype, name="down3")(f)
            f = nn.Conv(c.fusion_channels, (3, 3), use_bias=False,
                        dtype=self.dtype, name=f"scratch{i}")(f)
            feats.append(f)

        # coarse-to-fine fusion
        x = _ResidualConvUnit(c.fusion_channels, self.dtype,
                              name="rcu3")(feats[3])
        x = _up2(x)
        for i in (2, 1, 0):
            skip = _ResidualConvUnit(c.fusion_channels, self.dtype,
                                     name=f"rcu{i}a")(feats[i])
            x = x[:, :skip.shape[1], :skip.shape[2]] + skip
            x = _ResidualConvUnit(c.fusion_channels, self.dtype,
                                  name=f"rcu{i}b")(x)
            x = nn.Conv(c.fusion_channels, (1, 1), dtype=self.dtype,
                        name=f"fuse{i}")(x)
            if i > 0:
                x = _up2(x)

        x = nn.Conv(c.fusion_channels // 2, (3, 3), dtype=self.dtype,
                    name="head1")(x)
        x = _up2(x)
        x = nn.relu(nn.Conv(32, (3, 3), dtype=self.dtype, name="head2")(x))
        x = nn.Conv(1, (1, 1), dtype=self.dtype, name="head3")(x)
        return nn.relu(x[..., 0])  # non-negative relative depth


class DepthAnythingNet(nn.Module):
    """ViT backbone with intermediate taps + DPT head."""

    cfg: DepthAnythingConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images):  # (B, H, W, 3)
        c = self.cfg
        p = c.patch_size
        B, H, W, _ = images.shape
        x = nn.Conv(c.hidden_size, (p, p), strides=(p, p), dtype=self.dtype,
                    name="patch_embed")(images)
        h, w = x.shape[1:3]
        x = x.reshape(B, h * w, c.hidden_size)
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (h * w, c.hidden_size))
        x = x + pos.astype(self.dtype)
        taps = []
        for i in range(c.num_layers):
            x = _ViTBlock(c.num_heads, c.mlp_ratio, self.dtype,
                          name=f"block{i}")(x)
            if i in c.out_indices:
                taps.append(nn.LayerNorm(dtype=self.dtype,
                                         name=f"tap_ln{i}")(x))
        depth = DPTHead(c, self.dtype, name="dpt")(taps, (h, w))
        # head output is at 2x patch-grid resolution; lift to input size
        return jax.image.resize(depth, (B, H, W), "bilinear")


class DepthAnything:
    """Relative monocular depth: (B, 3, H, W) in [0, 1] -> (B, 1, H, W).

    H, W must be multiples of `cfg.patch_size`. Random init; real
    checkpoints port via the validated torch->JAX converter path.
    """

    def __init__(self, cfg: Optional[DepthAnythingConfig] = None,
                 params: Optional[dict] = None, dtype: Any = jnp.float32,
                 key: Optional[jax.Array] = None):
        self.cfg = cfg or DepthAnythingConfig()
        self.model = DepthAnythingNet(self.cfg, dtype)
        self.params = params
        self._key = key if key is not None else jax.random.PRNGKey(0)

    def __call__(self, images: jax.Array) -> jax.Array:
        B, C, H, W = images.shape
        p = self.cfg.patch_size
        check(C == 3, f"DepthAnything expects RGB (B, 3, H, W), got C={C}")
        check(H % p == 0 and W % p == 0,
              f"H, W must be multiples of patch_size={p}, got {H}x{W}")
        x = nchw_to_nhwc(images)
        if self.params is None:
            self.params = self.model.init(self._key, x)
        return self.model.apply(self.params, x)[:, None]
