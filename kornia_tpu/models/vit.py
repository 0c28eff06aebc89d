"""Vision Transformer (ViT) — exact architecture, TPU-native.

Reference behavior: kornia/models/vit.py —
- PatchEmbedding:148 (conv backbone, cls token prepend, learned positions
  of shape (N+1, D))
- TransformerEncoderBlock:104 (pre-norm, fused qkv timm-style attention
  MultiHeadAttention:62, FeedForward:51), final LayerNorm(eps=1e-6)
- VisionTransformer:191 returns ALL tokens (B, N+1, D);
  from_config:282 variants vit_ti/s/b/l/h.

Implementation notes (TPU-first): flat param dict keyed by the reference
torch state_dict names so the published AugReg checkpoints
(huggingface.co/kornia vit_*/16|32) load via `load_torch_weights`
(parity in tests/test_vit_parity.py). An optional classification head
(`num_classes > 0`) is provided on top for convenience — the reference
model itself is headless.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["VisionTransformer", "ViTConfig", "init_params",
           "load_torch_weights"]


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    image_size: int = 224
    patch_size: int = 16
    dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    num_classes: int = 0   # extra head, not part of the reference model
    in_channels: int = 3

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    @staticmethod
    def from_name(variant: str, **kw) -> "ViTConfig":
        """"vit_{size}/{patch}" presets (reference vit.py:307-317)."""
        model_type, patch = variant.split("/")
        cfgs = {
            "vit_ti": (192, 12, 3),
            "vit_s": (384, 12, 6),
            "vit_b": (768, 12, 12),
            "vit_l": (1024, 24, 16),
            "vit_h": (1280, 32, 16),
        }
        d, depth, heads = cfgs[model_type]
        return ViTConfig(patch_size=int(patch), dim=d, depth=depth,
                         num_heads=heads, **kw)


def _param_specs(cfg: ViTConfig):
    D = cfg.dim
    s: Dict[str, tuple] = {}
    s["patch_embedding.backbone.weight"] = (
        "conv", (D, cfg.in_channels, cfg.patch_size, cfg.patch_size))
    s["patch_embedding.backbone.bias"] = ("raw", (D,))
    s["patch_embedding.cls_token"] = ("raw", (1, 1, D))
    s["patch_embedding.positions"] = ("raw", (cfg.num_patches + 1, D))
    for i in range(cfg.depth):
        b = f"encoder.blocks.{i}"
        # ResidualAdd(Sequential(LN, MHA, Dropout)) => .0.fn.0 / .0.fn.1
        s[f"{b}.0.fn.0.weight"] = ("raw", (D,))
        s[f"{b}.0.fn.0.bias"] = ("raw", (D,))
        s[f"{b}.0.fn.1.qkv.weight"] = ("lin", (3 * D, D))
        s[f"{b}.0.fn.1.qkv.bias"] = ("raw", (3 * D,))
        s[f"{b}.0.fn.1.projection.weight"] = ("lin", (D, D))
        s[f"{b}.0.fn.1.projection.bias"] = ("raw", (D,))
        # ResidualAdd(Sequential(LN, FeedForward, Dropout)) => .1.fn.0/.1
        mlp = int(D * cfg.mlp_ratio)
        s[f"{b}.1.fn.0.weight"] = ("raw", (D,))
        s[f"{b}.1.fn.0.bias"] = ("raw", (D,))
        s[f"{b}.1.fn.1.0.weight"] = ("lin", (mlp, D))
        s[f"{b}.1.fn.1.0.bias"] = ("raw", (mlp,))
        s[f"{b}.1.fn.1.3.weight"] = ("lin", (D, mlp))
        s[f"{b}.1.fn.1.3.bias"] = ("raw", (D,))
    s["norm.weight"] = ("raw", (D,))
    s["norm.bias"] = ("raw", (D,))
    if cfg.num_classes > 0:  # kornia_tpu extra
        s["head.weight"] = ("lin", (cfg.num_classes, D))
        s["head.bias"] = ("raw", (cfg.num_classes,))
    return s


def init_params(key: jax.Array, cfg: ViTConfig,
                dtype=jnp.float32) -> Dict[str, jax.Array]:
    params: Dict[str, jax.Array] = {}
    for name, (kind, shape) in _param_specs(cfg).items():
        key, sub = jax.random.split(key)
        if kind == "conv":
            o, i, kh, kw = shape
            std = (2.0 / (i * kh * kw)) ** 0.5
            params[name] = jax.random.normal(sub, (kh, kw, i, o), dtype) * std
        elif kind == "lin":
            o, i = shape
            bound = 1.0 / math.sqrt(i)
            params[name] = jax.random.uniform(sub, (i, o), dtype, -bound,
                                              bound)
        elif name in ("patch_embedding.cls_token",
                      "patch_embedding.positions"):
            params[name] = jax.random.normal(sub, shape, dtype)
        elif name.endswith(".weight"):
            params[name] = jnp.ones(shape, dtype)
        else:
            params[name] = jnp.zeros(shape, dtype)
    return params


def load_torch_weights(state_dict, cfg: Optional[ViTConfig] = None
                       ) -> Dict[str, jax.Array]:
    cfg = cfg or ViTConfig()
    params: Dict[str, jax.Array] = {}
    for k, (kind, shape) in _param_specs(cfg).items():
        if k.startswith("head.") and k not in state_dict:
            continue  # headless reference checkpoints
        v = state_dict[k]
        v = np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach")
                       else v)
        assert v.shape == tuple(shape), (k, v.shape, shape)
        if kind == "conv":
            params[k] = jnp.asarray(v.transpose(2, 3, 1, 0))
        elif kind == "lin":
            params[k] = jnp.asarray(v.T)
        else:
            params[k] = jnp.asarray(v)
    return params


def _ln(p, prefix, x, eps=1e-6):
    mu = jnp.mean(x, -1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), -1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) \
        * p[f"{prefix}.weight"].astype(x.dtype) \
        + p[f"{prefix}.bias"].astype(x.dtype)


def _lin(p, prefix, x):
    return x @ p[f"{prefix}.weight"].astype(x.dtype) \
        + p[f"{prefix}.bias"].astype(x.dtype)


def forward(p, cfg: ViTConfig, images: jax.Array,
            return_intermediates: bool = False):
    """images (B, C, H, W) -> tokens (B, N+1, D) after the final norm
    (reference VisionTransformer.forward:255). With
    `return_intermediates=True` also returns the per-block outputs
    (reference `encoder_results`:243)."""
    B = images.shape[0]
    x = jnp.transpose(images, (0, 2, 3, 1))
    w = p["patch_embedding.backbone.weight"].astype(x.dtype)
    x = jax.lax.conv_general_dilated(
        x, w, (cfg.patch_size, cfg.patch_size), [(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    x = x + p["patch_embedding.backbone.bias"].astype(x.dtype)
    x = x.reshape(B, -1, cfg.dim)
    cls = jnp.broadcast_to(
        p["patch_embedding.cls_token"].astype(x.dtype), (B, 1, cfg.dim))
    x = jnp.concatenate([cls, x], 1)
    x = x + p["patch_embedding.positions"].astype(x.dtype)
    results: List[jax.Array] = []
    nh = cfg.num_heads
    hd = cfg.dim // nh
    for i in range(cfg.depth):
        b = f"encoder.blocks.{i}"
        h = _ln(p, f"{b}.0.fn.0", x)
        qkv = _lin(p, f"{b}.0.fn.1.qkv", h)
        N = qkv.shape[1]
        qkv = qkv.reshape(B, N, 3, nh, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = jax.nn.softmax(
            jnp.einsum("bhqd,bhkd->bhqk", q, k) * (hd ** -0.5), -1)
        o = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        o = o.transpose(0, 2, 1, 3).reshape(B, N, cfg.dim)
        x = x + _lin(p, f"{b}.0.fn.1.projection", o)
        h = _ln(p, f"{b}.1.fn.0", x)
        h = _lin(p, f"{b}.1.fn.1.3",
                 jax.nn.gelu(_lin(p, f"{b}.1.fn.1.0", h), approximate=False))
        x = x + h
        if return_intermediates:
            results.append(x)
    x = _ln(p, "norm", x)
    if return_intermediates:
        return x, results
    return x


class VisionTransformer:
    """Thin stateful wrapper mirroring the reference class API."""

    def __init__(self, cfg: Optional[ViTConfig] = None, params=None,
                 key: Optional[jax.Array] = None):
        self.cfg = cfg or ViTConfig()
        self._params = params
        self._key = key if key is not None else jax.random.PRNGKey(0)

    @staticmethod
    def from_config(variant: str, params=None, **kw) -> "VisionTransformer":
        return VisionTransformer(ViTConfig.from_name(variant, **kw), params)

    @property
    def params(self):
        if self._params is None:
            self._params = init_params(self._key, self.cfg)
        return self._params

    def init(self):
        return self.params

    def __call__(self, images: jax.Array) -> jax.Array:
        out = forward(self.params, self.cfg, images)
        if self.cfg.num_classes > 0:
            return _lin(self.params, "head", out[:, 0])
        return out
