"""Qwen2-VL vision encoder — exact architecture, TPU-native.

Reference behavior: kornia/models/qwen25/qwen2_vl.py —
Qwen2VLPatchMerger:28 (14x14 patch conv + LayerNorm), Qwen2VLVisionBlock
:165 (pre-norm eps 1e-6, fused-qkv attention :94, GELU MLP :135),
Qwen2VLVisionTransformer:202 (default 1280 dim / depth 32 / 16 heads;
the reference's rotary module :59 is an identity passthrough, kept for
state-dict compatibility).

Flat param dict keyed by the reference torch state_dict names; parity in
tests/test_vlm_parity.py.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

__all__ = ["Qwen2VLVisionTransformer", "Qwen2VLConfig", "init_params",
           "load_torch_weights"]


@dataclasses.dataclass(frozen=True)
class Qwen2VLConfig:
    embed_dim: int = 1280
    depth: int = 32
    num_heads: int = 16
    mlp_ratio: float = 4.0
    in_channels: int = 3
    patch_size: int = 14


def _param_specs(cfg: Qwen2VLConfig):
    D = cfg.embed_dim
    s: Dict[str, tuple] = {}
    s["patch_embed.conv.weight"] = (
        "conv", (D, cfg.in_channels, cfg.patch_size, cfg.patch_size))
    s["patch_embed.conv.bias"] = ("raw", (D,))
    s["patch_embed.ln_q.weight"] = ("raw", (D,))
    s["patch_embed.ln_q.bias"] = ("raw", (D,))
    mlp = int(D * cfg.mlp_ratio)
    for i in range(cfg.depth):
        b = f"blocks.{i}"
        for n in ("norm1", "norm2"):
            s[f"{b}.{n}.weight"] = ("raw", (D,))
            s[f"{b}.{n}.bias"] = ("raw", (D,))
        s[f"{b}.attn.qkv.weight"] = ("lin", (3 * D, D))
        s[f"{b}.attn.qkv.bias"] = ("raw", (3 * D,))
        s[f"{b}.attn.proj.weight"] = ("lin", (D, D))
        s[f"{b}.attn.proj.bias"] = ("raw", (D,))
        s[f"{b}.mlp.fc1.weight"] = ("lin", (mlp, D))
        s[f"{b}.mlp.fc1.bias"] = ("raw", (mlp,))
        s[f"{b}.mlp.fc2.weight"] = ("lin", (D, mlp))
        s[f"{b}.mlp.fc2.bias"] = ("raw", (D,))
    return s


def init_params(key: jax.Array, cfg: Qwen2VLConfig,
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
        elif name.endswith(".weight"):
            params[name] = jnp.ones(shape, dtype)
        else:
            params[name] = jnp.zeros(shape, dtype)
    return params


def load_torch_weights(state_dict, cfg: Optional[Qwen2VLConfig] = None
                       ) -> Dict[str, jax.Array]:
    cfg = cfg or Qwen2VLConfig()
    params: Dict[str, jax.Array] = {}
    for k, (kind, shape) in _param_specs(cfg).items():
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
    return (x - mu) * lax.rsqrt(var + eps) \
        * p[f"{prefix}.weight"].astype(x.dtype) \
        + p[f"{prefix}.bias"].astype(x.dtype)


def _lin(p, prefix, x):
    return x @ p[f"{prefix}.weight"].astype(x.dtype) \
        + p[f"{prefix}.bias"].astype(x.dtype)


def forward(p, cfg: Qwen2VLConfig, images: jax.Array) -> jax.Array:
    """images (B, 3, H, W) -> tokens (B, N, D)
    (reference Qwen2VLVisionTransformer.forward:230)."""
    x = jnp.transpose(images, (0, 2, 3, 1))
    w = p["patch_embed.conv.weight"].astype(x.dtype)
    x = lax.conv_general_dilated(
        x, w, (cfg.patch_size, cfg.patch_size), [(0, 0)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    x = x + p["patch_embed.conv.bias"].astype(x.dtype)
    B = x.shape[0]
    x = x.reshape(B, -1, cfg.embed_dim)
    x = _ln(p, "patch_embed.ln_q", x)
    nh = cfg.num_heads
    hd = cfg.embed_dim // nh
    for i in range(cfg.depth):
        b = f"blocks.{i}"
        h = _ln(p, f"{b}.norm1", x)
        qkv = _lin(p, f"{b}.attn.qkv", h)
        N = qkv.shape[1]
        qkv = qkv.reshape(B, N, 3, nh, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = jax.nn.softmax(q @ k.transpose(0, 1, 3, 2) / math.sqrt(hd),
                              -1)
        o = (attn @ v).transpose(0, 2, 1, 3).reshape(B, N, cfg.embed_dim)
        x = x + _lin(p, f"{b}.attn.proj", o)
        h = _ln(p, f"{b}.norm2", x)
        h = _lin(p, f"{b}.mlp.fc2",
                 jax.nn.gelu(_lin(p, f"{b}.mlp.fc1", h), approximate=False))
        x = x + h
    return x


class Qwen2VLVisionTransformer:
    """Thin stateful wrapper mirroring the reference class API."""

    def __init__(self, cfg: Optional[Qwen2VLConfig] = None, params=None,
                 key: Optional[jax.Array] = None):
        self.cfg = cfg or Qwen2VLConfig()
        self._params = params
        self._key = key if key is not None else jax.random.PRNGKey(0)

    @property
    def params(self):
        if self._params is None:
            self._params = init_params(self._key, self.cfg)
        return self._params

    def __call__(self, images: jax.Array) -> jax.Array:
        return forward(self.params, self.cfg, images)
