"""SigLip2 vision encoder — exact architecture, TPU-native.

Reference behavior: kornia/models/siglip2/vision_encoder.py —
SigLip2VisionEmbeddings:39 (patch conv + learned positions),
SigLip2VisionLayer:115 (pre-norm, separate q/k/v/out attention
attention.py:33), SigLip2MultiheadAttentionPoolingHead:160 (probe token +
torch nn.MultiheadAttention packed in_proj), SigLip2VisionModel:254
(post layernorm, returns (pooled, last_hidden_state)).

This is the weight-portable functional twin of the flax
`SigLip2VisionTower` in models/siglip2.py; it is also the vision tower
used by PaliGemma (reference modeling_paligemma.py:287). Params are keyed
by the reference torch state_dict names under an optional prefix; parity
in tests/test_vlm_parity.py.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

__all__ = ["SigLip2VisionModelConfig", "vision_param_specs",
           "vision_forward", "init_params", "load_torch_weights"]


@dataclasses.dataclass(frozen=True)
class SigLip2VisionModelConfig:
    image_size: int = 224
    patch_size: int = 16
    num_channels: int = 3
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    layer_norm_eps: float = 1e-6


def vision_param_specs(cfg: SigLip2VisionModelConfig, prefix: str = ""):
    D = cfg.hidden_size
    s: Dict[str, tuple] = {}
    s[f"{prefix}embeddings.patch_embedding.weight"] = (
        "conv", (D, cfg.num_channels, cfg.patch_size, cfg.patch_size))
    s[f"{prefix}embeddings.patch_embedding.bias"] = ("raw", (D,))
    n = (cfg.image_size // cfg.patch_size) ** 2
    s[f"{prefix}embeddings.position_embedding"] = ("raw", (n, D))
    for i in range(cfg.num_hidden_layers):
        b = f"{prefix}encoder.layers.{i}"
        for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
            s[f"{b}.self_attn.{proj}.weight"] = ("lin", (D, D))
            s[f"{b}.self_attn.{proj}.bias"] = ("raw", (D,))
        for nname in ("layer_norm1", "layer_norm2"):
            s[f"{b}.{nname}.weight"] = ("raw", (D,))
            s[f"{b}.{nname}.bias"] = ("raw", (D,))
        s[f"{b}.mlp.fc1.weight"] = ("lin", (cfg.intermediate_size, D))
        s[f"{b}.mlp.fc1.bias"] = ("raw", (cfg.intermediate_size,))
        s[f"{b}.mlp.fc2.weight"] = ("lin", (D, cfg.intermediate_size))
        s[f"{b}.mlp.fc2.bias"] = ("raw", (D,))
    s[f"{prefix}post_layernorm.weight"] = ("raw", (D,))
    s[f"{prefix}post_layernorm.bias"] = ("raw", (D,))
    # attention-pooling head (vision_encoder.py:160-182)
    s[f"{prefix}head.probe"] = ("raw", (1, 1, D))
    s[f"{prefix}head.attention.in_proj_weight"] = ("lin", (3 * D, D))
    s[f"{prefix}head.attention.in_proj_bias"] = ("raw", (3 * D,))
    s[f"{prefix}head.attention.out_proj.weight"] = ("lin", (D, D))
    s[f"{prefix}head.attention.out_proj.bias"] = ("raw", (D,))
    s[f"{prefix}head.layernorm.weight"] = ("raw", (D,))
    s[f"{prefix}head.layernorm.bias"] = ("raw", (D,))
    s[f"{prefix}head.mlp.fc1.weight"] = ("lin", (cfg.intermediate_size, D))
    s[f"{prefix}head.mlp.fc1.bias"] = ("raw", (cfg.intermediate_size,))
    s[f"{prefix}head.mlp.fc2.weight"] = ("lin", (D, cfg.intermediate_size))
    s[f"{prefix}head.mlp.fc2.bias"] = ("raw", (D,))
    return s


def init_params(key: jax.Array, cfg: SigLip2VisionModelConfig,
                prefix: str = "", dtype=jnp.float32) -> Dict[str, jax.Array]:
    params: Dict[str, jax.Array] = {}
    for name, (kind, shape) in vision_param_specs(cfg, prefix).items():
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
        elif "position_embedding" in name or name.endswith("probe"):
            params[name] = jax.random.normal(sub, shape, dtype)
        elif name.endswith(".weight"):
            params[name] = jnp.ones(shape, dtype)
        else:
            params[name] = jnp.zeros(shape, dtype)
    return params


def load_torch_weights(state_dict, cfg: SigLip2VisionModelConfig,
                       prefix: str = "") -> Dict[str, jax.Array]:
    params: Dict[str, jax.Array] = {}
    for k, (kind, shape) in vision_param_specs(cfg, prefix).items():
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


def _ln(p, prefix, x, eps):
    mu = jnp.mean(x, -1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), -1, keepdims=True)
    return (x - mu) * lax.rsqrt(var + eps) \
        * p[f"{prefix}.weight"].astype(x.dtype) \
        + p[f"{prefix}.bias"].astype(x.dtype)


def _lin(p, prefix, x):
    return x @ p[f"{prefix}.weight"].astype(x.dtype) \
        + p[f"{prefix}.bias"].astype(x.dtype)


def _attn(q, k, v, nh):
    B, Nq, D = q.shape
    Nk = k.shape[1]
    hd = D // nh
    q = q.reshape(B, Nq, nh, hd).transpose(0, 2, 1, 3)
    k = k.reshape(B, Nk, nh, hd).transpose(0, 2, 1, 3)
    v = v.reshape(B, Nk, nh, hd).transpose(0, 2, 1, 3)
    a = jax.nn.softmax(q @ k.transpose(0, 1, 3, 2) / math.sqrt(hd), -1)
    return (a @ v).transpose(0, 2, 1, 3).reshape(B, Nq, D)


def vision_forward(p, cfg: SigLip2VisionModelConfig, images: jax.Array,
                   prefix: str = "") -> Tuple[jax.Array, jax.Array]:
    """images (B, 3, H, W) -> (pooled (B, D), last_hidden (B, N, D))
    (reference SigLip2VisionModel.forward:273)."""
    eps = cfg.layer_norm_eps
    nh = cfg.num_attention_heads
    x = jnp.transpose(images, (0, 2, 3, 1))
    w = p[f"{prefix}embeddings.patch_embedding.weight"].astype(x.dtype)
    x = lax.conv_general_dilated(
        x, w, (cfg.patch_size, cfg.patch_size), [(0, 0)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    x = x + p[f"{prefix}embeddings.patch_embedding.bias"].astype(x.dtype)
    B = x.shape[0]
    x = x.reshape(B, -1, cfg.hidden_size)
    x = x + p[f"{prefix}embeddings.position_embedding"].astype(x.dtype)[None]
    for i in range(cfg.num_hidden_layers):
        b = f"{prefix}encoder.layers.{i}"
        h = _ln(p, f"{b}.layer_norm1", x, eps)
        o = _attn(_lin(p, f"{b}.self_attn.q_proj", h),
                  _lin(p, f"{b}.self_attn.k_proj", h),
                  _lin(p, f"{b}.self_attn.v_proj", h), nh)
        x = x + _lin(p, f"{b}.self_attn.out_proj", o)
        h = _ln(p, f"{b}.layer_norm2", x, eps)
        h = _lin(p, f"{b}.mlp.fc2",
                 jax.nn.gelu(_lin(p, f"{b}.mlp.fc1", h), approximate=False))
        x = x + h
    x = _ln(p, f"{prefix}post_layernorm", x, eps)
    # attention-pooling head: torch nn.MultiheadAttention packed qkv
    D = cfg.hidden_size
    probe = jnp.broadcast_to(
        p[f"{prefix}head.probe"].astype(x.dtype), (B, 1, D))
    win = p[f"{prefix}head.attention.in_proj_weight"].astype(x.dtype)
    bin_ = p[f"{prefix}head.attention.in_proj_bias"].astype(x.dtype)
    q = probe @ win[:, :D] + bin_[:D]
    k = x @ win[:, D:2 * D] + bin_[D:2 * D]
    v = x @ win[:, 2 * D:] + bin_[2 * D:]
    pooled = _attn(q, k, v, nh)
    pooled = _lin(p, f"{prefix}head.attention.out_proj", pooled)
    res = pooled
    pooled = _ln(p, f"{prefix}head.layernorm", pooled, eps)
    pooled = res + _lin(
        p, f"{prefix}head.mlp.fc2",
        jax.nn.gelu(_lin(p, f"{prefix}head.mlp.fc1", pooled),
                    approximate=False))
    return pooled[:, 0], x
