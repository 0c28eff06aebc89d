"""KimiVL vision stack (MoonViT + pixel-unshuffle projector) — exact
architecture, TPU-native.

Reference behavior: kornia/models/kimi_vl/ —
- moonvit.py: 2D rotary embedding (MoonViTRotaryEmbedding:50, half the
  head dim for each axis), pre-norm RoPE attention (MoonViTAttention:108),
  GELU MLP, absolute pos-embed with bicubic interpolation
  (MoonViT.forward:342-358)
- model.py: KimiVLProjector:31 (pre-norm LN, pixel_unshuffle(2), 2-layer
  GELU MLP), KimiVLModel:77 (vision encoder + projector; no LLM decoder,
  matching the reference's vision-only scope)
- config.py defaults (MoonViT: 1152/27/16, rope_theta 8e5).

Flat param dict keyed by the reference torch state_dict names; parity in
tests/test_vlm_parity.py. The 2D RoPE tables are built statically with
numpy per patch-grid shape.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

__all__ = ["KimiVLModel", "KimiVLConfig", "MoonViTConfig",
           "KimiVLProjectorConfig", "init_params", "load_torch_weights"]


@dataclasses.dataclass(frozen=True)
class MoonViTConfig:
    image_size: int = 384
    patch_size: int = 14
    num_channels: int = 3
    hidden_size: int = 1152
    num_hidden_layers: int = 27
    num_attention_heads: int = 16
    intermediate_size: int = 4304
    layer_norm_eps: float = 1e-6
    rope_theta: float = 800000.0


@dataclasses.dataclass(frozen=True)
class KimiVLProjectorConfig:
    input_dim: int = 1152
    hidden_dim: int = 4608
    output_dim: int = 2048


@dataclasses.dataclass(frozen=True)
class KimiVLConfig:
    vision: MoonViTConfig = MoonViTConfig()
    projector: KimiVLProjectorConfig = KimiVLProjectorConfig()


def _rope_2d(h: int, w: int, dim: int, theta: float) -> Tuple[np.ndarray,
                                                              np.ndarray]:
    """2D RoPE tables (moonvit.py:58-105): per-axis frequency banks over
    half the head dim each, h-major patch order."""
    dim_h = dim_w = dim // 2
    inv_h = 1.0 / theta ** (np.arange(0, dim_h, 2, dtype=np.float32) / dim_h)
    inv_w = 1.0 / theta ** (np.arange(0, dim_w, 2, dtype=np.float32) / dim_w)
    fh = np.outer(np.arange(h, dtype=np.float32), inv_h)
    fw = np.outer(np.arange(w, dtype=np.float32), inv_w)
    fh = np.repeat(fh, w, axis=0)
    fw = np.tile(fw, (h, 1))
    emb = np.concatenate([fh, fh, fw, fw], -1)
    return np.cos(emb), np.sin(emb)


def _param_specs(cfg: KimiVLConfig):
    v, pr = cfg.vision, cfg.projector
    D = v.hidden_size
    s: Dict[str, tuple] = {}
    s["vision_encoder.patch_embed.weight"] = (
        "conv", (D, v.num_channels, v.patch_size, v.patch_size))
    s["vision_encoder.patch_embed.bias"] = ("raw", (D,))
    n = (v.image_size // v.patch_size) ** 2
    s["vision_encoder.pos_embed"] = ("raw", (1, n, D))
    for i in range(v.num_hidden_layers):
        b = f"vision_encoder.encoder.layers.{i}"
        for nname in ("norm1", "norm2"):
            s[f"{b}.{nname}.weight"] = ("raw", (D,))
            s[f"{b}.{nname}.bias"] = ("raw", (D,))
        for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
            s[f"{b}.attn.{proj}.weight"] = ("lin", (D, D))
            s[f"{b}.attn.{proj}.bias"] = ("raw", (D,))
        s[f"{b}.mlp.fc1.weight"] = ("lin", (v.intermediate_size, D))
        s[f"{b}.mlp.fc1.bias"] = ("raw", (v.intermediate_size,))
        s[f"{b}.mlp.fc2.weight"] = ("lin", (D, v.intermediate_size))
        s[f"{b}.mlp.fc2.bias"] = ("raw", (D,))
    s["vision_encoder.norm.weight"] = ("raw", (D,))
    s["vision_encoder.norm.bias"] = ("raw", (D,))
    s["projector.pre_norm.weight"] = ("raw", (pr.input_dim,))
    s["projector.pre_norm.bias"] = ("raw", (pr.input_dim,))
    s["projector.mlp.0.weight"] = ("lin", (pr.hidden_dim, 4 * pr.input_dim))
    s["projector.mlp.0.bias"] = ("raw", (pr.hidden_dim,))
    s["projector.mlp.2.weight"] = ("lin", (pr.output_dim, pr.hidden_dim))
    s["projector.mlp.2.bias"] = ("raw", (pr.output_dim,))
    return s


def init_params(key: jax.Array, cfg: KimiVLConfig,
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
        elif name == "vision_encoder.pos_embed":
            params[name] = jax.random.normal(sub, shape, dtype)
        elif name.endswith(".weight"):
            params[name] = jnp.ones(shape, dtype)
        else:
            params[name] = jnp.zeros(shape, dtype)
    return params


def load_torch_weights(state_dict, cfg: Optional[KimiVLConfig] = None
                       ) -> Dict[str, jax.Array]:
    cfg = cfg or KimiVLConfig()
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


def _ln(p, prefix, x, eps):
    mu = jnp.mean(x, -1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), -1, keepdims=True)
    return (x - mu) * lax.rsqrt(var + eps) \
        * p[f"{prefix}.weight"].astype(x.dtype) \
        + p[f"{prefix}.bias"].astype(x.dtype)


def _lin(p, prefix, x):
    return x @ p[f"{prefix}.weight"].astype(x.dtype) \
        + p[f"{prefix}.bias"].astype(x.dtype)


def _apply_rope(x, cos, sin):
    """moonvit.py:29-47 — rotate_half convention."""
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    rot = jnp.concatenate([-x2, x1], -1)
    return x * cos + rot * sin


def encode_image(p, cfg: MoonViTConfig, images: jax.Array) -> jax.Array:
    """MoonViT: images (B, 3, H, W) -> tokens (B, N, D)
    (moonvit.py:325-365)."""
    x = jnp.transpose(images, (0, 2, 3, 1))
    w = p["vision_encoder.patch_embed.weight"].astype(x.dtype)
    x = lax.conv_general_dilated(
        x, w, (cfg.patch_size, cfg.patch_size), [(0, 0)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    x = x + p["vision_encoder.patch_embed.bias"].astype(x.dtype)
    B, hp, wp, D = x.shape
    x = x.reshape(B, hp * wp, D)
    pos = p["vision_encoder.pos_embed"].astype(x.dtype)
    if pos.shape[1] != hp * wp:  # bicubic interpolation (:344-356)
        href = int(pos.shape[1] ** 0.5)
        pos = jax.image.resize(pos.reshape(1, href, href, D),
                               (1, hp, wp, D), "cubic")
        pos = pos.reshape(1, hp * wp, D)
    x = x + pos
    nh = cfg.num_attention_heads
    hd = D // nh
    cos_np, sin_np = _rope_2d(hp, wp, hd, cfg.rope_theta)
    cos = jnp.asarray(cos_np, x.dtype)[None, None]
    sin = jnp.asarray(sin_np, x.dtype)[None, None]
    for i in range(cfg.num_hidden_layers):
        b = f"vision_encoder.encoder.layers.{i}"
        h = _ln(p, f"{b}.norm1", x, cfg.layer_norm_eps)
        N = h.shape[1]

        def split(a):
            return a.reshape(B, N, nh, hd).transpose(0, 2, 1, 3)
        q = _apply_rope(split(_lin(p, f"{b}.attn.q_proj", h)), cos, sin)
        k = _apply_rope(split(_lin(p, f"{b}.attn.k_proj", h)), cos, sin)
        v = split(_lin(p, f"{b}.attn.v_proj", h))
        attn = jax.nn.softmax(q @ k.transpose(0, 1, 3, 2) / math.sqrt(hd),
                              -1)
        o = (attn @ v).transpose(0, 2, 1, 3).reshape(B, N, D)
        x = x + _lin(p, f"{b}.attn.out_proj", o)
        h = _ln(p, f"{b}.norm2", x, cfg.layer_norm_eps)
        h = _lin(p, f"{b}.mlp.fc2",
                 jax.nn.gelu(_lin(p, f"{b}.mlp.fc1", h), approximate=False))
        x = x + h
    return _ln(p, "vision_encoder.norm", x, cfg.layer_norm_eps)


def project(p, cfg: KimiVLProjectorConfig, x: jax.Array, h: int, w: int
            ) -> jax.Array:
    """KimiVLProjector (model.py:31-76): LN -> pixel_unshuffle(2) -> MLP.
    x (B, N, D) -> (B, N/4, output_dim)."""
    B, _, D = x.shape
    x = _ln(p, "projector.pre_norm", x, 1e-5)
    h2, w2 = h // 2, w // 2
    # torch pixel_unshuffle channel order: out[c*4 + i*2 + j]
    t = x.reshape(B, h2, 2, w2, 2, D).transpose(0, 1, 3, 5, 2, 4)
    t = t.reshape(B, h2 * w2, D * 4)
    t = jax.nn.gelu(_lin(p, "projector.mlp.0", t), approximate=False)
    return _lin(p, "projector.mlp.2", t)


class KimiVLModel:
    """Vision encoder + projector (reference model.py:77)."""

    def __init__(self, cfg: Optional[KimiVLConfig] = None, params=None,
                 key: Optional[jax.Array] = None):
        self.cfg = cfg or KimiVLConfig()
        self._params = params
        self._key = key if key is not None else jax.random.PRNGKey(0)

    @property
    def params(self):
        if self._params is None:
            self._params = init_params(self._key, self.cfg)
        return self._params

    def __call__(self, images: jax.Array) -> jax.Array:
        v = self.cfg.vision
        feats = encode_image(self.params, v, images)
        hp = images.shape[2] // v.patch_size
        wp = images.shape[3] // v.patch_size
        return project(self.params, self.cfg.projector, feats, hp, wp)
