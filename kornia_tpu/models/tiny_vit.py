"""TinyViT (https://arxiv.org/abs/2207.10666) — exact architecture,
TPU-native.

Reference behavior: kornia/models/tiny_vit.py — ConvBN stem (PatchEmbed:67),
MBConv stage (MBConv:86, ConvLayer:174), window-attention stages with
cached relative attention biases (Attention:258, TinyViTBlock:365,
BasicLayer:437), PatchMerging downsample (:130), and the MobileSAM variant
(strides [2,2,1,1] + SAM neck, TinyViT:536-571) used as the mobile_sam
image encoder (models/sam/model.py:190).

Implementation notes (TPU-first):
- flat param dict keyed by the reference torch state_dict names
  (`load_torch_weights` is a pure layout transpose; parity in
  tests/test_tiny_vit_parity.py).
- NHWC feature maps; BatchNorm folded to scale/shift (inference stats).
- the relative attention-bias gather indices are built statically with
  numpy (reference build_attention_bias:297), so the bias add is a single
  static gather + broadcast under jit.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

__all__ = ["TinyViT", "TinyViTConfig", "init_params", "load_torch_weights"]

_BN_EPS = 1e-5


@dataclasses.dataclass(frozen=True)
class TinyViTConfig:
    img_size: int = 224
    in_chans: int = 3
    num_classes: int = 1000
    embed_dims: Tuple[int, ...] = (96, 192, 384, 768)
    depths: Tuple[int, ...] = (2, 2, 6, 2)
    num_heads: Tuple[int, ...] = (3, 6, 12, 24)
    window_sizes: Tuple[int, ...] = (7, 7, 14, 7)
    mlp_ratio: float = 4.0
    mbconv_expand_ratio: float = 4.0
    local_conv_size: int = 3
    mobile_sam: bool = False

    @property
    def strides(self) -> Tuple[int, ...]:
        return (2, 2, 1, 1) if self.mobile_sam else (2, 2, 2, 1)

    @property
    def resolutions(self) -> Tuple[int, ...]:
        """Input resolution of each stage (reference :574-614)."""
        r = self.img_size // 4
        out = []
        for s in self.strides:
            out.append(r)
            r //= s
        return tuple(out)

    @property
    def feat_size(self) -> int:
        r = self.img_size // 4
        for s in self.strides:
            r //= s
        return r

    @staticmethod
    def from_variant(variant: str, **kw) -> "TinyViTConfig":
        presets = {
            "5m": ((64, 128, 160, 320), (2, 2, 6, 2), (2, 4, 5, 10)),
            "11m": ((64, 128, 256, 448), (2, 2, 6, 2), (2, 4, 8, 14)),
            "21m": ((96, 192, 384, 576), (2, 2, 6, 2), (3, 6, 12, 18)),
        }
        dims, depths, heads = presets[variant]
        return TinyViTConfig(embed_dims=dims, depths=depths, num_heads=heads,
                             window_sizes=(7, 7, 14, 7), **kw)


def _n_bias_offsets(resolution: int) -> int:
    h = w = resolution
    rr = np.repeat(np.arange(h), w)
    cc = np.tile(np.arange(w), h)
    keys = np.abs(rr[:, None] - rr[None, :]) * w \
        + np.abs(cc[:, None] - cc[None, :])
    return len(np.unique(keys))


def _bias_idxs(resolution: int) -> np.ndarray:
    """reference build_attention_bias (tiny_vit.py:297-321)."""
    h = w = resolution
    rr = np.repeat(np.arange(h), w)
    cc = np.tile(np.arange(w), h)
    keys = np.abs(rr[:, None] - rr[None, :]) * w \
        + np.abs(cc[:, None] - cc[None, :])
    _, inverse = np.unique(keys, return_inverse=True)
    return inverse.reshape(h * w, h * w)


# -----------------------------------------------------------------------------
# Param specs
# -----------------------------------------------------------------------------

def _param_specs(cfg: TinyViTConfig) -> Dict[str, Tuple[str, Tuple[int, ...]]]:
    s: Dict[str, Tuple[str, Tuple[int, ...]]] = {}

    def convbn(prefix: str, i: int, o: int, k: int, groups: int = 1) -> None:
        s[f"{prefix}.c.weight"] = ("conv", (o, i // groups, k, k))
        for n, shape in (("weight", (o,)), ("bias", (o,)),
                         ("running_mean", (o,)), ("running_var", (o,))):
            s[f"{prefix}.bn.{n}"] = ("raw", shape)

    e0 = cfg.embed_dims[0]
    convbn("patch_embed.seq.0", cfg.in_chans, e0 // 2, 3)
    convbn("patch_embed.seq.2", e0 // 2, e0, 3)

    for li, (dim, depth) in enumerate(zip(cfg.embed_dims, cfg.depths)):
        pre = f"layers.{li}"
        if li == 0:
            h = int(dim * cfg.mbconv_expand_ratio)
            for j in range(depth):
                convbn(f"{pre}.blocks.{j}.conv1", dim, h, 1)
                convbn(f"{pre}.blocks.{j}.conv2", h, h, 3, groups=h)
                convbn(f"{pre}.blocks.{j}.conv3", h, dim, 1)
        else:
            heads = cfg.num_heads[li]
            key_dim = dim // heads
            ws = cfg.window_sizes[li]
            noff = _n_bias_offsets(ws)
            qkv_out = heads * key_dim * 3  # attn_ratio = 1.0
            for j in range(depth):
                b = f"{pre}.blocks.{j}"
                s[f"{b}.attn.norm.weight"] = ("raw", (dim,))
                s[f"{b}.attn.norm.bias"] = ("raw", (dim,))
                s[f"{b}.attn.qkv.weight"] = ("lin", (qkv_out, dim))
                s[f"{b}.attn.qkv.bias"] = ("raw", (qkv_out,))
                s[f"{b}.attn.proj.weight"] = ("lin", (dim, heads * key_dim))
                s[f"{b}.attn.proj.bias"] = ("raw", (dim,))
                s[f"{b}.attn.attention_biases"] = ("raw", (heads, noff))
                convbn(f"{b}.local_conv", dim, dim, cfg.local_conv_size,
                       groups=dim)
                mlp_h = int(dim * cfg.mlp_ratio)
                s[f"{b}.mlp.norm.weight"] = ("raw", (dim,))
                s[f"{b}.mlp.norm.bias"] = ("raw", (dim,))
                s[f"{b}.mlp.fc1.weight"] = ("lin", (mlp_h, dim))
                s[f"{b}.mlp.fc1.bias"] = ("raw", (mlp_h,))
                s[f"{b}.mlp.fc2.weight"] = ("lin", (dim, mlp_h))
                s[f"{b}.mlp.fc2.bias"] = ("raw", (dim,))
        if li < len(cfg.depths) - 1:
            out_dim = cfg.embed_dims[li + 1]
            convbn(f"{pre}.downsample.conv1", dim, out_dim, 1)
            convbn(f"{pre}.downsample.conv2", out_dim, out_dim, 3,
                   groups=out_dim)
            convbn(f"{pre}.downsample.conv3", out_dim, out_dim, 1)

    last = cfg.embed_dims[-1]
    if cfg.mobile_sam:
        s["neck.0.weight"] = ("conv", (256, last, 1, 1))
        s["neck.1.weight"] = ("raw", (256,))
        s["neck.1.bias"] = ("raw", (256,))
        s["neck.2.weight"] = ("conv", (256, 256, 3, 3))
        s["neck.3.weight"] = ("raw", (256,))
        s["neck.3.bias"] = ("raw", (256,))
    s["norm_head.weight"] = ("raw", (last,))
    s["norm_head.bias"] = ("raw", (last,))
    s["head.weight"] = ("lin", (cfg.num_classes, last))
    s["head.bias"] = ("raw", (cfg.num_classes,))
    return s


def init_params(key: jax.Array, cfg: TinyViTConfig,
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
        elif name.endswith("running_var") or (
                name.endswith(".weight") and "attention" not in name):
            params[name] = jnp.ones(shape, dtype)
        else:
            params[name] = jnp.zeros(shape, dtype)
    return params


def load_torch_weights(state_dict, cfg: Optional[TinyViTConfig] = None,
                       prefix: str = "") -> Dict[str, jax.Array]:
    """Convert a reference TinyViT torch state_dict (optionally nested under
    `prefix`, e.g. "image_encoder." for mobile_sam checkpoints)."""
    cfg = cfg or TinyViTConfig()
    params: Dict[str, jax.Array] = {}
    for k, (kind, shape) in _param_specs(cfg).items():
        v = state_dict[prefix + k]
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


# -----------------------------------------------------------------------------
# Functional forward
# -----------------------------------------------------------------------------

def _convbn(p, prefix, x, stride=1, padding=0, groups=1):
    w = p[f"{prefix}.c.weight"].astype(x.dtype)
    y = lax.conv_general_dilated(
        x, w, (stride, stride), [(padding, padding)] * 2,
        feature_group_count=groups,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    mean = p[f"{prefix}.bn.running_mean"].astype(x.dtype)
    var = p[f"{prefix}.bn.running_var"].astype(x.dtype)
    g = p[f"{prefix}.bn.weight"].astype(x.dtype)
    b = p[f"{prefix}.bn.bias"].astype(x.dtype)
    scale = g * lax.rsqrt(var + _BN_EPS)
    return y * scale + (b - mean * scale)


def _gelu(x):
    return jax.nn.gelu(x, approximate=False)


def _linear(p, prefix, x):
    return x @ p[f"{prefix}.weight"].astype(x.dtype) \
        + p[f"{prefix}.bias"].astype(x.dtype)


def _layer_norm(p, prefix, x, eps=1e-5):
    mu = jnp.mean(x, -1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), -1, keepdims=True)
    xn = (x - mu) * lax.rsqrt(var + eps)
    return xn * p[f"{prefix}.weight"].astype(x.dtype) \
        + p[f"{prefix}.bias"].astype(x.dtype)


def _mbconv(p, prefix, x, expand):
    h = _gelu(_convbn(p, f"{prefix}.conv1", x))
    h = _gelu(_convbn(p, f"{prefix}.conv2", h, padding=1,
                      groups=h.shape[-1]))
    h = _convbn(p, f"{prefix}.conv3", h)
    return _gelu(x + h)


def _patch_merging(p, prefix, x, stride):
    """(B, H, W, C) -> (B, H/s, W/s, C_out) (reference PatchMerging:130)."""
    x = _gelu(_convbn(p, f"{prefix}.conv1", x))
    x = _gelu(_convbn(p, f"{prefix}.conv2", x, stride=stride, padding=1,
                      groups=x.shape[-1]))
    return _convbn(p, f"{prefix}.conv3", x)


def _window_attention(p, prefix, x, heads, key_dim, idxs):
    """x: (B, N, C) window tokens (reference Attention.forward:339)."""
    B, N, C = x.shape
    x = _layer_norm(p, f"{prefix}.norm", x)
    qkv = _linear(p, f"{prefix}.qkv", x)
    qkv = qkv.reshape(B, N, heads, 3 * key_dim).transpose(0, 2, 1, 3)
    q, k, v = (qkv[..., :key_dim], qkv[..., key_dim:2 * key_dim],
               qkv[..., 2 * key_dim:])
    bias = p[f"{prefix}.attention_biases"].astype(x.dtype)[:, idxs]
    attn = q @ k.transpose(0, 1, 3, 2) * (key_dim ** -0.5) + bias[:, :N, :N]
    attn = jax.nn.softmax(attn, -1)
    out = (attn @ v).transpose(0, 2, 1, 3).reshape(B, N, heads * key_dim)
    return _linear(p, f"{prefix}.proj", out)


def _window_partition(x, w):
    B, H, W, C = x.shape
    ph, pw = (-H) % w, (-W) % w
    x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
    Hp, Wp = H + ph, W + pw
    x = x.reshape(B, Hp // w, w, Wp // w, w, C).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, w * w, C), (Hp, Wp)


def _window_unpartition(wins, w, pad_hw, hw):
    Hp, Wp = pad_hw
    H, W = hw
    B = wins.shape[0] // (Hp * Wp // (w * w))
    x = wins.reshape(B, Hp // w, Wp // w, w, w, -1).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, Hp, Wp, -1)[:, :H, :W]


def _tiny_vit_block(p, prefix, x, cfg: TinyViTConfig, stage: int,
                    idxs) -> jax.Array:
    """x: (B, H, W, C) (reference TinyViTBlock.forward:406)."""
    heads = cfg.num_heads[stage]
    dim = cfg.embed_dims[stage]
    ws = cfg.window_sizes[stage]
    hw = x.shape[1:3]
    res = x
    wins, pad_hw = _window_partition(x, ws)
    wins = _window_attention(p, f"{prefix}.attn", wins, heads, dim // heads,
                             idxs)
    x = res + _window_unpartition(wins, ws, pad_hw, hw)
    x = _convbn(p, f"{prefix}.local_conv", x,
                padding=cfg.local_conv_size // 2, groups=dim)
    h = _layer_norm(p, f"{prefix}.mlp.norm", x)
    h = _linear(p, f"{prefix}.mlp.fc2",
                _gelu(_linear(p, f"{prefix}.mlp.fc1", h)))
    return x + h


def forward_features(p, cfg: TinyViTConfig, images: jax.Array) -> jax.Array:
    """images (B, 3, H, W) -> final-stage tokens (B, h, w, C_last)
    (reference TinyViT.forward:625)."""
    x = jnp.transpose(images, (0, 2, 3, 1))
    x = _convbn(p, "patch_embed.seq.0", x, stride=2, padding=1)
    x = _gelu(x)
    x = _convbn(p, "patch_embed.seq.2", x, stride=2, padding=1)
    for li, depth in enumerate(cfg.depths):
        pre = f"layers.{li}"
        if li == 0:
            for j in range(depth):
                x = _mbconv(p, f"{pre}.blocks.{j}", x,
                            cfg.mbconv_expand_ratio)
        else:
            idxs = jnp.asarray(_bias_idxs(cfg.window_sizes[li]))
            for j in range(depth):
                x = _tiny_vit_block(p, f"{pre}.blocks.{j}", x, cfg, li, idxs)
        if li < len(cfg.depths) - 1:
            x = _patch_merging(p, f"{pre}.downsample", x, cfg.strides[li])
    return x


def encode_image(p, cfg: TinyViTConfig, images: jax.Array) -> jax.Array:
    """MobileSAM path: (B, 3, H, W) -> SAM embeddings (B, h, w, 256) NHWC
    (reference TinyViT.forward:630-633)."""
    x = forward_features(p, cfg, images)
    x = lax.conv_general_dilated(
        x, p["neck.0.weight"].astype(x.dtype), (1, 1), [(0, 0)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    x = _layer_norm(p, "neck.1", x, 1e-6)
    x = lax.conv_general_dilated(
        x, p["neck.2.weight"].astype(x.dtype), (1, 1), [(1, 1)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return _layer_norm(p, "neck.3", x, 1e-6)


def classify(p, cfg: TinyViTConfig, images: jax.Array) -> jax.Array:
    """Classification head: (B, 3, H, W) -> logits (B, num_classes)."""
    x = forward_features(p, cfg, images)
    x = jnp.mean(x.reshape(x.shape[0], -1, x.shape[-1]), 1)
    return _linear(p, "head", _layer_norm(p, "norm_head", x))


class TinyViT:
    """Thin stateful wrapper mirroring the reference class API."""

    def __init__(self, cfg: Optional[TinyViTConfig] = None, params=None,
                 key: Optional[jax.Array] = None):
        self.cfg = cfg or TinyViTConfig()
        self._params = params
        self._key = key if key is not None else jax.random.PRNGKey(0)

    @staticmethod
    def from_config(variant: str, params=None, **kw) -> "TinyViT":
        return TinyViT(TinyViTConfig.from_variant(variant, **kw), params)

    @property
    def params(self):
        if self._params is None:
            self._params = init_params(self._key, self.cfg)
        return self._params

    def __call__(self, images: jax.Array) -> jax.Array:
        if self.cfg.mobile_sam:
            return jnp.transpose(encode_image(self.params, self.cfg, images),
                                 (0, 3, 1, 2))
        return classify(self.params, self.cfg, images)
