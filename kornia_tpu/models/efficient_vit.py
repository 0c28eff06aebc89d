"""EfficientViT (ICCV 2023, multi-scale linear attention) — exact
architecture, TPU-native.

Reference behavior: kornia/models/efficient_vit/ —
- backbone.py:42 EfficientViTBackbone (b0-b3) and :241
  EfficientViTLargeBackbone (l0-l3), stage builders :134/:338
- nn/ops.py: ConvLayer:50, DSConv:129, MBConv:190, FusedMBConv:264,
  ResBlock:337, LiteMLA:399 (ReLU linear attention with multi-scale
  depthwise aggregation), EfficientViTBlock:525, ResidualBlock:589
- nn/act.py: hswish/relu6/gelu(tanh) registry; nn/norm.py: bn2d
- model.py:60 EfficientViT wrapper returning the stage-output dict.

Implementation notes (TPU-first):
- a single block "plan" is built from the config and drives BOTH the param
  specs and the forward pass, so the two cannot drift.
- flat param dict keyed by the reference torch state_dict names
  (`load_torch_weights` is a pure layout transpose; parity in
  tests/test_efficient_vit_parity.py).
- NHWC; BatchNorm folded to scale/shift (inference stats).
- LiteMLA's linear attention is two small matmuls per head group
  ((HW,d)ᵀ(HW,d+1) then (HW,d)(d,d+1)) — linear in resolution and
  MXU-friendly; the ones-column trick for the normalizer is kept.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

__all__ = ["EfficientViT", "EfficientViTConfig", "init_params",
           "load_torch_weights"]

_BN_EPS = 1e-5


@dataclasses.dataclass(frozen=True)
class EfficientViTConfig:
    width_list: Tuple[int, ...] = (16, 32, 64, 128, 256)
    depth_list: Tuple[int, ...] = (1, 2, 3, 3, 4)
    dim: int = 16                 # attention head dim (qkv_dim for large)
    expand_ratio: float = 4.0
    large: bool = False
    in_channels: int = 3

    @property
    def act(self) -> str:
        return "gelu" if self.large else "hswish"

    @staticmethod
    def from_name(name: str) -> "EfficientViTConfig":
        """b0-b3 (backbone.py:197-238) / l0-l3 (:412-449) presets."""
        b = {
            "b0": ((8, 16, 32, 64, 128), (1, 2, 2, 2, 2), 16),
            "b1": ((16, 32, 64, 128, 256), (1, 2, 3, 3, 4), 16),
            "b2": ((24, 48, 96, 192, 384), (1, 3, 4, 4, 6), 32),
            "b3": ((32, 64, 128, 256, 512), (1, 4, 6, 6, 9), 32),
        }
        large = {
            "l0": ((32, 64, 128, 256, 512), (1, 1, 1, 4, 4)),
            "l1": ((32, 64, 128, 256, 512), (1, 1, 1, 6, 6)),
            "l2": ((32, 64, 128, 256, 512), (1, 2, 2, 8, 8)),
            "l3": ((64, 128, 256, 512, 1024), (1, 2, 2, 8, 8)),
        }
        if name in b:
            w, d, dim = b[name]
            return EfficientViTConfig(w, d, dim)
        if name in large:
            w, d = large[name]
            return EfficientViTConfig(w, d, dim=32, large=True)
        raise ValueError(f"Unknown EfficientViT variant: {name}")


# -----------------------------------------------------------------------------
# Block plan: one structure drives param specs AND forward
# -----------------------------------------------------------------------------
# A "conv" entry is the reference ConvLayer (ops.py:50): conv [+bias]
# [+bn] [+act]. Plan entries:
#   ("conv", prefix, in, out, k, stride, groups, bias, norm, act)
#   ("mla", prefix, channels, dim)          # LiteMLA, scales=(5,)
#   ("res", [sub-entries])                  # residual: x + main(x)
#   ("seq", [sub-entries])                  # plain sequence

def _conv(prefix, i, o, k=1, stride=1, groups=1, bias=False, norm=True,
          act=None):
    return ("conv", prefix, i, o, k, stride, groups, bias, norm, act)


def _dsconv(prefix, i, o, stride, act, fewer_norm=False):
    """ops.py:129 — depthwise + pointwise."""
    return [
        _conv(f"{prefix}.depth_conv", i, i, 3, stride, groups=i,
              bias=fewer_norm, norm=not fewer_norm, act=act),
        _conv(f"{prefix}.point_conv", i, o, 1, bias=False, norm=True),
    ]


def _mbconv(prefix, i, o, stride, expand, act, fewer_norm=False):
    """ops.py:190 — inverted bottleneck."""
    mid = round(i * expand)
    return [
        _conv(f"{prefix}.inverted_conv", i, mid, 1, bias=fewer_norm,
              norm=not fewer_norm, act=act),
        _conv(f"{prefix}.depth_conv", mid, mid, 3, stride, groups=mid,
              bias=fewer_norm, norm=not fewer_norm, act=act),
        _conv(f"{prefix}.point_conv", mid, o, 1, bias=False, norm=True),
    ]


def _fused_mbconv(prefix, i, o, stride, expand, act, fewer_norm=False):
    """ops.py:264."""
    mid = round(i * expand)
    return [
        _conv(f"{prefix}.spatial_conv", i, mid, 3, stride, bias=fewer_norm,
              norm=not fewer_norm, act=act),
        _conv(f"{prefix}.point_conv", mid, o, 1, bias=False, norm=True),
    ]


def _resblock(prefix, i, o, stride, act, fewer_norm=False):
    """ops.py:337 (expand_ratio=1 => mid = in)."""
    return [
        _conv(f"{prefix}.conv1", i, i, 3, stride, bias=fewer_norm,
              norm=not fewer_norm, act=act),
        _conv(f"{prefix}.conv2", i, o, 3, 1, bias=False, norm=True),
    ]


def _evit_block(prefix, ch, dim, expand, act):
    """EfficientViTBlock (ops.py:525): residual LiteMLA + residual MBConv
    with fewer_norm-style biases."""
    return [
        ("res", [("mla", f"{prefix}.context_module.main", ch, dim)]),
        ("res", _mbconv(f"{prefix}.local_module.main", ch, ch, 1, expand,
                        act, fewer_norm=True)),
    ]


def _plan(cfg: EfficientViTConfig) -> List[Tuple[str, list]]:
    """Stage list mirroring the reference builders (backbone.py:59-132 for
    b-series, :261-336 for large). Returns [(stage_name, entries)]."""
    w, d, act = cfg.width_list, cfg.depth_list, cfg.act
    stages: List[Tuple[str, list]] = []
    if not cfg.large:
        stem: list = [_conv("input_stem.op_list.0", cfg.in_channels, w[0], 3,
                            2, norm=True, act=act)]
        for j in range(d[0]):
            stem.append(("res", _dsconv(f"input_stem.op_list.{j + 1}.main",
                                        w[0], w[0], 1, act)))
        stages.append(("input_stem", stem))
        cin = w[0]
        for sid, (wi, di) in enumerate(zip(w[1:3], d[1:3])):
            entries: list = []
            for j in range(di):
                stride = 2 if j == 0 else 1
                mb = _mbconv(f"stages.{sid}.op_list.{j}.main", cin, wi,
                             stride, cfg.expand_ratio, act)
                entries.append(("res", mb) if stride == 1 else ("seq", mb))
                cin = wi
            stages.append((f"stage{sid + 1}", entries))
        for sid, (wi, di) in enumerate(zip(w[3:], d[3:]), start=2):
            entries = [("seq", _mbconv(f"stages.{sid}.op_list.0.main", cin,
                                       wi, 2, cfg.expand_ratio, act,
                                       fewer_norm=True))]
            cin = wi
            for j in range(di):
                entries += _evit_block(f"stages.{sid}.op_list.{j + 1}", cin,
                                       cfg.dim, cfg.expand_ratio, act)
            stages.append((f"stage{sid + 1}", entries))
        return stages

    # ---- large backbone (backbone.py:261-336)
    stem = [_conv("stages.0.op_list.0", cfg.in_channels, w[0], 3, 2,
                  norm=True, act=act)]
    for j in range(d[0]):
        stem.append(("res", _resblock(f"stages.0.op_list.{j + 1}.main",
                                      w[0], w[0], 1, act)))
    stages.append(("stage0", stem))
    cin = w[0]
    for sid, (wi, di) in enumerate(zip(w[1:4], d[1:4]), start=1):
        entries = []
        for j in range(di + 1):
            stride = 2 if j == 0 else 1
            expand = 16 if stride == 2 else 4
            fn = sid > 2
            pre = f"stages.{sid}.op_list.{j}.main"
            blk = (_fused_mbconv(pre, cin, wi, stride, expand, act, fn)
                   if sid <= 2 else
                   _mbconv(pre, cin, wi, stride, expand, act, fn))
            entries.append(("res", blk) if stride == 1 else ("seq", blk))
            cin = wi
        stages.append((f"stage{sid}", entries))
    for sid, (wi, di) in enumerate(zip(w[4:], d[4:]), start=4):
        entries = [("seq", _mbconv(f"stages.{sid}.op_list.0.main", cin, wi,
                                   2, 24, act, fewer_norm=True))]
        cin = wi
        for j in range(di):
            entries += _evit_block(f"stages.{sid}.op_list.{j + 1}", cin,
                                   cfg.dim, 6, act)
        stages.append((f"stage{sid}", entries))
    return stages


# -----------------------------------------------------------------------------
# Param specs
# -----------------------------------------------------------------------------

def _walk(entries, fn):
    for e in entries:
        if e[0] == "conv":
            fn(e)
        elif e[0] == "mla":
            fn(e)
        else:
            _walk(e[1], fn)


def _param_specs(cfg: EfficientViTConfig
                 ) -> Dict[str, Tuple[str, Tuple[int, ...]]]:
    s: Dict[str, Tuple[str, Tuple[int, ...]]] = {}

    def bn(prefix, c):
        for n in ("weight", "bias", "running_mean", "running_var"):
            s[f"{prefix}.norm.{n}"] = ("raw", (c,))

    def add(e):
        if e[0] == "conv":
            _, prefix, i, o, k, _, groups, bias, norm, _ = e
            s[f"{prefix}.conv.weight"] = ("conv", (o, i // groups, k, k))
            if bias:
                s[f"{prefix}.conv.bias"] = ("raw", (o,))
            if norm:
                bn(prefix, o)
        else:  # LiteMLA (ops.py:427-473): heads = ch // dim, scales=(5,)
            _, prefix, ch, dim = e
            heads = ch // dim
            td = heads * dim
            s[f"{prefix}.qkv.conv.weight"] = ("conv", (3 * td, ch, 1, 1))
            s[f"{prefix}.aggreg.0.0.weight"] = ("conv", (3 * td, 1, 5, 5))
            s[f"{prefix}.aggreg.0.1.weight"] = (
                "conv", (3 * td, td // heads, 1, 1))
            s[f"{prefix}.proj.conv.weight"] = ("conv", (ch, 2 * td, 1, 1))
            bn(f"{prefix}.proj", ch)

    for _, entries in _plan(cfg):
        _walk(entries, add)
    return s


def init_params(key: jax.Array, cfg: EfficientViTConfig,
                dtype=jnp.float32) -> Dict[str, jax.Array]:
    params: Dict[str, jax.Array] = {}
    for name, (kind, shape) in _param_specs(cfg).items():
        key, sub = jax.random.split(key)
        if kind == "conv":
            o, i, kh, kw = shape
            std = (2.0 / (i * kh * kw)) ** 0.5
            params[name] = jax.random.normal(sub, (kh, kw, i, o), dtype) * std
        elif name.endswith("running_var") or name.endswith("norm.weight"):
            params[name] = jnp.ones(shape, dtype)
        else:
            params[name] = jnp.zeros(shape, dtype)
    return params


def load_torch_weights(state_dict, cfg: Optional[EfficientViTConfig] = None,
                       prefix: str = "backbone.") -> Dict[str, jax.Array]:
    """Convert a reference EfficientViT torch state_dict. `prefix` matches
    the kornia wrapper nesting (model.py:60: `self.backbone = ...`); pass
    "" for a bare backbone state_dict."""
    cfg = cfg or EfficientViTConfig()
    params: Dict[str, jax.Array] = {}
    for k, (kind, shape) in _param_specs(cfg).items():
        v = state_dict[prefix + k if prefix + k in state_dict else k]
        v = np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach")
                       else v)
        assert v.shape == tuple(shape), (k, v.shape, shape)
        params[k] = jnp.asarray(v.transpose(2, 3, 1, 0)) if kind == "conv" \
            else jnp.asarray(v)
    return params


# -----------------------------------------------------------------------------
# Forward
# -----------------------------------------------------------------------------

def _act_fn(name, x):
    if name == "hswish":
        return x * jnp.clip(x + 3.0, 0.0, 6.0) / 6.0
    if name == "relu6":
        return jnp.clip(x, 0.0, 6.0)
    if name == "relu":
        return jax.nn.relu(x)
    if name == "gelu":  # reference registers GELU(approximate="tanh")
        return jax.nn.gelu(x, approximate=True)
    return x


def _conv2d(p, name, x, stride=1, padding=0, groups=1):
    w = p[name].astype(x.dtype)
    return lax.conv_general_dilated(
        x, w, (stride, stride), [(padding, padding)] * 2,
        feature_group_count=groups,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _run_conv_layer(p, e, x):
    _, prefix, _, _, k, stride, groups, bias, norm, act = e
    x = _conv2d(p, f"{prefix}.conv.weight", x, stride, k // 2, groups)
    if bias:
        x = x + p[f"{prefix}.conv.bias"].astype(x.dtype)
    if norm:
        mean = p[f"{prefix}.norm.running_mean"].astype(x.dtype)
        var = p[f"{prefix}.norm.running_var"].astype(x.dtype)
        g = p[f"{prefix}.norm.weight"].astype(x.dtype)
        b = p[f"{prefix}.norm.bias"].astype(x.dtype)
        scale = g * lax.rsqrt(var + _BN_EPS)
        x = x * scale + (b - mean * scale)
    return _act_fn(act, x)


def _run_mla(p, e, x, eps=1e-15):
    """LiteMLA relu linear attention (ops.py:475-522)."""
    _, prefix, ch, dim = e
    heads = ch // dim
    td = heads * dim
    B, H, W, _ = x.shape
    qkv = _conv2d(p, f"{prefix}.qkv.conv.weight", x)
    agg = _conv2d(p, f"{prefix}.aggreg.0.0.weight", qkv, padding=2,
                  groups=3 * td)
    agg = _conv2d(p, f"{prefix}.aggreg.0.1.weight", agg, groups=3 * heads)
    ms = jnp.concatenate([qkv, agg], -1)  # (B, H, W, 6*td)
    G = 2 * heads
    t = ms.reshape(B, H * W, G, 3 * dim).transpose(0, 2, 1, 3)
    q = jax.nn.relu(t[..., :dim])
    k = jax.nn.relu(t[..., dim:2 * dim])
    v = t[..., 2 * dim:]
    v = jnp.concatenate([v, jnp.ones(v.shape[:-1] + (1,), v.dtype)], -1)
    kv = jnp.einsum("bgnd,bgne->bgde", k, v)      # (B, G, d, d+1)
    out = jnp.einsum("bgnd,bgde->bgne", q, kv)    # (B, G, HW, d+1)
    out = out[..., :-1] / (out[..., -1:] + eps)
    out = out.transpose(0, 2, 1, 3).reshape(B, H, W, G * dim)
    proj = ("conv", f"{prefix}.proj", G * dim, ch, 1, 1, 1, False, True,
            None)
    return _run_conv_layer(p, proj, out)


def _run_entries(p, entries, x):
    for e in entries:
        if e[0] == "conv":
            x = _run_conv_layer(p, e, x)
        elif e[0] == "mla":
            x = _run_mla(p, e, x)
        elif e[0] == "res":
            h = x
            for sub in e[1]:
                h = _run_entries(p, [sub], h)
            x = x + h
        else:  # seq
            for sub in e[1]:
                x = _run_entries(p, [sub], x)
    return x


def forward(p, cfg: EfficientViTConfig, images: jax.Array
            ) -> Dict[str, jax.Array]:
    """images (B, 3, H, W) -> stage-output dict, NCHW values
    (reference backbone.py:179-194 / :395-409 and model.py:91)."""
    x = jnp.transpose(images, (0, 2, 3, 1))
    out: Dict[str, jax.Array] = {"input": images}
    for i, (_, entries) in enumerate(_plan(cfg)):
        x = _run_entries(p, entries, x)
        out[f"stage{i}"] = jnp.transpose(x, (0, 3, 1, 2))
    out["stage_final"] = out[f"stage{len(_plan(cfg)) - 1}"]
    return out


class EfficientViT:
    """Backbone wrapper mirroring the reference class API (model.py:60)."""

    def __init__(self, cfg: Optional[EfficientViTConfig] = None, params=None,
                 key: Optional[jax.Array] = None):
        self.cfg = cfg or EfficientViTConfig.from_name("b1")
        self._params = params
        self._key = key if key is not None else jax.random.PRNGKey(0)

    @staticmethod
    def from_name(name: str, params=None) -> "EfficientViT":
        return EfficientViT(EfficientViTConfig.from_name(name), params)

    @property
    def params(self):
        if self._params is None:
            self._params = init_params(self._key, self.cfg)
        return self._params

    def __call__(self, images: jax.Array) -> Dict[str, jax.Array]:
        return forward(self.params, self.cfg, images)
