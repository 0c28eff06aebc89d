"""MobileViT (https://arxiv.org/abs/2110.02178) — exact architecture,
TPU-native.

Reference behavior: kornia/models/vit_mobile.py — conv_nxn_bn/conv_1x1_bn
stems (:24-31), MV2Block inverted residuals (:180), MobileViTBlock local
conv + patch-unfolded transformer + fusion (:242, unfold/fold math
:294-308), Transformer with (B, P, N, D) token layout (:136), xxs/xs/s
presets (:341-352).

Implementation notes (TPU-first): flat param dict keyed by the reference
torch state_dict names (`load_torch_weights`; parity in
tests/test_mobilevit_parity.py). Convs run NHWC; the MobileViT
unfold/fold is reproduced with the reference's exact reshape/transpose
sequence in channel-first layout (pure data movement, fused by XLA).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

__all__ = ["MobileViT", "MobileViTConfig", "init_params",
           "load_torch_weights"]

_BN_EPS = 1e-5
_DEPTHS = (2, 4, 3)


@dataclasses.dataclass(frozen=True)
class MobileViTConfig:
    mode: str = "xxs"
    in_channels: int = 3
    patch_size: Tuple[int, int] = (2, 2)

    @property
    def preset(self):
        return {
            "xxs": (2, (64, 80, 96),
                    (16, 16, 24, 24, 48, 48, 64, 64, 80, 80, 320),
                    (2, 4, 4)),
            "xs": (4, (96, 120, 144),
                   (16, 32, 48, 48, 64, 64, 80, 80, 96, 96, 384),
                   (2, 4, 4)),
            "s": (4, (144, 192, 240),
                  (16, 32, 64, 64, 96, 96, 128, 128, 160, 160, 640),
                  (2, 4, 4)),
        }[self.mode]

    @property
    def expansion(self) -> int:
        return self.preset[0]

    @property
    def dims(self) -> Tuple[int, ...]:
        return self.preset[1]

    @property
    def channels(self) -> Tuple[int, ...]:
        return self.preset[2]

    @property
    def mlp_mults(self) -> Tuple[int, ...]:
        return self.preset[3]


# (in, out, stride) of the seven MV2 blocks (vit_mobile.py:360-366)
def _mv2_plan(ch):
    return [(ch[0], ch[1], 1), (ch[1], ch[2], 2), (ch[2], ch[3], 1),
            (ch[2], ch[3], 1), (ch[3], ch[4], 2), (ch[5], ch[6], 2),
            (ch[7], ch[8], 2)]


def _param_specs(cfg: MobileViTConfig):
    ch, dims = cfg.channels, cfg.dims
    s: Dict[str, tuple] = {}

    def convbn(prefix, idx, i, o, k):
        s[f"{prefix}.{idx}.weight"] = ("conv", (o, i, k, k))
        for n in ("weight", "bias", "running_mean", "running_var"):
            s[f"{prefix}.{idx + 1}.{n}"] = ("raw", (o,))

    def dwbn(prefix, idx, c, k=3):
        s[f"{prefix}.{idx}.weight"] = ("conv", (c, 1, k, k))
        for n in ("weight", "bias", "running_mean", "running_var"):
            s[f"{prefix}.{idx + 1}.{n}"] = ("raw", (c,))

    convbn("conv1", 0, cfg.in_channels, ch[0], 3)
    for i, (ci, co, _) in enumerate(_mv2_plan(ch)):
        pre = f"mv2.{i}.conv"
        if cfg.expansion == 1:
            dwbn(pre, 0, ci)
            convbn(pre, 3, ci, co, 1)
        else:
            hid = ci * cfg.expansion
            convbn(pre, 0, ci, hid, 1)
            dwbn(pre, 3, hid)
            convbn(pre, 6, hid, co, 1)

    for bi, (dim, depth, channel, mult) in enumerate(
            zip(dims, _DEPTHS, (ch[5], ch[7], ch[9]), cfg.mlp_mults)):
        pre = f"mvit.{bi}"
        convbn(f"{pre}.conv1", 0, channel, channel, 3)
        convbn(f"{pre}.conv2", 0, channel, dim, 1)
        inner = 32  # heads=4, dim_head=8 (vit_mobile.py:272)
        for li in range(depth):
            t = f"{pre}.transformer.layers.{li}"
            for n in ("weight", "bias"):
                s[f"{t}.0.norm.{n}"] = ("raw", (dim,))
                s[f"{t}.1.norm.{n}"] = ("raw", (dim,))
            s[f"{t}.0.fn.to_qkv.weight"] = ("lin", (3 * inner, dim))
            s[f"{t}.0.fn.to_out.0.weight"] = ("lin", (dim, inner))
            s[f"{t}.0.fn.to_out.0.bias"] = ("raw", (dim,))
            mlp = dim * mult
            s[f"{t}.1.fn.net.0.weight"] = ("lin", (mlp, dim))
            s[f"{t}.1.fn.net.0.bias"] = ("raw", (mlp,))
            s[f"{t}.1.fn.net.3.weight"] = ("lin", (dim, mlp))
            s[f"{t}.1.fn.net.3.bias"] = ("raw", (dim,))
        convbn(f"{pre}.conv3", 0, dim, channel, 1)
        convbn(f"{pre}.conv4", 0, 2 * channel, channel, 3)
    convbn("conv2", 0, ch[-2], ch[-1], 1)
    return s


def init_params(key: jax.Array, cfg: MobileViTConfig,
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
                name.endswith(".weight") and "norm" not in name) \
                or name.endswith("norm.weight"):
            params[name] = jnp.ones(shape, dtype)
        else:
            params[name] = jnp.zeros(shape, dtype)
    return params


def load_torch_weights(state_dict, cfg: Optional[MobileViTConfig] = None
                       ) -> Dict[str, jax.Array]:
    cfg = cfg or MobileViTConfig()
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


def _convbn_silu(p, prefix, idx, x, stride=1, padding=0, groups=1):
    w = p[f"{prefix}.{idx}.weight"].astype(x.dtype)
    y = lax.conv_general_dilated(
        x, w, (stride, stride), [(padding, padding)] * 2,
        feature_group_count=groups,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    b = f"{prefix}.{idx + 1}"
    mean = p[f"{b}.running_mean"].astype(x.dtype)
    var = p[f"{b}.running_var"].astype(x.dtype)
    g = p[f"{b}.weight"].astype(x.dtype)
    bb = p[f"{b}.bias"].astype(x.dtype)
    scale = g * lax.rsqrt(var + _BN_EPS)
    return y * scale + (bb - mean * scale)


def _silu(x):
    return jax.nn.silu(x)


def _mv2(p, prefix, x, ci, co, stride, expansion):
    """MV2Block (vit_mobile.py:180)."""
    h = x
    if expansion == 1:
        h = _silu(_convbn_silu(p, prefix, 0, h, stride, 1, groups=ci))
        h = _convbn_silu(p, prefix, 3, h)
    else:
        hid = ci * expansion
        h = _silu(_convbn_silu(p, prefix, 0, h))
        h = _silu(_convbn_silu(p, prefix, 3, h, stride, 1, groups=hid))
        h = _convbn_silu(p, prefix, 6, h)
    if stride == 1 and ci == co:
        h = x + h
    return h


def _ln(p, prefix, x, eps=1e-5):
    mu = jnp.mean(x, -1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), -1, keepdims=True)
    return (x - mu) * lax.rsqrt(var + eps) \
        * p[f"{prefix}.weight"].astype(x.dtype) \
        + p[f"{prefix}.bias"].astype(x.dtype)


def _mvit_block(p, prefix, x, dim, depth, channel, ph, pw):
    """MobileViTBlock (vit_mobile.py:242): local conv, patch-unfold
    transformer over the (B, P, N, D) layout, fold, fuse."""
    y = x
    h = _silu(_convbn_silu(p, f"{prefix}.conv1", 0, x, padding=1))
    h = _silu(_convbn_silu(p, f"{prefix}.conv2", 0, h))
    B, H, W, d = h.shape
    nh, nw = H // ph, W // pw
    # exact reference unfold (:299-301), done channel-first
    t = jnp.transpose(h, (0, 3, 1, 2))           # (B, d, H, W)
    t = t.reshape(B * d * nh, ph, nw, pw).transpose(0, 2, 1, 3)
    t = t.reshape(B, d, nh * nw, ph * pw).transpose(0, 3, 2, 1)
    # transformer over (B, P, N, D), heads=4 dim_head=8
    heads, hd = 4, 8
    inner = heads * hd
    for li in range(depth):
        tp = f"{prefix}.transformer.layers.{li}"
        z = _ln(p, f"{tp}.0.norm", t)
        qkv = z @ p[f"{tp}.0.fn.to_qkv.weight"].astype(z.dtype)
        q, k, v = jnp.split(qkv, 3, -1)
        P, N = q.shape[1], q.shape[2]

        def heads_split(a):
            return a.reshape(B, P, N, heads, hd).transpose(0, 1, 3, 2, 4)
        q, k, v = heads_split(q), heads_split(k), heads_split(v)
        attn = jax.nn.softmax(
            q @ k.transpose(0, 1, 2, 4, 3) * (hd ** -0.5), -1)
        o = (attn @ v).transpose(0, 1, 3, 2, 4).reshape(B, P, N, inner)
        o = o @ p[f"{tp}.0.fn.to_out.0.weight"].astype(o.dtype) \
            + p[f"{tp}.0.fn.to_out.0.bias"].astype(o.dtype)
        t = t + o
        z = _ln(p, f"{tp}.1.norm", t)
        z = _silu(z @ p[f"{tp}.1.fn.net.0.weight"].astype(z.dtype)
                  + p[f"{tp}.1.fn.net.0.bias"].astype(z.dtype))
        z = z @ p[f"{tp}.1.fn.net.3.weight"].astype(z.dtype) \
            + p[f"{tp}.1.fn.net.3.bias"].astype(z.dtype)
        t = t + z
    # exact reference fold (:306-308)
    t = t.transpose(0, 3, 2, 1).reshape(B * d * nh, nw, ph, pw)
    t = t.transpose(0, 2, 1, 3).reshape(B, d, H, W)
    h = jnp.transpose(t, (0, 2, 3, 1))
    h = _silu(_convbn_silu(p, f"{prefix}.conv3", 0, h))
    h = jnp.concatenate([h, y], -1)
    return _silu(_convbn_silu(p, f"{prefix}.conv4", 0, h, padding=1))


def forward(p, cfg: MobileViTConfig, images: jax.Array) -> jax.Array:
    """images (B, 3, H, W) -> features (B, C_last, H/32, W/32)
    (reference MobileViT.forward:381)."""
    ch, dims = cfg.channels, cfg.dims
    ph, pw = cfg.patch_size
    x = jnp.transpose(images, (0, 2, 3, 1))
    x = _silu(_convbn_silu(p, "conv1", 0, x, stride=2, padding=1))
    plan = _mv2_plan(ch)
    for i in (0, 1, 2, 3, 4):
        ci, co, st = plan[i]
        x = _mv2(p, f"mv2.{i}.conv", x, ci, co, st, cfg.expansion)
    x = _mvit_block(p, "mvit.0", x, dims[0], _DEPTHS[0], ch[5], ph, pw)
    ci, co, st = plan[5]
    x = _mv2(p, "mv2.5.conv", x, ci, co, st, cfg.expansion)
    x = _mvit_block(p, "mvit.1", x, dims[1], _DEPTHS[1], ch[7], ph, pw)
    ci, co, st = plan[6]
    x = _mv2(p, "mv2.6.conv", x, ci, co, st, cfg.expansion)
    x = _mvit_block(p, "mvit.2", x, dims[2], _DEPTHS[2], ch[9], ph, pw)
    x = _silu(_convbn_silu(p, "conv2", 0, x))
    return jnp.transpose(x, (0, 3, 1, 2))


class MobileViT:
    """Thin stateful wrapper mirroring the reference class API
    (vit_mobile.py:317)."""

    def __init__(self, mode: str = "xxs",
                 cfg: Optional[MobileViTConfig] = None, params=None,
                 key: Optional[jax.Array] = None):
        self.cfg = cfg or MobileViTConfig(mode=mode)
        self._params = params
        self._key = key if key is not None else jax.random.PRNGKey(0)

    @property
    def params(self):
        if self._params is None:
            self._params = init_params(self._key, self.cfg)
        return self._params

    def __call__(self, images: jax.Array) -> jax.Array:
        return forward(self.params, self.cfg, images)
