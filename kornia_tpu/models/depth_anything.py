"""DepthAnything monocular relative depth (DINOv2 ViT + DPT head), TPU-native.

Reference behavior: kornia/models/depth_estimation/depth_anything.py — the
reference ships only an ONNX-runtime wrapper (DepthAnythingONNXBuilder:27)
around externally exported weights. Here the architecture itself is
implemented natively and CHECKPOINT-PORTABLE: the backbone is the DINOv2
ViT used by the official DepthAnything release (cls token, pre-norm blocks
with LayerScale — folded exactly into the out-projections at conversion
time), and the decoder reproduces the official DPT head topology
(projects → resize_layers → scratch.layerN_rn → refinenet4..1 →
output_conv1/2, Ranftl et al. 2021; Yang et al. 2024). `load_torch_weights`
maps the official `pretrained.* / depth_head.*` state dict onto this tree
(validated against a synthetic torch mirror in tests/test_weight_port.py).

TPU-first design:
- ViT patchify is one strided conv (MXU matmul); attention/MLP are plain
  Dense stacks.
- The stride-expanding "deconv" resize layers are einsum block expansions
  (a matmul — exact torch ConvTranspose semantics with stride == kernel,
  no lax.conv_transpose flip ambiguity).
- All bilinear up/down paths are separable one-hot interpolation MATRICES
  contracted on the MXU (`_interp_ac`), torch align_corners=True exact.
- Static shapes: input H, W must be multiples of `patch_size`.
- bf16-friendly via `dtype`.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..core.check import check
from .common import nchw_to_nhwc

__all__ = ["DepthAnythingConfig", "DPTHead", "DepthAnythingNet",
           "DepthAnything", "load_torch_weights"]


@dataclasses.dataclass(frozen=True)
class DepthAnythingConfig:
    patch_size: int = 14
    hidden_size: int = 384            # ViT-S
    num_layers: int = 12
    num_heads: int = 6
    mlp_ratio: float = 4.0
    out_indices: Tuple[int, int, int, int] = (2, 5, 8, 11)
    # per-tap reassemble widths + fusion width (official ViT-S head:
    # out_channels=[48, 96, 192, 384], features=64)
    reassemble_channels: Tuple[int, int, int, int] = (48, 96, 192, 384)
    fusion_channels: int = 64

    @classmethod
    def vits(cls) -> "DepthAnythingConfig":
        return cls()

    @classmethod
    def vitb(cls) -> "DepthAnythingConfig":
        return cls(hidden_size=768, num_heads=12,
                   reassemble_channels=(96, 192, 384, 768),
                   fusion_channels=128)

    @classmethod
    def vitl(cls) -> "DepthAnythingConfig":
        return cls(hidden_size=1024, num_layers=24, num_heads=16,
                   out_indices=(4, 11, 17, 23),
                   reassemble_channels=(256, 512, 1024, 1024),
                   fusion_channels=256)

    @classmethod
    def tiny(cls) -> "DepthAnythingConfig":
        return cls(patch_size=8, hidden_size=64, num_layers=4, num_heads=4,
                   out_indices=(0, 1, 2, 3),
                   reassemble_channels=(16, 24, 32, 48), fusion_channels=16)


def _interp_matrix(n_out: int, n_in: int, dtype=jnp.float32) -> jax.Array:
    """(n_out, n_in) torch bilinear align_corners=True interpolation
    weights — applied as a matmul so resampling runs on the MXU."""
    if n_in == 1:
        return jnp.ones((n_out, 1), dtype)
    if n_out == 1:
        # align_corners=True maps the single output to input position 0
        return jax.nn.one_hot(jnp.zeros((1,), jnp.int32), n_in, dtype=dtype)
    pos = jnp.linspace(0.0, n_in - 1.0, n_out)
    lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, n_in - 2)
    frac = (pos - lo).astype(dtype)
    return (jax.nn.one_hot(lo, n_in, dtype=dtype) * (1 - frac)[:, None]
            + jax.nn.one_hot(lo + 1, n_in, dtype=dtype) * frac[:, None])


def _interp_ac(x: jax.Array, hw: Tuple[int, int]) -> jax.Array:
    """NHWC bilinear resize, torch align_corners=True exact."""
    h, w = hw
    if x.shape[1:3] == (h, w):
        return x
    my = _interp_matrix(h, x.shape[1], x.dtype)
    mx = _interp_matrix(w, x.shape[2], x.dtype)
    x = jnp.einsum("oh,bhwc->bowc", my, x)
    return jnp.einsum("pw,bhwc->bhpc", mx, x)


class _Attention(nn.Module):
    """timm/DINOv2-layout attention: fused qkv + out proj (LayerScale is
    folded into `proj` by the converter)."""

    heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, N, D = x.shape
        dh = D // self.heads
        qkv = nn.Dense(3 * D, dtype=self.dtype, name="qkv")(x)
        q, k, v = jnp.split(qkv.reshape(B, N, 3, self.heads, dh), 3, axis=2)
        q, k, v = (t[:, :, 0].transpose(0, 2, 1, 3) for t in (q, k, v))
        a = jax.nn.softmax(
            jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(dh).astype(
                self.dtype), axis=-1)
        o = jnp.einsum("bhqk,bhkd->bhqd", a, v)
        o = o.transpose(0, 2, 1, 3).reshape(B, N, D)
        return nn.Dense(D, dtype=self.dtype, name="proj")(o)


class _ViTBlock(nn.Module):
    heads: int
    mlp_ratio: float
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        x = x + _Attention(self.heads, self.dtype, name="attn")(h)
        h = nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
        h = nn.Dense(int(x.shape[-1] * self.mlp_ratio), dtype=self.dtype,
                     name="fc1")(h)
        h = nn.gelu(h, approximate=False)  # DINOv2 uses exact GELU
        return x + nn.Dense(x.shape[-1], dtype=self.dtype, name="fc2")(h)


class _ResidualConvUnit(nn.Module):
    """relu → conv1 → relu → conv2 → +x (official ResidualConvUnit)."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.features, (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name="conv1")(nn.relu(x))
        h = nn.Conv(self.features, (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name="conv2")(nn.relu(h))
        return x + h


class _FeatureFusionBlock(nn.Module):
    """x (+ rcu1(skip)) → rcu2 → bilinear(size, ac=True) → 1×1 out_conv
    (official FeatureFusionBlock_custom, align_corners=True)."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, skip=None, size: Optional[Tuple[int, int]] = None):
        if skip is not None:
            x = x + _ResidualConvUnit(self.features, self.dtype,
                                      name="rcu1")(skip)
        x = _ResidualConvUnit(self.features, self.dtype, name="rcu2")(x)
        if size is None:
            size = (2 * x.shape[1], 2 * x.shape[2])
        x = _interp_ac(x, size)
        return nn.Conv(self.features, (1, 1), dtype=self.dtype,
                       name="out_conv")(x)


class _BlockDeconv(nn.Module):
    """ConvTranspose with stride == kernel, stored in the TORCH layout
    (C_in, C_out, s, s) and applied as one einsum block expansion —
    bitwise the official resize_layers semantics, MXU-shaped."""

    features: int
    stride: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        s = self.stride
        w = self.param("kernel", nn.initializers.lecun_normal(),
                       (C, self.features, s, s))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        y = jnp.einsum("bhwi,iopq->bhpwqo", x, w.astype(self.dtype))
        return y.reshape(B, H * s, W * s, self.features) + b.astype(
            self.dtype)


class DPTHead(nn.Module):
    """Official DepthAnything DPT decoder: project 4 ViT taps, resize to
    strides {×4, ×2, ×1, ×½} of the patch grid, 3×3 scratch convs, fuse
    coarse-to-fine with size-aware FeatureFusionBlocks, then the two-stage
    output head (Ranftl et al. 2021 §3; Yang et al. 2024)."""

    cfg: DepthAnythingConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, taps: Sequence[jax.Array], grid_hw: Tuple[int, int]):
        c = self.cfg
        h, w = grid_hw
        feats = []
        for i, t in enumerate(taps):
            B, N, D = t.shape
            f = nn.Dense(c.reassemble_channels[i], dtype=self.dtype,
                         name=f"proj{i}")(t).reshape(
                             B, h, w, c.reassemble_channels[i])
            if i == 0:
                f = _BlockDeconv(c.reassemble_channels[i], 4, self.dtype,
                                 name="resize0")(f)
            elif i == 1:
                f = _BlockDeconv(c.reassemble_channels[i], 2, self.dtype,
                                 name="resize1")(f)
            elif i == 3:
                f = nn.Conv(c.reassemble_channels[i], (3, 3), strides=2,
                            padding=((1, 1), (1, 1)), dtype=self.dtype,
                            name="resize3")(f)
            f = nn.Conv(c.fusion_channels, (3, 3), padding=((1, 1), (1, 1)),
                        use_bias=False, dtype=self.dtype,
                        name=f"layer{i + 1}_rn")(f)
            feats.append(f)

        l1, l2, l3, l4 = feats
        x = _FeatureFusionBlock(c.fusion_channels, self.dtype,
                                name="refinenet4")(l4, size=l3.shape[1:3])
        x = _FeatureFusionBlock(c.fusion_channels, self.dtype,
                                name="refinenet3")(x, l3, size=l2.shape[1:3])
        x = _FeatureFusionBlock(c.fusion_channels, self.dtype,
                                name="refinenet2")(x, l2, size=l1.shape[1:3])
        x = _FeatureFusionBlock(c.fusion_channels, self.dtype,
                                name="refinenet1")(x, l1)

        x = nn.Conv(c.fusion_channels // 2, (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name="output_conv1")(x)
        x = _interp_ac(x, (h * c.patch_size, w * c.patch_size))
        x = nn.relu(nn.Conv(32, (3, 3), padding=((1, 1), (1, 1)),
                            dtype=self.dtype, name="output_conv2_0")(x))
        x = nn.Conv(1, (1, 1), dtype=self.dtype, name="output_conv2_2")(x)
        return nn.relu(x[..., 0])  # non-negative relative depth


class DepthAnythingNet(nn.Module):
    """DINOv2 ViT backbone (cls token, shared final norm on every tap) +
    DPT head. LayerScale from the checkpoint is folded into proj/fc2 by
    `load_torch_weights`, so block residuals here are plain adds."""

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
        if pos.shape[0] != h * w:
            # checkpoint trained at another grid: bicubic-resize the
            # positional table (DINOv2 interpolate_pos_encoding)
            g = int(round(float(pos.shape[0]) ** 0.5))
            pos = jax.image.resize(
                pos.reshape(g, g, c.hidden_size).astype(jnp.float32),
                (h, w, c.hidden_size), "bicubic").reshape(
                    h * w, c.hidden_size).astype(pos.dtype)
        x = x + pos.astype(self.dtype)
        cls = self.param("cls_token", nn.initializers.normal(0.02),
                         (1, 1, c.hidden_size))
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(self.dtype),
                              (B, 1, c.hidden_size)), x], axis=1)
        taps = []
        for i in range(c.num_layers):
            x = _ViTBlock(c.num_heads, c.mlp_ratio, self.dtype,
                          name=f"block{i}")(x)
            if i in c.out_indices:
                taps.append(x)
        # DINOv2 get_intermediate_layers(norm=True): ONE shared final norm
        # applied to every tap; cls token dropped for the dense head
        norm = nn.LayerNorm(dtype=self.dtype, name="norm")
        taps = [norm(t)[:, 1:] for t in taps]
        depth = DPTHead(c, self.dtype, name="dpt")(taps, (h, w))
        return depth  # (B, H, W) — head already lifts to input size


class DepthAnything:
    """Relative monocular depth: (B, 3, H, W) in [0, 1] -> (B, 1, H, W).

    H, W must be multiples of `cfg.patch_size`. Random init; real
    checkpoints port via `load_torch_weights` (manifest entry
    "depth_anything", official `pretrained.* / depth_head.*` layout).
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


# -- torch checkpoint port ----------------------------------------------------

def _t(a) -> jnp.ndarray:
    import numpy as np

    return jnp.asarray(np.asarray(a), jnp.float32)


def load_torch_weights(state_dict: Dict[str, Any],
                       cfg: Optional[DepthAnythingConfig] = None) -> dict:
    """Map the official DepthAnything state dict (`pretrained.*` DINOv2 +
    `depth_head.*` DPT, e.g. depth_anything_vits14.pth) onto
    `DepthAnythingNet` params.

    Exact-fold notes:
      * LayerScale gammas (`ls1/ls2.gamma`) multiply the residual branch
        output per-feature — folded into `attn.proj` / `mlp.fc2`
        weights+biases, bit-exact.
      * `cls_token` absorbs its positional slot (`pos_embed[:, 0]`); the
        patch positional table keeps the rest.
    """
    import numpy as np

    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    if cfg is None:
        depth = len({k.split(".")[2] for k in sd
                     if k.startswith("pretrained.blocks.")})
        dim = sd["pretrained.cls_token"].shape[-1]
        by_dim = {384: DepthAnythingConfig.vits,
                  768: DepthAnythingConfig.vitb,
                  1024: DepthAnythingConfig.vitl}
        cfg = by_dim[dim]() if dim in by_dim else DepthAnythingConfig(
            hidden_size=dim, num_layers=depth)
        if cfg.num_layers != depth:
            cfg = dataclasses.replace(cfg, num_layers=depth)

    p: dict = {}
    pos = sd["pretrained.pos_embed"][0]                      # (1+N, D)
    p["cls_token"] = _t(sd["pretrained.cls_token"]
                        + pos[:1][None])                     # fold cls pos
    p["pos_embed"] = _t(pos[1:])
    p["patch_embed"] = {
        "kernel": _t(sd["pretrained.patch_embed.proj.weight"]
                     .transpose(2, 3, 1, 0)),
        "bias": _t(sd["pretrained.patch_embed.proj.bias"])}
    p["norm"] = {"scale": _t(sd["pretrained.norm.weight"]),
                 "bias": _t(sd["pretrained.norm.bias"])}
    for i in range(cfg.num_layers):
        b = f"pretrained.blocks.{i}"
        ls1 = sd.get(f"{b}.ls1.gamma")
        ls2 = sd.get(f"{b}.ls2.gamma")
        proj_w = sd[f"{b}.attn.proj.weight"]                 # (D, D)
        proj_b = sd[f"{b}.attn.proj.bias"]
        if ls1 is not None:
            proj_w = ls1[:, None] * proj_w
            proj_b = ls1 * proj_b
        fc2_w = sd[f"{b}.mlp.fc2.weight"]
        fc2_b = sd[f"{b}.mlp.fc2.bias"]
        if ls2 is not None:
            fc2_w = ls2[:, None] * fc2_w
            fc2_b = ls2 * fc2_b
        p[f"block{i}"] = {
            "norm1": {"scale": _t(sd[f"{b}.norm1.weight"]),
                      "bias": _t(sd[f"{b}.norm1.bias"])},
            "norm2": {"scale": _t(sd[f"{b}.norm2.weight"]),
                      "bias": _t(sd[f"{b}.norm2.bias"])},
            "attn": {
                "qkv": {"kernel": _t(sd[f"{b}.attn.qkv.weight"].T),
                        "bias": _t(sd[f"{b}.attn.qkv.bias"])},
                "proj": {"kernel": _t(proj_w.T), "bias": _t(proj_b)}},
            "fc1": {"kernel": _t(sd[f"{b}.mlp.fc1.weight"].T),
                    "bias": _t(sd[f"{b}.mlp.fc1.bias"])},
            "fc2": {"kernel": _t(fc2_w.T), "bias": _t(fc2_b)},
        }

    def conv(prefix, bias=True):
        out = {"kernel": _t(sd[f"{prefix}.weight"].transpose(2, 3, 1, 0))}
        if bias:
            out["bias"] = _t(sd[f"{prefix}.bias"])
        return out

    def rcu(prefix):
        return {"conv1": conv(f"{prefix}.conv1"),
                "conv2": conv(f"{prefix}.conv2")}

    dh = "depth_head"
    d: dict = {}
    for i in range(4):
        w = sd[f"{dh}.projects.{i}.weight"]                  # (C, D, 1, 1)
        d[f"proj{i}"] = {"kernel": _t(w[:, :, 0, 0].T),
                         "bias": _t(sd[f"{dh}.projects.{i}.bias"])}
        d[f"layer{i + 1}_rn"] = conv(f"{dh}.scratch.layer{i + 1}_rn",
                                     bias=False)
    # resize layers: 0/1 are torch ConvTranspose2d (C_in, C_out, s, s) —
    # kept in torch layout for the einsum block expansion; 3 is a conv
    d["resize0"] = {"kernel": _t(sd[f"{dh}.resize_layers.0.weight"]),
                    "bias": _t(sd[f"{dh}.resize_layers.0.bias"])}
    d["resize1"] = {"kernel": _t(sd[f"{dh}.resize_layers.1.weight"]),
                    "bias": _t(sd[f"{dh}.resize_layers.1.bias"])}
    d["resize3"] = conv(f"{dh}.resize_layers.3")
    for n in range(1, 5):
        r = f"{dh}.scratch.refinenet{n}"
        blk = {"rcu2": rcu(f"{r}.resConfUnit2"),
               "out_conv": conv(f"{r}.out_conv")}
        if n != 4:  # refinenet4 has no skip input
            blk["rcu1"] = rcu(f"{r}.resConfUnit1")
        d[f"refinenet{n}"] = blk
    d["output_conv1"] = conv(f"{dh}.scratch.output_conv1")
    d["output_conv2_0"] = conv(f"{dh}.scratch.output_conv2.0")
    d["output_conv2_2"] = conv(f"{dh}.scratch.output_conv2.2")
    p["dpt"] = d
    return {"params": p}
