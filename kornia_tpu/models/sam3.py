"""SAM-3 — exact architecture, TPU-native.

Reference behavior: kornia/models/sam3/architecture/ —
- image_encoder.py:116 ImageEncoderHiera (patch conv + LayerNorm,
  learned positions, to_qkv(bias=False)/dim_head-64 attention blocks
  common.py:63, final norm)
- prompt_encoder.py:96 PromptEncoder (sinusoidal PositionalEncoding:32
  with the reference's truncate-to-x-encoding quirk, per-label embedding
  table, GroupNorm mask downscaling, no_mask embed broadcast at S/4)
- mask_decoder.py:89 MaskDecoder (CrossAttentionTransformer:34 with
  torch nn.MultiheadAttention cross-attn, ConvTranspose upscaling,
  mean-pooled IoU head). The reference's Phase-2 stubs (boxes -> zeros,
  masks output = upscaled embeddings) are reproduced faithfully.

Flat param dict keyed by the reference torch state_dict names; parity in
tests/test_sam3_parity.py.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

__all__ = ["Sam3", "Sam3Config", "ImageEncoderHiera", "PromptEncoder3",
           "MaskDecoder3", "init_params", "load_torch_weights"]


@dataclasses.dataclass(frozen=True)
class Sam3Config:
    img_size: int = 1024
    patch_size: int = 16
    in_channels: int = 3
    encoder_embed_dim: int = 768
    encoder_depth: int = 12
    encoder_num_heads: int = 12
    mlp_ratio: float = 4.0
    encoder_dim_head: int = 64   # common.py:63 Attention default
    prompt_embed_dim: int = 256
    mask_in_chans: int = 16
    num_multimask_outputs: int = 3
    decoder_num_heads: int = 8   # CrossAttentionTransformer default
    decoder_dim_head: int = 64
    iou_head_hidden_dim: int = 256


def _attn_specs(s, prefix, dim, heads, dim_head):
    """common.py:63 Attention: fused to_qkv (no bias) + to_out.0."""
    inner = heads * dim_head
    s[f"{prefix}.to_qkv.weight"] = ("lin", (3 * inner, dim))
    if not (heads == 1 and dim_head == dim):
        s[f"{prefix}.to_out.0.weight"] = ("lin", (dim, inner))
        s[f"{prefix}.to_out.0.bias"] = ("raw", (dim,))


def _param_specs(cfg: Sam3Config):
    D, P = cfg.encoder_embed_dim, cfg.prompt_embed_dim
    s: Dict[str, tuple] = {}
    # ---- image encoder
    e = "image_encoder"
    s[f"{e}.patch_embed.proj.weight"] = (
        "conv", (D, cfg.in_channels, cfg.patch_size, cfg.patch_size))
    s[f"{e}.patch_embed.proj.bias"] = ("raw", (D,))
    s[f"{e}.patch_embed.norm.weight"] = ("raw", (D,))
    s[f"{e}.patch_embed.norm.bias"] = ("raw", (D,))
    n = (cfg.img_size // cfg.patch_size) ** 2
    s[f"{e}.pos_embed"] = ("raw", (1, n, D))
    mlp = int(D * cfg.mlp_ratio)
    for i in range(cfg.encoder_depth):
        b = f"{e}.blocks.{i}"
        for nn_ in ("norm1", "norm2"):
            s[f"{b}.{nn_}.weight"] = ("raw", (D,))
            s[f"{b}.{nn_}.bias"] = ("raw", (D,))
        _attn_specs(s, f"{b}.attn", D, cfg.encoder_num_heads,
                    cfg.encoder_dim_head)
        s[f"{b}.mlp.lin1.weight"] = ("lin", (mlp, D))
        s[f"{b}.mlp.lin1.bias"] = ("raw", (mlp,))
        s[f"{b}.mlp.lin2.weight"] = ("lin", (D, mlp))
        s[f"{b}.mlp.lin2.bias"] = ("raw", (D,))
    s[f"{e}.norm.weight"] = ("raw", (D,))
    s[f"{e}.norm.bias"] = ("raw", (D,))
    # ---- prompt encoder
    pe = "prompt_encoder"
    for i in range(4):
        s[f"{pe}.point_embeddings.{i}.weight"] = ("raw", (1, P))
    m = cfg.mask_in_chans
    s[f"{pe}.mask_downscaling.0.weight"] = ("conv", (m // 4, 1, 2, 2))
    s[f"{pe}.mask_downscaling.0.bias"] = ("raw", (m // 4,))
    s[f"{pe}.mask_downscaling.1.weight"] = ("raw", (m // 4,))
    s[f"{pe}.mask_downscaling.1.bias"] = ("raw", (m // 4,))
    s[f"{pe}.mask_downscaling.2.weight"] = ("conv", (m, m // 4, 2, 2))
    s[f"{pe}.mask_downscaling.2.bias"] = ("raw", (m,))
    s[f"{pe}.mask_downscaling.3.weight"] = ("raw", (m,))
    s[f"{pe}.mask_downscaling.3.bias"] = ("raw", (m,))
    s[f"{pe}.no_mask_embed.weight"] = ("raw", (1, P))
    # ---- mask decoder
    md = "mask_decoder"
    t = f"{md}.transformer"
    for nn_ in ("norm1", "norm2", "norm3"):
        s[f"{t}.{nn_}.weight"] = ("raw", (P,))
        s[f"{t}.{nn_}.bias"] = ("raw", (P,))
    s[f"{t}.cross_attn.in_proj_weight"] = ("lin", (3 * P, P))
    s[f"{t}.cross_attn.in_proj_bias"] = ("raw", (3 * P,))
    s[f"{t}.cross_attn.out_proj.weight"] = ("lin", (P, P))
    s[f"{t}.cross_attn.out_proj.bias"] = ("raw", (P,))
    _attn_specs(s, f"{t}.self_attn", P, cfg.decoder_num_heads,
                cfg.decoder_dim_head)
    s[f"{t}.mlp.lin1.weight"] = ("lin", (4 * P, P))
    s[f"{t}.mlp.lin1.bias"] = ("raw", (4 * P,))
    s[f"{t}.mlp.lin2.weight"] = ("lin", (P, 4 * P))
    s[f"{t}.mlp.lin2.bias"] = ("raw", (P,))
    s[f"{md}.output_upscaling.0.weight"] = ("convt", (P, P // 4, 2, 2))
    s[f"{md}.output_upscaling.0.bias"] = ("raw", (P // 4,))
    s[f"{md}.output_upscaling.1.weight"] = ("raw", (P // 4,))
    s[f"{md}.output_upscaling.1.bias"] = ("raw", (P // 4,))
    s[f"{md}.output_upscaling.2.weight"] = ("convt", (P // 4, P // 8, 2, 2))
    s[f"{md}.output_upscaling.2.bias"] = ("raw", (P // 8,))
    dims = [P, cfg.iou_head_hidden_dim, cfg.iou_head_hidden_dim,
            cfg.num_multimask_outputs]
    for j, idx in enumerate((0, 2, 4)):
        s[f"{md}.iou_prediction_head.{idx}.weight"] = (
            "lin", (dims[j + 1], dims[j]))
        s[f"{md}.iou_prediction_head.{idx}.bias"] = ("raw", (dims[j + 1],))
    return s


def init_params(key: jax.Array, cfg: Sam3Config,
                dtype=jnp.float32) -> Dict[str, jax.Array]:
    params: Dict[str, jax.Array] = {}
    for name, (kind, shape) in _param_specs(cfg).items():
        key, sub = jax.random.split(key)
        if kind == "conv":
            o, i, kh, kw = shape
            std = (2.0 / (i * kh * kw)) ** 0.5
            params[name] = jax.random.normal(sub, (kh, kw, i, o), dtype) * std
        elif kind == "convt":
            params[name] = jax.random.normal(sub, shape, dtype) * 0.02
        elif kind == "lin":
            o, i = shape
            bound = 1.0 / math.sqrt(i)
            params[name] = jax.random.uniform(sub, (i, o), dtype, -bound,
                                              bound)
        elif "pos_embed" in name:
            params[name] = jax.random.normal(sub, shape, dtype) * 0.02
        elif "embed" in name and name.endswith(".weight") and "norm" not in \
                name and "downscaling" not in name:
            params[name] = jax.random.normal(sub, shape, dtype)
        elif name.endswith(".weight") and "downscaling" not in name:
            params[name] = jnp.ones(shape, dtype)
        elif name.endswith(".weight"):  # GroupNorm weights
            params[name] = jnp.ones(shape, dtype)
        else:
            params[name] = jnp.zeros(shape, dtype)
    return params


def load_torch_weights(state_dict, cfg: Optional[Sam3Config] = None,
                       prefixes: Tuple[str, str, str] = (
                           "image_encoder.", "prompt_encoder.",
                           "mask_decoder.")) -> Dict[str, jax.Array]:
    """Convert torch state_dicts of the three reference modules. Pass the
    merged dict of `{prefix + k: v}` for each module (the reference ships
    them as separate nn.Modules)."""
    cfg = cfg or Sam3Config()
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


# -----------------------------------------------------------------------------
# Functional primitives
# -----------------------------------------------------------------------------

def _ln(p, prefix, x, eps=1e-5):
    mu = jnp.mean(x, -1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), -1, keepdims=True)
    return (x - mu) * lax.rsqrt(var + eps) \
        * p[f"{prefix}.weight"].astype(x.dtype) \
        + p[f"{prefix}.bias"].astype(x.dtype)


def _lin(p, prefix, x):
    return x @ p[f"{prefix}.weight"].astype(x.dtype) \
        + p[f"{prefix}.bias"].astype(x.dtype)


def _mha(q, k, v, heads):
    B, Nq, D = q.shape
    Nk = k.shape[1]
    hd = D // heads
    q = q.reshape(B, Nq, heads, hd).transpose(0, 2, 1, 3)
    k = k.reshape(B, Nk, heads, hd).transpose(0, 2, 1, 3)
    v = v.reshape(B, Nk, heads, hd).transpose(0, 2, 1, 3)
    a = jax.nn.softmax(q @ k.transpose(0, 1, 3, 2) / math.sqrt(hd), -1)
    return (a @ v).transpose(0, 2, 1, 3).reshape(B, Nq, D)


def _self_attn(p, prefix, x, heads, dim_head):
    """common.py:63 Attention (fused no-bias qkv, dim_head heads)."""
    qkv = x @ p[f"{prefix}.to_qkv.weight"].astype(x.dtype)
    q, k, v = jnp.split(qkv, 3, -1)
    o = _mha(q, k, v, heads)
    if f"{prefix}.to_out.0.weight" in p:
        o = _lin(p, f"{prefix}.to_out.0", o)
    return o


def _group_norm1(p, prefix, x, eps=1e-5):
    """torch GroupNorm(1, C) on NHWC maps: normalize over (H, W, C)."""
    mu = jnp.mean(x, (1, 2, 3), keepdims=True)
    var = jnp.mean(jnp.square(x - mu), (1, 2, 3), keepdims=True)
    xn = (x - mu) * lax.rsqrt(var + eps)
    return xn * p[f"{prefix}.weight"].astype(x.dtype) \
        + p[f"{prefix}.bias"].astype(x.dtype)


def _convt2x2(p, prefix, x):
    w = p[f"{prefix}.weight"].astype(x.dtype)  # (I, O, 2, 2)
    b = p[f"{prefix}.bias"].astype(x.dtype)
    B, H, W, _ = x.shape
    y = jnp.einsum("bhwc,cokl->bhkwlo", x, w)
    return y.reshape(B, H * 2, W * 2, w.shape[1]) + b


def _bilinear_resize(x, hw):
    """NHWC bilinear, align_corners=False, no antialias — exact
    F.interpolate semantics via the library's torch-parity resize."""
    from ..ops.warp import resize
    y = resize(jnp.transpose(x, (0, 3, 1, 2)), tuple(hw), "bilinear",
               align_corners=False)
    return jnp.transpose(y, (0, 2, 3, 1)).astype(x.dtype)


# -----------------------------------------------------------------------------
# Modules
# -----------------------------------------------------------------------------

def encode_image(p, cfg: Sam3Config, images: jax.Array) -> jax.Array:
    """(B, 3, S, S) -> tokens (B, N, D) (image_encoder.py:167)."""
    x = jnp.transpose(images, (0, 2, 3, 1))
    w = p["image_encoder.patch_embed.proj.weight"].astype(x.dtype)
    x = lax.conv_general_dilated(
        x, w, (cfg.patch_size, cfg.patch_size), [(0, 0)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    x = x + p["image_encoder.patch_embed.proj.bias"].astype(x.dtype)
    B = x.shape[0]
    x = x.reshape(B, -1, cfg.encoder_embed_dim)
    x = _ln(p, "image_encoder.patch_embed.norm", x)
    x = x + p["image_encoder.pos_embed"].astype(x.dtype)
    for i in range(cfg.encoder_depth):
        b = f"image_encoder.blocks.{i}"
        h = _ln(p, f"{b}.norm1", x)
        x = x + _self_attn(p, f"{b}.attn", h, cfg.encoder_num_heads,
                           cfg.encoder_dim_head)
        h = _ln(p, f"{b}.norm2", x)
        h = _lin(p, f"{b}.mlp.lin2",
                 jax.nn.gelu(_lin(p, f"{b}.mlp.lin1", h), approximate=False))
        x = x + h
    return _ln(p, "image_encoder.norm", x)


def positional_encoding(coords: jax.Array, embed_dim: int) -> jax.Array:
    """prompt_encoder.py:51-93 — including the truncation-to-x-encoding
    behavior of the reference."""
    half = embed_dim // 2
    freqs = 2.0 ** (jnp.arange(half, dtype=jnp.float32) / half) * jnp.pi
    args = coords[..., None] * freqs  # (B, N, 2, half)
    enc = jnp.stack([jnp.sin(args), jnp.cos(args)], -1)
    enc = enc.reshape(coords.shape[:-1] + (2, embed_dim))
    out = jnp.concatenate([enc[..., 0, :], enc[..., 1, :]], -1)
    return out[..., :embed_dim]


def encode_points(p, cfg: Sam3Config, coords: jax.Array, labels: jax.Array
                  ) -> jax.Array:
    """coords (B, N, 2) normalized [0,1]; labels (B, N) in {0, 1}
    (prompt_encoder.py:136-177)."""
    pe = positional_encoding(coords.astype(jnp.float32),
                             cfg.prompt_embed_dim)
    table = jnp.concatenate(
        [p[f"prompt_encoder.point_embeddings.{i}.weight"]
         for i in range(4)], 0)
    # reference: point_embeddings[min(label, 1)] — a Python -1 index wraps
    # to the LAST embedding (prompt_encoder.py:173)
    idx = jnp.where(labels < 0, 3, jnp.minimum(labels, 1))
    return pe + table.astype(pe.dtype)[idx]


def encode_masks(p, cfg: Sam3Config, masks: jax.Array) -> jax.Array:
    """(B, 1, H, W) -> dense (B, S/4, S/4, P)... the reference's
    mask_downscaling outputs mask_in_chans channels and bilinear-resizes
    to S/4 (prompt_encoder.py:244-254)."""
    x = jnp.transpose(masks, (0, 2, 3, 1))
    w0 = p["prompt_encoder.mask_downscaling.0.weight"].astype(x.dtype)
    x = lax.conv_general_dilated(x, w0, (2, 2), [(0, 0)] * 2,
                                 dimension_numbers=("NHWC", "HWIO", "NHWC"))
    x = x + p["prompt_encoder.mask_downscaling.0.bias"].astype(x.dtype)
    x = _group_norm1(p, "prompt_encoder.mask_downscaling.1", x)
    w2 = p["prompt_encoder.mask_downscaling.2.weight"].astype(x.dtype)
    x = lax.conv_general_dilated(x, w2, (2, 2), [(0, 0)] * 2,
                                 dimension_numbers=("NHWC", "HWIO", "NHWC"))
    x = x + p["prompt_encoder.mask_downscaling.2.bias"].astype(x.dtype)
    x = _group_norm1(p, "prompt_encoder.mask_downscaling.3", x)
    s4 = cfg.img_size // 4
    return _bilinear_resize(x, (s4, s4))


def no_mask_embed(p, cfg: Sam3Config, batch: int) -> jax.Array:
    s4 = cfg.img_size // 4
    return jnp.broadcast_to(
        p["prompt_encoder.no_mask_embed.weight"].reshape(1, 1, 1, -1),
        (batch, s4, s4, cfg.prompt_embed_dim))


def decode_masks(p, cfg: Sam3Config, image_emb: jax.Array,
                 sparse: jax.Array, dense: jax.Array
                 ) -> Tuple[jax.Array, jax.Array]:
    """image_emb (B, N, P) tokens; dense (B, h, w, C_dense) NHWC
    (mask_decoder.py:140-200)."""
    B, N, P = image_emb.shape
    H = W = int(round(N ** 0.5))
    spatial = image_emb.reshape(B, H, W, P)
    if dense.shape[-1] == P:
        spatial = spatial + _bilinear_resize(dense, (H, W))
    tokens = spatial.reshape(B, N, P)
    # cross-attention transformer on sparse prompts
    t = "mask_decoder.transformer"
    h = _ln(p, f"{t}.norm1", sparse)
    win = p[f"{t}.cross_attn.in_proj_weight"].astype(h.dtype)
    bin_ = p[f"{t}.cross_attn.in_proj_bias"].astype(h.dtype)
    q = h @ win[:, :P] + bin_[:P]
    k = tokens @ win[:, P:2 * P] + bin_[P:2 * P]
    v = tokens @ win[:, 2 * P:] + bin_[2 * P:]
    o = _mha(q, k, v, cfg.decoder_num_heads)
    sp = sparse + _lin(p, f"{t}.cross_attn.out_proj", o)
    h = _ln(p, f"{t}.norm2", sp)
    sp = sp + _self_attn(p, f"{t}.self_attn", h, cfg.decoder_num_heads,
                         cfg.decoder_dim_head)
    h = _ln(p, f"{t}.norm3", sp)
    sp = sp + _lin(p, f"{t}.mlp.lin2",
                   jax.nn.gelu(_lin(p, f"{t}.mlp.lin1", h),
                               approximate=False))
    # upscale (no activations, GroupNorm between — mask_decoder.py:124)
    x = _convt2x2(p, "mask_decoder.output_upscaling.0", spatial)
    x = _group_norm1(p, "mask_decoder.output_upscaling.1", x)
    x = _convt2x2(p, "mask_decoder.output_upscaling.2", x)
    masks = jnp.transpose(x, (0, 3, 1, 2))
    iou_in = jnp.mean(sp, 1)
    h = jax.nn.relu(_lin(p, "mask_decoder.iou_prediction_head.0", iou_in))
    h = jax.nn.relu(_lin(p, "mask_decoder.iou_prediction_head.2", h))
    iou = _lin(p, "mask_decoder.iou_prediction_head.4", h)
    return masks, iou


# Back-compat component handles (previous kornia_tpu API)
class ImageEncoderHiera:
    def __init__(self, cfg: Sam3Config, params):
        self.cfg, self.params = cfg, params

    def __call__(self, images):
        return encode_image(self.params, self.cfg, images)


class PromptEncoder3:
    def __init__(self, cfg: Sam3Config, params):
        self.cfg, self.params = cfg, params

    def __call__(self, coords, labels, masks=None):
        sparse = encode_points(self.params, self.cfg, coords, labels)
        dense = (encode_masks(self.params, self.cfg, masks)
                 if masks is not None
                 else no_mask_embed(self.params, self.cfg,
                                    coords.shape[0]))
        return sparse, dense


class MaskDecoder3:
    def __init__(self, cfg: Sam3Config, params):
        self.cfg, self.params = cfg, params

    def __call__(self, image_emb, sparse, dense):
        return decode_masks(self.params, self.cfg, image_emb, sparse, dense)


class Sam3:
    """Composed promptable-segmentation pipeline over the three exact
    SAM-3 modules. __call__(image (B, 3, S, S) in [0, 1], point_coords
    (B, M, 2) in pixels, point_labels (B, M)) -> (masks, iou)."""

    def __init__(self, cfg: Optional[Sam3Config] = None, params=None,
                 key: Optional[jax.Array] = None, **legacy):
        if cfg is None and legacy:
            cfg = Sam3Config(
                img_size=legacy.get("img_size", 64),
                patch_size=legacy.get("patch_size", 16),
                encoder_embed_dim=legacy.get("encoder_dim", 64),
                encoder_depth=legacy.get("depth", 2),
                encoder_num_heads=legacy.get("num_heads", 4),
                prompt_embed_dim=legacy.get("encoder_dim", 64),
                mask_in_chans=8, iou_head_hidden_dim=32)
        self.cfg = cfg or Sam3Config()
        self._params = params
        self._key = key if key is not None else jax.random.PRNGKey(0)

    @property
    def params(self):
        if self._params is None:
            self._params = init_params(self._key, self.cfg)
        return self._params

    def __call__(self, image, point_coords, point_labels):
        p, cfg = self.params, self.cfg
        S = image.shape[-1]
        tokens = encode_image(p, cfg, image)
        coords = point_coords / jnp.asarray([S, S], jnp.float32)
        sparse = encode_points(p, cfg, coords, point_labels)
        dense = no_mask_embed(p, cfg, image.shape[0])
        return decode_masks(p, cfg, tokens, sparse, dense)
