"""Segment Anything (SAM) — exact architecture, TPU-native.

Reference behavior: kornia/models/sam/ —
- image encoder (ViTDet): architecture/image_encoder.py:37 (windowed
  attention + decomposed relative position, neck convs)
- prompt encoder: architecture/prompt_encoder.py:35 (random spatial-
  frequency positional encoding, learned point-type embeddings, mask
  downscaling convs)
- two-way transformer: architecture/transformer.py:35 (token self-attn,
  token<->image cross-attn with downsampled internal dim, post-norm)
- mask decoder: architecture/mask_decoder.py:32 (iou/mask tokens,
  ConvTranspose upscaling, per-token hypernetwork MLPs)
- model/builder: model.py:87 (vit_b/l/h configs), served through
  contrib/visual_prompter.py:35.

Implementation notes (TPU-first):
- flat param dict keyed by the reference torch state_dict names, so
  `load_torch_weights` is a pure layout transpose (validated in
  tests/test_sam_parity.py against the reference modules).
- NHWC internally; NCHW at the public boundary.
- window partition/unpartition are static reshapes (padded grid), so the
  whole forward jits with fixed shapes; prompts are padded fixed-N points
  with labels in {-1: pad, 0: neg, 1: pos, 2: box TL, 3: box BR}.
- the 2x2-stride-2 ConvTranspose is lowered to one einsum (a pure MXU
  matmul) instead of a scatter.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

__all__ = ["Sam", "SamConfig", "VisualPrompter", "init_params",
           "load_torch_weights"]


@dataclasses.dataclass(frozen=True)
class SamConfig:
    """Mirrors the reference builder `_build_sam` (model.py:371)."""

    image_size: int = 1024
    patch_size: int = 16
    encoder_embed_dim: int = 768
    encoder_depth: int = 12
    encoder_num_heads: int = 12
    encoder_global_attn_indexes: Tuple[int, ...] = (2, 5, 8, 11)
    window_size: int = 14
    use_rel_pos: bool = True
    mlp_ratio: float = 4.0
    prompt_embed_dim: int = 256
    mask_in_chans: int = 16
    num_multimask_outputs: int = 3
    decoder_depth: int = 2
    decoder_num_heads: int = 8
    decoder_mlp_dim: int = 2048
    iou_head_depth: int = 3
    iou_head_hidden_dim: int = 256
    tiny_vit_variant: Optional[str] = None  # "5m" => MobileSAM encoder
    # "custom" variant: explicit TinyViT stage config (tests / scaled nets)
    tiny_vit_dims: Tuple[int, ...] = ()
    tiny_vit_depths: Tuple[int, ...] = ()
    tiny_vit_heads: Tuple[int, ...] = ()
    tiny_vit_windows: Tuple[int, ...] = ()

    @property
    def grid(self) -> int:
        return self.image_size // self.patch_size

    @property
    def tiny_vit_config(self):
        from .tiny_vit import TinyViTConfig
        if self.tiny_vit_variant == "custom":
            return TinyViTConfig(img_size=self.image_size, mobile_sam=True,
                                 embed_dims=self.tiny_vit_dims,
                                 depths=self.tiny_vit_depths,
                                 num_heads=self.tiny_vit_heads,
                                 window_sizes=self.tiny_vit_windows)
        return TinyViTConfig.from_variant(self.tiny_vit_variant,
                                          img_size=self.image_size,
                                          mobile_sam=True)

    @property
    def num_mask_tokens(self) -> int:
        return self.num_multimask_outputs + 1

    @staticmethod
    def from_name(name: str) -> "SamConfig":
        """vit_b / vit_l / vit_h / mobile_sam presets
        (reference model.py:161-206)."""
        if name == "mobile_sam":
            return SamConfig(tiny_vit_variant="5m")
        presets = {
            "vit_b": (768, 12, 12, (2, 5, 8, 11)),
            "vit_l": (1024, 24, 16, (5, 11, 17, 23)),
            "vit_h": (1280, 32, 16, (7, 15, 23, 31)),
        }
        if name not in presets:
            raise ValueError(f"Invalid SAM model name: {name}")
        d, depth, heads, glob = presets[name]
        return SamConfig(encoder_embed_dim=d, encoder_depth=depth,
                         encoder_num_heads=heads,
                         encoder_global_attn_indexes=glob)


# -----------------------------------------------------------------------------
# Param specs (torch names/shapes) — drives init + weight port
# -----------------------------------------------------------------------------

def _block_window(cfg: SamConfig, i: int) -> int:
    return 0 if i in cfg.encoder_global_attn_indexes else cfg.window_size


def _param_specs(cfg: SamConfig) -> Dict[str, Tuple[str, Tuple[int, ...]]]:
    D = cfg.encoder_embed_dim
    P = cfg.prompt_embed_dim
    g = cfg.grid
    hd = D // cfg.encoder_num_heads
    s: Dict[str, Tuple[str, Tuple[int, ...]]] = {}

    # ---- image encoder: ViTDet (image_encoder.py:100-136) or MobileSAM
    # TinyViT (model.py:190)
    if cfg.tiny_vit_variant is not None:
        from .tiny_vit import _param_specs as _tiny_param_specs
        for k, v in _tiny_param_specs(cfg.tiny_vit_config).items():
            if not k.startswith(("norm_head.", "head.")):  # unused by SAM
                s[f"image_encoder.{k}"] = v
        return _sam_head_specs(cfg, s)
    s["image_encoder.patch_embed.proj.weight"] = (
        "conv", (D, 3, cfg.patch_size, cfg.patch_size))
    s["image_encoder.patch_embed.proj.bias"] = ("raw", (D,))
    s["image_encoder.pos_embed"] = ("raw", (1, g, g, D))
    for i in range(cfg.encoder_depth):
        b = f"image_encoder.blocks.{i}"
        for n in ("norm1", "norm2"):
            s[f"{b}.{n}.weight"] = ("raw", (D,))
            s[f"{b}.{n}.bias"] = ("raw", (D,))
        s[f"{b}.attn.qkv.weight"] = ("lin", (3 * D, D))
        s[f"{b}.attn.qkv.bias"] = ("raw", (3 * D,))
        s[f"{b}.attn.proj.weight"] = ("lin", (D, D))
        s[f"{b}.attn.proj.bias"] = ("raw", (D,))
        if cfg.use_rel_pos:
            w = _block_window(cfg, i)
            size = w if w > 0 else g
            s[f"{b}.attn.rel_pos_h"] = ("raw", (2 * size - 1, hd))
            s[f"{b}.attn.rel_pos_w"] = ("raw", (2 * size - 1, hd))
        mlp = int(D * cfg.mlp_ratio)
        s[f"{b}.mlp.lin1.weight"] = ("lin", (mlp, D))
        s[f"{b}.mlp.lin1.bias"] = ("raw", (mlp,))
        s[f"{b}.mlp.lin2.weight"] = ("lin", (D, mlp))
        s[f"{b}.mlp.lin2.bias"] = ("raw", (D,))
    s["image_encoder.neck.0.weight"] = ("conv", (P, D, 1, 1))
    s["image_encoder.neck.1.weight"] = ("raw", (P,))
    s["image_encoder.neck.1.bias"] = ("raw", (P,))
    s["image_encoder.neck.2.weight"] = ("conv", (P, P, 3, 3))
    s["image_encoder.neck.3.weight"] = ("raw", (P,))
    s["image_encoder.neck.3.bias"] = ("raw", (P,))
    return _sam_head_specs(cfg, s)


def _sam_head_specs(cfg: SamConfig, s: Dict[str, Tuple[str, Tuple[int, ...]]]
                    ) -> Dict[str, Tuple[str, Tuple[int, ...]]]:
    """Prompt-encoder + mask-decoder specs (shared by both encoders)."""
    P = cfg.prompt_embed_dim
    # ---- prompt encoder (prompt_encoder.py:49-88)
    s["prompt_encoder.pe_layer.positional_encoding_gaussian_matrix"] = (
        "raw", (2, P // 2))
    for i in range(4):
        s[f"prompt_encoder.point_embeddings.{i}.weight"] = ("raw", (1, P))
    s["prompt_encoder.not_a_point_embed.weight"] = ("raw", (1, P))
    s["prompt_encoder.no_mask_embed.weight"] = ("raw", (1, P))
    m = cfg.mask_in_chans
    s["prompt_encoder.mask_downscaling.0.weight"] = ("conv", (m // 4, 1, 2, 2))
    s["prompt_encoder.mask_downscaling.0.bias"] = ("raw", (m // 4,))
    s["prompt_encoder.mask_downscaling.1.weight"] = ("raw", (m // 4,))
    s["prompt_encoder.mask_downscaling.1.bias"] = ("raw", (m // 4,))
    s["prompt_encoder.mask_downscaling.3.weight"] = ("conv", (m, m // 4, 2, 2))
    s["prompt_encoder.mask_downscaling.3.bias"] = ("raw", (m,))
    s["prompt_encoder.mask_downscaling.4.weight"] = ("raw", (m,))
    s["prompt_encoder.mask_downscaling.4.bias"] = ("raw", (m,))
    s["prompt_encoder.mask_downscaling.6.weight"] = ("conv", (P, m, 1, 1))
    s["prompt_encoder.mask_downscaling.6.bias"] = ("raw", (P,))

    # ---- mask decoder (mask_decoder.py:56-77, transformer.py:50-91)
    s["mask_decoder.iou_token.weight"] = ("raw", (1, P))
    s["mask_decoder.mask_tokens.weight"] = ("raw", (cfg.num_mask_tokens, P))

    def attn(prefix: str, internal: int) -> None:
        for n in ("q_proj", "k_proj", "v_proj"):
            s[f"{prefix}.{n}.weight"] = ("lin", (internal, P))
            s[f"{prefix}.{n}.bias"] = ("raw", (internal,))
        s[f"{prefix}.out_proj.weight"] = ("lin", (P, internal))
        s[f"{prefix}.out_proj.bias"] = ("raw", (P,))

    for i in range(cfg.decoder_depth):
        t = f"mask_decoder.transformer.layers.{i}"
        attn(f"{t}.self_attn", P)
        attn(f"{t}.cross_attn_token_to_image", P // 2)
        attn(f"{t}.cross_attn_image_to_token", P // 2)
        for n in ("norm1", "norm2", "norm3", "norm4"):
            s[f"{t}.{n}.weight"] = ("raw", (P,))
            s[f"{t}.{n}.bias"] = ("raw", (P,))
        s[f"{t}.mlp.lin1.weight"] = ("lin", (cfg.decoder_mlp_dim, P))
        s[f"{t}.mlp.lin1.bias"] = ("raw", (cfg.decoder_mlp_dim,))
        s[f"{t}.mlp.lin2.weight"] = ("lin", (P, cfg.decoder_mlp_dim))
        s[f"{t}.mlp.lin2.bias"] = ("raw", (P,))
    attn("mask_decoder.transformer.final_attn_token_to_image", P // 2)
    s["mask_decoder.transformer.norm_final_attn.weight"] = ("raw", (P,))
    s["mask_decoder.transformer.norm_final_attn.bias"] = ("raw", (P,))

    s["mask_decoder.output_upscaling.0.weight"] = ("convt", (P, P // 4, 2, 2))
    s["mask_decoder.output_upscaling.0.bias"] = ("raw", (P // 4,))
    s["mask_decoder.output_upscaling.1.weight"] = ("raw", (P // 4,))
    s["mask_decoder.output_upscaling.1.bias"] = ("raw", (P // 4,))
    s["mask_decoder.output_upscaling.3.weight"] = (
        "convt", (P // 4, P // 8, 2, 2))
    s["mask_decoder.output_upscaling.3.bias"] = ("raw", (P // 8,))
    for i in range(cfg.num_mask_tokens):
        h = f"mask_decoder.output_hypernetworks_mlps.{i}.layers"
        dims = [P, P, P, P // 8]
        for j in range(3):
            s[f"{h}.{j}.weight"] = ("lin", (dims[j + 1], dims[j]))
            s[f"{h}.{j}.bias"] = ("raw", (dims[j + 1],))
    dims = [P] + [cfg.iou_head_hidden_dim] * (cfg.iou_head_depth - 1) \
        + [cfg.num_mask_tokens]
    for j in range(cfg.iou_head_depth):
        s[f"mask_decoder.iou_prediction_head.layers.{j}.weight"] = (
            "lin", (dims[j + 1], dims[j]))
        s[f"mask_decoder.iou_prediction_head.layers.{j}.bias"] = (
            "raw", (dims[j + 1],))
    return s


def init_params(key: jax.Array, cfg: SamConfig,
                dtype=jnp.float32) -> Dict[str, jax.Array]:
    """Random init in the torch layout convention used by the specs."""
    params: Dict[str, jax.Array] = {}
    for name, (kind, shape) in _param_specs(cfg).items():
        key, sub = jax.random.split(key)
        if kind == "conv":
            o, i, kh, kw = shape
            std = (2.0 / (i * kh * kw)) ** 0.5
            params[name] = jax.random.normal(sub, (kh, kw, i, o), dtype) * std
        elif kind == "convt":
            i, o, kh, kw = shape
            std = (2.0 / (i * kh * kw)) ** 0.5
            params[name] = jax.random.normal(sub, shape, dtype) * std
        elif kind == "lin":
            o, i = shape
            bound = 1.0 / math.sqrt(i)
            params[name] = jax.random.uniform(sub, (i, o), dtype, -bound,
                                              bound)
        elif "pe_layer" in name:
            params[name] = jax.random.normal(sub, shape, dtype)
        elif name.endswith(".bias") or "pos_embed" in name \
                or "rel_pos" in name or name.endswith("running_mean") \
                or "attention_biases" in name:
            params[name] = jnp.zeros(shape, dtype)
        elif name.endswith("running_var") or ".bn.weight" in name \
                or "norm" in name or ".neck.1." in name \
                or ".neck.3." in name \
                or "mask_downscaling.1." in name \
                or "mask_downscaling.4." in name \
                or "output_upscaling.1." in name:
            params[name] = jnp.ones(shape, dtype)
        else:  # nn.Embedding weights (tokens / point embeddings): N(0, 1)
            params[name] = jax.random.normal(sub, shape, dtype)
    return params


def load_torch_weights(state_dict, cfg: Optional[SamConfig] = None
                       ) -> Dict[str, jax.Array]:
    """Convert a reference/Meta SAM torch state_dict into TPU-layout params.

    Works for sam_vit_b/l/h checkpoints (reference model.py:228-231) given
    the matching `SamConfig.from_name`.
    """
    cfg = cfg or SamConfig()
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

def _linear(p, prefix, x):
    return x @ p[f"{prefix}.weight"].astype(x.dtype) \
        + p[f"{prefix}.bias"].astype(x.dtype)


def _layer_norm(p, prefix, x, eps):
    mu = jnp.mean(x, -1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), -1, keepdims=True)
    xn = (x - mu) * lax.rsqrt(var + eps)
    return xn * p[f"{prefix}.weight"].astype(x.dtype) \
        + p[f"{prefix}.bias"].astype(x.dtype)


def _conv(p, prefix, x, stride=1, padding=0):
    w = p[f"{prefix}.weight"].astype(x.dtype)
    y = lax.conv_general_dilated(
        x, w, (stride, stride), [(padding, padding)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    b = p.get(f"{prefix}.bias")
    return y if b is None else y + b.astype(x.dtype)


def _convt2x2(p, prefix, x):
    """ConvTranspose2d(k=2, s=2) as a single einsum (non-overlapping
    windows -> pure matmul; MXU-friendly, no scatter)."""
    w = p[f"{prefix}.weight"].astype(x.dtype)  # (I, O, 2, 2) torch layout
    b = p[f"{prefix}.bias"].astype(x.dtype)
    B, H, W, _ = x.shape
    o = w.shape[1]
    y = jnp.einsum("bhwc,cokl->bhkwlo", x, w)
    return y.reshape(B, H * 2, W * 2, o) + b


def _gelu(x):
    return jax.nn.gelu(x, approximate=False)


def _mlp_relu(p, prefix, x, num_layers):
    """reference models/common.py MLP — ReLU between layers, linear last."""
    for j in range(num_layers):
        x = _linear(p, f"{prefix}.{j}", x)
        if j < num_layers - 1:
            x = jax.nn.relu(x)
    return x


# -----------------------------------------------------------------------------
# Image encoder (ViTDet)
# -----------------------------------------------------------------------------

def _rel_pos_table(rel_pos: jax.Array, q_size: int, k_size: int) -> jax.Array:
    """get_rel_pos (image_encoder.py:302): resize to 2*max-1 if needed,
    then gather at static relative-coordinate indices."""
    max_rel_dist = 2 * max(q_size, k_size) - 1
    if rel_pos.shape[0] != max_rel_dist:
        rel_pos = jax.image.resize(
            rel_pos, (max_rel_dist, rel_pos.shape[1]), "linear")
    qc = np.arange(q_size)[:, None] * max(k_size / q_size, 1.0)
    kc = np.arange(k_size)[None, :] * max(q_size / k_size, 1.0)
    idx = (qc - kc + (k_size - 1) * max(q_size / k_size, 1.0)).astype(np.int64)
    return rel_pos[jnp.asarray(idx)]


def _vit_attention(p, prefix, x, num_heads, use_rel_pos):
    """Attention with decomposed rel-pos (image_encoder.py:274-299).
    x: (B, H, W, C) token grid (one window or the full grid)."""
    B, H, W, C = x.shape
    hd = C // num_heads
    qkv = _linear(p, f"{prefix}.qkv", x.reshape(B, H * W, C))
    qkv = qkv.reshape(B, H * W, 3, num_heads, hd)
    qkv = qkv.transpose(2, 0, 3, 1, 4).reshape(3, B * num_heads, H * W, hd)
    q, k, v = qkv[0], qkv[1], qkv[2]
    attn = (q * (hd ** -0.5)) @ k.transpose(0, 2, 1)
    if use_rel_pos:
        rh = _rel_pos_table(p[f"{prefix}.rel_pos_h"].astype(x.dtype), H, H)
        rw = _rel_pos_table(p[f"{prefix}.rel_pos_w"].astype(x.dtype), W, W)
        rq = q.reshape(-1, H, W, hd)
        rel_h = jnp.einsum("bhwc,hkc->bhwk", rq, rh)
        rel_w = jnp.einsum("bhwc,wkc->bhwk", rq, rw)
        attn = (attn.reshape(-1, H, W, H, W) + rel_h[:, :, :, :, None]
                + rel_w[:, :, :, None, :]).reshape(-1, H * W, H * W)
    attn = jax.nn.softmax(attn, -1)
    out = (attn @ v).reshape(B, num_heads, H, W, hd)
    out = out.transpose(0, 2, 3, 1, 4).reshape(B, H, W, C)
    return _linear(p, f"{prefix}.proj", out)


def _window_partition(x, w):
    """(B,H,W,C) -> (B*nW, w, w, C) with bottom/right zero pad
    (models/common.py:174)."""
    B, H, W, C = x.shape
    ph, pw = (-H) % w, (-W) % w
    x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
    Hp, Wp = H + ph, W + pw
    x = x.reshape(B, Hp // w, w, Wp // w, w, C).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, w, w, C), (Hp, Wp)


def _window_unpartition(wins, w, pad_hw, hw):
    Hp, Wp = pad_hw
    H, W = hw
    B = wins.shape[0] // (Hp * Wp // (w * w))
    x = wins.reshape(B, Hp // w, Wp // w, w, w, -1).transpose(0, 1, 3, 2, 4, 5)
    x = x.reshape(B, Hp, Wp, -1)
    return x[:, :H, :W]


def encode_image(p, cfg: SamConfig, images: jax.Array) -> jax.Array:
    """images (B, 3, H, W) -> embeddings (B, He, We, prompt_embed_dim) NHWC
    (image_encoder.py:138-158; MobileSAM via TinyViT, model.py:190)."""
    if cfg.tiny_vit_variant is not None:
        from . import tiny_vit as _tv
        pre = "image_encoder."
        sub = {k[len(pre):]: v for k, v in p.items() if k.startswith(pre)}
        return _tv.encode_image(sub, cfg.tiny_vit_config, images)
    x = jnp.transpose(images, (0, 2, 3, 1))
    x = _conv(p, "image_encoder.patch_embed.proj", x, stride=cfg.patch_size)
    if x.shape[1:3] == (cfg.grid, cfg.grid):
        x = x + p["image_encoder.pos_embed"].astype(x.dtype)
    else:  # non-square/pretrain-size mismatch: bicubic-free bilinear resize
        pe = jax.image.resize(
            p["image_encoder.pos_embed"].astype(x.dtype),
            (1, x.shape[1], x.shape[2], x.shape[3]), "linear")
        x = x + pe
    for i in range(cfg.encoder_depth):
        b = f"image_encoder.blocks.{i}"
        w = _block_window(cfg, i)
        shortcut = x
        h = _layer_norm(p, f"{b}.norm1", x, 1e-6)
        if w > 0:
            hw = h.shape[1:3]
            h, pad_hw = _window_partition(h, w)
        h = _vit_attention(p, f"{b}.attn", h, cfg.encoder_num_heads,
                           cfg.use_rel_pos)
        if w > 0:
            h = _window_unpartition(h, w, pad_hw, hw)
        x = shortcut + h
        h = _layer_norm(p, f"{b}.norm2", x, 1e-6)
        h = _linear(p, f"{b}.mlp.lin2", _gelu(_linear(p, f"{b}.mlp.lin1", h)))
        x = x + h
    # neck: 1x1 conv -> LN2d -> 3x3 conv -> LN2d (no biases on convs)
    x = _conv(p, "image_encoder.neck.0", x)
    x = _layer_norm(p, "image_encoder.neck.1", x, 1e-6)
    x = _conv(p, "image_encoder.neck.2", x, padding=1)
    x = _layer_norm(p, "image_encoder.neck.3", x, 1e-6)
    return x


# -----------------------------------------------------------------------------
# Prompt encoder
# -----------------------------------------------------------------------------

def _pe_encoding(p, coords):
    """Random-frequency PE of [0,1]-normalized coords
    (prompt_encoder.py:196-203)."""
    m = p["prompt_encoder.pe_layer.positional_encoding_gaussian_matrix"]
    c = (2 * coords - 1) @ m.astype(coords.dtype)
    c = 2 * jnp.pi * c
    return jnp.concatenate([jnp.sin(c), jnp.cos(c)], -1)


def dense_pe(p, cfg: SamConfig) -> jax.Array:
    """Positional encoding over the embedding grid, (He, We, P)
    (prompt_encoder.py:205-217)."""
    g = cfg.grid
    ax = (jnp.arange(g, dtype=jnp.float32) + 0.5) / g
    yx = jnp.stack(jnp.meshgrid(ax, ax, indexing="ij"), -1)  # (g, g, [y, x])
    return _pe_encoding(p, yx[..., ::-1])


def encode_points(p, cfg: SamConfig, points: jax.Array, labels: jax.Array,
                  pad: bool = True) -> jax.Array:
    """points (B, N, 2) pixel xy; labels (B, N) in {-1,0,1,2,3}
    (prompt_encoder.py:100-122; box corners are labels 2/3, matching
    _embed_boxes). Returns sparse embeddings (B, N(+1), P)."""
    if pad:
        z = jnp.zeros(points.shape[:-2] + (1, 2), points.dtype)
        points = jnp.concatenate([points, z], axis=-2)
        labels = jnp.concatenate(
            [labels, -jnp.ones(labels.shape[:-1] + (1,), labels.dtype)], -1)
    coords = (points + 0.5) / jnp.asarray(
        [cfg.image_size, cfg.image_size], points.dtype)
    pe = _pe_encoding(p, coords)
    pe = jnp.where((labels == -1)[..., None], 0.0, pe)
    table = jnp.concatenate([
        p["prompt_encoder.not_a_point_embed.weight"],
        p["prompt_encoder.point_embeddings.0.weight"],
        p["prompt_encoder.point_embeddings.1.weight"],
        p["prompt_encoder.point_embeddings.2.weight"],
        p["prompt_encoder.point_embeddings.3.weight"]], 0).astype(pe.dtype)
    return pe + table[jnp.clip(labels + 1, 0, 4)]


def boxes_to_points(boxes: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """(B, 4) xyxy -> corner points (B, 2, 2) + labels (B, 2) = [2, 3]
    (prompt_encoder.py:115-122)."""
    pts = boxes.reshape(boxes.shape[:-1] + (2, 2))
    lbl = jnp.broadcast_to(jnp.asarray([2, 3], jnp.int32),
                           pts.shape[:-1])
    return pts, lbl


def encode_masks(p, mask: jax.Array) -> jax.Array:
    """mask (B, 1, 4*He, 4*We) -> dense embeddings (B, He, We, P)
    (prompt_encoder.py:79-87)."""
    x = jnp.transpose(mask, (0, 2, 3, 1))
    x = _conv(p, "prompt_encoder.mask_downscaling.0", x, stride=2)
    x = _layer_norm(p, "prompt_encoder.mask_downscaling.1", x, 1e-6)
    x = _gelu(x)
    x = _conv(p, "prompt_encoder.mask_downscaling.3", x, stride=2)
    x = _layer_norm(p, "prompt_encoder.mask_downscaling.4", x, 1e-6)
    x = _gelu(x)
    return _conv(p, "prompt_encoder.mask_downscaling.6", x)


def no_mask_embed(p, cfg: SamConfig, batch: int) -> jax.Array:
    g = cfg.grid
    return jnp.broadcast_to(
        p["prompt_encoder.no_mask_embed.weight"].reshape(1, 1, 1, -1),
        (batch, g, g, cfg.prompt_embed_dim))


# -----------------------------------------------------------------------------
# Two-way transformer + mask decoder
# -----------------------------------------------------------------------------

def _ds_attention(p, prefix, q, k, v, num_heads):
    """Attention with internal-dim downsample (transformer.py:233-291)."""
    qp, kp, vp = (_linear(p, f"{prefix}.{n}_proj", t)
                  for n, t in (("q", q), ("k", k), ("v", v)))
    B, Lq, D = qp.shape
    Lk = kp.shape[1]
    d = D // num_heads
    qp = qp.reshape(B, Lq, num_heads, d).transpose(0, 2, 1, 3)
    kp = kp.reshape(B, Lk, num_heads, d).transpose(0, 2, 1, 3)
    vp = vp.reshape(B, Lk, num_heads, d).transpose(0, 2, 1, 3)
    attn = jax.nn.softmax(qp @ kp.transpose(0, 1, 3, 2) / math.sqrt(d), -1)
    out = (attn @ vp).transpose(0, 2, 1, 3).reshape(B, Lq, D)
    return _linear(p, f"{prefix}.out_proj", out)


def _two_way_transformer(p, cfg: SamConfig, image_emb, image_pe, tokens):
    """transformer.py:93-129. image_emb/image_pe: (B, L_img, P);
    tokens: (B, L_tok, P). Returns (queries, keys)."""
    nh = cfg.decoder_num_heads
    queries, keys = tokens, image_emb
    for i in range(cfg.decoder_depth):
        t = f"mask_decoder.transformer.layers.{i}"
        if i == 0:  # skip_first_layer_pe
            queries = _ds_attention(p, f"{t}.self_attn", queries, queries,
                                    queries, nh)
        else:
            q = queries + tokens
            queries = queries + _ds_attention(p, f"{t}.self_attn", q, q,
                                              queries, nh)
        queries = _layer_norm(p, f"{t}.norm1", queries, 1e-5)
        q = queries + tokens
        k = keys + image_pe
        queries = queries + _ds_attention(
            p, f"{t}.cross_attn_token_to_image", q, k, keys, nh)
        queries = _layer_norm(p, f"{t}.norm2", queries, 1e-5)
        h = _linear(p, f"{t}.mlp.lin2",
                    jax.nn.relu(_linear(p, f"{t}.mlp.lin1", queries)))
        queries = _layer_norm(p, f"{t}.norm3", queries + h, 1e-5)
        q = queries + tokens
        k = keys + image_pe
        keys = keys + _ds_attention(
            p, f"{t}.cross_attn_image_to_token", k, q, queries, nh)
        keys = _layer_norm(p, f"{t}.norm4", keys, 1e-5)
    q = queries + tokens
    k = keys + image_pe
    queries = queries + _ds_attention(
        p, "mask_decoder.transformer.final_attn_token_to_image", q, k, keys,
        nh)
    queries = _layer_norm(p, "mask_decoder.transformer.norm_final_attn",
                          queries, 1e-5)
    return queries, keys


def decode_masks(p, cfg: SamConfig, image_emb: jax.Array, image_pe: jax.Array,
                 sparse: jax.Array, dense: jax.Array,
                 multimask_output: bool = True
                 ) -> Tuple[jax.Array, jax.Array]:
    """mask_decoder.py:119-159. image_emb (B, He, We, P) NHWC (+dense),
    sparse (B, N, P). Returns (masks (B, C, 4He, 4We), iou_pred (B, C))."""
    B = sparse.shape[0]
    out_tok = jnp.concatenate([p["mask_decoder.iou_token.weight"],
                               p["mask_decoder.mask_tokens.weight"]],
                              0).astype(sparse.dtype)
    tokens = jnp.concatenate(
        [jnp.broadcast_to(out_tok[None], (B,) + out_tok.shape), sparse], 1)
    src = image_emb + dense
    He, We, P = src.shape[1:]
    src = src.reshape(B, He * We, P)
    pos = jnp.broadcast_to(image_pe.reshape(1, He * We, P), src.shape)
    hs, src = _two_way_transformer(p, cfg, src, pos, tokens)
    iou_tok = hs[:, 0]
    mask_toks = hs[:, 1:1 + cfg.num_mask_tokens]
    x = src.reshape(B, He, We, P)
    x = _convt2x2(p, "mask_decoder.output_upscaling.0", x)
    x = _layer_norm(p, "mask_decoder.output_upscaling.1", x, 1e-6)
    x = _gelu(x)
    x = _gelu(_convt2x2(p, "mask_decoder.output_upscaling.3", x))
    hyper = jnp.stack(
        [_mlp_relu(p, f"mask_decoder.output_hypernetworks_mlps.{i}.layers",
                   mask_toks[:, i], 3)
         for i in range(cfg.num_mask_tokens)], 1)  # (B, T, P/8)
    masks = jnp.einsum("btc,bhwc->bthw", hyper, x)
    iou_pred = _mlp_relu(p, "mask_decoder.iou_prediction_head.layers",
                         iou_tok, cfg.iou_head_depth)
    sl = slice(1, None) if multimask_output else slice(0, 1)
    return masks[:, sl], iou_pred[:, sl]


# -----------------------------------------------------------------------------
# Model wrapper
# -----------------------------------------------------------------------------

class Sam:
    """Promptable segmentation model (reference model.py:87).

    Call with images (B, 3, H, W) and padded fixed-N point prompts
    (B, N, 2)/(B, N); box prompts via `boxes_to_points`. Returns
    (low-res mask logits (B, C, 4He, 4We), iou predictions (B, C)).
    """

    mask_threshold: float = 0.0

    def __init__(self, cfg: Optional[SamConfig] = None, params=None,
                 key: Optional[jax.Array] = None):
        self.cfg = cfg or SamConfig()
        self._params = params
        self._key = key if key is not None else jax.random.PRNGKey(0)

    @staticmethod
    def from_name(name: str, params=None) -> "Sam":
        return Sam(SamConfig.from_name(name), params)

    @property
    def params(self):
        if self._params is None:
            self._params = init_params(self._key, self.cfg)
        return self._params

    def encode_image(self, images: jax.Array) -> jax.Array:
        """(B, 3, H, W) -> (B, P, He, We) embeddings (NCHW boundary)."""
        return jnp.transpose(encode_image(self.params, self.cfg, images),
                             (0, 3, 1, 2))

    def __call__(self, images: jax.Array, point_coords: jax.Array,
                 point_labels: jax.Array,
                 mask_inputs: Optional[jax.Array] = None,
                 multimask_output: bool = True
                 ) -> Tuple[jax.Array, jax.Array]:
        p, cfg = self.params, self.cfg
        emb = encode_image(p, cfg, images)
        sparse = encode_points(p, cfg, point_coords, point_labels)
        dense = (encode_masks(p, mask_inputs) if mask_inputs is not None
                 else no_mask_embed(p, cfg, emb.shape[0]))
        return decode_masks(p, cfg, emb, dense_pe(p, cfg), sparse, dense,
                            multimask_output)


class VisualPrompter:
    """SAM predict loop (reference contrib/visual_prompter.py:35):
    `set_image` computes the (expensive) image embedding once; `predict`
    re-runs only the prompt encoder + mask decoder per prompt batch."""

    pixel_mean = (123.675 / 255, 116.28 / 255, 103.53 / 255)
    pixel_std = (58.395 / 255, 57.12 / 255, 57.375 / 255)

    def __init__(self, model: Optional[Sam] = None):
        self.model = model or Sam()
        self._embedding: Optional[jax.Array] = None
        self._scale: float = 1.0

    def preprocess_image(self, image: jax.Array) -> jax.Array:
        """Normalize (SAM dataset stats) + resize longest side + pad
        bottom/right to the encoder size (visual_prompter.py:103-134)."""
        from ..ops.warp import resize
        if image.ndim == 3:
            image = image[None]
        mean = jnp.asarray(self.pixel_mean, image.dtype).reshape(1, 3, 1, 1)
        std = jnp.asarray(self.pixel_std, image.dtype).reshape(1, 3, 1, 1)
        x = (image - mean) / std
        size = self.model.cfg.image_size
        h, w = x.shape[-2:]
        self._scale = size / max(h, w)
        nh, nw = round(h * self._scale), round(w * self._scale)
        x = resize(x, (nh, nw))
        return jnp.pad(x, ((0, 0), (0, 0), (0, size - nh), (0, size - nw)))

    def set_image(self, image: jax.Array) -> None:
        x = self.preprocess_image(image)
        self._embedding = encode_image(self.model.params, self.model.cfg, x)

    def reset_image(self) -> None:
        self._embedding = None

    @property
    def is_image_set(self) -> bool:
        return self._embedding is not None

    def predict(self, keypoints: jax.Array, keypoints_labels: jax.Array,
                boxes: Optional[jax.Array] = None,
                masks: Optional[jax.Array] = None,
                multimask_output: bool = True
                ) -> Tuple[jax.Array, jax.Array]:
        """keypoints (K, N, 2) in ORIGINAL image pixels; labels (K, N).
        Returns (logits (K, C, 256, 256), scores (K, C))."""
        if self._embedding is None:
            raise RuntimeError("call set_image first")
        p, cfg = self.model.params, self.model.cfg
        pts = keypoints * self._scale
        if boxes is not None:
            bpts, blbl = boxes_to_points(boxes * self._scale)
            pts = jnp.concatenate([pts, bpts], 1)
            keypoints_labels = jnp.concatenate(
                [keypoints_labels, blbl.astype(keypoints_labels.dtype)], 1)
        sparse = encode_points(p, cfg, pts, keypoints_labels,
                               pad=boxes is None)
        K = sparse.shape[0]
        dense = (encode_masks(p, masks) if masks is not None
                 else no_mask_embed(p, cfg, K))
        emb = jnp.broadcast_to(self._embedding,
                               (K,) + self._embedding.shape[1:])
        return decode_masks(p, cfg, emb, dense_pe(p, cfg), sparse, dense,
                            multimask_output)
