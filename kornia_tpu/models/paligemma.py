"""PaliGemma (SigLip2 vision tower + Gemma decoder) — exact architecture,
TPU-native.

Reference behavior: kornia/models/paligemma/modeling_paligemma.py —
GemmaRMSNorm:31 (zero-init weight, out * (1 + w)), rotary embedding
:58-112, GeGLU GemmaMLP:115, grouped-query GemmaAttention:141 (kv-head
repeat, SDPA scale 1/sqrt(head_dim)), GemmaDecoderLayer:227, PaliGemma:273
(vision tower last_hidden -> linear projector -> prepend to text
embeddings -> decoder -> lm_head); configuration_paligemma.py defaults
(2048 hidden / 18 layers / 8 heads / 1 kv head / head_dim 256).

Flat param dict keyed by the reference torch state_dict names (the vision
tower nests under "vision_tower.", matching the torch module); parity in
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

from .siglip2_vision import (SigLip2VisionModelConfig,
                             init_params as _vision_init,
                             load_torch_weights as _vision_load,
                             vision_forward)

__all__ = ["PaliGemma", "PaliGemmaConfig", "init_params",
           "load_torch_weights"]


@dataclasses.dataclass(frozen=True)
class PaliGemmaConfig:
    vision: SigLip2VisionModelConfig = SigLip2VisionModelConfig()
    vocab_size: int = 257152
    hidden_size: int = 2048
    intermediate_size: int = 16384
    num_hidden_layers: int = 18
    num_attention_heads: int = 8
    num_key_value_heads: int = 1
    head_dim: int = 256
    rope_theta: float = 10000.0


def _param_specs(cfg: PaliGemmaConfig):
    D = cfg.hidden_size
    s: Dict[str, tuple] = {}
    s["multi_modal_projector.weight"] = ("lin", (D, cfg.vision.hidden_size))
    s["multi_modal_projector.bias"] = ("raw", (D,))
    s["embed_tokens.weight"] = ("raw", (cfg.vocab_size, D))
    qd = cfg.num_attention_heads * cfg.head_dim
    kvd = cfg.num_key_value_heads * cfg.head_dim
    for i in range(cfg.num_hidden_layers):
        b = f"layers.{i}"
        s[f"{b}.self_attn.q_proj.weight"] = ("lin", (qd, D))
        s[f"{b}.self_attn.k_proj.weight"] = ("lin", (kvd, D))
        s[f"{b}.self_attn.v_proj.weight"] = ("lin", (kvd, D))
        s[f"{b}.self_attn.o_proj.weight"] = ("lin", (D, qd))
        s[f"{b}.mlp.gate_proj.weight"] = ("lin", (cfg.intermediate_size, D))
        s[f"{b}.mlp.up_proj.weight"] = ("lin", (cfg.intermediate_size, D))
        s[f"{b}.mlp.down_proj.weight"] = ("lin", (D, cfg.intermediate_size))
        s[f"{b}.input_layernorm.weight"] = ("raw", (D,))
        s[f"{b}.post_attention_layernorm.weight"] = ("raw", (D,))
    s["norm.weight"] = ("raw", (D,))
    s["lm_head.weight"] = ("lin", (cfg.vocab_size, D))
    return s


def init_params(key: jax.Array, cfg: PaliGemmaConfig,
                dtype=jnp.float32) -> Dict[str, jax.Array]:
    key, vk = jax.random.split(key)
    params = _vision_init(vk, cfg.vision, prefix="vision_tower.",
                          dtype=dtype)
    for name, (kind, shape) in _param_specs(cfg).items():
        key, sub = jax.random.split(key)
        if kind == "lin":
            o, i = shape
            params[name] = jax.random.normal(sub, (i, o), dtype) * 0.02
        elif name == "embed_tokens.weight":
            params[name] = jax.random.normal(sub, shape, dtype) * 0.02
        else:  # RMSNorm weights are ZERO-init (out * (1 + w)); biases zero
            params[name] = jnp.zeros(shape, dtype)
    return params


def load_torch_weights(state_dict, cfg: Optional[PaliGemmaConfig] = None
                       ) -> Dict[str, jax.Array]:
    cfg = cfg or PaliGemmaConfig()
    params = _vision_load(state_dict, cfg.vision, prefix="vision_tower.")
    for k, (kind, shape) in _param_specs(cfg).items():
        v = state_dict[k]
        v = np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach")
                       else v)
        assert v.shape == tuple(shape), (k, v.shape, shape)
        params[k] = jnp.asarray(v.T) if kind == "lin" else jnp.asarray(v)
    return params


def _rms_norm(p, name, x, eps=1e-6):
    """GemmaRMSNorm (modeling_paligemma.py:31-55): f32 norm, * (1 + w)."""
    xf = x.astype(jnp.float32)
    n = xf * lax.rsqrt(jnp.mean(jnp.square(xf), -1, keepdims=True) + eps)
    return n.astype(x.dtype) * (1.0 + p[name].astype(x.dtype))


def _rope_tables(position_ids, head_dim, theta, dtype):
    """(B, N) -> cos/sin (B, N, head_dim) (modeling_paligemma.py:76-94)."""
    inv = 1.0 / theta ** (np.arange(0, head_dim, 2, dtype=np.float32)
                          / head_dim)
    freqs = position_ids[..., None].astype(jnp.float32) * jnp.asarray(inv)
    emb = jnp.concatenate([freqs, freqs], -1)
    return jnp.cos(emb).astype(dtype), jnp.sin(emb).astype(dtype)


def _rotate_half(x):
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], -1)


def decode(p, cfg: PaliGemmaConfig, inputs_embeds: jax.Array,
           position_ids: Optional[jax.Array] = None,
           attention_mask: Optional[jax.Array] = None) -> jax.Array:
    """Gemma decoder stack over embeddings (B, N, D) -> logits
    (B, N, vocab) (modeling_paligemma.py:349-361)."""
    B, N, D = inputs_embeds.shape
    if position_ids is None:
        position_ids = jnp.broadcast_to(jnp.arange(N)[None], (B, N))
    cos, sin = _rope_tables(position_ids, cfg.head_dim, cfg.rope_theta,
                            inputs_embeds.dtype)
    cos, sin = cos[:, None], sin[:, None]  # (B, 1, N, head_dim)
    nh, nkv, hd = (cfg.num_attention_heads, cfg.num_key_value_heads,
                   cfg.head_dim)
    x = inputs_embeds
    for i in range(cfg.num_hidden_layers):
        b = f"layers.{i}"
        h = _rms_norm(p, f"{b}.input_layernorm.weight", x)
        q = (h @ p[f"{b}.self_attn.q_proj.weight"].astype(h.dtype)
             ).reshape(B, N, nh, hd).transpose(0, 2, 1, 3)
        k = (h @ p[f"{b}.self_attn.k_proj.weight"].astype(h.dtype)
             ).reshape(B, N, nkv, hd).transpose(0, 2, 1, 3)
        v = (h @ p[f"{b}.self_attn.v_proj.weight"].astype(h.dtype)
             ).reshape(B, N, nkv, hd).transpose(0, 2, 1, 3)
        q = q * cos + _rotate_half(q) * sin
        k = k * cos + _rotate_half(k) * sin
        k = jnp.repeat(k, nh // nkv, axis=1)
        v = jnp.repeat(v, nh // nkv, axis=1)
        logits = q @ k.transpose(0, 1, 3, 2) / math.sqrt(hd)
        if attention_mask is not None:
            logits = logits + attention_mask.astype(logits.dtype)
        o = (jax.nn.softmax(logits, -1) @ v
             ).transpose(0, 2, 1, 3).reshape(B, N, nh * hd)
        x = x + o @ p[f"{b}.self_attn.o_proj.weight"].astype(o.dtype)
        h = _rms_norm(p, f"{b}.post_attention_layernorm.weight", x)
        gate = jax.nn.gelu(
            h @ p[f"{b}.mlp.gate_proj.weight"].astype(h.dtype),
            approximate=False)
        up = h @ p[f"{b}.mlp.up_proj.weight"].astype(h.dtype)
        x = x + (gate * up) @ p[f"{b}.mlp.down_proj.weight"].astype(h.dtype)
    x = _rms_norm(p, "norm.weight", x)
    return x @ p["lm_head.weight"].astype(x.dtype)


def forward(p, cfg: PaliGemmaConfig, input_ids: jax.Array,
            pixel_values: jax.Array,
            attention_mask: Optional[jax.Array] = None,
            position_ids: Optional[jax.Array] = None) -> jax.Array:
    """(B, S) tokens + (B, 3, H, W) images -> logits (B, N_img + S, vocab)
    (reference PaliGemma.forward:310)."""
    _, last_hidden = vision_forward(p, cfg.vision, pixel_values,
                                    prefix="vision_tower.")
    img = last_hidden @ p["multi_modal_projector.weight"].astype(
        last_hidden.dtype) + p["multi_modal_projector.bias"].astype(
        last_hidden.dtype)
    txt = p["embed_tokens.weight"].astype(img.dtype)[input_ids]
    embeds = jnp.concatenate([img, txt], 1)
    return decode(p, cfg, embeds, position_ids, attention_mask)


class PaliGemma:
    """Thin stateful wrapper mirroring the reference class API."""

    def __init__(self, cfg: Optional[PaliGemmaConfig] = None, params=None,
                 key: Optional[jax.Array] = None):
        self.cfg = cfg or PaliGemmaConfig()
        self._params = params
        self._key = key if key is not None else jax.random.PRNGKey(0)

    @property
    def params(self):
        if self._params is None:
            self._params = init_params(self._key, self.cfg)
        return self._params

    def __call__(self, input_ids: jax.Array, pixel_values: jax.Array,
                 attention_mask: Optional[jax.Array] = None,
                 position_ids: Optional[jax.Array] = None) -> jax.Array:
        return forward(self.params, self.cfg, input_ids, pixel_values,
                       attention_mask, position_ids)
