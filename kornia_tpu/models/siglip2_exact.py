"""SigLip2 full two-tower model — exact, weight-portable.

Reference behavior: kornia/models/siglip2/ —
- text_encoder.py:33 SigLip2TextModel (token+position embeddings,
  pre-norm layers, final LN, last-token pool + head)
- model.py:42 SigLip2Model (optional vision/text projections, clamped
  logit scale + bias, pairwise sigmoid logits; the diagonal-only loss
  variant model.py:221-222)
- vision side in models/siglip2_vision.py (shared with PaliGemma).

This is the weight-portable functional twin of the flax training model in
models/siglip2.py. Params keyed by the reference torch state_dict names;
parity in tests/test_siglip2_exact_parity.py.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .siglip2_vision import (SigLip2VisionModelConfig, vision_forward,
                             vision_param_specs)

__all__ = ["SigLip2Exact", "SigLip2ExactConfig", "SigLip2TextModelConfig",
           "text_forward", "init_params", "load_torch_weights"]


@dataclasses.dataclass(frozen=True)
class SigLip2TextModelConfig:
    vocab_size: int = 256000
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 64
    layer_norm_eps: float = 1e-6


@dataclasses.dataclass(frozen=True)
class SigLip2ExactConfig:
    vision: SigLip2VisionModelConfig = SigLip2VisionModelConfig()
    text: SigLip2TextModelConfig = SigLip2TextModelConfig()
    projection_dim: int = 768
    logit_scale_init: float = 2.6592
    logit_scale_max: float = 100.0


def text_param_specs(cfg: SigLip2TextModelConfig, prefix: str = ""):
    D = cfg.hidden_size
    s: Dict[str, tuple] = {}
    s[f"{prefix}embeddings.token_embedding.weight"] = (
        "raw", (cfg.vocab_size, D))
    s[f"{prefix}embeddings.position_embedding.weight"] = (
        "raw", (cfg.max_position_embeddings, D))
    for i in range(cfg.num_hidden_layers):
        b = f"{prefix}encoder.layers.{i}"
        for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
            s[f"{b}.self_attn.{proj}.weight"] = ("lin", (D, D))
            s[f"{b}.self_attn.{proj}.bias"] = ("raw", (D,))
        for n in ("layer_norm1", "layer_norm2"):
            s[f"{b}.{n}.weight"] = ("raw", (D,))
            s[f"{b}.{n}.bias"] = ("raw", (D,))
        s[f"{b}.mlp.fc1.weight"] = ("lin", (cfg.intermediate_size, D))
        s[f"{b}.mlp.fc1.bias"] = ("raw", (cfg.intermediate_size,))
        s[f"{b}.mlp.fc2.weight"] = ("lin", (D, cfg.intermediate_size))
        s[f"{b}.mlp.fc2.bias"] = ("raw", (D,))
    s[f"{prefix}final_layer_norm.weight"] = ("raw", (D,))
    s[f"{prefix}final_layer_norm.bias"] = ("raw", (D,))
    s[f"{prefix}head.weight"] = ("lin", (D, D))
    s[f"{prefix}head.bias"] = ("raw", (D,))
    return s


def _param_specs(cfg: SigLip2ExactConfig):
    s = vision_param_specs(cfg.vision, prefix="vision_model.")
    s.update(text_param_specs(cfg.text, prefix="text_model."))
    if cfg.projection_dim != cfg.vision.hidden_size:
        s["vision_projection.weight"] = (
            "lin", (cfg.projection_dim, cfg.vision.hidden_size))
        s["vision_projection.bias"] = ("raw", (cfg.projection_dim,))
    if cfg.projection_dim != cfg.text.hidden_size:
        s["text_projection.weight"] = (
            "lin", (cfg.projection_dim, cfg.text.hidden_size))
        s["text_projection.bias"] = ("raw", (cfg.projection_dim,))
    s["logit_scale"] = ("raw", ())
    s["logit_bias"] = ("raw", ())
    return s


def init_params(key: jax.Array, cfg: SigLip2ExactConfig,
                dtype=jnp.float32) -> Dict[str, jax.Array]:
    params: Dict[str, jax.Array] = {}
    for name, (kind, shape) in _param_specs(cfg).items():
        key, sub = jax.random.split(key)
        if name == "logit_scale":
            params[name] = jnp.asarray(cfg.logit_scale_init, dtype)
        elif name == "logit_bias":
            params[name] = jnp.zeros((), dtype)
        elif kind == "conv":
            o, i, kh, kw = shape
            std = (2.0 / (i * kh * kw)) ** 0.5
            params[name] = jax.random.normal(sub, (kh, kw, i, o), dtype) * std
        elif kind == "lin":
            o, i = shape
            bound = 1.0 / math.sqrt(i)
            params[name] = jax.random.uniform(sub, (i, o), dtype, -bound,
                                              bound)
        elif "position_embedding" in name or "token_embedding" in name \
                or name.endswith("probe"):
            params[name] = jax.random.normal(sub, shape, dtype)
        elif name.endswith(".weight"):
            params[name] = jnp.ones(shape, dtype)
        else:
            params[name] = jnp.zeros(shape, dtype)
    return params


def load_torch_weights(state_dict, cfg: Optional[SigLip2ExactConfig] = None
                       ) -> Dict[str, jax.Array]:
    cfg = cfg or SigLip2ExactConfig()
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


def text_forward(p, cfg: SigLip2TextModelConfig, input_ids: jax.Array,
                 attention_mask: Optional[jax.Array] = None,
                 position_ids: Optional[jax.Array] = None,
                 prefix: str = "") -> Tuple[jax.Array, jax.Array]:
    """(B, S) ids -> (pooled (B, D), last_hidden (B, S, D))
    (reference SigLip2TextModel.forward:215)."""
    eps = cfg.layer_norm_eps
    nh = cfg.num_attention_heads
    B, S = input_ids.shape
    tok = p[f"{prefix}embeddings.token_embedding.weight"][input_ids]
    if position_ids is None:
        position_ids = jnp.broadcast_to(jnp.arange(S)[None], (B, S))
    pos = p[f"{prefix}embeddings.position_embedding.weight"][position_ids]
    x = tok + pos
    allowed = None
    if attention_mask is not None:
        # attention.py:104-122 passes ~(m_q & m_k) as a BOOL attn_mask to
        # torch SDPA, where True means "attend" — i.e. the reference
        # attends exactly where at least one side is padded, and SDPA
        # zero-fills rows with no attendable key. Replicated verbatim.
        m = attention_mask.astype(bool)
        allowed = ~(m[:, None, :, None] & m[:, None, None, :])
    hd = cfg.hidden_size // nh
    for i in range(cfg.num_hidden_layers):
        b = f"{prefix}encoder.layers.{i}"
        h = _ln(p, f"{b}.layer_norm1", x, eps)
        q = _lin(p, f"{b}.self_attn.q_proj", h)
        k = _lin(p, f"{b}.self_attn.k_proj", h)
        v = _lin(p, f"{b}.self_attn.v_proj", h)
        q = q.reshape(B, S, nh, hd).transpose(0, 2, 1, 3)
        k = k.reshape(B, S, nh, hd).transpose(0, 2, 1, 3)
        v = v.reshape(B, S, nh, hd).transpose(0, 2, 1, 3)
        a = q @ k.transpose(0, 1, 3, 2) / math.sqrt(hd)
        if allowed is not None:
            w = jax.nn.softmax(jnp.where(allowed, a, -1e30), -1)
            w = jnp.where(jnp.any(allowed, -1, keepdims=True), w, 0.0)
        else:
            w = jax.nn.softmax(a, -1)
        o = (w @ v).transpose(0, 2, 1, 3)
        x = x + _lin(p, f"{b}.self_attn.out_proj", o.reshape(B, S, -1))
        h = _ln(p, f"{b}.layer_norm2", x, eps)
        h = _lin(p, f"{b}.mlp.fc2",
                 jax.nn.gelu(_lin(p, f"{b}.mlp.fc1", h), approximate=False))
        x = x + h
    x = _ln(p, f"{prefix}final_layer_norm", x, eps)
    pooled = _lin(p, f"{prefix}head", x[:, -1])
    return pooled, x


class SigLip2Exact:
    """Two-tower model with the reference's forward contract
    (model.py:173-231)."""

    def __init__(self, cfg: Optional[SigLip2ExactConfig] = None,
                 params=None, key: Optional[jax.Array] = None):
        self.cfg = cfg or SigLip2ExactConfig()
        self._params = params
        self._key = key if key is not None else jax.random.PRNGKey(0)

    @property
    def params(self):
        if self._params is None:
            self._params = init_params(self._key, self.cfg)
        return self._params

    def get_image_features(self, pixel_values: jax.Array,
                           normalize: bool = True) -> jax.Array:
        p = self.params
        pooled, _ = vision_forward(p, self.cfg.vision, pixel_values,
                                   prefix="vision_model.")
        if "vision_projection.weight" in p:
            pooled = _lin(p, "vision_projection", pooled)
        if normalize:
            pooled = pooled / jnp.linalg.norm(pooled, axis=-1,
                                              keepdims=True)
        return pooled

    def get_text_features(self, input_ids: jax.Array,
                          attention_mask: Optional[jax.Array] = None,
                          position_ids: Optional[jax.Array] = None,
                          normalize: bool = True) -> jax.Array:
        p = self.params
        pooled, _ = text_forward(p, self.cfg.text, input_ids,
                                 attention_mask, position_ids,
                                 prefix="text_model.")
        if "text_projection.weight" in p:
            pooled = _lin(p, "text_projection", pooled)
        if normalize:
            pooled = pooled / jnp.linalg.norm(pooled, axis=-1,
                                              keepdims=True)
        return pooled

    def __call__(self, pixel_values: Optional[jax.Array] = None,
                 input_ids: Optional[jax.Array] = None,
                 attention_mask: Optional[jax.Array] = None) -> Dict:
        p = self.params
        img = (self.get_image_features(pixel_values)
               if pixel_values is not None else None)
        txt = (self.get_text_features(input_ids, attention_mask)
               if input_ids is not None else None)
        scale = jnp.exp(jnp.clip(p["logit_scale"], 0.0,
                                 math.log(self.cfg.logit_scale_max)))
        out = {"image_embeds": img, "text_embeds": txt,
               "logit_scale": scale, "logits_per_image": None,
               "logits_per_text": None}
        if img is not None and txt is not None:
            lt = txt @ img.T * scale + p["logit_bias"]
            out["logits_per_text"] = lt
            out["logits_per_image"] = lt.T
        return out
