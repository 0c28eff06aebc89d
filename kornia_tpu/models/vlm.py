"""Generative vision-language model scaffold, TPU-native.

Reference behavior: kornia/models/paligemma/modeling_paligemma.py
(GemmaRMSNorm:31, GemmaRotaryEmbedding:58, GemmaMLP:115 gated GeGLU,
GemmaAttention:141 GQA, GemmaDecoderLayer:227, PaliGemma:273 — SigLIP
vision tower + linear multimodal projector + decoder LM with full
attention over the image+prompt prefix), and the same pattern in
qwen25/qwen2_vl.py:245, smolvlm2/, kimi_vl/.

TPU-first redesign (NOT a port):
- Decode is a `lax.scan` over a PREALLOCATED static-length KV cache
  updated with `dynamic_update_slice` — no dynamic shapes, one compiled
  executable for prefill and one for all decode steps.
- Attention/MLP are einsums that shard over a mesh ("model" axis on heads
  / mlp dim) — the multichip path is the same code with sharded params.
- GQA via head-grouped einsum, RoPE precomputed per chunk; embeddings
  scaled by sqrt(hidden) and RMSNorm uses the (1 + w) Gemma weight form.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .common import nchw_to_nhwc
from .siglip2 import SigLip2VisionConfig, SigLip2VisionTower

__all__ = ["DecoderConfig", "VLMConfig", "DecoderLM", "VLMModel", "VLM"]


@dataclasses.dataclass(frozen=True)
class DecoderConfig:
    vocab_size: int = 257216
    hidden_size: int = 2048
    num_layers: int = 18
    num_heads: int = 8
    num_kv_heads: int = 1
    head_dim: int = 256
    mlp_dim: int = 16384
    rope_theta: float = 10000.0
    norm_eps: float = 1e-6

    @classmethod
    def tiny(cls) -> "DecoderConfig":
        return cls(vocab_size=512, hidden_size=64, num_layers=2, num_heads=4,
                   num_kv_heads=2, head_dim=16, mlp_dim=128)


@dataclasses.dataclass(frozen=True)
class VLMConfig:
    vision: SigLip2VisionConfig = SigLip2VisionConfig()
    decoder: DecoderConfig = DecoderConfig()
    max_seq_len: int = 1024

    @classmethod
    def tiny(cls) -> "VLMConfig":
        return cls(
            vision=SigLip2VisionConfig(image_size=32, patch_size=8,
                                       hidden_size=64, num_hidden_layers=2,
                                       num_attention_heads=4,
                                       intermediate_size=128),
            decoder=DecoderConfig.tiny(),
            max_seq_len=64,
        )


class RMSNorm(nn.Module):
    """Gemma RMSNorm: x * rsqrt(mean x^2) * (1 + w) (modeling:31)."""

    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        w = self.param("weight", nn.initializers.zeros, (x.shape[-1],))
        var = jnp.mean(jnp.square(x.astype(jnp.float32)), -1, keepdims=True)
        y = x.astype(jnp.float32) * jax.lax.rsqrt(var + self.eps)
        return (y * (1.0 + w)).astype(x.dtype)


def _rope(x: jax.Array, positions: jax.Array, theta: float) -> jax.Array:
    """Rotary embedding on (B, T, H, Dh); positions (B, T)."""
    Dh = x.shape[-1]
    half = Dh // 2
    freq = theta ** (-jnp.arange(0, half, dtype=jnp.float32) / half)
    ang = positions[..., None].astype(jnp.float32) * freq  # (B, T, half)
    cos = jnp.cos(ang)[:, :, None, :].astype(x.dtype)
    sin = jnp.sin(ang)[:, :, None, :].astype(x.dtype)
    x1, x2 = x[..., :half], x[..., half:]
    return jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], -1)


class _DecoderLayer(nn.Module):
    cfg: DecoderConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, k_cache, v_cache, positions, start, mask):
        """x (B, T, D); k/v_cache (B, S, KH, Dh); mask (B, T, S) bool.

        Writes this chunk's K/V at [start, start+T) and attends to the
        full cache under `mask`. Returns (y, k_cache, v_cache).
        """
        c = self.cfg
        B, T, D = x.shape
        H, KH, Dh = c.num_heads, c.num_kv_heads, c.head_dim
        h = RMSNorm(c.norm_eps, name="ln_attn")(x)
        q = nn.DenseGeneral((H, Dh), use_bias=False, dtype=self.dtype,
                            name="q")(h)
        k = nn.DenseGeneral((KH, Dh), use_bias=False, dtype=self.dtype,
                            name="k")(h)
        v = nn.DenseGeneral((KH, Dh), use_bias=False, dtype=self.dtype,
                            name="v")(h)
        q = _rope(q, positions, c.rope_theta)
        k = _rope(k, positions, c.rope_theta)
        k_cache = jax.lax.dynamic_update_slice(k_cache, k, (0, start, 0, 0))
        v_cache = jax.lax.dynamic_update_slice(v_cache, v, (0, start, 0, 0))

        # GQA: group H query heads over KH kv heads
        g = H // KH
        qg = q.reshape(B, T, KH, g, Dh)
        logits = jnp.einsum("btkgd,bskd->btkgs", qg, k_cache,
                            preferred_element_type=jnp.float32)
        logits = logits / jnp.sqrt(Dh).astype(logits.dtype)
        logits = jnp.where(mask[:, :, None, None, :], logits, -1e30)
        attn = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
        out = jnp.einsum("btkgs,bskd->btkgd", attn, v_cache)
        out = out.reshape(B, T, H * Dh)
        x = x + nn.Dense(D, use_bias=False, dtype=self.dtype, name="o")(out)

        h = RMSNorm(c.norm_eps, name="ln_mlp")(x)
        gate = nn.Dense(c.mlp_dim, use_bias=False, dtype=self.dtype,
                        name="gate")(h)
        up = nn.Dense(c.mlp_dim, use_bias=False, dtype=self.dtype,
                      name="up")(h)
        h = nn.gelu(gate, approximate=True) * up
        x = x + nn.Dense(D, use_bias=False, dtype=self.dtype, name="down")(h)
        return x, k_cache, v_cache


class DecoderLM(nn.Module):
    """Decoder-only LM over embeddings (Gemma-style)."""

    cfg: DecoderConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, emb, k_caches, v_caches, positions, start, mask):
        """emb (B, T, D) already-projected input embeddings;
        k/v_caches (L, B, S, KH, Dh). Returns (logits, k_caches, v_caches).
        """
        c = self.cfg
        x = emb * jnp.sqrt(c.hidden_size).astype(emb.dtype)
        ks, vs = [], []
        for i in range(c.num_layers):
            x, knew, vnew = _DecoderLayer(c, self.dtype, name=f"layer{i}")(
                x, k_caches[i], v_caches[i], positions, start, mask)
            ks.append(knew)
            vs.append(vnew)
        x = RMSNorm(c.norm_eps, name="final_ln")(x)
        logits = nn.Dense(c.vocab_size, use_bias=False, dtype=self.dtype,
                          name="lm_head")(x)
        return logits, jnp.stack(ks), jnp.stack(vs)

    def embed(self, tokens):
        emb = nn.Embed(self.cfg.vocab_size, self.cfg.hidden_size,
                       dtype=self.dtype, name="tok_embed")(tokens)
        return emb


class VLMModel(nn.Module):
    """Vision tower + projector + decoder (PaliGemma:273 pattern)."""

    cfg: VLMConfig
    dtype: Any = jnp.float32

    def setup(self):
        self.vision = SigLip2VisionTower(self.cfg.vision, self.dtype)
        self.projector = nn.Dense(self.cfg.decoder.hidden_size,
                                  use_bias=True, dtype=self.dtype,
                                  name="mm_projector")
        self.lm = DecoderLM(self.cfg.decoder, self.dtype)
        self.tok_embed = nn.Embed(self.cfg.decoder.vocab_size,
                                  self.cfg.decoder.hidden_size,
                                  dtype=self.dtype, name="tok_embed")

    def image_tokens(self, images):
        _, tokens = self.vision(images)  # (B, N, Dv)
        return self.projector(tokens)    # (B, N, D)

    def prefill(self, images, prompt_ids, k_caches, v_caches):
        """Full attention over [image tokens; prompt] prefix
        (modeling_paligemma.py: prefix is bidirectional)."""
        img = self.image_tokens(images)
        txt = self.tok_embed(prompt_ids)
        emb = jnp.concatenate([img, txt], axis=1)
        B, T, _ = emb.shape
        S = k_caches.shape[2]
        positions = jnp.broadcast_to(jnp.arange(T)[None], (B, T))
        # prefix-LM mask: every prefix token sees the whole prefix
        mask = jnp.broadcast_to((jnp.arange(S) < T)[None, None], (B, T, S))
        return self.lm(emb, k_caches, v_caches, positions, 0, mask) + (T,)

    def decode_step(self, token, k_caches, v_caches, pos):
        """One greedy step: token (B, 1) at absolute position pos."""
        emb = self.tok_embed(token)
        B = token.shape[0]
        S = k_caches.shape[2]
        positions = jnp.broadcast_to(pos[None, None], (B, 1)).astype(jnp.int32)
        mask = jnp.broadcast_to((jnp.arange(S) <= pos)[None, None], (B, 1, S))
        return self.lm(emb, k_caches, v_caches, positions, pos, mask)


class VLM:
    """Image + prompt -> greedy-decoded token ids.

    `generate(images (B, 3, H, W), prompt_ids (B, P), max_new_tokens)`
    returns (B, max_new_tokens) int32 tokens. Random init; real VLM
    checkpoints (paligemma/qwen2-vl/smolvlm) port through the validated
    torch->JAX converter path once weights are available (no egress).
    """

    def __init__(self, cfg: Optional[VLMConfig] = None,
                 params: Optional[dict] = None, dtype: Any = jnp.float32,
                 key: Optional[jax.Array] = None):
        self.cfg = cfg or VLMConfig.tiny()
        self.model = VLMModel(self.cfg, dtype)
        self.params = params
        self._key = key if key is not None else jax.random.PRNGKey(0)
        self._dtype = dtype

    def _caches(self, B: int):
        d = self.cfg.decoder
        shape = (d.num_layers, B, self.cfg.max_seq_len, d.num_kv_heads,
                 d.head_dim)
        return jnp.zeros(shape, self._dtype), jnp.zeros(shape, self._dtype)

    def init(self, B: int = 1, prompt_len: int = 4):
        v = self.cfg.vision
        img = jnp.zeros((B, v.image_size, v.image_size, 3), self._dtype)
        ids = jnp.zeros((B, prompt_len), jnp.int32)
        k, vv = self._caches(B)
        self.params = self.model.init(self._key, img, ids, k, vv,
                                      method=VLMModel.prefill)
        return self.params

    def generate(self, images: jax.Array, prompt_ids: jax.Array,
                 max_new_tokens: int = 16) -> jax.Array:
        B = images.shape[0]
        x = nchw_to_nhwc(images) if images.shape[1] in (1, 3) else images
        if x.shape[-1] == 1:
            x = jnp.broadcast_to(x, x.shape[:-1] + (3,))
        if self.params is None:
            self.init(B, prompt_ids.shape[1])
        k, v = self._caches(B)
        logits, k, v, T = self.model.apply(self.params, x, prompt_ids, k, v,
                                           method=VLMModel.prefill)
        first = jnp.argmax(logits[:, -1], -1)[:, None].astype(jnp.int32)

        def step(carry, _):
            tok, k, v, pos = carry
            logits, k, v = self.model.apply(self.params, tok, k, v, pos,
                                            method=VLMModel.decode_step)
            nxt = jnp.argmax(logits[:, -1], -1)[:, None].astype(jnp.int32)
            return (nxt, k, v, pos + 1), tok[:, 0]

        (_, _, _, _), toks = jax.lax.scan(
            step, (first, k, v, jnp.asarray(T, jnp.int32)), None,
            length=max_new_tokens)
        return toks.T  # (B, max_new_tokens)
