"""SigLIP2-style two-tower image-text model, TPU-native.

Reference behavior: kornia/models/siglip2/ (model.py:58 SigLip2Model with
sigmoid-contrastive logits logit_scale/logit_bias; vision_encoder.py:39
patch-conv embeddings + pre-LN transformer + multihead-attention-pooling
probe head:160; text_encoder.py:33 embeddings + transformer + final LN +
last-token pool + head; config.py defaults).

TPU-first redesign (NOT a port):
- One flax module per tower (NHWC patchify via strided conv = one MXU
  matmul per image); attention through
  `nn.MultiHeadDotProductAttention` so XLA picks fused TPU attention.
- The contrastive loss is computed from the full pairwise logit matrix —
  on a device mesh the B x B matrix shards over `data` via einsum; a
  `positive_only` flag reproduces the reference's diagonal-only variant
  (model.py:233-237).
- bf16-friendly: params stay f32, activations cast via `dtype`.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from .common import nchw_to_nhwc

__all__ = ["SigLip2VisionConfig", "SigLip2TextConfig", "SigLip2Config",
           "SigLip2VisionTower", "SigLip2TextTower", "SigLip2Model",
           "SigLip2", "siglip_loss"]


@dataclasses.dataclass(frozen=True)
class SigLip2VisionConfig:
    image_size: int = 224
    patch_size: int = 16
    num_channels: int = 3
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    layer_norm_eps: float = 1e-6


@dataclasses.dataclass(frozen=True)
class SigLip2TextConfig:
    vocab_size: int = 256000
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    layer_norm_eps: float = 1e-6


@dataclasses.dataclass(frozen=True)
class SigLip2Config:
    vision: SigLip2VisionConfig = SigLip2VisionConfig()
    text: SigLip2TextConfig = SigLip2TextConfig()
    projection_dim: int = 768
    logit_scale_init: float = 2.6592  # log(1/0.07), config.py
    logit_bias_init: float = -10.0
    logit_scale_max_log: float = 4.6052  # log(100)

    @classmethod
    def tiny(cls) -> "SigLip2Config":
        """Small config for tests / random-init experiments."""
        return cls(
            vision=SigLip2VisionConfig(image_size=32, patch_size=8,
                                       hidden_size=64, num_hidden_layers=2,
                                       num_attention_heads=4,
                                       intermediate_size=128),
            text=SigLip2TextConfig(vocab_size=1000, hidden_size=64,
                                   num_hidden_layers=2, num_attention_heads=4,
                                   intermediate_size=128,
                                   max_position_embeddings=32),
            projection_dim=64,
        )


class _EncoderLayer(nn.Module):
    """Pre-LN transformer block with optional key padding mask."""

    heads: int
    mlp_dim: int
    eps: float = 1e-6
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None):
        h = nn.LayerNorm(epsilon=self.eps, dtype=self.dtype)(x)
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.heads, dtype=self.dtype)(h, h, mask=mask)
        x = x + h
        h = nn.LayerNorm(epsilon=self.eps, dtype=self.dtype)(x)
        h = nn.Dense(self.mlp_dim, dtype=self.dtype)(h)
        h = nn.gelu(h, approximate=True)
        h = nn.Dense(x.shape[-1], dtype=self.dtype)(h)
        return x + h


def _key_mask(attention_mask: Optional[jax.Array], q_len: int
              ) -> Optional[jax.Array]:
    """(B, S) 1/0 -> (B, 1, q_len, S) boolean attention mask."""
    if attention_mask is None:
        return None
    m = attention_mask.astype(bool)[:, None, None, :]
    return jnp.broadcast_to(m, (m.shape[0], 1, q_len, m.shape[-1]))


class SigLip2VisionTower(nn.Module):
    """Patchify + transformer + attention-pool probe (vision_encoder.py)."""

    cfg: SigLip2VisionConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images):  # (B, H, W, 3)
        c = self.cfg
        p = c.patch_size
        x = nn.Conv(c.hidden_size, (p, p), strides=(p, p), dtype=self.dtype,
                    name="patch_embed")(images)
        B, h, w, D = x.shape
        x = x.reshape(B, h * w, D)
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (h * w, c.hidden_size))
        x = x + pos.astype(self.dtype)
        for i in range(c.num_hidden_layers):
            x = _EncoderLayer(c.num_attention_heads, c.intermediate_size,
                              c.layer_norm_eps, self.dtype,
                              name=f"layer{i}")(x)
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype,
                         name="post_ln")(x)
        # attention pooling with a learned probe (vision_encoder.py:160)
        probe = self.param("probe", nn.initializers.normal(0.02),
                           (1, 1, c.hidden_size)).astype(self.dtype)
        probe = jnp.broadcast_to(probe, (B, 1, c.hidden_size))
        pooled = nn.MultiHeadDotProductAttention(
            num_heads=c.num_attention_heads, dtype=self.dtype,
            name="pool_attn")(probe, x)
        res = pooled
        pooled = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype,
                              name="pool_ln")(pooled)
        h2 = nn.Dense(c.intermediate_size, dtype=self.dtype,
                      name="pool_mlp1")(pooled)
        h2 = nn.gelu(h2, approximate=True)
        pooled = res + nn.Dense(c.hidden_size, dtype=self.dtype,
                                name="pool_mlp2")(h2)
        return pooled[:, 0], x  # (B, D) pooled, (B, N, D) tokens


class SigLip2TextTower(nn.Module):
    """Token+pos embeddings + transformer + last-token head
    (text_encoder.py)."""

    cfg: SigLip2TextConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, input_ids, attention_mask=None, position_ids=None):
        c = self.cfg
        B, S = input_ids.shape
        tok = nn.Embed(c.vocab_size, c.hidden_size, dtype=self.dtype,
                       name="token_embed")(input_ids)
        if position_ids is None:
            position_ids = jnp.arange(S)[None]
        pos = nn.Embed(c.max_position_embeddings, c.hidden_size,
                       dtype=self.dtype, name="pos_embed")(position_ids)
        x = tok + pos
        mask = _key_mask(attention_mask, S)
        for i in range(c.num_hidden_layers):
            x = _EncoderLayer(c.num_attention_heads, c.intermediate_size,
                              c.layer_norm_eps, self.dtype,
                              name=f"layer{i}")(x, mask)
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype,
                         name="final_ln")(x)
        pooled = x[:, -1]  # last-token pool (text_encoder.py:249)
        pooled = nn.Dense(c.hidden_size, dtype=self.dtype,
                          name="head")(pooled)
        return pooled, x


def siglip_loss(logits_per_text: jax.Array,
                positive_only: bool = False) -> jax.Array:
    """Sigmoid contrastive loss over the pairwise logit matrix.

    `positive_only=True` reproduces the reference's diagonal-only variant
    (model.py:233-237); the default is the full SigLIP loss with -1 labels
    on off-diagonal pairs (Zhai et al. 2023).
    """
    B = logits_per_text.shape[0]
    if positive_only:
        diag = jnp.diagonal(logits_per_text)
        return -jnp.mean(jax.nn.log_sigmoid(diag))
    z = 2.0 * jnp.eye(B, dtype=logits_per_text.dtype) - 1.0
    return -jnp.mean(jnp.sum(jax.nn.log_sigmoid(z * logits_per_text), -1))


class SigLip2Model(nn.Module):
    """Two-tower model with sigmoid-contrastive logits (model.py:58)."""

    cfg: SigLip2Config
    dtype: Any = jnp.float32

    def setup(self):
        self.vision = SigLip2VisionTower(self.cfg.vision, self.dtype)
        self.text = SigLip2TextTower(self.cfg.text, self.dtype)
        self.logit_scale = self.param(
            "logit_scale",
            lambda k: jnp.asarray(self.cfg.logit_scale_init, jnp.float32))
        self.logit_bias = self.param(
            "logit_bias",
            lambda k: jnp.asarray(self.cfg.logit_bias_init, jnp.float32))

    def encode_image(self, images, normalize=True):
        emb, _ = self.vision(images)
        if normalize:
            emb = emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)
        return emb

    def encode_text(self, input_ids, attention_mask=None, normalize=True):
        emb, _ = self.text(input_ids, attention_mask)
        if normalize:
            emb = emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)
        return emb

    def __call__(self, images, input_ids, attention_mask=None,
                 return_loss=False, positive_only_loss=False):
        img = self.encode_image(images)
        txt = self.encode_text(input_ids, attention_mask)
        scale = jnp.exp(jnp.clip(self.logit_scale, 0.0,
                                 self.cfg.logit_scale_max_log))
        logits_per_text = txt @ img.T * scale + self.logit_bias
        out = {
            "image_embeds": img,
            "text_embeds": txt,
            "logit_scale": scale,
            "logits_per_text": logits_per_text,
            "logits_per_image": logits_per_text.T,
        }
        if return_loss:
            out["loss"] = siglip_loss(logits_per_text, positive_only_loss)
        return out


class SigLip2:
    """Facade: (B, 3, H, W) images in [0, 1] + (B, S) token ids.

    Random-init architecture; real checkpoints port through the validated
    torch->JAX converter path (tests/test_weight_port.py) once weights are
    available (no egress in this environment).
    """

    def __init__(self, cfg: Optional[SigLip2Config] = None,
                 params: Optional[dict] = None, dtype: Any = jnp.float32,
                 key: Optional[jax.Array] = None):
        self.cfg = cfg or SigLip2Config()
        self.model = SigLip2Model(self.cfg, dtype)
        self.params = params
        self._key = key if key is not None else jax.random.PRNGKey(0)

    def init(self):
        v = self.cfg.vision
        dummy_img = jnp.zeros((1, v.image_size, v.image_size, 3))
        dummy_ids = jnp.zeros((1, 8), jnp.int32)
        self.params = self.model.init(self._key, dummy_img, dummy_ids)
        return self.params

    def __call__(self, images, input_ids, attention_mask=None,
                 return_loss=False):
        if self.params is None:
            self.init()
        x = nchw_to_nhwc(images) if images.ndim == 4 and \
            images.shape[1] in (1, 3) else images
        if x.shape[-1] == 1:
            x = jnp.broadcast_to(x, x.shape[:-1] + (3,))
        return self.model.apply(self.params, x, input_ids, attention_mask,
                                return_loss)
