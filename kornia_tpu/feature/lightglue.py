"""LightGlue-style attention matcher
(reference: kornia/feature/lightglue.py:932 — rotary position encoding,
interleaved self/cross attention, matchability-weighted dual-softmax
assignment with dustbins; LightGlue.forward:677).

TPU-first: fixed-N keypoint sets with validity masks; the reference's
adaptive depth/width pruning (data-dependent early exit) is replaced by a
static depth — on TPU the whole-batch matmuls are cheap and early exit
would force recompilation.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = ["LightGlue", "LightGlueConfig"]


class LightGlueConfig:
    def __init__(self, dim: int = 256, num_heads: int = 4,
                 num_layers: int = 9, input_dim: int = 128):
        self.dim = dim
        self.num_heads = num_heads
        self.num_layers = num_layers
        self.input_dim = input_dim


def _rotary_embed(kpts: jax.Array, dim: int) -> Tuple[jax.Array, jax.Array]:
    """2D rotary encoding of normalized keypoints (reference:
    lightglue.py LearnableFourierPositionalEncoding simplified to fixed
    frequencies). Returns (cos, sin) of shape (B, N, dim//2)."""
    d4 = dim // 4
    freqs = jnp.exp(jnp.linspace(0.0, 3.0, d4))
    ang_x = kpts[..., 0:1] * freqs
    ang_y = kpts[..., 1:2] * freqs
    ang = jnp.concatenate([ang_x, ang_y], axis=-1)  # (B, N, dim/2)
    return jnp.cos(ang), jnp.sin(ang)


def _apply_rotary(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """x: (B, N, h, d); rotate feature pairs."""
    B, N, h, d = x.shape
    x1 = x[..., 0::2]
    x2 = x[..., 1::2]
    c = cos[:, :, None, :]
    s = sin[:, :, None, :]
    out1 = x1 * c - x2 * s
    out2 = x1 * s + x2 * c
    return jnp.stack([out1, out2], axis=-1).reshape(B, N, h, d)


class _Attention(nn.Module):
    dim: int
    num_heads: int
    rotary: bool = False

    @nn.compact
    def __call__(self, x, source, mask_src, cos_q=None, sin_q=None,
                 cos_k=None, sin_k=None):
        B, N, _ = x.shape
        M = source.shape[1]
        h = self.num_heads
        d = self.dim // h
        q = nn.Dense(self.dim)(x).reshape(B, N, h, d)
        k = nn.Dense(self.dim)(source).reshape(B, M, h, d)
        v = nn.Dense(self.dim)(source).reshape(B, M, h, d)
        if self.rotary:
            q = _apply_rotary(q, cos_q, sin_q)
            k = _apply_rotary(k, cos_k, sin_k)
        logits = jnp.einsum("bnhd,bmhd->bhnm", q, k) / jnp.sqrt(d)
        logits = jnp.where(mask_src[:, None, None, :], logits, -1e9)
        attn = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(B, N, self.dim)
        return nn.Dense(self.dim)(out)


class _GlueLayer(nn.Module):
    dim: int
    num_heads: int

    @nn.compact
    def __call__(self, x0, x1, m0, m1, rot0, rot1):
        cos0, sin0 = rot0
        cos1, sin1 = rot1
        # self attention (rotary)
        sa = _Attention(self.dim, self.num_heads, rotary=True)
        x0 = x0 + nn.Dense(self.dim)(jnp.concatenate(
            [x0, sa(nn.LayerNorm()(x0), nn.LayerNorm()(x0), m0,
                    cos0, sin0, cos0, sin0)], -1))
        x1 = x1 + nn.Dense(self.dim)(jnp.concatenate(
            [x1, sa(nn.LayerNorm()(x1), nn.LayerNorm()(x1), m1,
                    cos1, sin1, cos1, sin1)], -1))
        # cross attention (no rotary)
        ca = _Attention(self.dim, self.num_heads, rotary=False)
        n0 = nn.LayerNorm()(x0)
        n1 = nn.LayerNorm()(x1)
        x0 = x0 + nn.Dense(self.dim)(jnp.concatenate([x0, ca(n0, n1, m1)], -1))
        x1 = x1 + nn.Dense(self.dim)(jnp.concatenate([x1, ca(n1, n0, m0)], -1))
        return x0, x1


class LightGlueModule(nn.Module):
    cfg: LightGlueConfig

    @nn.compact
    def __call__(self, kpts0, kpts1, desc0, desc1, mask0, mask1):
        cfg = self.cfg
        x0 = nn.Dense(cfg.dim)(desc0)
        x1 = nn.Dense(cfg.dim)(desc1)
        d_head = cfg.dim // cfg.num_heads
        rot0 = _rotary_embed(kpts0, d_head)
        rot1 = _rotary_embed(kpts1, d_head)
        for _ in range(cfg.num_layers):
            x0, x1 = _GlueLayer(cfg.dim, cfg.num_heads)(
                x0, x1, mask0, mask1, rot0, rot1)
        # assignment (reference: lightglue.py MatchAssignment)
        f0 = nn.Dense(cfg.dim)(x0) / cfg.dim**0.25
        f1 = nn.Dense(cfg.dim)(x1) / cfg.dim**0.25
        sim = jnp.einsum("bnc,bmc->bnm", f0, f1)
        z0 = nn.Dense(1)(x0)[..., 0]  # matchability logits
        z1 = nn.Dense(1)(x1)[..., 0]
        sim = jnp.where(mask0[:, :, None] & mask1[:, None, :], sim, -1e9)
        scores = (jax.nn.log_softmax(sim, axis=2)
                  + jax.nn.log_softmax(sim, axis=1)
                  + jax.nn.log_sigmoid(z0)[:, :, None]
                  + jax.nn.log_sigmoid(z1)[:, None, :])
        return scores


class LightGlue:
    """User-facing matcher: fixed-N masked sets → matches with scores."""

    def __init__(self, cfg: Optional[LightGlueConfig] = None,
                 params: Optional[Any] = None,
                 key: Optional[jax.Array] = None):
        self.cfg = cfg or LightGlueConfig()
        self.module = LightGlueModule(self.cfg)
        self._params = params
        self._key = key if key is not None else jax.random.PRNGKey(0)

    def init(self, n: int = 64):
        z2 = jnp.zeros((1, n, 2))
        zd = jnp.zeros((1, n, self.cfg.input_dim))
        m = jnp.ones((1, n), bool)
        self._params = self.module.init(self._key, z2, z2, zd, zd, m, m)
        return self._params

    def __call__(self, data: Dict[str, jax.Array],
                 threshold: float = 0.1) -> Dict[str, jax.Array]:
        kp0 = data["keypoints0"]
        kp1 = data["keypoints1"]
        d0 = data["descriptors0"]
        d1 = data["descriptors1"]
        m0 = data.get("mask0", jnp.ones(kp0.shape[:2], bool))
        m1 = data.get("mask1", jnp.ones(kp1.shape[:2], bool))
        size = jnp.asarray(data.get("image_size", (1.0, 1.0)))
        kp0n = kp0 / jnp.max(size) * 2.0 - 1.0
        kp1n = kp1 / jnp.max(size) * 2.0 - 1.0
        if self._params is None:
            self.init(kp0.shape[1])
        scores = self.module.apply(self._params, kp0n, kp1n, d0, d1, m0, m1)
        p = jnp.exp(scores)
        idx1 = jnp.argmax(p, axis=2)
        best = jnp.max(p, axis=2)
        idx0_back = jnp.argmax(p, axis=1)
        mutual = jnp.take_along_axis(idx0_back, idx1, axis=1) == \
            jnp.arange(kp0.shape[1])[None]
        valid = mutual & (best > threshold) & m0
        return {"matches0": idx1, "scores0": best, "valid": valid}
