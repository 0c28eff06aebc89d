"""DINOv2 Vision Transformer backbone (flax), keyed to the torch state
dict of the reference's vendored DINOv2
(reference: kornia/feature/dedode/transformer/dinov2.py:77
DinoVisionTransformer; vit_large config at :444; DeDoDe-G uses it frozen
via encoder.py:71 FrozenDINOv2 with patch_size=14, init_values=1.0).

TPU notes: NHWC patchify via one strided conv (lowers to an MXU matmul),
bicubic positional-embedding interpolation matches the torch
`interpolate(mode="bicubic")` path, attention is plain batched sdpa —
XLA fuses it; no xformers analogue needed.
"""

from __future__ import annotations

import math
from typing import Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["DinoV2ViT", "load_dinov2_torch_weights", "VIT_LARGE_CFG"]

VIT_LARGE_CFG = dict(patch_size=14, embed_dim=1024, depth=24, num_heads=16,
                     mlp_ratio=4.0, init_values=1.0, pos_grid=37)


def _torch_bicubic_matrix(n_in: int, n_out: int, sigma: float) -> np.ndarray:
    """(n_out, n_in) operator == torch F.interpolate(scale_factor=sigma,
    mode="bicubic", align_corners=False, antialias=False): cubic
    convolution a=-0.75, src = (dst + 0.5)/sigma - 0.5, border-clamped."""
    a = -0.75

    def cubic(d):
        d = abs(d)
        if d <= 1.0:
            return ((a + 2.0) * d - (a + 3.0)) * d * d + 1.0
        if d < 2.0:
            return (((d - 5.0) * d + 8.0) * d - 4.0) * a
        return 0.0

    A = np.zeros((n_out, n_in), np.float64)
    for i in range(n_out):
        src = (i + 0.5) / sigma - 0.5
        f = math.floor(src)
        for k in range(-1, 3):
            idx = min(max(f + k, 0), n_in - 1)
            A[i, idx] += cubic(src - (f + k))
    return A.astype(np.float32)


class _Block(nn.Module):
    """Pre-norm ViT block with LayerScale (dinov2 layers/block.py:53)."""

    embed_dim: int
    num_heads: int
    mlp_ratio: float

    @nn.compact
    def __call__(self, x):
        D = self.embed_dim
        h = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
        qkv = nn.Dense(3 * D, name="qkv")(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        B, N, _ = q.shape
        hd = D // self.num_heads

        def heads(t):
            return t.reshape(B, N, self.num_heads, hd).transpose(0, 2, 1, 3)

        q, k, v = heads(q), heads(k), heads(v)
        attn = jax.nn.softmax(
            (q @ jnp.swapaxes(k, -1, -2)) / math.sqrt(hd), axis=-1)
        o = (attn @ v).transpose(0, 2, 1, 3).reshape(B, N, D)
        o = nn.Dense(D, name="proj")(o)
        gamma1 = self.param("ls1_gamma", nn.initializers.ones, (D,))
        x = x + gamma1 * o
        h = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        h = nn.Dense(int(D * self.mlp_ratio), name="fc1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(D, name="fc2")(h)
        gamma2 = self.param("ls2_gamma", nn.initializers.ones, (D,))
        return x + gamma2 * h


class DinoV2ViT(nn.Module):
    """(B, H, W, 3) normalized image → (B, H//p, W//p, D) patch tokens
    after the final LayerNorm (== the reference's x_norm_patchtokens,
    dinov2.py forward_features)."""

    patch_size: int = 14
    embed_dim: int = 1024
    depth: int = 24
    num_heads: int = 16
    mlp_ratio: float = 4.0
    init_values: float = 1.0
    pos_grid: int = 37  # 518 // 14 — training-time pos-embed grid

    @nn.compact
    def __call__(self, x):
        B, H, W, _ = x.shape
        p = self.patch_size
        gh, gw = H // p, W // p
        D = self.embed_dim
        x = nn.Conv(D, (p, p), strides=(p, p), name="patch_proj")(x)
        x = x.reshape(B, gh * gw, D)
        cls = self.param("cls_token", nn.initializers.zeros, (1, 1, D))
        pos = self.param("pos_embed", nn.initializers.zeros,
                         (1, self.pos_grid * self.pos_grid + 1, D))
        # bicubic pos-embed interpolation (dinov2.py:213
        # interpolate_pos_encoding) to the current patch grid
        cls_pos = pos[:, :1]
        patch_pos = pos[:, 1:].reshape(1, self.pos_grid, self.pos_grid, D)
        if (gh, gw) != (self.pos_grid, self.pos_grid):
            # torch F.interpolate(mode="bicubic", antialias=False) with the
            # reference's scale_factor = (g + 0.1)/pos_grid fudge
            # (dinov2.py:238) — jax.image.resize antialiases downsamples,
            # so the exact cubic-convolution operator is built instead
            Ay = jnp.asarray(_torch_bicubic_matrix(
                self.pos_grid, gh, (gh + 0.1) / self.pos_grid), x.dtype)
            Ax = jnp.asarray(_torch_bicubic_matrix(
                self.pos_grid, gw, (gw + 0.1) / self.pos_grid), x.dtype)
            patch_pos = jnp.einsum("oh,bhwd,pw->bopd", Ay, patch_pos, Ax)
        patch_pos = patch_pos.reshape(1, gh * gw, D)
        x = x + patch_pos
        cls_tok = jnp.broadcast_to(cls + cls_pos, (B, 1, D))
        x = jnp.concatenate([cls_tok, x], axis=1)
        for i in range(self.depth):
            x = _Block(D, self.num_heads, self.mlp_ratio,
                       name=f"block{i}")(x)
        x = nn.LayerNorm(epsilon=1e-6, name="norm")(x)
        return x[:, 1:].reshape(B, gh, gw, D)


def load_dinov2_torch_weights(state_dict: Dict, depth: int = 24) -> Dict:
    """torch DINOv2 state dict (dinov2.py param names: patch_embed.proj,
    cls_token, pos_embed, blocks.N.{norm1,attn.qkv,attn.proj,ls1.gamma,
    norm2,mlp.fc1,mlp.fc2,ls2.gamma}, norm) → flax params for DinoV2ViT."""

    def a(k):
        return np.asarray(state_dict[k])

    params = {
        "cls_token": a("cls_token"),
        "pos_embed": a("pos_embed"),
        "patch_proj": {
            "kernel": a("patch_embed.proj.weight").transpose(2, 3, 1, 0),
            "bias": a("patch_embed.proj.bias"),
        },
        "norm": {"scale": a("norm.weight"), "bias": a("norm.bias")},
    }
    for i in range(depth):
        pre = f"blocks.{i}."
        params[f"block{i}"] = {
            "norm1": {"scale": a(pre + "norm1.weight"),
                      "bias": a(pre + "norm1.bias")},
            "qkv": {"kernel": a(pre + "attn.qkv.weight").T,
                    "bias": a(pre + "attn.qkv.bias")},
            "proj": {"kernel": a(pre + "attn.proj.weight").T,
                     "bias": a(pre + "attn.proj.bias")},
            "ls1_gamma": a(pre + "ls1.gamma"),
            "norm2": {"scale": a(pre + "norm2.weight"),
                      "bias": a(pre + "norm2.bias")},
            "fc1": {"kernel": a(pre + "mlp.fc1.weight").T,
                    "bias": a(pre + "mlp.fc1.bias")},
            "fc2": {"kernel": a(pre + "mlp.fc2.weight").T,
                    "bias": a(pre + "mlp.fc2.bias")},
            "ls2_gamma": a(pre + "ls2.gamma"),
        }
    return {"params": params}
