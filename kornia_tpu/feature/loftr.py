"""LoFTR-style detector-free dense matcher
(reference: kornia/feature/loftr/ — ResNet-FPN backbone
loftr/backbone/resnet_fpn.py, linear-attention coarse/fine transformer
loftr/loftr_module/, dual-softmax coarse matching coarse_matching.py:303,
fine refinement; LoFTR.forward:121).

TPU-first: linear attention is two matmul chains (MXU-perfect); coarse
matching returns FIXED-K matches with confidence + validity masks instead
of the reference's thresholded variable-length lists. The (H·W/64)²
coarse attention is context-parallelizable over a mesh (SURVEY.md §5) —
single-chip here, sharding hook in `parallel/`.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..models.common import nchw_to_nhwc, nhwc_to_nchw

__all__ = ["LoFTR", "LoFTRConfig"]


class LoFTRConfig:
    def __init__(self, coarse_dim: int = 256, fine_dim: int = 128,
                 num_coarse_layers: int = 4, num_heads: int = 8,
                 fine_window: int = 5, top_k: int = 512):
        self.coarse_dim = coarse_dim
        self.fine_dim = fine_dim
        self.num_coarse_layers = num_coarse_layers
        self.num_heads = num_heads
        self.fine_window = fine_window
        self.top_k = top_k


class _BasicBlock(nn.Module):
    ch: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.ch, (3, 3), strides=self.stride, use_bias=False)(x)
        h = nn.GroupNorm(num_groups=8)(h)
        h = nn.relu(h)
        h = nn.Conv(self.ch, (3, 3), use_bias=False)(h)
        h = nn.GroupNorm(num_groups=8)(h)
        if self.stride != 1 or x.shape[-1] != self.ch:
            x = nn.Conv(self.ch, (1, 1), strides=self.stride, use_bias=False)(x)
        return nn.relu(x + h)


class _ResNetFPN(nn.Module):
    """1/8 coarse + 1/2 fine feature maps (reference: backbone/resnet_fpn.py)."""

    coarse_dim: int
    fine_dim: int

    @nn.compact
    def __call__(self, x):  # NHWC
        c1 = nn.relu(nn.GroupNorm(num_groups=8)(
            nn.Conv(64, (7, 7), strides=2, use_bias=False)(x)))  # 1/2
        c1 = _BasicBlock(64)(c1)
        c2 = _BasicBlock(96, stride=2)(c1)  # 1/4
        c2 = _BasicBlock(96)(c2)
        c3 = _BasicBlock(128, stride=2)(c2)  # 1/8
        c3 = _BasicBlock(128)(c3)
        # FPN top-down
        p3 = nn.Conv(self.coarse_dim, (1, 1))(c3)
        up3 = jax.image.resize(p3, (p3.shape[0], c2.shape[1], c2.shape[2],
                                    p3.shape[3]), "bilinear")
        p2 = nn.Conv(self.fine_dim, (1, 1))(c2) + nn.Conv(self.fine_dim, (1, 1))(up3)
        up2 = jax.image.resize(p2, (p2.shape[0], c1.shape[1], c1.shape[2],
                                    p2.shape[3]), "bilinear")
        p1 = nn.Conv(self.fine_dim, (1, 1))(c1) + nn.Conv(self.fine_dim, (1, 1))(up2)
        return p3, p1  # coarse (1/8), fine (1/2)


def _elu_feature(x):
    return nn.elu(x) + 1.0


class _LinearAttention(nn.Module):
    """O(N) linear attention (reference: loftr_module/linear_attention.py)."""

    dim: int
    num_heads: int

    @nn.compact
    def __call__(self, x, source):
        B, N, _ = x.shape
        M = source.shape[1]
        h = self.num_heads
        d = self.dim // h
        q = nn.Dense(self.dim)(x).reshape(B, N, h, d)
        k = nn.Dense(self.dim)(source).reshape(B, M, h, d)
        v = nn.Dense(self.dim)(source).reshape(B, M, h, d)
        q = _elu_feature(q)
        k = _elu_feature(k)
        kv = jnp.einsum("bmhd,bmhe->bhde", k, v)  # (B, h, d, d)
        z = 1.0 / (jnp.einsum("bnhd,bhd->bnh", q, k.sum(axis=1)) + 1e-6)
        out = jnp.einsum("bnhd,bhde,bnh->bnhe", q, kv, z)
        return nn.Dense(self.dim)(out.reshape(B, N, self.dim))


class _LoFTRBlock(nn.Module):
    dim: int
    num_heads: int

    @nn.compact
    def __call__(self, x, source):
        msg = _LinearAttention(self.dim, self.num_heads)(
            nn.LayerNorm()(x), nn.LayerNorm()(source))
        x = x + msg
        h = nn.LayerNorm()(x)
        h = nn.Dense(self.dim * 2)(h)
        h = nn.gelu(h)
        x = x + nn.Dense(self.dim)(h)
        return x


class _PositionEncoding(nn.Module):
    """Sinusoidal 2D positional encoding (reference:
    loftr_module/position_encoding.py)."""

    dim: int

    def __call__(self, feat):  # (B, H, W, C)
        B, H, W, C = feat.shape
        d4 = C // 4
        ys = jnp.arange(H)[:, None, None]
        xs = jnp.arange(W)[None, :, None]
        div = jnp.exp(jnp.arange(d4) * (-jnp.log(10000.0) / max(d4 - 1, 1)))
        pe = jnp.concatenate([
            jnp.broadcast_to(jnp.sin(xs * div), (H, W, d4)),
            jnp.broadcast_to(jnp.cos(xs * div), (H, W, d4)),
            jnp.broadcast_to(jnp.sin(ys * div), (H, W, d4)),
            jnp.broadcast_to(jnp.cos(ys * div), (H, W, d4)),
        ], axis=-1)
        pad = C - pe.shape[-1]
        if pad:
            pe = jnp.concatenate([pe, jnp.zeros((H, W, pad))], -1)
        return feat + pe[None]


class LoFTRModule(nn.Module):
    """flax module: full coarse pipeline + fine refinement."""

    cfg: LoFTRConfig

    @nn.compact
    def __call__(self, img0, img1):  # NCHW grayscale
        cfg = self.cfg
        x0 = nchw_to_nhwc(img0)
        x1 = nchw_to_nhwc(img1)
        backbone = _ResNetFPN(cfg.coarse_dim, cfg.fine_dim)
        c0, f0 = backbone(x0)
        c1, f1 = backbone(x1)
        B, Hc, Wc, C = c0.shape
        pe = _PositionEncoding(cfg.coarse_dim)
        t0 = pe(c0).reshape(B, Hc * Wc, C)
        t1 = pe(c1).reshape(B, c1.shape[1] * c1.shape[2], C)
        for _ in range(cfg.num_coarse_layers):
            blk_self = _LoFTRBlock(cfg.coarse_dim, cfg.num_heads)
            blk_cross = _LoFTRBlock(cfg.coarse_dim, cfg.num_heads)
            t0 = blk_self(t0, t0)
            t1 = blk_self(t1, t1)
            t0n = blk_cross(t0, t1)
            t1 = blk_cross(t1, t0)
            t0 = t0n
        # dual-softmax coarse matching (reference: coarse_matching.py:303)
        t0n = t0 / jnp.maximum(jnp.linalg.norm(t0, axis=-1, keepdims=True), 1e-6)
        t1n = t1 / jnp.maximum(jnp.linalg.norm(t1, axis=-1, keepdims=True), 1e-6)
        sim = jnp.einsum("bnc,bmc->bnm", t0n, t1n) / 0.1
        conf = jax.nn.softmax(sim, axis=1) * jax.nn.softmax(sim, axis=2)
        return conf, (f0, f1), (Hc, Wc, c1.shape[1], c1.shape[2])


class LoFTR:
    """User-facing wrapper (reference API: LoFTR.forward:121 takes a dict
    {"image0", "image1"} and returns keypoints + confidence)."""

    def __init__(self, cfg: Optional[LoFTRConfig] = None,
                 params: Optional[Any] = None,
                 key: Optional[jax.Array] = None):
        self.cfg = cfg or LoFTRConfig()
        self.module = LoFTRModule(self.cfg)
        self._params = params
        self._key = key if key is not None else jax.random.PRNGKey(0)

    def init(self, hw: Tuple[int, int] = (128, 128)):
        dummy = jnp.zeros((1, 1, *hw))
        self._params = self.module.init(self._key, dummy, dummy)
        return self._params

    def _fine_refine(self, f0, f1, kp0, kp1):
        """Correlation-based subpixel refinement of kp1 (reference:
        loftr/loftr_module fine matching): the fine descriptor at kp0
        correlates against a w x w fine-feature window around kp1; the
        soft-argmax of the correlation is the refined offset."""
        w = self.cfg.fine_window
        r = w // 2
        stride = 2.0  # fine-feature stride
        B, Hf, Wf, D = f0.shape
        K = kp0.shape[1]

        def gather_vec(fm, xy):
            ix = jnp.clip(jnp.round(xy[..., 0] / stride).astype(jnp.int32),
                          0, Wf - 1)
            iy = jnp.clip(jnp.round(xy[..., 1] / stride).astype(jnp.int32),
                          0, Hf - 1)
            flat = fm.reshape(B, Hf * Wf, D)
            idx = (iy * Wf + ix)[..., None]
            return jnp.take_along_axis(flat, jnp.broadcast_to(
                idx, (B, K, D)), axis=1)  # (B, K, D)

        q = gather_vec(f0, kp0)
        # window gather around kp1
        offs = jnp.stack(jnp.meshgrid(jnp.arange(-r, r + 1),
                                      jnp.arange(-r, r + 1),
                                      indexing="ij"), -1).reshape(-1, 2)
        cx = jnp.round(kp1[..., 0] / stride).astype(jnp.int32)
        cy = jnp.round(kp1[..., 1] / stride).astype(jnp.int32)
        wx = jnp.clip(cx[..., None] + offs[None, None, :, 1], 0, Wf - 1)
        wy = jnp.clip(cy[..., None] + offs[None, None, :, 0], 0, Hf - 1)
        flat1 = f1.reshape(B, Hf * Wf, D)
        widx = (wy * Wf + wx).reshape(B, -1)[..., None]
        win = jnp.take_along_axis(
            flat1, jnp.broadcast_to(widx, (B, K * w * w, D)), axis=1
        ).reshape(B, K, w * w, D)
        corr = jnp.einsum("bkd,bkwd->bkw", q, win) / jnp.sqrt(float(D))
        p = jax.nn.softmax(corr * 10.0, axis=-1)
        exp_off = jnp.einsum("bkw,wc->bkc", p, offs.astype(jnp.float32))
        # offs is (dy, dx); convert to (dx, dy) pixels
        delta = jnp.stack([exp_off[..., 1], exp_off[..., 0]], -1) * stride
        return kp1 + delta

    def __call__(self, data: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
        img0 = data["image0"]
        img1 = data["image1"]
        if self._params is None:
            self.init(img0.shape[-2:])
        conf, fines, (Hc, Wc, Hc1, Wc1) = self.module.apply(
            self._params, img0, img1)
        B = img0.shape[0]
        K = min(self.cfg.top_k, conf.shape[1])
        # mutual-max mask
        max1 = conf == jnp.max(conf, axis=2, keepdims=True)
        max0 = conf == jnp.max(conf, axis=1, keepdims=True)
        mutual = conf * (max0 & max1)
        flat = mutual.reshape(B, -1)
        vals, idx = jax.lax.top_k(flat, K)
        idx0 = idx // conf.shape[2]
        idx1 = idx % conf.shape[2]
        scale = 8.0  # coarse stride
        kp0 = jnp.stack([(idx0 % Wc).astype(jnp.float32),
                         (idx0 // Wc).astype(jnp.float32)], -1) * scale + scale / 2
        kp1 = jnp.stack([(idx1 % Wc1).astype(jnp.float32),
                         (idx1 // Wc1).astype(jnp.float32)], -1) * scale + scale / 2
        f0, f1 = fines
        kp1 = self._fine_refine(f0, f1, kp0, kp1)
        valid = vals > 0.0
        return {
            "keypoints0": kp0,
            "keypoints1": kp1,
            "confidence": vals,
            "valid": valid,
            "batch_indexes": jnp.repeat(jnp.arange(B), K),
        }
