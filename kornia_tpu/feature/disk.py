"""DISK-style U-Net keypoint detector + descriptor
(reference: kornia/feature/disk/ — unet detector/descriptor with grid NMS,
disk/disk.py:29).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..models.common import nchw_to_nhwc

__all__ = ["DISK", "DISKFeatures"]


class DISKFeatures:
    """(reference: disk/_disk.py DISKFeatures) — fixed-K padded."""

    def __init__(self, keypoints, descriptors, detection_scores, valid):
        self.keypoints = keypoints
        self.descriptors = descriptors
        self.detection_scores = detection_scores
        self.valid = valid


class _Down(nn.Module):
    ch: int

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.ch, (3, 3), use_bias=False)(x)
        x = nn.GroupNorm(num_groups=4)(x)
        x = nn.relu(x)
        x = nn.Conv(self.ch, (3, 3), use_bias=False)(x)
        x = nn.GroupNorm(num_groups=4)(x)
        return nn.relu(x)


class _UNet(nn.Module):
    desc_dim: int

    @nn.compact
    def __call__(self, x):  # NHWC
        d1 = _Down(32)(x)
        p1 = nn.avg_pool(d1, (2, 2), (2, 2))
        d2 = _Down(64)(p1)
        p2 = nn.avg_pool(d2, (2, 2), (2, 2))
        d3 = _Down(128)(p2)
        u2 = jax.image.resize(d3, (d3.shape[0], d2.shape[1], d2.shape[2],
                                   d3.shape[3]), "bilinear")
        c2 = _Down(64)(jnp.concatenate([u2, d2], -1))
        u1 = jax.image.resize(c2, (c2.shape[0], d1.shape[1], d1.shape[2],
                                   c2.shape[3]), "bilinear")
        c1 = _Down(32)(jnp.concatenate([u1, d1], -1))
        out = nn.Conv(self.desc_dim + 1, (1, 1))(c1)
        return out  # (B, H, W, desc_dim+1): descriptors + heatmap


class DISK:
    """(reference: disk/disk.py:29). `heatmap_and_dense_descriptors` +
    top-K keypoint extraction with window NMS."""

    def __init__(self, desc_dim: int = 128, params: Optional[Any] = None,
                 key: Optional[jax.Array] = None):
        self.desc_dim = desc_dim
        self.module = _UNet(desc_dim)
        self._params = params
        self._key = key if key is not None else jax.random.PRNGKey(0)

    def init(self, hw: Tuple[int, int] = (64, 64)):
        self._params = self.module.init(self._key, jnp.zeros((1, *hw, 3)))
        return self._params

    def heatmap_and_dense_descriptors(self, images: jax.Array
                                      ) -> Tuple[jax.Array, jax.Array]:
        """(B, 3, H, W) → (heatmap (B, 1, H, W), descs (B, D, H, W))."""
        x = nchw_to_nhwc(images)
        if self._params is None:
            self.init(x.shape[1:3])
        out = self.module.apply(self._params, x)
        heat = out[..., -1:]
        desc = out[..., :-1]
        desc = desc / jnp.maximum(
            jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-6)
        return (jnp.transpose(heat, (0, 3, 1, 2)),
                jnp.transpose(desc, (0, 3, 1, 2)))

    def __call__(self, images: jax.Array, n: int = 512,
                 window_size: int = 5, score_threshold: float = 0.0
                 ) -> DISKFeatures:
        from ..geometry.subpix import nms2d
        heat, desc = self.heatmap_and_dense_descriptors(images)
        B, _, H, W = heat.shape
        nmsed = nms2d(heat, (window_size, window_size))
        flat = nmsed.reshape(B, -1)
        vals, idx = jax.lax.top_k(flat, n)
        xs = (idx % W).astype(jnp.float32)
        ys = (idx // W).astype(jnp.float32)
        kp = jnp.stack([xs, ys], -1)
        D = desc.shape[1]
        dflat = desc.reshape(B, D, -1)
        dsel = jnp.take_along_axis(
            dflat, jnp.broadcast_to(idx[:, None, :], (B, D, n)), axis=2)
        return DISKFeatures(kp, jnp.swapaxes(dsel, 1, 2), vals,
                            vals > score_threshold)
