"""XFeat-style lightweight detector/descriptor
(reference: kornia/feature/xfeat.py:270-619 — accelerated features:
cell-logit keypoint head + compact dense descriptors + match helper).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..models.common import nchw_to_nhwc

__all__ = ["XFeat"]


class _XFeatNet(nn.Module):
    desc_dim: int = 64

    @nn.compact
    def __call__(self, x):  # NHWC grayscale/RGB
        for ch in (8, 16, 32):
            x = nn.relu(nn.GroupNorm(num_groups=4)(
                nn.Conv(ch, (3, 3), strides=2, use_bias=False)(x)))
        x = nn.relu(nn.GroupNorm(num_groups=4)(
            nn.Conv(64, (3, 3), use_bias=False)(x)))
        # keypoint head: 64 cell positions + dustbin (SuperPoint-style
        # cell logits — XFeat uses the same trick for cheap detection)
        logits = nn.Conv(65, (1, 1))(x)
        desc = nn.Conv(self.desc_dim, (1, 1))(x)
        desc = desc / jnp.maximum(
            jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-6)
        # reliability head
        rel = nn.sigmoid(nn.Conv(1, (1, 1))(x))
        return logits, desc, rel


class XFeat:
    """detectAndCompute / match API mirroring the reference
    (feature/xfeat.py XFeat.detectAndCompute, match_xfeat)."""

    def __init__(self, top_k: int = 512, desc_dim: int = 64,
                 params: Optional[Any] = None,
                 key: Optional[jax.Array] = None):
        self.top_k = top_k
        self.module = _XFeatNet(desc_dim)
        self._params = params
        self._key = key if key is not None else jax.random.PRNGKey(0)

    def detectAndCompute(self, images: jax.Array,
                         top_k: Optional[int] = None) -> Dict[str, jax.Array]:
        """(B, C, H, W) → dict(keypoints (B, K, 2), scores (B, K),
        descriptors (B, K, D), valid (B, K))."""
        K = top_k or self.top_k
        x = nchw_to_nhwc(images)
        if x.shape[-1] == 1:
            x = jnp.repeat(x, 3, axis=-1)
        if self._params is None:
            self._params = self.module.init(self._key, x)
        logits, desc, rel = self.module.apply(self._params, x)
        B, Hc, Wc, _ = logits.shape
        # cell softmax → per-pixel heatmap at stride 8
        p = jax.nn.softmax(logits, axis=-1)[..., :64]
        heat = p.reshape(B, Hc, Wc, 8, 8).transpose(0, 1, 3, 2, 4)
        heat = heat.reshape(B, Hc * 8, Wc * 8)
        heat = heat * jax.image.resize(rel[..., 0], heat.shape, "nearest")
        flat = heat.reshape(B, -1)
        scores, idx = jax.lax.top_k(flat, K)
        W8 = Wc * 8
        xs = (idx % W8).astype(jnp.float32)
        ys = (idx // W8).astype(jnp.float32)
        kp = jnp.stack([xs, ys], -1)
        # sample descriptors at keypoint cells
        cix = jnp.clip((xs / 8).astype(jnp.int32), 0, Wc - 1)
        ciy = jnp.clip((ys / 8).astype(jnp.int32), 0, Hc - 1)
        dflat = desc.reshape(B, Hc * Wc, -1)
        didx = (ciy * Wc + cix)[..., None]
        d = jnp.take_along_axis(
            dflat, jnp.broadcast_to(didx, (B, K, dflat.shape[-1])), axis=1)
        return {"keypoints": kp, "scores": scores, "descriptors": d,
                "valid": scores > 0}

    def match_xfeat(self, img0: jax.Array, img1: jax.Array,
                    top_k: Optional[int] = None
                    ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        """→ (mkpts0, mkpts1, valid) via mutual-NN on descriptors."""
        from .matching import match_mnn
        f0 = self.detectAndCompute(img0, top_k)
        f1 = self.detectAndCompute(img1, top_k)
        dists, idx, valid = match_mnn(f0["descriptors"][0],
                                      f1["descriptors"][0],
                                      f0["valid"][0], f1["valid"][0])
        mk0 = f0["keypoints"][0]
        mk1 = f1["keypoints"][0][idx[:, 1]]
        return mk0, mk1, valid
