"""Video and patch augmentation containers
(reference: kornia/augmentation/container/video.py:452 VideoSequential,
container/patch.py:565 PatchSequential).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp

from ..core.dtype import as_float
from .base import AugmentationBase2D
from .container import ImageSequential

__all__ = ["VideoSequential", "PatchSequential"]


class VideoSequential(ImageSequential):
    """Temporally-consistent augmentation of (B, T, C, H, W) clips
    (reference: container/video.py:452).

    The SAME sampled parameters apply to every frame of a clip: params are
    generated for batch B, then broadcast over T by folding frames into the
    batch and repeating the per-sample parameters."""

    def __init__(self, *augs: AugmentationBase2D, data_format: str = "BTCHW"):
        super().__init__(*augs)
        assert data_format in ("BTCHW", "BCTHW")
        self.data_format = data_format

    def __call__(self, x: jax.Array, key: Optional[jax.Array] = None,
                 params: Optional[List[dict]] = None) -> jax.Array:
        x = as_float(x)
        if self.data_format == "BCTHW":
            x = jnp.swapaxes(x, 1, 2)  # → BTCHW
        B, T, C, H, W = x.shape
        flat = x.reshape(B * T, C, H, W)
        if params is None:
            if key is None:
                key = jax.random.PRNGKey(0)
            # sample per-CLIP params at batch size B, then repeat over T
            params = []
            keys = jax.random.split(key, len(self.augs))
            for aug, k in zip(self.augs, keys):
                p = aug.generate_parameters(k, (B, C, H, W))
                p_rep = jax.tree_util.tree_map(
                    lambda v: jnp.repeat(v, T, axis=0)
                    if hasattr(v, "shape") and v.ndim >= 1 and v.shape[0] == B
                    else v, p)
                params.append(p_rep)
        out = flat
        for aug, p in zip(self.augs, params):
            out = aug(out, params=p)
        out = out.reshape(B, T, C, H, W)
        if self.data_format == "BCTHW":
            out = jnp.swapaxes(out, 1, 2)
        return out


class PatchSequential(ImageSequential):
    """Apply the pipeline independently per image patch
    (reference: container/patch.py:565). The image is tiled into a
    grid_size x grid_size grid; each patch gets its own parameters
    (patchwise mode)."""

    def __init__(self, *augs: AugmentationBase2D, grid_size: int = 4):
        super().__init__(*augs)
        self.grid_size = grid_size

    def __call__(self, x: jax.Array, key: Optional[jax.Array] = None
                 ) -> jax.Array:
        x = as_float(x)
        B, C, H, W = x.shape
        g = self.grid_size
        ph, pw = H // g, W // g
        patches = x[:, :, : g * ph, : g * pw].reshape(B, C, g, ph, g, pw)
        patches = patches.transpose(0, 2, 4, 1, 3, 5).reshape(
            B * g * g, C, ph, pw)
        if key is None:
            key = jax.random.PRNGKey(0)
        out = patches
        keys = jax.random.split(key, len(self.augs))
        for aug, k in zip(self.augs, keys):
            out = aug(out, k)
        out = out.reshape(B, g, g, C, ph, pw).transpose(0, 3, 1, 4, 2, 5)
        out = out.reshape(B, C, g * ph, g * pw)
        if (g * ph, g * pw) != (H, W):
            out = jnp.pad(out, [(0, 0), (0, 0), (0, H - g * ph),
                                (0, W - g * pw)])
        return out
