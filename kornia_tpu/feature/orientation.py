"""Keypoint orientation estimation (reference: kornia/feature/orientation.py).

`LAFOrienter` assigns each LAF its dominant gradient orientation via a
smoothed 36-bin histogram over the patch — the histogram accumulation is a
one-hot matmul (MXU-shaped), parabolic peak refinement included.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

from ..core.dtype import as_float
from ..ops.filters import get_gaussian_kernel2d, spatial_gradient
from .laf import extract_patches_from_pyramid, rotate_laf, set_laf_orientation, get_laf_orientation

__all__ = ["patch_dominant_gradient_orientation", "LAFOrienter"]


def patch_dominant_gradient_orientation(patch: jax.Array,
                                        num_ang_bins: int = 36,
                                        eps: float = 1e-8) -> jax.Array:
    """(B, 1, PS, PS) → (B,) dominant orientation in radians
    (reference: orientation.py PassLAF/PatchDominantGradientOrientation)."""
    patch = as_float(patch)
    B, C, PS, _ = patch.shape
    grads = spatial_gradient(patch, "diff")
    gx = grads[:, :, 0]
    gy = grads[:, :, 1]
    gk = get_gaussian_kernel2d((PS, PS), (PS / 3.0, PS / 3.0), patch.dtype)[0]
    mag = jnp.sqrt(gx * gx + gy * gy + eps) * gk[None, None]
    ori = jnp.arctan2(gy, gx + eps) + 2 * math.pi
    o_big = ori * num_ang_bins / (2.0 * math.pi)
    bo0 = jnp.floor(o_big)
    wo1 = o_big - bo0
    bo0 = jnp.mod(bo0, num_ang_bins).astype(jnp.int32)
    bo1 = jnp.mod(bo0 + 1, num_ang_bins)
    oh0 = jax.nn.one_hot(bo0[:, 0].reshape(B, -1), num_ang_bins, dtype=patch.dtype)
    oh1 = jax.nn.one_hot(bo1[:, 0].reshape(B, -1), num_ang_bins, dtype=patch.dtype)
    m = mag[:, 0].reshape(B, -1, 1)
    hist = jnp.sum(oh0 * (1 - wo1[:, 0].reshape(B, -1, 1)) * m
                   + oh1 * wo1[:, 0].reshape(B, -1, 1) * m, axis=1)  # (B, bins)
    # circular smoothing [1, 4, 6, 4, 1]/16
    kernel = jnp.array([1.0, 4.0, 6.0, 4.0, 1.0], patch.dtype) / 16.0
    hist_pad = jnp.concatenate([hist[:, -2:], hist, hist[:, :2]], axis=1)
    smoothed = jnp.stack(
        [jnp.sum(hist_pad[:, i : i + 5] * kernel, axis=1)
         for i in range(num_ang_bins)], axis=1)
    peak = jnp.argmax(smoothed, axis=1)
    # parabolic refinement around the peak
    left = smoothed[jnp.arange(B), jnp.mod(peak - 1, num_ang_bins)]
    right = smoothed[jnp.arange(B), jnp.mod(peak + 1, num_ang_bins)]
    center = smoothed[jnp.arange(B), peak]
    denom = left - 2.0 * center + right
    offset = jnp.where(jnp.abs(denom) > eps,
                       0.5 * (left - right) / denom, 0.0)
    angle = (peak.astype(patch.dtype) + offset) * (2.0 * math.pi / num_ang_bins)
    return angle


class LAFOrienter:
    """Update LAF orientations from patch content
    (reference: orientation.py LAFOrienter)."""

    def __init__(self, patch_size: int = 32, num_angular_bins: int = 36):
        self.patch_size = patch_size
        self.num_angular_bins = num_angular_bins

    def __call__(self, laf: jax.Array, img: jax.Array) -> jax.Array:
        B, N = laf.shape[:2]
        patches = extract_patches_from_pyramid(img, laf, self.patch_size)
        patches = patches.reshape(B * N, *patches.shape[2:])
        if patches.shape[1] == 3:
            from ..ops.color import rgb_to_grayscale
            patches = rgb_to_grayscale(patches)
        angles = patch_dominant_gradient_orientation(
            patches, self.num_angular_bins).reshape(B, N)
        angles_deg = jnp.rad2deg(angles)[..., None]
        return set_laf_orientation(laf, angles_deg)
