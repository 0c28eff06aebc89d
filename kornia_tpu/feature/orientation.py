"""Keypoint orientation estimation (reference: kornia/feature/orientation.py).

`LAFOrienter` assigns each LAF its dominant gradient orientation via a
smoothed 36-bin histogram over the patch — the histogram accumulation is a
one-hot matmul (MXU-shaped), parabolic peak refinement included. Exact
reference semantics: sobel gradients, sigma = PS/6 spatial weighting,
discrete-Gaussian circular smoothing, and the reference's sign/offset
conventions (orientation.py:52-131).
"""

from __future__ import annotations

import math
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ..core.dtype import as_float
from ..ops.filters import (get_gaussian_discrete_kernel1d,
                           get_gaussian_kernel2d, spatial_gradient)
from .laf import extract_patches_from_pyramid, get_laf_orientation, set_laf_orientation

__all__ = ["patch_dominant_gradient_orientation", "LAFOrienter", "PassLAF"]


class PassLAF:
    """Identity stand-in for orientation / affine-shape estimators
    (reference: orientation.py:35 PassLAF)."""

    def __call__(self, laf: jax.Array, img: jax.Array) -> jax.Array:
        return laf


def patch_dominant_gradient_orientation(patch: jax.Array,
                                        num_ang_bins: int = 36,
                                        eps: float = 1e-8) -> jax.Array:
    """(B, 1, PS, PS) → (B,) dominant orientation in radians
    (reference: orientation.py:52 PatchDominantGradientOrientation —
    exact math incl. the +pi bin offset and negated output angle)."""
    patch = as_float(patch)
    B, C, PS, _ = patch.shape
    grads = spatial_gradient(patch, "sobel")
    gx = grads[:, :, 0]
    gy = grads[:, :, 1]
    sigma = PS / 6.0
    gk = get_gaussian_kernel2d((PS, PS), (sigma, sigma), patch.dtype)[0]
    mag = jnp.sqrt(gx * gx + gy * gy + eps) * gk[None, None]
    ori = jnp.arctan2(gy, gx + eps) + 2.0 * math.pi
    o_big = num_ang_bins * (ori + math.pi) / (2.0 * math.pi)
    bo0f = jnp.floor(o_big)
    wo1 = o_big - bo0f
    bo0 = jnp.mod(bo0f, num_ang_bins).astype(jnp.int32)
    bo1 = jnp.mod(bo0 + 1, num_ang_bins)
    # histogram via one-hot matmul (MXU) — adaptive_avg_pool2d == mean
    oh0 = jax.nn.one_hot(bo0[:, 0].reshape(B, -1), num_ang_bins,
                         dtype=patch.dtype)
    oh1 = jax.nn.one_hot(bo1[:, 0].reshape(B, -1), num_ang_bins,
                         dtype=patch.dtype)
    w1 = wo1[:, 0].reshape(B, -1, 1)
    m = mag[:, 0].reshape(B, -1, 1)
    hist = jnp.mean(oh0 * (1.0 - w1) * m + oh1 * w1 * m, axis=1)
    # circular smoothing with the discrete Gaussian(5, 1.6)
    kernel = get_gaussian_discrete_kernel1d(5, 1.6, patch.dtype)[0]
    hist_pad = jnp.concatenate([hist[:, -2:], hist, hist[:, :2]], axis=1)
    smoothed = jnp.stack(
        [jnp.sum(hist_pad[:, i : i + 5] * kernel, axis=1)
         for i in range(num_ang_bins)], axis=1)
    peak = jnp.argmax(smoothed, axis=1)
    left = smoothed[jnp.arange(B), jnp.mod(peak - 1, num_ang_bins)]
    right = smoothed[jnp.arange(B), jnp.mod(peak + 1, num_ang_bins)]
    center = smoothed[jnp.arange(B), peak]
    denom = left + right - 2.0 * center
    offset = jnp.where(jnp.abs(denom) > eps,
                       0.5 * (left - right) / denom, 0.0)
    angle = -((2.0 * math.pi * (peak.astype(patch.dtype) + offset)
               / num_ang_bins) - math.pi)
    return angle


class LAFOrienter:
    """Rotate LAFs by the estimated patch orientation — additive on top of
    the current orientation (reference: orientation.py:215 LAFOrienter)."""

    def __init__(self, patch_size: int = 32, num_angular_bins: int = 36,
                 angle_detector: Optional[Callable[[jax.Array], jax.Array]] = None,
                 patch_mode: Optional[str] = None):
        self.patch_size = patch_size
        self.num_angular_bins = num_angular_bins
        self.angle_detector = angle_detector
        # Pallas sampling mode ("bf16" = fast descriptor-grade sampling)
        self.patch_mode = patch_mode

    def __call__(self, laf: jax.Array, img: jax.Array) -> jax.Array:
        B, N = laf.shape[:2]
        patches = extract_patches_from_pyramid(img, laf, self.patch_size,
                                               pallas_mode=self.patch_mode)
        patches = patches.reshape(B * N, *patches.shape[2:])
        if patches.shape[1] == 3:
            from ..ops.color import rgb_to_grayscale
            patches = rgb_to_grayscale(patches)
        if self.angle_detector is None:
            angles = patch_dominant_gradient_orientation(
                patches, self.num_angular_bins)
        else:
            angles = self.angle_detector(patches)
        angles = angles.reshape(B, N)
        prev = get_laf_orientation(laf)[..., 0]
        return set_laf_orientation(
            laf, (jnp.rad2deg(angles) + prev)[..., None])
