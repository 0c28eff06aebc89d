"""SIFT descriptor as dense convolutions
(reference: kornia/feature/siftdesc.py:381).

The descriptor is computed on (B, 1, PS, PS) patches: gradient magnitude/
orientation → soft-binned orientation maps → spatial pooling with bilinear
spatial weights (implemented as a grouped conv) → 4x4x8 descriptor with
SIFT clipping + renormalization. All matmul/conv shaped — MXU friendly.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

from ..core.check import check
from ..core.dtype import as_float
from ..ops.filters import get_gaussian_kernel2d, spatial_gradient

__all__ = ["sift_describe", "SIFTDescriptor", "DenseSIFTDescriptor"]


def _get_pooling_kernel(ksize: int, dtype=jnp.float32) -> jax.Array:
    """Triangular (bilinear) pooling kernel (reference: siftdesc.py
    get_sift_pooling_kernel)."""
    ks_2 = float(ksize) / 2.0
    xc2 = ks_2 - jnp.abs(jnp.arange(ksize, dtype=dtype) + 0.5 - ks_2)
    kernel = (xc2[:, None] * xc2[None, :]) / (ks_2**2)
    return kernel


def sift_describe(
    patches: jax.Array,
    num_ang_bins: int = 8,
    num_spatial_bins: int = 4,
    rootsift: bool = True,
    clipval: float = 0.2,
    eps: float = 1e-10,
) -> jax.Array:
    """(B, 1, PS, PS) patches → (B, num_spatial_bins² * num_ang_bins)."""
    patches = as_float(patches)
    B, CH, PS, _ = patches.shape
    check(CH == 1, "sift_describe expects grayscale patches")
    # gaussian weighting of the whole patch (reference sigma = PS/sqrt(2))
    sig = PS / math.sqrt(2.0)
    gk = get_gaussian_kernel2d((PS, PS), (sig, sig), patches.dtype)[0]
    grads = spatial_gradient(patches, "diff")
    gx = grads[:, :, 0]
    gy = grads[:, :, 1]
    mag = jnp.sqrt(gx * gx + gy * gy + eps) * gk[None, None]
    ori = jnp.mod(jnp.arctan2(gy, gx + eps) + 2.0 * math.pi, 2.0 * math.pi)
    # soft orientation binning
    o_big = ori * num_ang_bins / (2.0 * math.pi)
    bo0 = jnp.floor(o_big)
    wo1 = o_big - bo0
    bo0 = jnp.mod(bo0, num_ang_bins).astype(jnp.int32)
    bo1 = jnp.mod(bo0 + 1, num_ang_bins)
    # scatter into (B, num_ang_bins, PS, PS) with one-hot matmuls
    oh0 = jax.nn.one_hot(bo0[:, 0], num_ang_bins, axis=1, dtype=patches.dtype)
    oh1 = jax.nn.one_hot(bo1[:, 0], num_ang_bins, axis=1, dtype=patches.dtype)
    ang_maps = oh0 * ((1.0 - wo1) * mag) + oh1 * (wo1 * mag)  # (B, A, PS, PS)
    # spatial pooling: grouped conv with the triangular kernel, stride to
    # produce num_spatial_bins x num_spatial_bins outputs
    ksize = 2 * PS // (num_spatial_bins + 1)
    stride = PS // num_spatial_bins
    pad = ksize // 4
    pool = _get_pooling_kernel(ksize, patches.dtype)
    w = jnp.broadcast_to(pool, (num_ang_bins, ksize, ksize))[:, None]
    pooled = lax.conv_general_dilated(
        jnp.pad(ang_maps, [(0, 0), (0, 0), (pad, pad), (pad, pad)]),
        w, (stride, stride), "VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=num_ang_bins,
    )  # (B, A, nsb, nsb)
    pooled = pooled[:, :, :num_spatial_bins, :num_spatial_bins]
    # reference element order: [angular_bin, y, x] (siftdesc.py view(B,-1)
    # after per-angular-bin concat)
    desc = pooled.reshape(B, -1)
    # normalize, clip, renormalize (SIFT standard)
    desc = desc / jnp.maximum(jnp.linalg.norm(desc, axis=-1, keepdims=True), eps)
    desc = jnp.clip(desc, 0.0, clipval)
    desc = desc / jnp.maximum(jnp.linalg.norm(desc, axis=-1, keepdims=True), eps)
    if rootsift:
        desc = jnp.sqrt(desc / jnp.maximum(
            jnp.sum(desc, axis=-1, keepdims=True), eps) + eps)
    return desc


class SIFTDescriptor:
    """Callable matching the reference module API (siftdesc.py:381)."""

    def __init__(self, patch_size: int = 41, num_ang_bins: int = 8,
                 num_spatial_bins: int = 4, rootsift: bool = True,
                 clipval: float = 0.2):
        self.patch_size = patch_size
        self.num_ang_bins = num_ang_bins
        self.num_spatial_bins = num_spatial_bins
        self.rootsift = rootsift
        self.clipval = clipval

    def __call__(self, patches: jax.Array) -> jax.Array:
        return sift_describe(patches, self.num_ang_bins,
                             self.num_spatial_bins, self.rootsift,
                             self.clipval)


class DenseSIFTDescriptor:
    """Dense per-pixel SIFT (reference: siftdesc.py DenseSIFTDescriptor).
    Returns (B, 128, H, W)."""

    def __init__(self, num_ang_bins: int = 8, num_spatial_bins: int = 4,
                 spatial_bin_size: int = 4, rootsift: bool = True,
                 clipval: float = 0.2, stride: int = 1, padding: int = 1):
        self.num_ang_bins = num_ang_bins
        self.num_spatial_bins = num_spatial_bins
        self.spatial_bin_size = spatial_bin_size
        self.rootsift = rootsift
        self.clipval = clipval
        self.stride = stride
        self.padding = padding

    def __call__(self, x: jax.Array) -> jax.Array:
        x = as_float(x)
        B, C, H, W = x.shape
        eps = 1e-10
        grads = spatial_gradient(x, "diff")
        gx, gy = grads[:, :, 0], grads[:, :, 1]
        mag = jnp.sqrt(gx * gx + gy * gy + eps)
        ori = jnp.mod(jnp.arctan2(gy, gx + eps) + 2 * math.pi, 2 * math.pi)
        o_big = ori * self.num_ang_bins / (2.0 * math.pi)
        bo0 = jnp.floor(o_big)
        wo1 = o_big - bo0
        bo0 = jnp.mod(bo0, self.num_ang_bins).astype(jnp.int32)
        bo1 = jnp.mod(bo0 + 1, self.num_ang_bins)
        oh0 = jax.nn.one_hot(bo0[:, 0], self.num_ang_bins, axis=1, dtype=x.dtype)
        oh1 = jax.nn.one_hot(bo1[:, 0], self.num_ang_bins, axis=1, dtype=x.dtype)
        ang = oh0 * ((1 - wo1) * mag) + oh1 * (wo1 * mag)
        ks = self.spatial_bin_size
        pool = _get_pooling_kernel(ks, x.dtype)
        w = jnp.broadcast_to(pool, (self.num_ang_bins, ks, ks))[:, None]
        descs = []
        nsb = self.num_spatial_bins
        # pool each spatial bin with its own offset (static unroll)
        base = lax.conv_general_dilated(
            jnp.pad(ang, [(0, 0), (0, 0)] + [(self.padding + ks * (nsb // 2),) * 2] * 2),
            w, (self.stride, self.stride), "VALID",
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            feature_group_count=self.num_ang_bins)
        for iy in range(nsb):
            for ix in range(nsb):
                sl = base[:, :, iy * ks : iy * ks + H, ix * ks : ix * ks + W]
                descs.append(sl)
        desc = jnp.concatenate(descs, axis=1)  # (B, 128, H, W)
        n = jnp.linalg.norm(desc, axis=1, keepdims=True)
        desc = desc / jnp.maximum(n, eps)
        desc = jnp.clip(desc, 0.0, self.clipval)
        n = jnp.linalg.norm(desc, axis=1, keepdims=True)
        desc = desc / jnp.maximum(n, eps)
        if self.rootsift:
            desc = jnp.sqrt(
                desc / jnp.maximum(jnp.sum(desc, axis=1, keepdims=True), eps) + eps)
        return desc
