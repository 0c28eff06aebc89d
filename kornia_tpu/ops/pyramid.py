"""Image pyramids (reference: kornia/geometry/transform/pyramid.py, 557 LoC).

`ScalePyramid` is the SIFT-style octave stack feeding the detectors.
TPU note: the reference loops octaves in Python with shrinking shapes;
that is unavoidable under XLA too (shapes differ per octave) but each
octave's level stack is built with one batched separable blur, and the
octave count is static from the input shape.
"""

from __future__ import annotations

import math
from typing import List, Tuple

import jax
import jax.numpy as jnp

from ..core.check import check_shape
from ..core.dtype import as_float
from .filters import filter2d, gaussian_blur2d, get_gaussian_kernel1d, filter2d_separable
from .warp import resize

__all__ = [
    "pyrdown",
    "pyrup",
    "build_pyramid",
    "build_laplacian_pyramid",
    "upscale_double",
    "ScalePyramid",
]

_PYR_KERNEL = jnp.array(
    [[1.0, 4.0, 6.0, 4.0, 1.0]]
) / 16.0


def pyrdown(input: jax.Array, border_type: str = "reflect",
            align_corners: bool = False, factor: float = 2.0) -> jax.Array:
    """Blur + downsample by 2 (reference: pyramid.py:373)."""
    x = as_float(input)
    k = _PYR_KERNEL.astype(x.dtype)
    blurred = filter2d_separable(x, k, k, border_type)
    H, W = x.shape[-2:]
    out_h = int(float(H) / factor)
    out_w = int(float(W) / factor)
    return resize(blurred, (out_h, out_w), "bilinear", align_corners=align_corners)


def pyrup(input: jax.Array, border_type: str = "reflect",
          align_corners: bool = False) -> jax.Array:
    """Upsample by 2 + blur (reference: pyramid.py:416)."""
    x = as_float(input)
    H, W = x.shape[-2:]
    up = resize(x, (2 * H, 2 * W), "bilinear", align_corners=align_corners)
    k = _PYR_KERNEL.astype(x.dtype)
    return filter2d_separable(up, k, k, border_type)


def build_pyramid(input: jax.Array, max_level: int,
                  border_type: str = "reflect",
                  align_corners: bool = False) -> List[jax.Array]:
    """Gaussian pyramid list, level 0 = input (reference: pyramid.py:454)."""
    pyramid = [as_float(input)]
    for _ in range(max_level - 1):
        pyramid.append(pyrdown(pyramid[-1], border_type, align_corners))
    return pyramid


def build_laplacian_pyramid(input: jax.Array, max_level: int,
                            border_type: str = "reflect",
                            align_corners: bool = False) -> List[jax.Array]:
    """(reference: pyramid.py:506). Last level is the gaussian residual."""
    gp = build_pyramid(input, max_level, border_type, align_corners)
    lp = []
    for i in range(max_level - 1):
        up = pyrup(gp[i + 1], border_type, align_corners)
        up = resize(up, gp[i].shape[-2:], "bilinear")
        lp.append(gp[i] - up)
    lp.append(gp[-1])
    return lp


def upscale_double(x: jax.Array) -> jax.Array:
    return resize(as_float(x), (x.shape[-2] * 2, x.shape[-1] * 2), "bilinear",
                  align_corners=True)


class ScalePyramid:
    """SIFT-style scale pyramid (reference: pyramid.py:145).

    Returns per octave a (B, L, C, H, W) level stack plus sigma and pixel
    distance bookkeeping, L = n_levels + extra_levels.
    """

    def __init__(self, n_levels: int = 3, init_sigma: float = 1.6,
                 min_size: int = 15, double_image: bool = False):
        self.n_levels = n_levels
        self.init_sigma = init_sigma
        self.min_size = min_size
        self.double_image = double_image
        self.extra_levels = 3
        self.sigma_step = 2.0 ** (1.0 / n_levels)

    def n_octaves(self, h: int, w: int) -> int:
        size = min(h, w) * (2 if self.double_image else 1)
        n = 0
        while size >= self.min_size:
            n += 1
            size //= 2
        return max(n, 1)

    def get_first_level(self, input: jax.Array) -> Tuple[jax.Array, float, float]:
        if self.double_image:
            x = upscale_double(input)
            pixel_dist = 0.5
        else:
            x = input
            pixel_dist = 1.0
        # bring image to init_sigma (assume capture sigma 0.5 per reference)
        cur_sigma = 0.5 / pixel_dist
        if self.init_sigma > cur_sigma:
            sigma = math.sqrt(self.init_sigma**2 - cur_sigma**2)
            ksize = self.get_kernel_size(sigma)
            x = gaussian_blur2d(x, ksize, sigma, border_type="replicate")
            cur_sigma = self.init_sigma
        return x, cur_sigma, pixel_dist

    @staticmethod
    def get_kernel_size(sigma: float) -> int:
        ksize = 2 * int(math.ceil(4.0 * sigma)) + 1
        return max(ksize, 3)

    def _level_kernels(self, cur_sigma: float) -> Tuple[list, list]:
        """Incremental 1-D gaussian kernels for levels 1..L-1 plus the
        level sigmas (static floats — identical to the sequential loop)."""
        L = self.n_levels + self.extra_levels
        kernels, sigmas = [], []
        level_sigma = cur_sigma
        for _ in range(1, L):
            target = level_sigma * self.sigma_step
            sigma_diff = math.sqrt(max(target**2 - level_sigma**2, 1e-12))
            ksize = self.get_kernel_size(sigma_diff)
            kernels.append(get_gaussian_kernel1d(ksize, sigma_diff))
            level_sigma = target
            sigmas.append(level_sigma)
        return kernels, sigmas

    def __call__(self, input: jax.Array
                 ) -> Tuple[List[jax.Array], List[jax.Array], List[jax.Array]]:
        """Returns (pyramid levels per octave (B, L, C, h, w),
        sigmas (B, L) per octave, pixel_dists (B, L) per octave)."""
        x = as_float(input)
        B = x.shape[0]
        L = self.n_levels + self.extra_levels
        cur, cur_sigma, pixel_dist = self.get_first_level(x)
        octaves = []
        sigmas_out = []
        dists_out = []
        oct_count = self.n_octaves(x.shape[-2], x.shape[-1])
        for o in range(oct_count):
            h_o, w_o = cur.shape[-2:]
            kernels, lvl_sigmas = self._level_kernels(cur_sigma)
            sigmas = [cur_sigma * pixel_dist] + \
                [s * pixel_dist for s in lvl_sigmas]
            import os
            if (jax.default_backend() == "tpu" and 32 <= h_o <= 768
                    and 32 <= w_o <= 768
                    and os.environ.get("KORNIA_TPU_ML_BLUR", "1") != "0"):
                # every level of the octave in ONE pallas_call: the
                # sequential blur chain as cumulative banded-operator
                # products (exact semantics, no inter-level dependency —
                # ROOFLINE item 3a)
                from .pallas_kernels import multi_level_blur
                lv = multi_level_blur(cur, kernels, kernels,
                                      border_type="replicate")
                levels = [cur] + [lv[i] for i in range(L - 1)]
            else:
                levels = [cur]
                for k in kernels:
                    levels.append(filter2d_separable(
                        levels[-1], k, k, border_type="replicate"))
            stack = jnp.stack(levels, axis=1)  # (B, L, C, h, w)
            octaves.append(stack)
            sigmas_out.append(jnp.broadcast_to(
                jnp.asarray(sigmas, x.dtype), (B, L)))
            dists_out.append(jnp.full((B, L), pixel_dist, x.dtype))
            # next octave: downsample the level with sigma 2*init (index n_levels)
            next_base = levels[self.n_levels]
            h, w = next_base.shape[-2:]
            if min(h, w) // 2 < self.min_size // 2 + 1 or o == oct_count - 1:
                if o == oct_count - 1:
                    break
            cur = resize(next_base, (h // 2, w // 2), "bilinear")
            pixel_dist *= 2.0
            # cur_sigma stays: downsampling halves spatial frequency
        return octaves, sigmas_out, dists_out
