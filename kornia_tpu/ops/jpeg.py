"""Differentiable JPEG codec (reference: kornia/enhance/jpeg.py:44-299).

Reference-exact semantics (Reich et al. 2024 "differentiable JPEG"):
polynomial floor/round surrogates, soft exponential clipping, the
(QT*scale + 50)/100 table quantization law, 4:2:0 chroma subsampling with
an antialiased bilinear half-scale, bilinear upsampling on decode, and
replicate padding to /16. The 8x8 DCT runs as two matmuls against the
orthonormal DCT-II matrix — MXU-shaped, numerically identical to the
reference's scaled cosine basis tensordot.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.dtype import as_float

__all__ = ["jpeg_codec_differentiable"]

# standard JPEG quantization tables
_QT_Y = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99],
], np.float32)
_QT_C = np.array([
    [17, 18, 24, 47, 99, 99, 99, 99],
    [18, 21, 26, 66, 99, 99, 99, 99],
    [24, 26, 56, 99, 99, 99, 99, 99],
    [47, 66, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
], np.float32)


def _dct_matrix(n: int = 8) -> np.ndarray:
    k = np.arange(n)
    M = np.sqrt(2.0 / n) * np.cos(np.pi * (2 * k[None, :] + 1) * k[:, None]
                                  / (2 * n))
    M[0] *= 1.0 / np.sqrt(2.0)
    return M.astype(np.float32)


_DCT = _dct_matrix()


def _blockify(x: jax.Array) -> jax.Array:
    """(B, H, W) → (B, nblocks, 8, 8)."""
    B, H, W = x.shape
    x = x.reshape(B, H // 8, 8, W // 8, 8).transpose(0, 1, 3, 2, 4)
    return x.reshape(B, -1, 8, 8)


def _unblockify(x: jax.Array, H: int, W: int) -> jax.Array:
    B = x.shape[0]
    x = x.reshape(B, H // 8, W // 8, 8, 8).transpose(0, 1, 3, 2, 4)
    return x.reshape(B, H, W)


def _poly_round(x: jax.Array) -> jax.Array:
    """round(x) + (x - round(x))^3 (jpeg.py
    _differentiable_polynomial_rounding — the cubic term is part of the
    FORWARD value, not just the gradient surrogate)."""
    xr = jnp.round(x)
    return xr + (x - xr) ** 3


def _poly_floor(x: jax.Array) -> jax.Array:
    """floor(x) + (x - 0.5 - floor(x))^3 (jpeg.py
    _differentiable_polynomial_floor)."""
    xf = jnp.floor(x)
    return xf + (x - 0.5 - xf) ** 3


def _soft_clip(x: jax.Array, min_val: float, max_val: float,
               scale: float = 0.02) -> jax.Array:
    """Soft exponential clipping (jpeg.py _differentiable_clipping)."""
    x = jnp.where(x > max_val,
                  -scale * (jnp.exp(jnp.minimum(-x + max_val, 0.0)) - 1.0)
                  + max_val, x)
    x = jnp.where(x < min_val,
                  scale * (jnp.exp(jnp.minimum(x - min_val, 0.0)) - 1.0)
                  + min_val, x)
    return x


def _quality_to_scale(q: jax.Array) -> jax.Array:
    """JPEG quality → quantization-table scale
    (jpeg.py _jpeg_quality_to_scale): poly_floor(5000/q | 200-2q)."""
    return _poly_floor(jnp.where(q < 50.0, 5000.0 / q, 200.0 - 2.0 * q))


def _scaled_qtable(qt: jax.Array, q: jax.Array) -> jax.Array:
    """(B, 8, 8) effective quantization table (jpeg.py _quantize):
    poly_floor(soft_clip((QT * scale + 50) / 100, 1, 255))."""
    scaled = qt[None] * _quality_to_scale(q)[:, None, None]
    return _poly_floor(_soft_clip((scaled + 50.0) / 100.0, 1.0, 255.0))


def _down2_antialias(x: jax.Array) -> jax.Array:
    """Half-scale with kornia's antialias (jpeg.py _chroma_subsampling →
    rescale(0.5, bilinear, antialias=True), affwarp.resize): a 3x3
    Gaussian pre-blur with sigma = (1/scale - 1)/2 = 0.5, then plain
    bilinear — which at exactly half scale is 2x2 averaging."""
    from .filters import gaussian_blur2d
    B, H, W = x.shape
    blurred = gaussian_blur2d(x[:, None], 3, (0.5, 0.5), "reflect")[:, 0]
    return blurred.reshape(B, H // 2, 2, W // 2, 2).mean(axis=(2, 4))


def _up2_bilinear(x: jax.Array) -> jax.Array:
    """2x bilinear upsample, align_corners=False (jpeg.py
    _chroma_upsampling): output 2k → 0.25*in[k-1] + 0.75*in[k];
    2k+1 → 0.75*in[k] + 0.25*in[k+1]; edge-clamped."""
    def one_axis(a, size):
        k = jnp.arange(size)
        lo = jnp.clip(k - 1, 0, size - 1)
        hi = jnp.clip(k + 1, 0, size - 1)
        even = 0.25 * a[..., lo] + 0.75 * a[..., k]
        odd = 0.75 * a[..., k] + 0.25 * a[..., hi]
        return jnp.stack([even, odd], -1).reshape(*a.shape[:-1], 2 * size)

    B, H, W = x.shape
    x = jnp.moveaxis(one_axis(jnp.moveaxis(x, 1, -1), H), -1, 1)
    return one_axis(x, W)


def jpeg_codec_differentiable(image_rgb: jax.Array, jpeg_quality: jax.Array
                              ) -> jax.Array:
    """Encode+decode (B, 3, H, W) in [0, 1] at quality (B,)
    (reference: enhance/jpeg.py jpeg_codec_differentiable). Arbitrary
    H, W: replicate-padded to /16 internally and cropped back."""
    from .color import rgb_to_ycbcr, ycbcr_to_rgb
    x = as_float(image_rgb)
    B, C, H0, W0 = x.shape
    # pad bottom/right to /16 (jpeg.py _perform_padding)
    h_pad = (-H0) % 16
    w_pad = (-W0) % 16
    if h_pad or w_pad:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, h_pad), (0, w_pad)), mode="edge")
    H, W = H0 + h_pad, W0 + w_pad
    q = jnp.broadcast_to(as_float(jpeg_quality), (B,))
    dct = jnp.asarray(_DCT)
    qt_y = _scaled_qtable(jnp.asarray(_QT_Y), q)[:, None]  # (B, 1, 8, 8)
    qt_c = _scaled_qtable(jnp.asarray(_QT_C), q)[:, None]

    ycbcr = rgb_to_ycbcr(x) * 255.0
    y = ycbcr[:, 0]
    # 4:2:0 chroma subsampling, antialiased bilinear half-scale
    cb_s = _down2_antialias(ycbcr[:, 1])
    cr_s = _down2_antialias(ycbcr[:, 2])

    def encode_decode(plane, qt):
        blocks = _blockify(plane - 128.0)
        coeffs = jnp.einsum("ij,bnjk,lk->bnil", dct, blocks, dct)
        quant = _poly_round(coeffs / qt)
        deq = quant * qt
        rec = jnp.einsum("ji,bnjk,kl->bnil", dct, deq, dct)
        return rec + 128.0

    y_r = _unblockify(encode_decode(y, qt_y), H, W)
    cb_r = _unblockify(encode_decode(cb_s, qt_c), H // 2, W // 2)
    cr_r = _unblockify(encode_decode(cr_s, qt_c), H // 2, W // 2)
    cb_f = _up2_bilinear(cb_r)
    cr_f = _up2_bilinear(cr_r)
    out = ycbcr_to_rgb(jnp.stack([y_r, cb_f, cr_f], axis=1) / 255.0)
    # reference soft-clips the [0,1]-range output against (0, 255): only
    # the lower bound bites (jpeg.py:630)
    out = _soft_clip(out, 0.0, 255.0)
    return out[..., :H0, :W0]
