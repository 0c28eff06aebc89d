"""Deformable 2D convolution (DCNv1/v2), TPU-native.

Reference behavior: kornia/feature/aliked/deform_conv2d.py:33 (pure-torch
port of torchvision.ops.deform_conv2d; papers 1703.06211 / 1811.11168).

TPU-first redesign (NOT a port):
- The input lives as (B, H*W, C) so each of the four bilinear corner
  lookups is ONE row-gather of contiguous C-lane vectors — the layout XLA
  lowers best on TPU — instead of per-channel scatter/gather.
- The kernel contraction is a single (Ho*Wo) x (K*C_in) @ (K*C_in) x C_out
  einsum per group: the FLOPs land on the MXU, fused with the modulation
  mask and bias by XLA.
- Offset/conv groups are unrolled in Python (static, tiny) so everything
  under jit has static shapes.
"""

from __future__ import annotations

from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp

from ..core.dtype import as_float

__all__ = ["deform_conv2d"]

_IntPair = Union[int, Tuple[int, int]]


def _pair(v: _IntPair) -> Tuple[int, int]:
    return (v, v) if isinstance(v, int) else (v[0], v[1])


def deform_conv2d(
    x: jax.Array,
    offset: jax.Array,
    weight: jax.Array,
    bias: Optional[jax.Array] = None,
    stride: _IntPair = (1, 1),
    padding: _IntPair = (0, 0),
    dilation: _IntPair = (1, 1),
    mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Deformable convolution matching ``torchvision.ops.deform_conv2d``.

    Args:
        x: input feature map ``(B, C_in, H, W)``.
        offset: ``(B, 2 * G * kH * kW, Ho, Wo)`` with per-kernel-point
            ``(dy, dx)`` interleaved along the channel dim (G offset groups).
        weight: ``(C_out, C_in // groups, kH, kW)``.
        bias: optional ``(C_out,)``.
        mask: optional DCNv2 modulation ``(B, G * kH * kW, Ho, Wo)``.

    Returns:
        ``(B, C_out, Ho, Wo)``.
    """
    x = as_float(x)
    offset = as_float(offset)
    weight = as_float(weight)
    B, C_in, H, W = x.shape
    C_out, C_in_per_group, kH, kW = weight.shape
    sH, sW = _pair(stride)
    pH, pW = _pair(padding)
    dH, dW = _pair(dilation)
    groups = C_in // C_in_per_group
    K = kH * kW
    G = offset.shape[1] // (2 * K)
    c_per_g = C_in // G

    Ho = (H + 2 * pH - dH * (kH - 1) - 1) // sH + 1
    Wo = (W + 2 * pW - dW * (kW - 1) - 1) // sW + 1
    N = Ho * Wo

    # (B, G, K, 2, Ho, Wo): channel layout is [dy0, dx0, dy1, dx1, ...]
    off = offset.reshape(B, G, K, 2, Ho, Wo)
    # absolute fractional sample positions per output pixel and kernel tap
    oy = (jnp.arange(Ho, dtype=x.dtype) * sH - pH)[:, None]
    ox = (jnp.arange(Wo, dtype=x.dtype) * sW - pW)[None, :]
    ky = (jnp.arange(kH, dtype=x.dtype) * dH).repeat(kW)[:, None, None]
    kx = jnp.tile(jnp.arange(kW, dtype=x.dtype) * dW, kH)[:, None, None]
    sample_h = oy + ky + off[:, :, :, 0]          # (B, G, K, Ho, Wo)
    sample_w = ox + kx + off[:, :, :, 1]

    h0 = jnp.floor(sample_h)
    w0 = jnp.floor(sample_w)
    lh = sample_h - h0
    lw = sample_w - w0
    h0i = h0.astype(jnp.int32)
    w0i = w0.astype(jnp.int32)

    xf = x.reshape(B, C_in, H * W).transpose(0, 2, 1)  # (B, HW, C) row-gather layout

    def corner(hh: jax.Array, ww: jax.Array, wgt: jax.Array, g: int) -> jax.Array:
        valid = ((hh >= 0) & (hh < H) & (ww >= 0) & (ww < W)).astype(x.dtype)
        idx = (jnp.clip(hh, 0, H - 1) * W + jnp.clip(ww, 0, W - 1)).reshape(B, K * N)
        rows = jnp.take_along_axis(
            xf[:, :, g * c_per_g:(g + 1) * c_per_g], idx[:, :, None], axis=1)
        return rows.reshape(B, K, N, c_per_g) * (valid * wgt).reshape(B, K, N, 1)

    sampled = []
    for g in range(G):
        hh0, ww0 = h0i[:, g], w0i[:, g]
        flh, flw = lh[:, g], lw[:, g]
        v = (corner(hh0, ww0, (1 - flh) * (1 - flw), g)
             + corner(hh0, ww0 + 1, (1 - flh) * flw, g)
             + corner(hh0 + 1, ww0, flh * (1 - flw), g)
             + corner(hh0 + 1, ww0 + 1, flh * flw, g))
        if mask is not None:
            m = as_float(mask).reshape(B, G, K, N)[:, g]
            v = v * m[..., None]
        sampled.append(v)                          # (B, K, N, c_per_g)

    # (B, N, K, C_in): taps and channels contiguous for the MXU contraction
    full = jnp.concatenate([s.transpose(0, 2, 1, 3) for s in sampled], axis=-1)
    full = full.reshape(B, N, K, groups, C_in_per_group)
    wf = weight.reshape(groups, C_out // groups, C_in_per_group, K)
    out = jnp.einsum("bnkgc,gock->bngo", full, wf,
                     preferred_element_type=jnp.float32)
    out = out.reshape(B, N, C_out).astype(x.dtype)
    if bias is not None:
        out = out + as_float(bias)
    return out.transpose(0, 2, 1).reshape(B, C_out, Ho, Wo)
