"""Subpixel localization: NMS, soft-argmax, quadratic interpolation, DSNT
(reference: kornia/geometry/subpix/, 2.8k LoC)."""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from ..core.check import check, check_shape
from ..core.dtype import as_float
from ..core.grid import create_meshgrid

__all__ = [
    "nms2d",
    "nms3d",
    "spatial_softmax2d",
    "spatial_expectation2d",
    "spatial_soft_argmax2d",
    "render_gaussian2d",
    "conv_soft_argmax2d",
    "conv_soft_argmax3d",
    "conv_quad_interp3d",
]


def nms2d(x: jax.Array, kernel_size: Tuple[int, int] = (3, 3),
          mask_only: bool = False) -> jax.Array:
    """Hard NMS: keep values STRICTLY greater than every neighbor in the
    window (center excluded; replicate padding) — exact reference
    semantics (subpix/nms.py NonMaximaSuppression2d: plateaus die)."""
    x = as_float(x)
    kh, kw = kernel_size
    B, C, H, W = x.shape
    xp = jnp.pad(x, [(0, 0), (0, 0), (kh // 2, (kh - 1) // 2),
                     (kw // 2, (kw - 1) // 2)], mode="edge")
    max_non_center = jnp.full_like(x, -jnp.inf)
    for dy in range(kh):
        for dx in range(kw):
            if dy == kh // 2 and dx == kw // 2:
                continue
            tap = lax.dynamic_slice(xp, (0, 0, dy, dx), (B, C, H, W))
            max_non_center = jnp.maximum(max_non_center, tap)
    mask = x > max_non_center
    if mask_only:
        return mask
    return x * mask.astype(x.dtype)


def nms3d(x: jax.Array, kernel_size: Tuple[int, int, int] = (3, 3, 3),
          mask_only: bool = False) -> jax.Array:
    """(B, C, D, H, W) NMS (reference: subpix/nms.py:332)."""
    x = as_float(x)
    kd, kh, kw = kernel_size
    pooled = lax.reduce_window(
        x, -jnp.inf, lax.max, (1, 1, kd, kh, kw), (1, 1, 1, 1, 1), "SAME"
    )
    mask = x == pooled
    if mask_only:
        return mask
    return x * mask.astype(x.dtype)


def spatial_softmax2d(x: jax.Array, temperature=1.0) -> jax.Array:
    """Per-channel softmax over H*W (reference: subpix/dsnt.py:39)."""
    x = as_float(x)
    B, C, H, W = x.shape
    flat = x.reshape(B, C, -1) * temperature
    return jax.nn.softmax(flat, axis=-1).reshape(B, C, H, W)


def spatial_expectation2d(p: jax.Array, normalized_coordinates: bool = True
                          ) -> jax.Array:
    """Expected (x, y) under a spatial distribution
    (reference: dsnt.py:76)."""
    B, C, H, W = p.shape
    grid = create_meshgrid(H, W, normalized_coordinates, p.dtype)  # (1,H,W,2)
    ex = jnp.sum(p * grid[0, ..., 0], axis=(-2, -1))
    ey = jnp.sum(p * grid[0, ..., 1], axis=(-2, -1))
    return jnp.stack([ex, ey], axis=-1)  # (B, C, 2)


def spatial_soft_argmax2d(x: jax.Array, temperature=1.0,
                          normalized_coordinates: bool = True) -> jax.Array:
    """(reference: subpix/spatial_soft_argmax.py:546)."""
    return spatial_expectation2d(spatial_softmax2d(x, temperature),
                                 normalized_coordinates)


def render_gaussian2d(mean: jax.Array, std: jax.Array, size: Tuple[int, int],
                      normalized_coordinates: bool = True) -> jax.Array:
    """Render isotropic gaussians at (B, N, 2) means
    (reference: dsnt.py:121)."""
    H, W = size
    grid = create_meshgrid(H, W, normalized_coordinates, mean.dtype)[0]
    dx = grid[None, None, ..., 0] - mean[..., 0][..., None, None]
    dy = grid[None, None, ..., 1] - mean[..., 1][..., None, None]
    sx = std[..., 0][..., None, None]
    sy = std[..., 1][..., None, None]
    g = jnp.exp(-0.5 * ((dx / sx) ** 2 + (dy / sy) ** 2))
    return g / jnp.maximum(jnp.sum(g, axis=(-2, -1), keepdims=True), 1e-12)


def _window_sum(x: jax.Array, k: Tuple[int, int], stride: Tuple[int, int],
                pad: int) -> jax.Array:
    return lax.reduce_window(
        x, 0.0, lax.add, (1, 1, *k), (1, 1, *stride),
        [(0, 0), (0, 0), (pad, pad), (pad, pad)],
    )


def conv_soft_argmax2d(
    x: jax.Array,
    kernel_size: Tuple[int, int] = (3, 3),
    stride: Tuple[int, int] = (1, 1),
    padding: Tuple[int, int] = (1, 1),
    temperature=1.0,
    normalized_coordinates: bool = True,
    output_value: bool = False,
):
    """Windowed soft-argmax: per window, softmax-weighted coordinates
    (reference: subpix/spatial_soft_argmax.py:303).

    Implemented with pooled exp-sums instead of unfold: two reduce_window
    passes compute the normalizer and the coordinate expectations — no
    (B, C·k², L) unfold tensor, TPU friendly."""
    x = as_float(x)
    B, C, H, W = x.shape
    kh, kw = kernel_size
    ph, pw = padding
    # numeric stabilization: subtract global max (cheap, exact for softmax)
    x_s = (x - jax.lax.stop_gradient(jnp.max(x, axis=(-2, -1), keepdims=True))) / jnp.maximum(
        jnp.asarray(temperature, x.dtype), 1e-8)
    e = jnp.exp(x_s)
    grid = create_meshgrid(H, W, False, x.dtype)[0]  # pixel coords
    gx = jnp.broadcast_to(grid[..., 0], (B, C, H, W))
    gy = jnp.broadcast_to(grid[..., 1], (B, C, H, W))

    def pool(t):
        return lax.reduce_window(
            t, 0.0, lax.add, (1, 1, kh, kw), (1, 1, *stride),
            [(0, 0), (0, 0), (ph, ph), (pw, pw)],
        )

    den = jnp.maximum(pool(e), 1e-12)
    ex = pool(e * gx) / den
    ey = pool(e * gy) / den
    if normalized_coordinates:
        ex = 2.0 * ex / max(W - 1, 1) - 1.0
        ey = 2.0 * ey / max(H - 1, 1) - 1.0
    coords = jnp.stack([ex, ey], axis=2)  # (B, C, 2, Ho, Wo)
    if output_value:
        val = pool(e * x) / den
        return coords, val
    return coords


def conv_soft_argmax3d(
    x: jax.Array,
    kernel_size: Tuple[int, int, int] = (3, 3, 3),
    stride: Tuple[int, int, int] = (1, 1, 1),
    padding: Tuple[int, int, int] = (1, 1, 1),
    temperature=1.0,
    normalized_coordinates: bool = False,
    output_value: bool = True,
):
    """(B, C, D, H, W) windowed soft-argmax (reference: :417)."""
    x = as_float(x)
    B, C, D, H, W = x.shape
    x_s = (x - jax.lax.stop_gradient(jnp.max(x, axis=(-3, -2, -1), keepdims=True))) / jnp.maximum(
        jnp.asarray(temperature, x.dtype), 1e-8)
    e = jnp.exp(x_s)
    zs = jnp.arange(D, dtype=x.dtype).reshape(D, 1, 1)
    ys = jnp.arange(H, dtype=x.dtype).reshape(1, H, 1)
    xs = jnp.arange(W, dtype=x.dtype).reshape(1, 1, W)
    gz = jnp.broadcast_to(zs, (B, C, D, H, W))
    gy = jnp.broadcast_to(ys, (B, C, D, H, W))
    gx = jnp.broadcast_to(xs, (B, C, D, H, W))

    def pool(t):
        return lax.reduce_window(
            t, 0.0, lax.add, (1, 1, *kernel_size), (1, 1, *stride),
            [(0, 0), (0, 0), (padding[0],) * 2, (padding[1],) * 2,
             (padding[2],) * 2],
        )

    den = jnp.maximum(pool(e), 1e-12)
    ez = pool(e * gz) / den
    ey = pool(e * gy) / den
    ex = pool(e * gx) / den
    if normalized_coordinates:
        ez = 2.0 * ez / max(D - 1, 1) - 1.0
        ey = 2.0 * ey / max(H - 1, 1) - 1.0
        ex = 2.0 * ex / max(W - 1, 1) - 1.0
    coords = jnp.stack([ex, ey, ez], axis=2)
    if output_value:
        val = pool(e * x) / den
        return coords, val
    return coords


def conv_quad_interp3d(x: jax.Array, strict_maxima_bonus: float = 10.0,
                       eps: float = 1e-7) -> Tuple[jax.Array, jax.Array]:
    """Quadratic subpixel refinement of 3D local maxima in a (B, C, D, H, W)
    scale-space response (reference: subpix/spatial_soft_argmax.py:665 —
    the SIFT-style detector's localization step).

    Returns (coords (B, C, 3, D, H, W) with (x, y, s) offsets applied to
    the integer grid, refined values (B, C, D, H, W))."""
    x = as_float(x)
    B, C, D, H, W = x.shape
    # first and second derivatives by central differences
    xp = jnp.pad(x, [(0, 0), (0, 0), (1, 1), (1, 1), (1, 1)], mode="edge")

    def sl(dz, dy, dx):
        return lax.dynamic_slice(xp, (0, 0, 1 + dz, 1 + dy, 1 + dx),
                                 (B, C, D, H, W))

    gx = 0.5 * (sl(0, 0, 1) - sl(0, 0, -1))
    gy = 0.5 * (sl(0, 1, 0) - sl(0, -1, 0))
    gs = 0.5 * (sl(1, 0, 0) - sl(-1, 0, 0))
    dxx = sl(0, 0, 1) + sl(0, 0, -1) - 2 * x
    dyy = sl(0, 1, 0) + sl(0, -1, 0) - 2 * x
    dss = sl(1, 0, 0) + sl(-1, 0, 0) - 2 * x
    dxy = 0.25 * (sl(0, 1, 1) - sl(0, 1, -1) - sl(0, -1, 1) + sl(0, -1, -1))
    dxs = 0.25 * (sl(1, 0, 1) - sl(1, 0, -1) - sl(-1, 0, 1) + sl(-1, 0, -1))
    dys = 0.25 * (sl(1, 1, 0) - sl(1, -1, 0) - sl(-1, 1, 0) + sl(-1, -1, 0))
    # Hessian (3x3) and gradient (3,) per voxel, order (x, y, s)
    Hmat = jnp.stack(
        [
            jnp.stack([dxx, dxy, dxs], axis=-1),
            jnp.stack([dxy, dyy, dys], axis=-1),
            jnp.stack([dxs, dys, dss], axis=-1),
        ],
        axis=-2,
    )  # (B, C, D, H, W, 3, 3)
    g = jnp.stack([gx, gy, gs], axis=-1)[..., None]  # (..., 3, 1)
    # solve H dx = -g with regularization; clamp offsets to [-0.5, 0.5]
    eye = jnp.eye(3, dtype=x.dtype)
    Hreg = Hmat + eps * eye
    det = jnp.linalg.det(Hreg)
    ok = jnp.abs(det) > eps
    Hsafe = jnp.where(ok[..., None, None], Hreg, eye)
    offset = -jnp.linalg.solve(Hsafe, g)[..., 0]  # (B, C, D, H, W, 3)
    offset = jnp.where(ok[..., None], offset, 0.0)
    offset = jnp.clip(offset, -0.5, 0.5)
    dval = 0.5 * jnp.sum(g[..., 0] * offset, axis=-1)
    y_refined = x + dval
    # strict maxima bonus: reward voxels that are the strict local max
    if strict_maxima_bonus > 0:
        pooled = lax.reduce_window(
            x, -jnp.inf, lax.max, (1, 1, 3, 3, 3), (1, 1, 1, 1, 1), "SAME")
        is_max = (x == pooled)
        y_refined = y_refined + strict_maxima_bonus * is_max.astype(x.dtype)
    # coords: integer grid + offsets, order (x, y, s)
    zs = jnp.arange(D, dtype=x.dtype).reshape(D, 1, 1)
    ys = jnp.arange(H, dtype=x.dtype).reshape(1, H, 1)
    xs = jnp.arange(W, dtype=x.dtype).reshape(1, 1, W)
    cx = jnp.broadcast_to(xs, (B, C, D, H, W)) + offset[..., 0]
    cy = jnp.broadcast_to(ys, (B, C, D, H, W)) + offset[..., 1]
    cs = jnp.broadcast_to(zs, (B, C, D, H, W)) + offset[..., 2]
    coords = jnp.stack([cx, cy, cs], axis=2)
    return coords, y_refined
