"""Differentiable-ish rasterization helpers
(reference: kornia/image/draw.py — draw_line, draw_rectangle, draw_point2d,
draw_convex_polygon). Coverage-based formulations: each primitive renders
via a distance field + mask, so everything is batched and jit-safe.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..core.dtype import as_float

__all__ = ["draw_point2d", "draw_line", "draw_rectangle",
           "draw_convex_polygon"]


def _color(color, C, dtype):
    c = jnp.asarray(color, dtype)
    return c.reshape(-1)[:C].reshape(C, 1, 1)


def draw_point2d(image: jax.Array, points: jax.Array, color) -> jax.Array:
    """Set pixels at integer (x, y) points. image (C, H, W), points (N, 2)."""
    image = as_float(image)
    C, H, W = image.shape
    x = jnp.clip(points[..., 0].astype(jnp.int32), 0, W - 1)
    y = jnp.clip(points[..., 1].astype(jnp.int32), 0, H - 1)
    col = jnp.asarray(color, image.dtype).reshape(-1)[:C]
    return image.at[:, y, x].set(col[:, None])


def draw_line(image: jax.Array, p1: jax.Array, p2: jax.Array, color
              ) -> jax.Array:
    """Anti-alias-free 1px line via point-to-segment distance
    (reference: image/draw.py draw_line). image (C, H, W), p1/p2 (2,)."""
    image = as_float(image)
    C, H, W = image.shape
    p1 = as_float(p1)
    p2 = as_float(p2)
    ys, xs = jnp.meshgrid(jnp.arange(H, dtype=image.dtype),
                          jnp.arange(W, dtype=image.dtype), indexing="ij")
    d = p2 - p1
    len2 = jnp.maximum(jnp.sum(d * d), 1e-8)
    t = ((xs - p1[0]) * d[0] + (ys - p1[1]) * d[1]) / len2
    t = jnp.clip(t, 0.0, 1.0)
    projx = p1[0] + t * d[0]
    projy = p1[1] + t * d[1]
    dist = jnp.sqrt((xs - projx) ** 2 + (ys - projy) ** 2)
    mask = (dist <= 0.5).astype(image.dtype)[None]
    return image * (1 - mask) + _color(color, C, image.dtype) * mask


def draw_rectangle(image: jax.Array, rectangle: jax.Array, color,
                   fill: bool = False) -> jax.Array:
    """Rect (B, N, 4) xyxy onto (B, C, H, W)
    (reference: image/draw.py draw_rectangle)."""
    image = as_float(image)
    B, C, H, W = image.shape
    rect = as_float(rectangle)
    ys = jnp.arange(H, dtype=image.dtype)[None, None, :, None]
    xs = jnp.arange(W, dtype=image.dtype)[None, None, None, :]
    x0 = rect[..., 0][..., None, None]
    y0 = rect[..., 1][..., None, None]
    x1 = rect[..., 2][..., None, None]
    y1 = rect[..., 3][..., None, None]
    inside = (xs >= x0) & (xs <= x1) & (ys >= y0) & (ys <= y1)
    if fill:
        mask = inside
    else:
        border = ((jnp.abs(xs - x0) < 1) | (jnp.abs(xs - x1) < 1)
                  | (jnp.abs(ys - y0) < 1) | (jnp.abs(ys - y1) < 1))
        mask = inside & border
    mask = jnp.any(mask, axis=1)[:, None].astype(image.dtype)  # over N boxes
    col = jnp.asarray(color, image.dtype).reshape(1, -1, 1, 1)
    return image * (1 - mask) + col * mask


def draw_convex_polygon(image: jax.Array, polygons: jax.Array, color
                        ) -> jax.Array:
    """Fill convex polygons (B, N, 2) onto (B, C, H, W) via half-plane
    intersection (reference: image/draw.py draw_convex_polygon)."""
    image = as_float(image)
    B, C, H, W = image.shape
    poly = as_float(polygons)
    N = poly.shape[1]
    ys, xs = jnp.meshgrid(jnp.arange(H, dtype=image.dtype),
                          jnp.arange(W, dtype=image.dtype), indexing="ij")
    inside = jnp.ones((B, H, W), dtype=bool)
    for i in range(N):
        a = poly[:, i]
        b = poly[:, (i + 1) % N]
        # cross product sign: inside if consistently on one side
        cx = (b[:, 0] - a[:, 0])[:, None, None]
        cy = (b[:, 1] - a[:, 1])[:, None, None]
        px = xs[None] - a[:, 0][:, None, None]
        py = ys[None] - a[:, 1][:, None, None]
        cross = cx * py - cy * px
        inside = inside & (cross >= 0)
    mask = inside[:, None].astype(image.dtype)
    col = jnp.asarray(color, image.dtype).reshape(1, -1, 1, 1)
    return image * (1 - mask) + col * mask
