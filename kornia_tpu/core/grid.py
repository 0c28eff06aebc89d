"""Coordinate grid builders (reference: kornia/utils/grid.py:121 create_meshgrid)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["create_meshgrid", "create_meshgrid3d", "normalize_pixel_coordinates",
           "denormalize_pixel_coordinates", "normalize_pixel_coordinates3d",
           "denormalize_pixel_coordinates3d"]


def create_meshgrid(
    height: int,
    width: int,
    normalized_coordinates: bool = True,
    dtype=jnp.float32,
) -> jax.Array:
    """(1, H, W, 2) grid of (x, y) coordinates.

    Normalized coordinates span [-1, 1] (same convention as the reference /
    torch grid_sample align_corners=True).
    """
    if normalized_coordinates:
        xs = jnp.linspace(-1.0, 1.0, width, dtype=dtype)
        ys = jnp.linspace(-1.0, 1.0, height, dtype=dtype)
    else:
        xs = jnp.arange(width, dtype=dtype)
        ys = jnp.arange(height, dtype=dtype)
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    return jnp.stack([gx, gy], axis=-1)[None]


def create_meshgrid3d(
    depth: int,
    height: int,
    width: int,
    normalized_coordinates: bool = True,
    dtype=jnp.float32,
) -> jax.Array:
    """(1, D, H, W, 3) grid of (x, y, z) coordinates."""
    if normalized_coordinates:
        xs = jnp.linspace(-1.0, 1.0, width, dtype=dtype)
        ys = jnp.linspace(-1.0, 1.0, height, dtype=dtype)
        zs = jnp.linspace(-1.0, 1.0, depth, dtype=dtype)
    else:
        xs = jnp.arange(width, dtype=dtype)
        ys = jnp.arange(height, dtype=dtype)
        zs = jnp.arange(depth, dtype=dtype)
    gz, gy, gx = jnp.meshgrid(zs, ys, xs, indexing="ij")
    return jnp.stack([gx, gy, gz], axis=-1)[None]


def normalize_pixel_coordinates(pixel: jax.Array, height: int, width: int,
                                eps: float = 1e-8) -> jax.Array:
    """Pixel coords (..., 2) in [0, W-1]x[0, H-1] → [-1, 1]^2
    (reference: geometry/conversions.py normalize_pixel_coordinates)."""
    wh = jnp.array([width - 1, height - 1], dtype=pixel.dtype)
    return 2.0 * pixel / jnp.maximum(wh, eps) - 1.0


def denormalize_pixel_coordinates(coord: jax.Array, height: int, width: int,
                                  eps: float = 1e-8) -> jax.Array:
    wh = jnp.array([width - 1, height - 1], dtype=coord.dtype)
    return (coord + 1.0) * jnp.maximum(wh, eps) / 2.0


def normalize_pixel_coordinates3d(pixel: jax.Array, depth: int, height: int,
                                  width: int, eps: float = 1e-8) -> jax.Array:
    whd = jnp.array([width - 1, height - 1, depth - 1], dtype=pixel.dtype)
    return 2.0 * pixel / jnp.maximum(whd, eps) - 1.0


def denormalize_pixel_coordinates3d(coord: jax.Array, depth: int, height: int,
                                    width: int, eps: float = 1e-8) -> jax.Array:
    whd = jnp.array([width - 1, height - 1, depth - 1], dtype=coord.dtype)
    return (coord + 1.0) * jnp.maximum(whd, eps) / 2.0
