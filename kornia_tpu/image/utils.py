"""Image layout utilities (reference: kornia/image/utils.py)."""

from __future__ import annotations

import functools
from typing import Any, Callable, List, Optional

import jax
import jax.numpy as jnp

__all__ = [
    "image_list_to_tensor", "make_grid",
    "perform_keep_shape_image", "perform_keep_shape_video",
]


def image_list_to_tensor(images: List[Any]) -> jax.Array:
    """List of (H, W, C) images → (B, C, H, W) array
    (reference: image/utils.py:76)."""
    if not images:
        raise ValueError("Input list of images is empty")
    stacked = jnp.stack([jnp.asarray(im) for im in images])  # (B, H, W, C)
    if stacked.ndim != 4:
        raise ValueError(f"images must be (H, W, C), got {stacked.shape[1:]}")
    return jnp.moveaxis(stacked, -1, 1)


def make_grid(tensor: jax.Array, n_row: Optional[int] = None,
              padding: int = 2) -> jax.Array:
    """Tile a (B, C, H, W) batch into one (C, H', W') image with padding
    (reference: image/utils.py:257)."""
    tensor = jnp.asarray(tensor)
    B, C, H, W = tensor.shape
    if n_row is None:
        n_row = int(jnp.ceil(jnp.sqrt(B)))
    n_col = (B + n_row - 1) // n_row
    pH, pW = H + padding, W + padding
    padded = jnp.pad(tensor, [(0, n_row * n_col - B), (0, 0),
                              (0, padding), (0, padding)])
    grid = padded.reshape(n_row, n_col, C, pH, pW)
    grid = jnp.transpose(grid, (2, 0, 3, 1, 4)).reshape(
        C, n_row * pH, n_col * pW)
    return grid[:, : n_row * pH - padding, : n_col * pW - padding]


def _keep_shape(f: Callable, spatial_dims: int) -> Callable:
    @functools.wraps(f)
    def wrapper(input, *args, **kwargs):
        x = jnp.asarray(input)
        in_shape = x.shape
        lead = in_shape[: x.ndim - (spatial_dims + 1)]
        x = x.reshape((-1,) + in_shape[x.ndim - (spatial_dims + 1):]) \
            if x.ndim > spatial_dims + 1 else x[None]
        if x.ndim == spatial_dims + 1:
            x = x[None]
        out = f(x, *args, **kwargs)
        return out.reshape(lead + out.shape[1:]) if lead else out[0]
    return wrapper


def perform_keep_shape_image(f: Callable) -> Callable:
    """Decorator: accept (..., C, H, W), run `f` on (B, C, H, W), restore
    the leading shape (reference: image/utils.py:306)."""
    return _keep_shape(f, 3)


def perform_keep_shape_video(f: Callable) -> Callable:
    """Same for (..., C, T, H, W) video (reference: image/utils.py:338)."""
    return _keep_shape(f, 4)
