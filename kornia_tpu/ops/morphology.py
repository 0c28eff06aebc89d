"""Grayscale morphology (reference: kornia/morphology/morphology.py:32-511).

The reference unfolds windows into channels + max/min pools
(_neight2channels_like_kernel:26). On TPU we lower directly to
``lax.reduce_window`` for flat structuring elements (a single fused
pooling kernel) and to a shift-and-accumulate over taps for non-flat ones.
All ops support arbitrary (flat) structuring elements via masking.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from ..core.check import check
from ..core.dtype import as_float

__all__ = [
    "dilation",
    "erosion",
    "opening",
    "closing",
    "gradient",
    "top_hat",
    "bottom_hat",
]


def _is_full_ones(kernel: jax.Array) -> bool:
    # static check: only possible when kernel is a concrete array
    try:
        import numpy as np
        return bool(np.all(np.asarray(kernel) == 1.0))
    except Exception:
        return False


def _morph(
    image: jax.Array,
    kernel: jax.Array,
    op: str,
    structuring_element: Optional[jax.Array] = None,
    origin: Optional[Tuple[int, int]] = None,
    border_type: str = "geodesic",
    border_value: float = 0.0,
) -> jax.Array:
    image = as_float(image)
    check(image.ndim == 4, f"expected (B,C,H,W), got {image.shape}")
    kh, kw = kernel.shape[-2:]
    if origin is None:
        origin = (kh // 2, kw // 2)
    oy, ox = origin
    neutral = -jnp.inf if op == "max" else jnp.inf
    if border_type == "geodesic":
        pad_value = border_value if op == "max" else -border_value
        pad_value = border_value
        # geodesic: border treated as border_value for dilation, and as
        # max value for erosion (reference semantics: e=1e4 guard)
        pad_value = border_value if op == "max" else 1e4
    else:
        pad_value = border_value
    B, C, H, W = image.shape
    xp = jnp.pad(
        image,
        [(0, 0), (0, 0), (oy, kh - 1 - oy), (ox, kw - 1 - ox)],
        mode="constant", constant_values=pad_value,
    )
    flat = structuring_element is None and _is_full_ones(kernel)
    if flat:
        fn = lax.max if op == "max" else lax.min
        init = -jnp.inf if op == "max" else jnp.inf
        return lax.reduce_window(xp, init, fn, (1, 1, kh, kw), (1, 1, 1, 1), "VALID")
    se = structuring_element if structuring_element is not None else jnp.zeros_like(kernel)
    se = se.astype(image.dtype)
    kernel = kernel.astype(image.dtype)
    out = jnp.full((B, C, H, W), neutral, dtype=image.dtype)
    for dy in range(kh):
        for dx in range(kw):
            tap = lax.dynamic_slice(xp, (0, 0, dy, dx), (B, C, H, W))
            kv = kernel[dy, dx]
            sv = se[dy, dx]
            if op == "max":
                cand = tap + sv
                cand = jnp.where(kv > 0, cand, -jnp.inf)
                out = jnp.maximum(out, cand)
            else:
                cand = tap - sv
                cand = jnp.where(kv > 0, cand, jnp.inf)
                out = jnp.minimum(out, cand)
    return out


def dilation(image: jax.Array, kernel: jax.Array,
             structuring_element: Optional[jax.Array] = None,
             origin: Optional[Tuple[int, int]] = None,
             border_type: str = "geodesic", border_value: float = 0.0,
             max_val: float = 1e4) -> jax.Array:
    """(reference: morphology.py dilation). Flat SE path = fused max-pool."""
    # dilation mirrors the kernel; for symmetric kernels this is identity.
    k = jnp.flip(kernel, axis=(-2, -1))
    se = None if structuring_element is None else jnp.flip(
        structuring_element, axis=(-2, -1))
    if border_type == "geodesic":
        bv = 0.0
    else:
        bv = border_value
    return _morph(image, k, "max", se, origin, "constant", bv)


def erosion(image: jax.Array, kernel: jax.Array,
            structuring_element: Optional[jax.Array] = None,
            origin: Optional[Tuple[int, int]] = None,
            border_type: str = "geodesic", border_value: float = 0.0,
            max_val: float = 1e4) -> jax.Array:
    """(reference: morphology.py erosion)."""
    bv = max_val if border_type == "geodesic" else border_value
    return _morph(image, kernel, "min", structuring_element, origin,
                  "constant", bv)


def opening(image: jax.Array, kernel: jax.Array, **kw) -> jax.Array:
    return dilation(erosion(image, kernel, **kw), kernel, **kw)


def closing(image: jax.Array, kernel: jax.Array, **kw) -> jax.Array:
    return erosion(dilation(image, kernel, **kw), kernel, **kw)


def gradient(image: jax.Array, kernel: jax.Array, **kw) -> jax.Array:
    return dilation(image, kernel, **kw) - erosion(image, kernel, **kw)


def top_hat(image: jax.Array, kernel: jax.Array, **kw) -> jax.Array:
    return as_float(image) - opening(image, kernel, **kw)


def bottom_hat(image: jax.Array, kernel: jax.Array, **kw) -> jax.Array:
    return closing(image, kernel, **kw) - as_float(image)
