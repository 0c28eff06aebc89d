"""Tensor/image interop helpers (reference: kornia/utils/image.py —
image_to_tensor, tensor_to_image; utils/helpers.py batched_forward)."""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["image_to_tensor", "tensor_to_image", "batched_forward"]


def image_to_tensor(image: np.ndarray, keepdim: bool = True) -> jax.Array:
    """HWC (or HW) numpy → CHW float array (reference: image_to_tensor)."""
    a = np.asarray(image)
    if a.ndim == 2:
        a = a[..., None]
    if a.ndim == 3:
        a = np.moveaxis(a, -1, 0)
        out = jnp.asarray(a)
        return out if keepdim else out[None]
    if a.ndim == 4:  # NHWC
        return jnp.asarray(np.moveaxis(a, -1, 1))
    raise ValueError(f"unsupported image ndim {a.ndim}")


def tensor_to_image(tensor: jax.Array, keepdim: bool = False) -> np.ndarray:
    """CHW / NCHW array → HWC (or NHWC) numpy (reference: tensor_to_image)."""
    a = np.asarray(tensor)
    if a.ndim == 3:
        out = np.moveaxis(a, 0, -1)
    elif a.ndim == 4:
        out = np.moveaxis(a, 1, -1)
        if out.shape[0] == 1 and not keepdim:
            out = out[0]
    else:
        raise ValueError(f"unsupported tensor ndim {a.ndim}")
    if out.shape[-1] == 1:
        out = out[..., 0]
    return out


def batched_forward(fn: Callable, x: jax.Array, chunk: int = 16) -> jax.Array:
    """Apply fn in chunks along the batch dim to bound peak memory
    (reference: utils/helpers.py batched_forward). Uses lax.map over
    equal-sized chunks (pads the tail)."""
    B = x.shape[0]
    pad = (-B) % chunk
    if pad:
        x = jnp.concatenate([x, jnp.repeat(x[:1], pad, axis=0)], axis=0)
    xs = x.reshape(-1, chunk, *x.shape[1:])
    out = jax.lax.map(fn, xs)
    out = out.reshape(-1, *out.shape[2:])
    return out[:B]
