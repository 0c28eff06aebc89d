"""Image file IO (reference: kornia/io/io.py:159,219 — the reference
delegates to the external Rust crate kornia_rs; here PIL decodes on host
and the array moves to device once. A native C++ decode path is the
optimization for data-loading-bound pipelines).
"""

from __future__ import annotations

import enum
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["ImageLoadType", "load_image", "write_image"]


class ImageLoadType(enum.Enum):
    UNCHANGED = 0
    GRAY8 = 1
    RGB8 = 2
    RGBA8 = 3
    GRAY32 = 4
    RGB32 = 5


def load_image(path: str, desired_type: ImageLoadType = ImageLoadType.RGB32,
               device=None) -> jax.Array:
    """Load → (C, H, W) array (reference: io.py:159). Uses the native C++
    decoder (libjpeg/libpng, io/native.py) when built; PIL otherwise."""
    from .native import native_available, read_image_native
    if native_available() and path.lower().endswith(
            (".jpg", ".jpeg", ".png")) and desired_type in (
            ImageLoadType.RGB8, ImageLoadType.RGB32, ImageLoadType.GRAY8,
            ImageLoadType.GRAY32):
        arr = read_image_native(path)  # (H, W, 3) u8
        if desired_type in (ImageLoadType.GRAY8, ImageLoadType.GRAY32):
            arr = (0.299 * arr[..., 0] + 0.587 * arr[..., 1]
                   + 0.114 * arr[..., 2]).astype(np.uint8)[..., None]
        arr = np.moveaxis(arr, -1, 0)
        if desired_type in (ImageLoadType.GRAY32, ImageLoadType.RGB32):
            arr = arr.astype(np.float32) / 255.0
        out = jnp.asarray(arr)
        if device is not None:
            out = jax.device_put(out, device)
        return out
    from PIL import Image as PILImage
    pil = PILImage.open(path)
    if desired_type in (ImageLoadType.GRAY8, ImageLoadType.GRAY32):
        pil = pil.convert("L")
    elif desired_type in (ImageLoadType.RGB8, ImageLoadType.RGB32):
        pil = pil.convert("RGB")
    elif desired_type == ImageLoadType.RGBA8:
        pil = pil.convert("RGBA")
    arr = np.asarray(pil)
    if arr.ndim == 2:
        arr = arr[..., None]
    arr = np.moveaxis(arr, -1, 0)
    if desired_type in (ImageLoadType.GRAY32, ImageLoadType.RGB32):
        arr = arr.astype(np.float32) / 255.0
    out = jnp.asarray(arr)
    if device is not None:
        out = jax.device_put(out, device)
    return out


def write_image(path: str, image: jax.Array) -> None:
    """(C, H, W) uint8 or float in [0,1] → file (reference: io.py:219)."""
    from PIL import Image as PILImage
    a = np.asarray(image)
    if a.ndim == 4:
        a = a[0]
    if np.issubdtype(a.dtype, np.floating):
        a = np.clip(a * 255.0, 0, 255).astype(np.uint8)
    a = np.moveaxis(a, 0, -1)
    if a.shape[-1] == 1:
        a = a[..., 0]
    PILImage.fromarray(a).save(path)
