"""Image container (reference: kornia/image/image.py:44-386, base.py:29-111).

`Image` wraps a (B?, C, H, W) array with pixel-format and layout metadata;
registered as a pytree so it flows through jit. File IO goes through
PIL (the reference delegates to the external Rust crate kornia_rs,
io/io.py:24 — a native decode path here is a later optimization).
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..core.dtype import as_float

__all__ = ["ColorSpace", "ChannelsOrder", "ImageSize", "PixelFormat",
           "ImageLayout", "Image"]


class ColorSpace(enum.Enum):
    UNKNOWN = 0
    GRAY = 1
    RGB = 2
    BGR = 3
    RGBA = 4


class ChannelsOrder(enum.Enum):
    CHANNELS_FIRST = 0
    CHANNELS_LAST = 1


@dataclasses.dataclass(frozen=True)
class ImageSize:
    height: int
    width: int


@dataclasses.dataclass(frozen=True)
class PixelFormat:
    color_space: ColorSpace = ColorSpace.RGB
    bit_depth: int = 8


@dataclasses.dataclass(frozen=True)
class ImageLayout:
    image_size: ImageSize
    channels: int
    channels_order: ChannelsOrder = ChannelsOrder.CHANNELS_FIRST


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class Image:
    data: jax.Array  # always stored channels-first (C, H, W) or (B, C, H, W)
    pixel_format: PixelFormat = PixelFormat()

    def tree_flatten(self):
        return (self.data,), self.pixel_format

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], aux)

    # -- properties ----------------------------------------------------------
    @property
    def is_batch(self) -> bool:
        return self.data.ndim == 4

    @property
    def channels(self) -> int:
        return self.data.shape[-3]

    @property
    def height(self) -> int:
        return self.data.shape[-2]

    @property
    def width(self) -> int:
        return self.data.shape[-1]

    @property
    def shape(self):
        return self.data.shape

    @property
    def dtype(self):
        return self.data.dtype

    @property
    def layout(self) -> ImageLayout:
        return ImageLayout(ImageSize(self.height, self.width), self.channels)

    # -- constructors --------------------------------------------------------
    @classmethod
    def from_numpy(cls, arr: np.ndarray,
                   color_space: ColorSpace = ColorSpace.RGB,
                   channels_order: ChannelsOrder = ChannelsOrder.CHANNELS_LAST
                   ) -> "Image":
        a = np.asarray(arr)
        bit_depth = 8 if a.dtype == np.uint8 else (
            16 if a.dtype == np.uint16 else 32)
        if a.ndim == 2:
            a = a[..., None]
        if channels_order == ChannelsOrder.CHANNELS_LAST:
            a = np.moveaxis(a, -1, -3)
        return cls(jnp.asarray(a), PixelFormat(color_space, bit_depth))

    @classmethod
    def from_file(cls, path: str) -> "Image":
        from PIL import Image as PILImage
        pil = PILImage.open(path)
        mode_to_cs = {"L": ColorSpace.GRAY, "RGB": ColorSpace.RGB,
                      "RGBA": ColorSpace.RGBA}
        cs = mode_to_cs.get(pil.mode)
        if cs is None:
            pil = pil.convert("RGB")
            cs = ColorSpace.RGB
        return cls.from_numpy(np.asarray(pil), cs)

    @classmethod
    def from_dlpack(cls, capsule) -> "Image":
        return cls(jnp.from_dlpack(capsule))

    # -- converters ----------------------------------------------------------
    def to_numpy(self) -> np.ndarray:
        return np.asarray(self.data)

    def to_float(self) -> "Image":
        scale = float(2**self.pixel_format.bit_depth - 1) \
            if not jnp.issubdtype(self.data.dtype, jnp.floating) else 1.0
        return Image(as_float(self.data) / scale,
                     PixelFormat(self.pixel_format.color_space, 32))

    def to_uint8(self) -> "Image":
        if jnp.issubdtype(self.data.dtype, jnp.floating):
            d = jnp.clip(self.data * 255.0, 0, 255).astype(jnp.uint8)
        else:
            d = self.data.astype(jnp.uint8)
        return Image(d, PixelFormat(self.pixel_format.color_space, 8))

    def to_gray(self) -> "Image":
        from ..ops.color import bgr_to_grayscale, rgb_to_grayscale
        img = self.to_float()
        if self.pixel_format.color_space == ColorSpace.GRAY:
            return img
        fn = (bgr_to_grayscale
              if self.pixel_format.color_space == ColorSpace.BGR
              else rgb_to_grayscale)
        data = img.data if img.is_batch else img.data[None]
        out = fn(data if data.shape[-3] == 3 else data[..., :3, :, :])
        out = out if img.is_batch else out[0]
        return Image(out, PixelFormat(ColorSpace.GRAY, 32))

    def to_rgb(self) -> "Image":
        from ..ops.color import bgr_to_rgb, grayscale_to_rgb
        img = self.to_float()
        cs = self.pixel_format.color_space
        data = img.data if img.is_batch else img.data[None]
        if cs == ColorSpace.GRAY:
            out = grayscale_to_rgb(data)
        elif cs == ColorSpace.BGR:
            out = bgr_to_rgb(data)
        elif cs == ColorSpace.RGBA:
            out = data[..., :3, :, :]
        else:
            out = data
        out = out if img.is_batch else out[0]
        return Image(out, PixelFormat(ColorSpace.RGB, 32))

    def write(self, path: str) -> None:
        from PIL import Image as PILImage
        img = self.to_uint8()
        a = np.asarray(img.data)
        if a.ndim == 4:
            a = a[0]
        a = np.moveaxis(a, 0, -1)
        if a.shape[-1] == 1:
            a = a[..., 0]
        PILImage.fromarray(a).save(path)
