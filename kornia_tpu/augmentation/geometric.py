"""2D geometric augmentations
(reference: kornia/augmentation/_2d/geometric/, 17 ops, ~2.5k LoC).

Every op defines its (B, 3, 3) transform; warping, box/keypoint transforms
and inverses all flow through that matrix.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.dtype import as_float
from ..ops.warp import (
    get_affine_matrix2d,
    get_perspective_transform,
    get_rotation_matrix2d,
    get_translation_matrix2d,
    warp_perspective,
)
from .base import GeometricAugmentationBase2D

__all__ = [
    "Resize",
    "LongestMaxSize",
    "SmallestMaxSize",
    "RandomHorizontalFlip",
    "RandomVerticalFlip",
    "RandomRotation",
    "RandomRotation90",
    "RandomAffine",
    "RandomPerspective",
    "RandomShear",
    "RandomTranslate",
    "RandomCrop",
    "RandomResizedCrop",
    "CenterCrop",
    "RandomElasticTransform",
    "RandomThinPlateSpline",
    "RandomFisheye",
]


def _eye(B):
    return jnp.broadcast_to(jnp.eye(3), (B, 3, 3))


class Resize(GeometricAugmentationBase2D):
    """Deterministic resize (reference: _2d/geometric/resize.py)."""

    def __init__(self, size, interpolation: str = "bilinear",
                 antialias: bool = False, **kw):
        super().__init__(p=1.0, **kw)
        self.size = (size, size) if isinstance(size, int) else size
        self.interpolation = interpolation
        self.antialias = antialias

    def __call__(self, x, key=None, params=None):
        from ..core.dtype import as_float
        from ..ops.warp import resize
        return resize(as_float(x), self.size, self.interpolation,
                      antialias=self.antialias)

    def out_size(self, in_hw):
        return (int(self.size[0]), int(self.size[1]))

    def matrix(self, params, shape):
        H, W = shape[-2:]
        h, w = self.out_size((H, W))
        B = params["apply_mask"].shape[0]
        sx = (w - 1.0) / max(W - 1, 1)
        sy = (h - 1.0) / max(H - 1, 1)
        M = jnp.array([[sx, 0.0, 0.0], [0.0, sy, 0.0], [0.0, 0.0, 1.0]])
        return jnp.broadcast_to(M, (B, 3, 3))


class LongestMaxSize(GeometricAugmentationBase2D):
    """Resize so the longest side equals max_size
    (reference: _2d/geometric/resize.py LongestMaxSize)."""

    def __init__(self, max_size: int, **kw):
        super().__init__(p=1.0, **kw)
        self.max_size = max_size

    def __call__(self, x, key=None, params=None):
        from ..core.dtype import as_float
        from ..ops.warp import resize
        return resize(as_float(x), self.max_size, side="long")

    def out_size(self, in_hw):
        H, W = in_hw
        s = self.max_size / max(H, W)
        return (int(round(H * s)), int(round(W * s)))

    def matrix(self, params, shape):
        H, W = shape[-2:]
        h, w = self.out_size((H, W))
        B = params["apply_mask"].shape[0]
        M = jnp.array([[(w - 1.0) / max(W - 1, 1), 0.0, 0.0],
                       [0.0, (h - 1.0) / max(H - 1, 1), 0.0],
                       [0.0, 0.0, 1.0]])
        return jnp.broadcast_to(M, (B, 3, 3))


class SmallestMaxSize(GeometricAugmentationBase2D):
    """Resize so the shortest side equals max_size
    (reference: _2d/geometric/resize.py SmallestMaxSize)."""

    def __init__(self, max_size: int, **kw):
        super().__init__(p=1.0, **kw)
        self.max_size = max_size

    def __call__(self, x, key=None, params=None):
        from ..core.dtype import as_float
        from ..ops.warp import resize
        return resize(as_float(x), self.max_size, side="short")

    def out_size(self, in_hw):
        H, W = in_hw
        s = self.max_size / min(H, W)
        return (int(round(H * s)), int(round(W * s)))

    def matrix(self, params, shape):
        H, W = shape[-2:]
        h, w = self.out_size((H, W))
        B = params["apply_mask"].shape[0]
        M = jnp.array([[(w - 1.0) / max(W - 1, 1), 0.0, 0.0],
                       [0.0, (h - 1.0) / max(H - 1, 1), 0.0],
                       [0.0, 0.0, 1.0]])
        return jnp.broadcast_to(M, (B, 3, 3))


class RandomHorizontalFlip(GeometricAugmentationBase2D):
    """(reference: _2d/geometric/horizontal_flip.py)."""

    def matrix(self, params, shape):
        B = params["apply_mask"].shape[0]
        W = shape[-1]
        M = jnp.array([[-1.0, 0.0, W - 1.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]])
        return jnp.broadcast_to(M, (B, 3, 3))

    def apply(self, x, params):
        return jnp.flip(x, axis=-1)  # exact flip, no resampling


class RandomVerticalFlip(GeometricAugmentationBase2D):
    def matrix(self, params, shape):
        B = params["apply_mask"].shape[0]
        H = shape[-2]
        M = jnp.array([[1.0, 0.0, 0.0], [0.0, -1.0, H - 1.0], [0.0, 0.0, 1.0]])
        return jnp.broadcast_to(M, (B, 3, 3))

    def apply(self, x, params):
        return jnp.flip(x, axis=-2)


class RandomRotation(GeometricAugmentationBase2D):
    def __init__(self, degrees=15.0, resample="bilinear",
                 padding_mode="zeros", **kw):
        super().__init__(**kw)
        d = degrees if isinstance(degrees, (tuple, list)) else (-degrees, degrees)
        self.degrees = d
        self.flags = {"resample": resample, "padding_mode": padding_mode}

    def sample_params(self, key, batch, shape):
        return {"degrees": self._uniform(key, batch, *self.degrees)}

    def matrix(self, params, shape):
        B = params["degrees"].shape[0]
        H, W = shape[-2:]
        center = jnp.broadcast_to(
            jnp.array([(W - 1) / 2.0, (H - 1) / 2.0]), (B, 2))
        A = get_rotation_matrix2d(center, params["degrees"], jnp.ones((B, 2)))
        from ..geometry.conversions import convert_affinematrix_to_homography
        return convert_affinematrix_to_homography(A)


class RandomRotation90(GeometricAugmentationBase2D):
    """Rotation by multiples of 90° (reference: _2d/geometric/rotation.py
    RandomRotation90)."""

    def __init__(self, times=(0, 3), **kw):
        super().__init__(**kw)
        self.times = times

    def sample_params(self, key, batch, shape):
        if self.same_on_batch:
            k = jax.random.randint(key, (), self.times[0], self.times[1] + 1)
            k = jnp.broadcast_to(k, (batch,))
        else:
            k = jax.random.randint(key, (batch,), self.times[0],
                                   self.times[1] + 1)
        return {"k": k}

    def matrix(self, params, shape):
        B = params["k"].shape[0]
        H, W = shape[-2:]
        center = jnp.broadcast_to(
            jnp.array([(W - 1) / 2.0, (H - 1) / 2.0]), (B, 2))
        A = get_rotation_matrix2d(center,
                                  90.0 * params["k"].astype(jnp.float32),
                                  jnp.ones((B, 2)))
        from ..geometry.conversions import convert_affinematrix_to_homography
        return convert_affinematrix_to_homography(A)

    def apply(self, x, params):
        # exact rot90 per k via select over the 4 variants (square images)
        H, W = x.shape[-2:]
        if H == W:
            opts = jnp.stack([x, jnp.rot90(x, 1, (-2, -1)),
                              jnp.rot90(x, 2, (-2, -1)),
                              jnp.rot90(x, 3, (-2, -1))])
            k = jnp.mod(params["k"], 4)
            return jnp.take_along_axis(
                opts, k[None, :, None, None, None], axis=0)[0]
        return super().apply(x, params)


class RandomAffine(GeometricAugmentationBase2D):
    """(reference: _2d/geometric/affine.py)."""

    def __init__(self, degrees=15.0, translate=None, scale=None, shear=None,
                 resample="bilinear", padding_mode="zeros", **kw):
        super().__init__(**kw)
        self.degrees = degrees if isinstance(degrees, (tuple, list)) else (
            -degrees, degrees)
        self.translate = translate
        self.scale_rng = scale
        self.shear = shear if shear is None or isinstance(shear, (tuple, list)) \
            else (-shear, shear)
        self.flags = {"resample": resample, "padding_mode": padding_mode}

    def sample_params(self, key, batch, shape):
        H, W = shape[-2:]
        ks = jax.random.split(key, 5)
        p = {"degrees": self._uniform(ks[0], batch, *self.degrees)}
        if self.translate is not None:
            tx, ty = self.translate
            p["tx"] = self._uniform(ks[1], batch, -tx * W, tx * W)
            p["ty"] = self._uniform(ks[2], batch, -ty * H, ty * H)
        else:
            p["tx"] = jnp.zeros(batch)
            p["ty"] = jnp.zeros(batch)
        if self.scale_rng is not None:
            p["scale"] = self._uniform(ks[3], batch, *self.scale_rng[:2])
        else:
            p["scale"] = jnp.ones(batch)
        if self.shear is not None:
            p["shear_x"] = jnp.deg2rad(self._uniform(ks[4], batch, *self.shear))
        else:
            p["shear_x"] = jnp.zeros(batch)
        return p

    def matrix(self, params, shape):
        B = params["degrees"].shape[0]
        H, W = shape[-2:]
        center = jnp.broadcast_to(
            jnp.array([(W - 1) / 2.0, (H - 1) / 2.0]), (B, 2))
        translations = jnp.stack([params["tx"], params["ty"]], -1)
        scale = jnp.stack([params["scale"], params["scale"]], -1)
        return get_affine_matrix2d(translations, center, scale,
                                   params["degrees"], sx=params["shear_x"])


class RandomShear(RandomAffine):
    def __init__(self, shear=(-10.0, 10.0), **kw):
        super().__init__(degrees=0.0, shear=shear, **kw)


class RandomTranslate(RandomAffine):
    def __init__(self, translate=(0.1, 0.1), **kw):
        super().__init__(degrees=0.0, translate=translate, **kw)


class RandomPerspective(GeometricAugmentationBase2D):
    """(reference: _2d/geometric/perspective.py)."""

    def __init__(self, distortion_scale: float = 0.5, resample="bilinear", **kw):
        super().__init__(**kw)
        self.distortion_scale = distortion_scale
        self.flags = {"resample": resample}

    def sample_params(self, key, batch, shape):
        H, W = shape[-2:]
        d = self.distortion_scale
        # jitter each corner inward by up to d/2 of the size
        if self.same_on_batch:
            jit = jax.random.uniform(key, (4, 2)) * d / 2.0
            jit = jnp.broadcast_to(jit, (batch, 4, 2))
        else:
            jit = jax.random.uniform(key, (batch, 4, 2)) * d / 2.0
        corners = jnp.array(
            [[0.0, 0.0], [W - 1.0, 0.0], [W - 1.0, H - 1.0], [0.0, H - 1.0]])
        signs = jnp.array([[1.0, 1.0], [-1.0, 1.0], [-1.0, -1.0], [1.0, -1.0]])
        dst = corners[None] + jit * signs[None] * jnp.array([W, H])
        return {"src": jnp.broadcast_to(corners, (batch, 4, 2)), "dst": dst}

    def matrix(self, params, shape):
        return get_perspective_transform(params["src"], params["dst"])


class RandomCrop(GeometricAugmentationBase2D):
    """Crop to `size` at a random location (reference:
    _2d/geometric/crop.py). Output has the crop size (static)."""

    def __init__(self, size: Tuple[int, int], resample="bilinear",
                 padding_mode="zeros", **kw):
        # output shape is static (the crop size) so the op always applies;
        # accept-and-ignore a caller's p for reference API compatibility
        kw.pop("p", None)
        super().__init__(p=1.0, **kw)
        self.size = size
        self.flags = {"resample": resample, "padding_mode": padding_mode}

    def sample_params(self, key, batch, shape):
        H, W = shape[-2:]
        h, w = self.size
        k1, k2 = jax.random.split(key)
        y0 = self._uniform(k1, batch, 0.0, max(H - h, 0) + 1e-6)
        x0 = self._uniform(k2, batch, 0.0, max(W - w, 0) + 1e-6)
        return {"y0": jnp.floor(y0), "x0": jnp.floor(x0)}

    def out_size(self, in_hw):
        return (int(self.size[0]), int(self.size[1]))

    def matrix(self, params, shape):
        B = params["y0"].shape[0]
        t = jnp.stack([-params["x0"], -params["y0"]], -1)
        return get_translation_matrix2d(t)

    def apply(self, x, params):
        M = self.matrix(params, x.shape)
        return warp_perspective(x, M, self.size,
                                mode=self.flags["resample"],
                                align_corners=True)

    def __call__(self, x, key=None, params=None):
        # output shape differs from input: apply unconditionally (p=1)
        x = as_float(x)
        if params is None:
            if key is None:
                key = jax.random.PRNGKey(0)
            params = self.generate_parameters(key, x.shape)
        return self.apply(x, params)


class RandomResizedCrop(GeometricAugmentationBase2D):
    """(reference: _2d/geometric/resized_crop.py)."""

    def __init__(self, size: Tuple[int, int], scale=(0.08, 1.0),
                 ratio=(3 / 4, 4 / 3), resample="bilinear", **kw):
        kw.pop("p", None)  # static output shape: always applies
        super().__init__(p=1.0, **kw)
        self.size = size
        self.scale = scale
        self.ratio = ratio
        self.flags = {"resample": resample}

    def sample_params(self, key, batch, shape):
        H, W = shape[-2:]
        ks = jax.random.split(key, 4)
        area = self._uniform(ks[0], batch, *self.scale) * H * W
        logr = self._uniform(ks[1], batch, jnp.log(self.ratio[0]),
                             jnp.log(self.ratio[1]))
        ratio = jnp.exp(logr)
        w = jnp.clip(jnp.sqrt(area * ratio), 8.0, W)
        h = jnp.clip(jnp.sqrt(area / ratio), 8.0, H)
        y0 = self._uniform(ks[2], batch, 0.0, 1.0) * (H - h)
        x0 = self._uniform(ks[3], batch, 0.0, 1.0) * (W - w)
        return {"y0": y0, "x0": x0, "h": h, "w": w}

    def out_size(self, in_hw):
        return (int(self.size[0]), int(self.size[1]))

    def matrix(self, params, shape):
        """Maps crop box → output rect."""
        h_out, w_out = self.size
        B = params["y0"].shape[0]
        x0, y0 = params["x0"], params["y0"]
        src = jnp.stack([
            jnp.stack([x0, y0], -1),
            jnp.stack([x0 + params["w"] - 1, y0], -1),
            jnp.stack([x0 + params["w"] - 1, y0 + params["h"] - 1], -1),
            jnp.stack([x0, y0 + params["h"] - 1], -1)], axis=1)
        dst = jnp.broadcast_to(jnp.array(
            [[0.0, 0.0], [w_out - 1.0, 0.0], [w_out - 1.0, h_out - 1.0],
             [0.0, h_out - 1.0]]), (B, 4, 2))
        return get_perspective_transform(src, dst)

    def apply(self, x, params):
        M = self.matrix(params, x.shape)
        return warp_perspective(x, M, self.size, mode=self.flags["resample"],
                                align_corners=True)

    def __call__(self, x, key=None, params=None):
        x = as_float(x)
        if params is None:
            if key is None:
                key = jax.random.PRNGKey(0)
            params = self.generate_parameters(key, x.shape)
        return self.apply(x, params)


class CenterCrop(GeometricAugmentationBase2D):
    def __init__(self, size, **kw):
        super().__init__(p=1.0, **kw)
        self.size = (size, size) if isinstance(size, int) else size

    def __call__(self, x, key=None, params=None):
        from ..ops.warp import center_crop
        return center_crop(as_float(x), self.size)

    def out_size(self, in_hw):
        return (int(self.size[0]), int(self.size[1]))

    def matrix(self, params, shape):
        H, W = shape[-2:]
        h, w = self.size
        B = params["apply_mask"].shape[0]
        x0 = jnp.floor(jnp.asarray((W - w) / 2.0))
        y0 = jnp.floor(jnp.asarray((H - h) / 2.0))
        M = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0],
                       [0.0, 0.0, 1.0]]).at[0, 2].set(-x0).at[1, 2].set(-y0)
        return jnp.broadcast_to(M, (B, 3, 3))


class RandomElasticTransform(GeometricAugmentationBase2D):
    """(reference: _2d/geometric/elastic_transform.py)."""

    def __init__(self, kernel_size=(63, 63), sigma=(32.0, 32.0),
                 alpha=(1.0, 1.0), **kw):
        super().__init__(**kw)
        self.kernel_size = kernel_size
        self.sigma = sigma
        self.alpha = alpha

    def sample_params(self, key, batch, shape):
        B, C_, H, W = shape
        return {"noise": jax.random.uniform(key, (B, 2, H, W)) * 2 - 1}

    def apply(self, x, params):
        from ..ops.warp import elastic_transform2d
        return elastic_transform2d(x, params["noise"], self.kernel_size,
                                   self.sigma, self.alpha, align_corners=True)


class RandomThinPlateSpline(GeometricAugmentationBase2D):
    """(reference: _2d/geometric/thin_plate_spline.py)."""

    def __init__(self, scale: float = 0.2, **kw):
        super().__init__(**kw)
        self.scale = scale

    def sample_params(self, key, batch, shape):
        grid = jnp.stack(jnp.meshgrid(jnp.linspace(-1, 1, 3),
                                      jnp.linspace(-1, 1, 3),
                                      indexing="ij"), -1).reshape(-1, 2)
        src = jnp.broadcast_to(grid, (batch, 9, 2))
        noise = (jax.random.uniform(key, (batch, 9, 2)) * 2 - 1) * self.scale
        return {"src": src, "dst": src + noise}

    def apply(self, x, params):
        from ..ops.warp import get_tps_transform, warp_image_tps
        kw_, aw = get_tps_transform(params["dst"], params["src"])
        return warp_image_tps(x, params["dst"], kw_, aw, align_corners=True)


class RandomFisheye(GeometricAugmentationBase2D):
    """Radial fisheye distortion (reference: _2d/geometric/fisheye.py)."""

    def __init__(self, center_x=(-0.3, 0.3), center_y=(-0.3, 0.3),
                 gamma=(0.9, 1.1), **kw):
        super().__init__(**kw)
        self.cx = center_x
        self.cy = center_y
        self.gamma = gamma

    def sample_params(self, key, batch, shape):
        ks = jax.random.split(key, 3)
        return {"cx": self._uniform(ks[0], batch, *self.cx),
                "cy": self._uniform(ks[1], batch, *self.cy),
                "gamma": self._uniform(ks[2], batch, *self.gamma)}

    def apply(self, x, params):
        from ..core.grid import create_meshgrid
        from ..ops.warp import grid_sample
        B, C_, H, W = x.shape
        grid = jnp.broadcast_to(create_meshgrid(H, W, True), (B, H, W, 2))
        c = jnp.stack([params["cx"], params["cy"]], -1)[:, None, None, :]
        d = grid - c
        r = jnp.linalg.norm(d, axis=-1, keepdims=True)
        g = params["gamma"][:, None, None, None]
        warped = c + d * jnp.power(jnp.maximum(r, 1e-6), g - 1.0)
        return grid_sample(x, warped, "bilinear", "zeros", True)


class PadTo(GeometricAugmentationBase2D):
    """Pad the sample to a fixed (height, width); always applies (p=1) and
    inverts by cropping (reference: _2d/geometric/pad.py:26)."""

    def __init__(self, size: Tuple[int, int], pad_mode: str = "constant",
                 pad_value: float = 0.0, keepdim: bool = False, **kw):
        kw["p"] = 1.0
        kw["p_batch"] = 1.0
        super().__init__(**kw)
        self.size = (int(size[0]), int(size[1]))
        self.pad_mode = pad_mode
        self.pad_value = float(pad_value)
        self._in_hw: Optional[Tuple[int, int]] = None

    def out_size(self, in_hw):
        return (max(self.size[0], in_hw[0]), max(self.size[1], in_hw[1]))

    def __call__(self, x, key=None, params=None):
        from ..core.dtype import as_float
        x = as_float(x)
        H, W = x.shape[-2:]
        self._in_hw = (H, W)
        ph = max(self.size[0] - H, 0)
        pw = max(self.size[1] - W, 0)
        mode = {"constant": "constant", "replicate": "edge",
                "reflect": "reflect", "circular": "wrap"}[self.pad_mode]
        pad_cfg = [(0, 0)] * (x.ndim - 2) + [(0, ph), (0, pw)]
        if mode == "constant":
            return jnp.pad(x, pad_cfg, constant_values=self.pad_value)
        return jnp.pad(x, pad_cfg, mode=mode)

    forward = __call__

    def inverse(self, x, params=None):
        if self._in_hw is None:
            return x
        H, W = self._in_hw
        return x[..., :H, :W]


__all__ += ["PadTo"]
