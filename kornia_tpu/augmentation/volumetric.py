"""3D volumetric augmentations (reference: kornia/augmentation/_3d/,
~2.5k LoC). Inputs are (B, C, D, H, W)."""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.dtype import as_float
from ..ops.warp3d import center_crop3d, crop3d, get_projective_transform, warp_affine3d
from .base import AugmentationBase2D

__all__ = [
    "RandomHorizontalFlip3D",
    "RandomVerticalFlip3D",
    "RandomDepthicalFlip3D",
    "RandomRotation3D",
    "RandomAffine3D",
    "RandomCrop3D",
    "CenterCrop3D",
    "RandomEqualize3D",
]


class _Base3D(AugmentationBase2D):
    """3D ops reuse the 2D machinery (mask gating, key splitting)."""


class RandomHorizontalFlip3D(_Base3D):
    def apply(self, x, params):
        return jnp.flip(x, axis=-1)


class RandomVerticalFlip3D(_Base3D):
    def apply(self, x, params):
        return jnp.flip(x, axis=-2)


class RandomDepthicalFlip3D(_Base3D):
    def apply(self, x, params):
        return jnp.flip(x, axis=-3)


class RandomRotation3D(_Base3D):
    """XYZ euler rotation (reference: _3d/geometric/rotation.py)."""

    def __init__(self, degrees=15.0, **kw):
        super().__init__(**kw)
        if isinstance(degrees, (int, float)):
            self.degrees = [(-degrees, degrees)] * 3
        else:
            self.degrees = [d if isinstance(d, (tuple, list)) else (-d, d)
                            for d in degrees]

    def sample_params(self, key, batch, shape):
        ks = jax.random.split(key, 3)
        angles = jnp.stack(
            [self._uniform(ks[i], batch, *self.degrees[i]) for i in range(3)],
            axis=-1)
        return {"angles": angles}

    def apply(self, x, params):
        B = x.shape[0]
        D, H, W = x.shape[-3:]
        center = jnp.broadcast_to(
            jnp.array([(W - 1) / 2.0, (H - 1) / 2.0, (D - 1) / 2.0]), (B, 3))
        M = get_projective_transform(center, params["angles"], jnp.ones(B))
        return warp_affine3d(x, M, (D, H, W))


class RandomAffine3D(_Base3D):
    """(reference: _3d/geometric/affine.py)."""

    def __init__(self, degrees=15.0, translate=None, scale=None, **kw):
        super().__init__(**kw)
        if isinstance(degrees, (int, float)):
            self.degrees = [(-degrees, degrees)] * 3
        else:
            self.degrees = [d if isinstance(d, (tuple, list)) else (-d, d)
                            for d in degrees]
        self.translate = translate
        self.scale_rng = scale

    def sample_params(self, key, batch, shape):
        ks = jax.random.split(key, 5)
        angles = jnp.stack(
            [self._uniform(ks[i], batch, *self.degrees[i]) for i in range(3)],
            axis=-1)
        D, H, W = shape[-3:]
        if self.translate is not None:
            t = jnp.stack([
                self._uniform(ks[3], batch, -self.translate[0] * W,
                              self.translate[0] * W),
                self._uniform(ks[3], batch, -self.translate[1] * H,
                              self.translate[1] * H),
                self._uniform(ks[3], batch, -self.translate[2] * D,
                              self.translate[2] * D)], -1)
        else:
            t = jnp.zeros((batch, 3))
        scale = (self._uniform(ks[4], batch, *self.scale_rng)
                 if self.scale_rng is not None else jnp.ones(batch))
        return {"angles": angles, "t": t, "scale": scale}

    def apply(self, x, params):
        B = x.shape[0]
        D, H, W = x.shape[-3:]
        center = jnp.broadcast_to(
            jnp.array([(W - 1) / 2.0, (H - 1) / 2.0, (D - 1) / 2.0]), (B, 3))
        M = get_projective_transform(center, params["angles"], params["scale"])
        M = M.at[:, :, 3].add(params["t"])
        return warp_affine3d(x, M, (D, H, W))


class RandomCrop3D(_Base3D):
    def __init__(self, size: Tuple[int, int, int], **kw):
        super().__init__(p=1.0, **kw)
        self.size = size

    def sample_params(self, key, batch, shape):
        D, H, W = shape[-3:]
        d, h, w = self.size
        ks = jax.random.split(key, 3)
        return {
            "z0": jax.random.randint(ks[0], (), 0, max(D - d, 0) + 1),
            "y0": jax.random.randint(ks[1], (), 0, max(H - h, 0) + 1),
            "x0": jax.random.randint(ks[2], (), 0, max(W - w, 0) + 1),
        }

    def __call__(self, x, key=None, params=None):
        x = as_float(x)
        if params is None:
            if key is None:
                key = jax.random.PRNGKey(0)
            params = self.generate_parameters(key, x.shape)
        B, C = x.shape[:2]
        return jax.lax.dynamic_slice(
            x, (0, 0, params["z0"], params["y0"], params["x0"]),
            (B, C, *self.size))


class CenterCrop3D(_Base3D):
    def __init__(self, size: Tuple[int, int, int], **kw):
        super().__init__(p=1.0, **kw)
        self.size = size

    def __call__(self, x, key=None, params=None):
        return center_crop3d(as_float(x), self.size)


class RandomEqualize3D(_Base3D):
    def apply(self, x, params):
        from ..ops.enhance import equalize3d
        return equalize3d(x)
