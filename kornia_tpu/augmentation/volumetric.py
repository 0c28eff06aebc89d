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


def _flip_matrix4(shape, axis):
    """(B, 4, 4) reflection about the volume centre along `axis`
    (-1 = W/horizontal, -2 = H/vertical, -3 = D/depthical); xyz order
    matches get_projective_transform (reference _3d/geometric/
    horizontal_flip.py compute_transformation)."""
    B = shape[0]
    D, H, W = shape[-3:]
    diag = [1.0, 1.0, 1.0, 1.0]
    trans = [0.0, 0.0, 0.0]
    idx = {-1: 0, -2: 1, -3: 2}[axis]
    size = {-1: W, -2: H, -3: D}[axis]
    diag[idx] = -1.0
    trans[idx] = size - 1.0
    M = jnp.diag(jnp.asarray(diag))
    M = M.at[:3, 3].set(jnp.asarray(trans))
    return jnp.broadcast_to(M, (B, 4, 4))


class RandomHorizontalFlip3D(_Base3D):
    def apply(self, x, params):
        return jnp.flip(x, axis=-1)

    def matrix4(self, params, shape):
        return _flip_matrix4(shape, -1)


class RandomVerticalFlip3D(_Base3D):
    def apply(self, x, params):
        return jnp.flip(x, axis=-2)

    def matrix4(self, params, shape):
        return _flip_matrix4(shape, -2)


class RandomDepthicalFlip3D(_Base3D):
    def apply(self, x, params):
        return jnp.flip(x, axis=-3)

    def matrix4(self, params, shape):
        return _flip_matrix4(shape, -3)


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
        D, H, W = x.shape[-3:]
        M = self.matrix4(params, x.shape)[:, :3]
        # reference 3D geometric ops default to align_corners=False
        # (_3d/geometric/rotation.py:102)
        return warp_affine3d(x, M, (D, H, W), align_corners=False)

    def matrix4(self, params, shape):
        B = params["angles"].shape[0]
        D, H, W = shape[-3:]
        center = jnp.broadcast_to(
            jnp.array([(W - 1) / 2.0, (H - 1) / 2.0, (D - 1) / 2.0]), (B, 3))
        M = get_projective_transform(center, params["angles"],
                                     jnp.ones(B))  # (B, 3, 4)
        bottom = jnp.broadcast_to(jnp.array([[0.0, 0, 0, 1]]), (B, 1, 4))
        return jnp.concatenate([M, bottom], axis=1)


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
        D, H, W = x.shape[-3:]
        M = self.matrix4(params, x.shape)[:, :3]
        # reference 3D geometric ops default to align_corners=False
        # (_3d/geometric/rotation.py:102)
        return warp_affine3d(x, M, (D, H, W), align_corners=False)

    def matrix4(self, params, shape):
        B = params["angles"].shape[0]
        D, H, W = shape[-3:]
        center = jnp.broadcast_to(
            jnp.array([(W - 1) / 2.0, (H - 1) / 2.0, (D - 1) / 2.0]), (B, 3))
        M = get_projective_transform(center, params["angles"],
                                     params["scale"])
        M = M.at[:, :, 3].add(params["t"])
        bottom = jnp.broadcast_to(jnp.array([[0.0, 0, 0, 1]]), (B, 1, 4))
        return jnp.concatenate([M, bottom], axis=1)


class RandomCrop3D(_Base3D):
    def __init__(self, size: Tuple[int, int, int], **kw):
        super().__init__(p=1.0, **kw)
        self.size = size

    def sample_params(self, key, batch, shape):
        D, H, W = shape[-3:]
        d, h, w = self.size
        ks = jax.random.split(key, 3)
        n = 1 if self.same_on_batch else batch
        z0 = jax.random.randint(ks[0], (n,), 0, max(D - d, 0) + 1)
        y0 = jax.random.randint(ks[1], (n,), 0, max(H - h, 0) + 1)
        x0 = jax.random.randint(ks[2], (n,), 0, max(W - w, 0) + 1)
        bcast = lambda a: jnp.broadcast_to(a, (batch,))
        return {"z0": bcast(z0), "y0": bcast(y0), "x0": bcast(x0)}

    def __call__(self, x, key=None, params=None):
        x = as_float(x)
        if params is None:
            if key is None:
                key = jax.random.PRNGKey(0)
            params = self.generate_parameters(key, x.shape)
        C = x.shape[1]
        # per-sample crop origin (reference random_crop_generator3d)
        return jax.vmap(
            lambda xi, z, y, xx: jax.lax.dynamic_slice(
                xi, (0, z, y, xx), (C, *self.size)))(
            x, params["z0"], params["y0"], params["x0"])

    def matrix4(self, params, shape):
        B = params["z0"].shape[0]
        M = jnp.broadcast_to(jnp.eye(4), (B, 4, 4))
        t = -jnp.stack([params["x0"], params["y0"], params["z0"]],
                       -1).astype(jnp.float32)
        return M.at[:, :3, 3].set(t)


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


# --- reference 3D base-class names (kornia/augmentation/_3d/base.py) --------

class AugmentationBase3D(_Base3D):
    """(B, C, D, H, W) augmentation base (reference: _3d/base.py)."""


class IntensityAugmentationBase3D(AugmentationBase3D):
    """Never changes geometry (reference: _3d/intensity/base.py)."""


class GeometricAugmentationBase3D(AugmentationBase3D):
    """Invertible through a (B, 4, 4) matrix (reference:
    _3d/geometric/base.py)."""

    def matrix4(self, params, shape):
        B = params["apply_mask"].shape[0]
        return jnp.broadcast_to(jnp.eye(4), (B, 4, 4))


class RigidAffineAugmentationBase3D(GeometricAugmentationBase3D):
    """(reference: _3d/base.py RigidAffineAugmentationBase3D)."""


class RandomMotionBlur3D(IntensityAugmentationBase3D):
    """Directional 3D motion blur (reference:
    _3d/intensity/motion_blur.py:28). Kernel size is static under jit;
    yaw/pitch/roll and direction are sampled per batch element."""

    def __init__(self, kernel_size: int = 3, angle=35.0,
                 direction=(-1.0, 1.0), border_type: str = "constant", **kw):
        super().__init__(**kw)
        self.kernel_size = int(kernel_size) if not isinstance(
            kernel_size, (tuple, list)) else int(kernel_size[0])
        if isinstance(angle, (int, float)):
            self.angle = [(-float(angle), float(angle))] * 3
        elif isinstance(angle[0], (tuple, list)):
            self.angle = [tuple(a) for a in angle]
        elif len(angle) == 3:
            self.angle = [(-float(a), float(a)) for a in angle]
        else:
            self.angle = [tuple(angle)] * 3
        self.direction = (tuple(direction)
                          if isinstance(direction, (tuple, list))
                          else (-float(direction), float(direction)))
        self.border_type = border_type

    def sample_params(self, key, batch, shape):
        ks = jax.random.split(key, 4)
        angles = jnp.stack(
            [self._uniform(ks[i], batch, *self.angle[i]) for i in range(3)],
            axis=-1)
        return {"angle": angles,
                "direction": self._uniform(ks[3], batch, *self.direction)}

    def apply(self, x, params):
        from ..ops.filters import motion_blur3d
        return motion_blur3d(x, self.kernel_size, params["angle"],
                             params["direction"], self.border_type)


class RandomPerspective3D(GeometricAugmentationBase3D):
    """Random 3D perspective warp of (B, C, D, H, W) volumes (reference:
    _3d/geometric/perspective.py:28; generator
    random_generator/_3d/perspective.py — corners pulled toward the
    center by distortion_scale/2 · U[0,1])."""

    def __init__(self, distortion_scale: float = 0.5,
                 resample: str = "bilinear", align_corners: bool = False,
                 **kw):
        super().__init__(**kw)
        self.distortion_scale = float(distortion_scale)
        self.resample = resample
        self.align_corners = align_corners

    def sample_params(self, key, batch, shape):
        B, C_, D, H, W = shape
        corners = jnp.array(
            [[0, 0, 0], [W - 1, 0, 0], [W - 1, H - 1, 0], [0, H - 1, 0],
             [0, 0, D - 1], [W - 1, 0, D - 1], [W - 1, H - 1, D - 1],
             [0, H - 1, D - 1]], jnp.float32)
        start = jnp.broadcast_to(corners, (batch, 8, 3))
        # unit direction toward the volume centre per corner
        center = jnp.array([(W - 1) / 2.0, (H - 1) / 2.0, (D - 1) / 2.0])
        pts_norm = jnp.sign(center - corners)  # (8, 3) of ±1
        factor = self.distortion_scale / 2.0 * center  # per-axis max pull
        if self.same_on_batch:
            rand = jax.random.uniform(key, (1, 8, 3))
            rand = jnp.broadcast_to(rand, (batch, 8, 3))
        else:
            rand = jax.random.uniform(key, (batch, 8, 3))
        end = start + factor * rand * pts_norm
        return {"start_points": start, "end_points": end}

    def apply(self, x, params):
        from ..ops.warp3d import get_perspective_transform3d, warp_perspective3d
        M = get_perspective_transform3d(params["start_points"],
                                        params["end_points"])
        D, H, W = x.shape[-3:]
        return warp_perspective3d(x, M, (D, H, W), self.resample,
                                  align_corners=self.align_corners)

    def matrix4(self, params, shape):
        from ..ops.warp3d import get_perspective_transform3d
        return get_perspective_transform3d(params["start_points"],
                                           params["end_points"])


__all__ += [
    "AugmentationBase3D", "IntensityAugmentationBase3D",
    "GeometricAugmentationBase3D", "RigidAffineAugmentationBase3D",
    "RandomMotionBlur3D", "RandomPerspective3D",
]
