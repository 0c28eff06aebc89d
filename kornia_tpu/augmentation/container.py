"""Augmentation containers
(reference: kornia/augmentation/container/augment.py:51 AugmentationSequential,
container/ops.py per-DataKey dispatch, container/image.py ImageSequential).

TPU-first: the whole pipeline is ONE pure function of (inputs, key) —
jit once, zero per-op dispatch. Parameter dicts are returned for replay
(`params=` argument) and exact inverses, mirroring the reference's
ParamItem records (container/params.py).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp

from ..core.dtype import as_float
from ..core.linalg import inverse_3x3
from ..geometry.linalg import transform_points
from .base import AugmentationBase2D, GeometricAugmentationBase2D

__all__ = ["ImageSequential", "AugmentationSequential", "DataKey",
           "ManyToManyAugmentationDispather", "ManyToOneAugmentationDispather"]


class DataKey:
    INPUT = "input"
    MASK = "mask"
    BBOX = "bbox"
    BBOX_XYXY = "bbox_xyxy"
    KEYPOINTS = "keypoints"
    CLASS = "class"


class ImageSequential:
    """Sequential image-only pipeline (reference: container/image.py:446)."""

    def __init__(self, *augs: AugmentationBase2D):
        self.augs = list(augs)

    def generate_parameters(self, key: jax.Array, shape) -> List[Dict]:
        keys = jax.random.split(key, len(self.augs))
        return [aug.generate_parameters(k, shape)
                for aug, k in zip(self.augs, keys)]

    def __call__(self, x: jax.Array, key: Optional[jax.Array] = None,
                 params: Optional[List[Dict]] = None) -> jax.Array:
        x = as_float(x)
        if params is None:
            if key is None:
                key = jax.random.PRNGKey(0)
            params = self.generate_parameters(key, x.shape)
        for aug, p in zip(self.augs, params):
            x = aug(x, params=p)
        return x


class AugmentationSequential(ImageSequential):
    """Multi-datakey pipeline with matrix bookkeeping and inverse
    (reference: container/augment.py:431 forward, :303 inverse).

    call: ``aug(image, mask, bbox, keypoints, data_keys=[...], key=key)``
    Boxes are (B, N, 4) xyxy or (B, N, 4, 2) corner quads; keypoints are
    (B, N, 2).
    """

    def __init__(self, *augs: AugmentationBase2D,
                 data_keys: Sequence[str] = ("input",),
                 same_on_batch: bool = False):
        super().__init__(*augs)
        self.data_keys = list(data_keys)
        self._params: Optional[List[Dict]] = None

    # -- matrix composition --------------------------------------------------
    def transform_matrix(self, shape, params: List[Dict]) -> jax.Array:
        B = shape[0]
        M = jnp.broadcast_to(jnp.eye(3), (B, 3, 3))
        for aug, p in zip(self.augs, params):
            if isinstance(aug, GeometricAugmentationBase2D):
                M = aug.transform_matrix(jnp.zeros(shape), p) @ M
        return M

    # -- per-datakey application --------------------------------------------
    def _apply_image(self, x, params):
        for aug, p in zip(self.augs, params):
            x = aug(x, params=p)
        return x

    def _apply_mask(self, m, params, shape):
        # geometric-only, nearest interpolation semantics via same matrices
        from ..ops.warp import warp_perspective
        for aug, p in zip(self.augs, params):
            if isinstance(aug, GeometricAugmentationBase2D):
                M = aug.transform_matrix(m, p)
                H, W = m.shape[-2:]
                m = warp_perspective(m, M, (H, W), mode="nearest",
                                     align_corners=True)
        return m

    def _apply_keypoints(self, kp, params, shape):
        M = self.transform_matrix(shape, params)
        return transform_points(M, kp)

    def _apply_bbox(self, bbox, params, shape):
        M = self.transform_matrix(shape, params)
        if bbox.shape[-1] == 4 and bbox.ndim == 3:  # xyxy → corners
            x0, y0, x1, y1 = (bbox[..., 0], bbox[..., 1], bbox[..., 2],
                              bbox[..., 3])
            corners = jnp.stack(
                [jnp.stack([x0, y0], -1), jnp.stack([x1, y0], -1),
                 jnp.stack([x1, y1], -1), jnp.stack([x0, y1], -1)], axis=-2)
            warped = transform_points(M[:, None], corners)
            x0n = warped[..., 0].min(-1)
            y0n = warped[..., 1].min(-1)
            x1n = warped[..., 0].max(-1)
            y1n = warped[..., 1].max(-1)
            return jnp.stack([x0n, y0n, x1n, y1n], -1)
        return transform_points(M[:, None], bbox)

    def __call__(self, *inputs, data_keys: Optional[Sequence[str]] = None,
                 key: Optional[jax.Array] = None,
                 params: Optional[List[Dict]] = None):
        keys_ = list(data_keys) if data_keys is not None else self.data_keys
        assert len(inputs) == len(keys_), \
            f"got {len(inputs)} inputs for data_keys {keys_}"
        img_idx = keys_.index("input")
        image = as_float(inputs[img_idx])
        if params is None:
            if key is None:
                key = jax.random.PRNGKey(0)
            params = self.generate_parameters(key, image.shape)
        self._params = params
        outs = []
        for inp, k in zip(inputs, keys_):
            if k == "input":
                outs.append(self._apply_image(as_float(inp), params))
            elif k == "mask":
                outs.append(self._apply_mask(as_float(inp), params, image.shape))
            elif k in ("bbox", "bbox_xyxy"):
                outs.append(self._apply_bbox(as_float(inp), params, image.shape))
            elif k == "keypoints":
                outs.append(self._apply_keypoints(as_float(inp), params,
                                                  image.shape))
            elif k == "class":
                outs.append(inp)
            else:
                raise ValueError(f"unknown data key {k}")
        return outs[0] if len(outs) == 1 else tuple(outs)

    # -- inverse -------------------------------------------------------------
    def inverse(self, *inputs, data_keys: Optional[Sequence[str]] = None,
                params: Optional[List[Dict]] = None):
        """Invert the geometric part using recorded params
        (reference: augment.py:303)."""
        keys_ = list(data_keys) if data_keys is not None else self.data_keys
        params = params if params is not None else self._params
        assert params is not None, "call forward first or pass params"
        img_idx = keys_.index("input") if "input" in keys_ else 0
        shape = inputs[img_idx].shape
        M = self.transform_matrix(shape, params)
        M_inv = inverse_3x3(M)
        outs = []
        from ..ops.warp import warp_perspective
        for inp, k in zip(inputs, keys_):
            inp = as_float(inp)
            if k in ("input", "mask"):
                H, W = inp.shape[-2:]
                mode = "nearest" if k == "mask" else "bilinear"
                outs.append(warp_perspective(inp, M_inv, (H, W), mode=mode,
                                             align_corners=True))
            elif k == "keypoints":
                outs.append(transform_points(M_inv, inp))
            elif k in ("bbox", "bbox_xyxy"):
                x0, y0, x1, y1 = (inp[..., 0], inp[..., 1], inp[..., 2],
                                  inp[..., 3])
                corners = jnp.stack(
                    [jnp.stack([x0, y0], -1), jnp.stack([x1, y0], -1),
                     jnp.stack([x1, y1], -1), jnp.stack([x0, y1], -1)],
                    axis=-2)
                warped = transform_points(M_inv[:, None], corners)
                outs.append(jnp.stack(
                    [warped[..., 0].min(-1), warped[..., 1].min(-1),
                     warped[..., 0].max(-1), warped[..., 1].max(-1)], -1))
            else:
                outs.append(inp)
        return outs[0] if len(outs) == 1 else tuple(outs)


class ManyToManyAugmentationDispather:
    """Dispatch N pipelines to N inputs (reference:
    container/dispatcher.py ManyToManyAugmentationDispather)."""

    def __init__(self, *augs: AugmentationSequential):
        self.augs = list(augs)

    def __call__(self, *inputs, key: Optional[jax.Array] = None):
        if key is None:
            key = jax.random.PRNGKey(0)
        keys = jax.random.split(key, len(self.augs))
        return tuple(aug(*inp, key=k)
                     for aug, inp, k in zip(self.augs, inputs, keys))


class ManyToOneAugmentationDispather:
    """Apply one pipeline with SHARED parameters to many inputs
    (reference: container/dispatcher.py ManyToOneAugmentationDispather)."""

    def __init__(self, *augs: AugmentationSequential):
        self.augs = list(augs)

    def __call__(self, *inputs, key: Optional[jax.Array] = None):
        if key is None:
            key = jax.random.PRNGKey(0)
        outs = []
        for aug, inp in zip(self.augs, inputs):
            img = inp[0] if isinstance(inp, (tuple, list)) else inp
            params = aug.generate_parameters(key, img.shape)
            if isinstance(inp, (tuple, list)):
                outs.append(aug(*inp, params=params))
            else:
                outs.append(aug(inp, params=params))
        return tuple(outs)
