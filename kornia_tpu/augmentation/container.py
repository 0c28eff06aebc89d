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
    """Multi-datakey pipeline with PER-OP replay and exact inverse
    (reference: container/augment.py:431 forward, :303 inverse,
    container/ops.py per-DataKey dispatch).

    call: ``aug(image, mask, bbox, keypoints, data_keys=[...], key=key)``
    Boxes are (B, N, 4) xyxy, (B, N, 4, 2) corner quads, or
    `kornia_tpu.geometry.boxes.Boxes`; keypoints are (B, N, 2) or
    `Keypoints`. Container inputs come back as the same container type.

    Unlike a single composed 3x3 (round-1 design), every datakey replays
    the ops ONE BY ONE: size-changing crops re-frame subsequent ops,
    masks pick up non-affine warps (elastic/TPS) from the op's own apply,
    and the inverse walks the recorded params in reverse — matching the
    reference's semantics (container/augment.py:303 inverse loop).
    """

    def __init__(self, *augs: AugmentationBase2D,
                 data_keys: Sequence[str] = ("input",),
                 same_on_batch: bool = False):
        super().__init__(*augs)
        self.data_keys = list(data_keys)
        self._params: Optional[List[Dict]] = None
        self._in_hw: Optional[Tuple[int, int]] = None

    # -- size bookkeeping ---------------------------------------------------
    def size_chain(self, in_hw: Tuple[int, int]) -> List[Tuple[int, int]]:
        """Static (H, W) before each op (+ final): len == n_ops + 1."""
        sizes = [tuple(in_hw)]
        for aug in self.augs:
            sizes.append(tuple(aug.out_size(sizes[-1])))
        return sizes

    # -- matrix composition (legacy helper; affine ops only) ----------------
    def transform_matrix(self, shape, params: List[Dict]) -> jax.Array:
        B = shape[0]
        M = jnp.broadcast_to(jnp.eye(3), (B, 3, 3))
        sizes = self.size_chain(shape[-2:])
        for aug, p, hw in zip(self.augs, params, sizes):
            if isinstance(aug, GeometricAugmentationBase2D):
                M = aug._gated_matrix(p, hw) @ M
        return M

    # -- per-datakey application --------------------------------------------
    def _apply_image(self, x, params):
        for aug, p in zip(self.augs, params):
            x = aug(x, params=p)
        return x

    def _apply_mask(self, m, params, in_hw):
        sizes = self.size_chain(in_hw)
        for aug, p, hw in zip(self.augs, params, sizes):
            m = aug.apply_to_mask(m, p, hw)
        return m

    def _apply_coords(self, pts, params, in_hw):
        sizes = self.size_chain(in_hw)
        for aug, p, hw in zip(self.augs, params, sizes):
            pts = aug.transform_coords(pts, p, hw)
        return pts

    def _inverse_coords(self, pts, params, in_hw):
        sizes = self.size_chain(in_hw)
        for aug, p, hw in zip(reversed(self.augs), reversed(params),
                              reversed(sizes[:-1])):
            pts = aug.inverse_coords(pts, p, hw)
        return pts

    def _apply_bbox(self, bbox, params, in_hw):
        """xyxy boxes travel as corner quads through every op and are
        re-axis-aligned at the END (reference: container/ops.py:273 —
        per-op transforms on the quad, one final hull)."""
        if bbox.shape[-1] == 4 and bbox.ndim == 3:  # xyxy → corners
            corners = _xyxy_to_corners(bbox)
            out = self._apply_coords(corners, params, in_hw)
            return _corners_to_xyxy(out)
        return self._apply_coords(bbox, params, in_hw)

    def _inverse_bbox(self, bbox, params, in_hw):
        if bbox.shape[-1] == 4 and bbox.ndim == 3:
            corners = _xyxy_to_corners(bbox)
            out = self._inverse_coords(corners, params, in_hw)
            return _corners_to_xyxy(out)
        return self._inverse_coords(bbox, params, in_hw)

    def __call__(self, *inputs, data_keys: Optional[Sequence[str]] = None,
                 key: Optional[jax.Array] = None,
                 params: Optional[List[Dict]] = None):
        from ..geometry.boxes import Boxes, Keypoints
        keys_ = list(data_keys) if data_keys is not None else self.data_keys
        assert len(inputs) == len(keys_), \
            f"got {len(inputs)} inputs for data_keys {keys_}"
        img_idx = keys_.index("input")
        image = as_float(inputs[img_idx])
        in_hw = image.shape[-2:]
        if params is None:
            if key is None:
                key = jax.random.PRNGKey(0)
            params = self.generate_parameters(key, image.shape)
        self._params = params
        self._in_hw = tuple(in_hw)
        outs = []
        for inp, k in zip(inputs, keys_):
            if k == "input":
                outs.append(self._apply_image(as_float(inp), params))
            elif k == "mask":
                outs.append(self._apply_mask(as_float(inp), params, in_hw))
            elif k in ("bbox", "bbox_xyxy"):
                if isinstance(inp, Boxes):
                    quad = _xyxy_to_corners(inp.to_tensor("xyxy"))
                    out = self._apply_coords(quad, params, in_hw)
                    outs.append(Boxes(_corners_to_xyxy(out), inp.valid))
                else:
                    outs.append(self._apply_bbox(as_float(inp), params,
                                                 in_hw))
            elif k == "keypoints":
                if isinstance(inp, Keypoints):
                    out = self._apply_coords(inp.data, params, in_hw)
                    outs.append(Keypoints(out, inp.valid))
                else:
                    outs.append(self._apply_coords(as_float(inp), params,
                                                   in_hw))
            elif k == "class":
                outs.append(inp)
            else:
                raise ValueError(f"unknown data key {k}")
        return outs[0] if len(outs) == 1 else tuple(outs)

    # -- inverse -------------------------------------------------------------
    def inverse(self, *inputs, data_keys: Optional[Sequence[str]] = None,
                params: Optional[List[Dict]] = None,
                in_hw: Optional[Tuple[int, int]] = None):
        """Replay recorded params in REVERSE, op by op (reference:
        augment.py:303): each geometric op un-warps to its own input
        frame, so size-changing crops and per-op interpolation invert
        exactly (a composed global matrix cannot)."""
        from ..geometry.boxes import Boxes, Keypoints
        keys_ = list(data_keys) if data_keys is not None else self.data_keys
        params = params if params is not None else self._params
        assert params is not None, "call forward first or pass params"
        in_hw = tuple(in_hw) if in_hw is not None else self._in_hw
        assert in_hw is not None, "pass in_hw= (original H, W)"
        sizes = self.size_chain(in_hw)
        outs = []
        for inp, k in zip(inputs, keys_):
            if k in ("input", "mask"):
                x = as_float(inp)
                mode = "nearest" if k == "mask" else "bilinear"
                for aug, p, hw in zip(reversed(self.augs), reversed(params),
                                      reversed(sizes[:-1])):
                    x = aug.inverse_image(x, p, hw, mode=mode)
                outs.append(x)
            elif k == "keypoints":
                if isinstance(inp, Keypoints):
                    out = self._inverse_coords(inp.data, params, in_hw)
                    outs.append(Keypoints(out, inp.valid))
                else:
                    outs.append(self._inverse_coords(as_float(inp), params,
                                                     in_hw))
            elif k in ("bbox", "bbox_xyxy"):
                if isinstance(inp, Boxes):
                    quad = _xyxy_to_corners(inp.to_tensor("xyxy"))
                    out = self._inverse_coords(quad, params, in_hw)
                    outs.append(Boxes(_corners_to_xyxy(out), inp.valid))
                else:
                    outs.append(self._inverse_bbox(as_float(inp), params,
                                                   in_hw))
            else:
                outs.append(inp)
        return outs[0] if len(outs) == 1 else tuple(outs)


def _xyxy_to_corners(bbox: jax.Array) -> jax.Array:
    x0, y0, x1, y1 = (bbox[..., 0], bbox[..., 1], bbox[..., 2],
                      bbox[..., 3])
    return jnp.stack(
        [jnp.stack([x0, y0], -1), jnp.stack([x1, y0], -1),
         jnp.stack([x1, y1], -1), jnp.stack([x0, y1], -1)], axis=-2)


def _corners_to_xyxy(corners: jax.Array) -> jax.Array:
    return jnp.stack(
        [corners[..., 0].min(-1), corners[..., 1].min(-1),
         corners[..., 0].max(-1), corners[..., 1].max(-1)], -1)


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
