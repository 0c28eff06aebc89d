"""Boxes / Keypoints containers
(reference: kornia/geometry/boxes.py:186-837, keypoints.py:32-210).

Pytree dataclasses over padded fixed-N arrays with validity masks — the
jit-compatible generalization of the reference's variable-length lists.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp

from ..core.dtype import as_float
from .bbox import bbox_to_mask, transform_bbox
from .linalg import transform_points

__all__ = ["Boxes", "Keypoints"]


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class Boxes:
    """(B, N, 4) xyxy boxes + (B, N) validity (reference: boxes.py:186)."""

    data: jax.Array
    valid: jax.Array

    def tree_flatten(self):
        return (self.data, self.valid), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    # constructors ---------------------------------------------------------
    @classmethod
    def from_tensor(cls, boxes: jax.Array, mode: str = "xyxy") -> "Boxes":
        boxes = as_float(boxes)
        if boxes.ndim == 2:
            boxes = boxes[None]
        if mode == "xywh":
            x, y, w, h = (boxes[..., 0], boxes[..., 1], boxes[..., 2],
                          boxes[..., 3])
            boxes = jnp.stack([x, y, x + w, y + h], -1)
        elif mode == "vertices":
            x0 = boxes[..., 0].min(-1) if boxes.ndim == 4 else boxes[..., 0]
            boxes = jnp.stack(
                [boxes[..., 0].min(-1), boxes[..., 1].min(-1),
                 boxes[..., 0].max(-1), boxes[..., 1].max(-1)], -1)
        valid = jnp.ones(boxes.shape[:-1], dtype=bool)
        return cls(boxes, valid)

    def to_tensor(self, mode: str = "xyxy") -> jax.Array:
        if mode == "xywh":
            b = self.data
            return jnp.stack([b[..., 0], b[..., 1], b[..., 2] - b[..., 0],
                              b[..., 3] - b[..., 1]], -1)
        if mode == "vertices":
            b = self.data
            x0, y0, x1, y1 = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
            return jnp.stack(
                [jnp.stack([x0, y0], -1), jnp.stack([x1, y0], -1),
                 jnp.stack([x1, y1], -1), jnp.stack([x0, y1], -1)], axis=-2)
        return self.data

    # ops ------------------------------------------------------------------
    def transform_boxes(self, M: jax.Array) -> "Boxes":
        """(reference: boxes.py transform_boxes — homography on corners)."""
        return Boxes(transform_bbox(M, self.data, "xyxy"), self.valid)

    def compute_area(self) -> jax.Array:
        b = self.data
        area = jnp.clip(b[..., 2] - b[..., 0], 0, None) * jnp.clip(
            b[..., 3] - b[..., 1], 0, None)
        return area * self.valid

    def filter_boxes_by_area(self, min_area: float = 0.0,
                             max_area: Optional[float] = None) -> "Boxes":
        area = self.compute_area()
        ok = area >= min_area
        if max_area is not None:
            ok = ok & (area <= max_area)
        return Boxes(self.data, self.valid & ok)

    def clamp(self, height: int, width: int) -> "Boxes":
        b = self.data
        x = jnp.clip(b[..., 0::2], 0, width - 1)
        y = jnp.clip(b[..., 1::2], 0, height - 1)
        out = jnp.stack([x[..., 0], y[..., 0], x[..., 1], y[..., 1]], -1)
        return Boxes(out, self.valid)

    def to_mask(self, height: int, width: int) -> jax.Array:
        """(B, N, H, W) masks."""
        B, N = self.data.shape[:2]
        quads = self.to_tensor("vertices").reshape(B * N, 4, 2)
        m = bbox_to_mask(quads, width, height).reshape(B, N, height, width)
        return m * self.valid[..., None, None]

    def pad(self, n: int) -> "Boxes":
        pad = [(0, 0), (0, n), (0, 0)]
        return Boxes(jnp.pad(self.data, pad),
                     jnp.pad(self.valid, [(0, 0), (0, n)]))


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class Keypoints:
    """(B, N, 2) points + validity (reference: keypoints.py:32)."""

    data: jax.Array
    valid: jax.Array

    def tree_flatten(self):
        return (self.data, self.valid), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @classmethod
    def from_tensor(cls, pts: jax.Array) -> "Keypoints":
        pts = as_float(pts)
        if pts.ndim == 2:
            pts = pts[None]
        return cls(pts, jnp.ones(pts.shape[:-1], dtype=bool))

    def to_tensor(self) -> jax.Array:
        return self.data

    def transform_keypoints(self, M: jax.Array) -> "Keypoints":
        return Keypoints(transform_points(M, self.data), self.valid)

    def clamp(self, height: int, width: int) -> "Keypoints":
        x = jnp.clip(self.data[..., 0], 0, width - 1)
        y = jnp.clip(self.data[..., 1], 0, height - 1)
        return Keypoints(jnp.stack([x, y], -1), self.valid)

    def mark_outside(self, height: int, width: int) -> "Keypoints":
        inside = ((self.data[..., 0] >= 0) & (self.data[..., 0] < width)
                  & (self.data[..., 1] >= 0) & (self.data[..., 1] < height))
        return Keypoints(self.data, self.valid & inside)

    def pad(self, n: int) -> "Keypoints":
        return Keypoints(jnp.pad(self.data, [(0, 0), (0, n), (0, 0)]),
                         jnp.pad(self.valid, [(0, 0), (0, n)]))


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class VideoBoxes:
    """(B, T, N, 4) xyxy boxes over time + validity
    (reference: boxes.py:837 VideoBoxes)."""

    data: jax.Array
    valid: jax.Array

    def tree_flatten(self):
        return (self.data, self.valid), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @classmethod
    def from_tensor(cls, boxes: jax.Array) -> "VideoBoxes":
        boxes = as_float(boxes)
        return cls(boxes, jnp.ones(boxes.shape[:-1], dtype=bool))

    def to_frame_boxes(self) -> Boxes:
        """Fold time into the batch dim."""
        B, T, N, _ = self.data.shape
        return Boxes(self.data.reshape(B * T, N, 4),
                     self.valid.reshape(B * T, N))

    def transform_boxes(self, M: jax.Array) -> "VideoBoxes":
        """Apply per-clip (B, 3, 3) or per-frame (B, T, 3, 3) homographies."""
        if M.ndim == 3:
            M = jnp.broadcast_to(M[:, None], (*self.data.shape[:2], 3, 3))
        B, T, N, _ = self.data.shape
        flat = transform_bbox(M.reshape(B * T, 3, 3),
                              self.data.reshape(B * T, N, 4), "xyxy")
        return VideoBoxes(flat.reshape(B, T, N, 4), self.valid)
