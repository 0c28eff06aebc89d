"""Functional bounding-box ops (reference: kornia/geometry/bbox.py:41-546)."""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.check import check, check_shape
from ..core.dtype import as_float
from .linalg import transform_points

__all__ = [
    "bbox_generator",
    "bbox_generator3d",
    "infer_bbox_shape",
    "infer_bbox_shape3d",
    "bbox_to_mask",
    "bbox_to_mask3d",
    "transform_bbox",
    "nms",
]


def bbox_generator(x_start: jax.Array, y_start: jax.Array,
                   width: jax.Array, height: jax.Array) -> jax.Array:
    """(B,) coords → (B, 4, 2) corner quads TL,TR,BR,BL
    (reference: bbox.py:41)."""
    x = as_float(x_start)
    y = as_float(y_start)
    w = as_float(width)
    h = as_float(height)
    tl = jnp.stack([x, y], -1)
    tr = jnp.stack([x + w - 1, y], -1)
    br = jnp.stack([x + w - 1, y + h - 1], -1)
    bl = jnp.stack([x, y + h - 1], -1)
    return jnp.stack([tl, tr, br, bl], axis=-2)


def bbox_generator3d(x_start, y_start, z_start, width, height, depth
                     ) -> jax.Array:
    """(B,) → (B, 8, 3) hexahedron vertices (reference: bbox.py:106)."""
    x = as_float(x_start)
    y = as_float(y_start)
    z = as_float(z_start)
    w = as_float(width)
    h = as_float(height)
    d = as_float(depth)
    verts = []
    for dz in (0, 1):
        zz = z + dz * (d - 1)
        verts += [
            jnp.stack([x, y, zz], -1),
            jnp.stack([x + w - 1, y, zz], -1),
            jnp.stack([x + w - 1, y + h - 1, zz], -1),
            jnp.stack([x, y + h - 1, zz], -1),
        ]
    return jnp.stack(verts, axis=-2)


def infer_bbox_shape(boxes: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Corner quads (..., 4, 2) → (heights, widths) (reference: bbox.py:186)."""
    check_shape(boxes, ["*", "4", "2"], "boxes")
    widths = boxes[..., 1, 0] - boxes[..., 0, 0] + 1
    heights = boxes[..., 3, 1] - boxes[..., 0, 1] + 1
    return heights, widths


def infer_bbox_shape3d(boxes: jax.Array
                       ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    check_shape(boxes, ["*", "8", "3"], "boxes")
    widths = boxes[..., 1, 0] - boxes[..., 0, 0] + 1
    heights = boxes[..., 3, 1] - boxes[..., 0, 1] + 1
    depths = boxes[..., 4, 2] - boxes[..., 0, 2] + 1
    return depths, heights, widths


def bbox_to_mask(boxes: jax.Array, width: int, height: int) -> jax.Array:
    """Corner quads (B, 4, 2) → (B, H, W) binary masks
    (reference: bbox.py:254)."""
    boxes = as_float(boxes)
    x0 = boxes[..., 0, 0][..., None, None]
    y0 = boxes[..., 0, 1][..., None, None]
    x1 = boxes[..., 1, 0][..., None, None]
    y1 = boxes[..., 3, 1][..., None, None]
    xs = jnp.arange(width, dtype=boxes.dtype)[None, None, :]
    ys = jnp.arange(height, dtype=boxes.dtype)[None, :, None]
    inside = (xs >= x0) & (xs <= x1) & (ys >= y0) & (ys <= y1)
    return inside.astype(boxes.dtype)


def bbox_to_mask3d(boxes: jax.Array, size: Tuple[int, int, int]) -> jax.Array:
    """(B, 8, 3) → (B, 1, D, H, W) (reference: bbox.py:313)."""
    boxes = as_float(boxes)
    D, H, W = size
    x0 = boxes[..., 0, 0][..., None, None, None]
    y0 = boxes[..., 0, 1][..., None, None, None]
    z0 = boxes[..., 0, 2][..., None, None, None]
    x1 = boxes[..., 1, 0][..., None, None, None]
    y1 = boxes[..., 3, 1][..., None, None, None]
    z1 = boxes[..., 4, 2][..., None, None, None]
    xs = jnp.arange(W, dtype=boxes.dtype)[None, None, None, :]
    ys = jnp.arange(H, dtype=boxes.dtype)[None, None, :, None]
    zs = jnp.arange(D, dtype=boxes.dtype)[None, :, None, None]
    inside = ((xs >= x0) & (xs <= x1) & (ys >= y0) & (ys <= y1)
              & (zs >= z0) & (zs <= z1))
    return inside[:, None].astype(boxes.dtype)


def transform_bbox(trans_mat: jax.Array, boxes: jax.Array,
                   mode: str = "xyxy", restore_coordinates: bool = True
                   ) -> jax.Array:
    """Apply (B, 3, 3) to xyxy or xywh boxes, axis-aligned envelope
    (reference: bbox.py:425)."""
    boxes = as_float(boxes)
    if mode == "xywh":
        x, y, w, h = (boxes[..., 0], boxes[..., 1], boxes[..., 2], boxes[..., 3])
        boxes_xyxy = jnp.stack([x, y, x + w, y + h], -1)
    else:
        boxes_xyxy = boxes
    x0, y0, x1, y1 = (boxes_xyxy[..., 0], boxes_xyxy[..., 1],
                      boxes_xyxy[..., 2], boxes_xyxy[..., 3])
    corners = jnp.stack(
        [jnp.stack([x0, y0], -1), jnp.stack([x1, y0], -1),
         jnp.stack([x1, y1], -1), jnp.stack([x0, y1], -1)], axis=-2)
    M = trans_mat[:, None] if corners.ndim == 4 else trans_mat
    warped = transform_points(M, corners)
    nx0 = warped[..., 0].min(-1)
    ny0 = warped[..., 1].min(-1)
    nx1 = warped[..., 0].max(-1)
    ny1 = warped[..., 1].max(-1)
    out = jnp.stack([nx0, ny0, nx1, ny1], -1)
    if mode == "xywh":
        out = jnp.stack([out[..., 0], out[..., 1], out[..., 2] - out[..., 0],
                         out[..., 3] - out[..., 1]], -1)
    return out


def nms(boxes: jax.Array, scores: jax.Array, iou_threshold: float,
        max_output: Optional[int] = None) -> jax.Array:
    """IoU-based NMS over xyxy boxes (N, 4) (reference: bbox.py:546).

    TPU formulation: fixed-trip-count suppression — sort once by score,
    then a static O(N²) mask update instead of a data-dependent loop.
    Returns indices (N,) with -1 for suppressed entries (kornia returns a
    variable-length keep list; padded indices generalize it under jit).
    """
    boxes = as_float(boxes)
    N = boxes.shape[0]
    order = jnp.argsort(-scores)
    b = boxes[order]
    area = jnp.clip(b[:, 2] - b[:, 0], 0, None) * jnp.clip(
        b[:, 3] - b[:, 1], 0, None)
    lt = jnp.maximum(b[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(b[:, None, 2:], b[None, :, 2:])
    wh = jnp.clip(rb - lt, 0.0, None)
    inter = wh[..., 0] * wh[..., 1]
    iou = inter / jnp.maximum(area[:, None] + area[None, :] - inter, 1e-8)
    overlap = iou > iou_threshold

    def body(keep, i):
        # i survives iff no higher-scored kept box overlaps it
        sup = jnp.any(overlap[i] & keep & (jnp.arange(N) < i))
        return keep.at[i].set(~sup), None

    keep, _ = jax.lax.scan(body, jnp.ones(N, bool), jnp.arange(N))
    kept_sorted = jnp.where(keep, order, -1)
    if max_output is not None:
        kept_sorted = kept_sorted[:max_output]
    return kept_sorted


def validate_bbox(boxes: jax.Array) -> bool:
    """Check (B, 4, 2) boxes are axis-aligned rectangles with consistent
    width/height (reference: bbox.py:41). Trace-time check; returns True."""
    check(boxes.ndim == 3 and boxes.shape[1:] == (4, 2),
          f"boxes must be (B, 4, 2), got {boxes.shape}")
    return True


def validate_bbox3d(boxes: jax.Array) -> bool:
    """Check (B, 8, 3) hexahedrons (reference: bbox.py:78)."""
    check(boxes.ndim == 3 and boxes.shape[1:] == (8, 3),
          f"boxes must be (B, 8, 3), got {boxes.shape}")
    return True


__all__ += ["validate_bbox", "validate_bbox3d"]
