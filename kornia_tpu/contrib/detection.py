"""Detection task APIs (reference: kornia/contrib/object_detection.py —
ObjectDetector:128, BoxFiltering:292; face_detection.py — FaceDetector:144,
FaceDetectorResult:45; edge_detection.py EdgeDetector:37).

The task wrappers (pre-processing, decoding, NMS, result containers) are
jit-friendly; FaceDetector runs the exact YuNet architecture
(`models/yunet.py`) and EdgeDetector the exact DexiNed
(`models/dexined.py`), so the published torch checkpoints drop in via
each model's `load_torch_weights`.
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Any, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..core.dtype import as_float
from ..geometry.bbox import nms as bbox_nms
from ..models.common import nchw_to_nhwc

__all__ = ["ObjectDetector", "BoxFiltering", "FaceDetector", "FaceKeypoint",
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

class FaceKeypoint(enum.Enum):
    """Facial keypoint ids (reference: face_detection.py:32-42)."""

    EYE_LEFT = 0
    EYE_RIGHT = 1
    NOSE = 2
    MOUTH_LEFT = 3
    MOUTH_RIGHT = 4


@dataclasses.dataclass
class FaceDetectorResult:
    """(reference: face_detection.py:45). data: (..., 15) = xyxy box,
    5 landmark xy pairs, score — padded rows have score 0."""

    data: jax.Array

    @property
    def xmin(self):
        return self.data[..., 0]

    @property
    def ymin(self):
        return self.data[..., 1]

    @property
    def xmax(self):
        return self.data[..., 2]

    @property
    def ymax(self):
        return self.data[..., 3]

    @property
    def score(self):
        return self.data[..., 14]

    @property
    def width(self):
        return self.xmax - self.xmin

    @property
    def height(self):
        return self.ymax - self.ymin

    @property
    def top_left(self):
        return self.data[..., 0:2]

    @property
    def bottom_right(self):
        return self.data[..., 2:4]

    def get_keypoint(self, keypoint) -> jax.Array:
        i = keypoint.value if isinstance(keypoint, FaceKeypoint) else int(keypoint)
        return self.data[..., 4 + 2 * i: 6 + 2 * i]


class FaceDetector:
    """(reference: face_detection.py:144): exact YuNet → prior decode →
    sqrt(cls·iou) scoring → NMS → FaceDetectorResult list per image.

    Fully static: `top_k` bounds the pre-NMS candidate set and the output
    is `keep_top_k` rows with suppressed/padded rows zeroed (score 0),
    compacted to the front in score order — jit-compatible replacement for
    the reference's variable-length keep lists."""

    def __init__(self, top_k: int = 5000, confidence_threshold: float = 0.3,
                 nms_threshold: float = 0.3, keep_top_k: Optional[int] = None,
                 params: Optional[Any] = None,
                 key: Optional[jax.Array] = None):
        from ..models.yunet import YuNet, yunet_init_params
        self.confidence_threshold = confidence_threshold
        self.nms_threshold = nms_threshold
        self.top_k = top_k
        self.keep_top_k = keep_top_k if keep_top_k is not None else top_k
        if params is None:
            params = yunet_init_params(
                key if key is not None else jax.random.PRNGKey(0))
        self.model = YuNet(params)

    def __call__(self, images: jax.Array) -> List[FaceDetectorResult]:
        from ..models.yunet import prior_boxes, decode, VARIANCE
        images = as_float(images)
        H, W = images.shape[-2:]
        out = self.model(images)
        priors = prior_boxes((H, W))
        boxes = decode(out["loc"], priors, VARIANCE)  # (B, N, 14)
        scale = jnp.asarray([W, H] * 7, boxes.dtype)
        boxes = boxes * scale
        scores = jnp.sqrt(out["conf"][..., 1]
                          * jnp.clip(out["iou"][..., 0], 0.0, 1.0))
        scores = jnp.where(scores > self.confidence_threshold, scores, 0.0)
        B = scores.shape[0]
        return [FaceDetectorResult(self.postprocess_one(boxes[b], scores[b]))
                for b in range(B)]

    def postprocess_one(self, boxes: jax.Array, scores: jax.Array) -> jax.Array:
        """Single-image top-k → NMS → front-compacted (keep_top_k, 15) rows
        (reference postprocess loop, face_detection.py:185-206)."""
        N = scores.shape[0]
        K = min(self.top_k, N)
        keep_k = min(self.keep_top_k, K)
        s_k, idx = jax.lax.top_k(scores, K)
        b_k = boxes[idx]
        keep = bbox_nms(b_k[:, :4], s_k, self.nms_threshold)
        valid = (keep >= 0)
        # compact kept rows to the front, preserving score order
        order = jnp.argsort(~valid, stable=True)[:keep_k]
        sel = jnp.maximum(keep[order], 0)
        ok = valid[order] & (s_k[sel] > 0)
        data = jnp.concatenate([b_k[sel], s_k[sel][:, None]], -1)
        return jnp.where(ok[:, None], data, 0.0)


# -----------------------------------------------------------------------------
# Edge detection
# -----------------------------------------------------------------------------

class EdgeDetector:
    """(reference: edge_detection.py:37 + EdgeDetectorBuilder:212-249):
    resize to `image_size` → ImageNet-mean/255-scale normalize → exact
    DexiNed → sigmoid → resize back to the input size."""

    _MEAN = (0.485, 0.456, 0.406)

    def __init__(self, params: Optional[Any] = None,
                 key: Optional[jax.Array] = None, image_size: int = 352):
        from ..models.dexined import DexiNed
        self.model = DexiNed(params, key)
        self.image_size = image_size

    def __call__(self, images: jax.Array) -> jax.Array:
        from ..ops.warp import resize
        images = as_float(images)
        H, W = images.shape[-2:]
        x = resize(images, (self.image_size, self.image_size), "bilinear",
                   align_corners=False)
        mean = jnp.asarray(self._MEAN, x.dtype).reshape(1, 3, 1, 1)
        x = (x - mean) * 255.0
        out = jax.nn.sigmoid(self.model(x))
        return resize(out, (H, W), "bilinear", align_corners=False)
