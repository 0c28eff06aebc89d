"""kornia-layout: ``kornia_tpu.contrib`` mirrors ``kornia.contrib``."""

from .ops import *  # noqa: F401,F403
from .detection import (  # noqa: F401
    BoxFiltering,
    EdgeDetector,
    FaceDetector,
    FaceDetectorResult,
    FaceKeypoint,
    ObjectDetector,
)
from .image_stitching import ImageStitcher  # noqa: F401
from ..core.module import fn_module as _fn_module
from . import ops as _ops

ExtractTensorPatches = _fn_module(_ops.extract_tensor_patches,
                                  "ExtractTensorPatches")
CombineTensorPatches = _fn_module(_ops.combine_tensor_patches,
                                  "CombineTensorPatches")
DistanceTransform = _fn_module(_ops.distance_transform, "DistanceTransform")


class SuperResolution:
    """Task wrapper around a super-resolution model (reference:
    contrib/super_resolution.py:43 — there an ONNX/basicsr bridge; here the
    native :class:`kornia_tpu.models.SmallSR`)."""

    name = "super_resolution"

    def __init__(self, model=None, pre_processor=None, post_processor=None):
        if model is None:
            from ..models.small_sr import SmallSR
            model = SmallSR()
        self.model = model
        self.pre_processor = pre_processor or (lambda x: x)
        self.post_processor = post_processor or (lambda x: x)

    def __call__(self, images):
        import jax.numpy as jnp
        x = self.pre_processor(images)
        if isinstance(x, (list, tuple)):
            out = [self.model(im[None])[0] for im in x]
        else:
            out = self.model(x)
        return self.post_processor(out)

    forward = __call__


class BoxMotTracker:
    """Detector + multi-object tracker loop (reference:
    contrib/boxmot_tracker.py:40 — there a lazy `boxmot` dependency; here
    the native jitted ByteTrack in :mod:`kornia_tpu.tracking.bytetrack`)."""

    def __init__(self, detector=None, tracker_model_name: str = "ByteTrack",
                 **tracker_kwargs):
        from ..tracking.bytetrack import BoxTracker, ByteTracker
        allowed = ("capacity", "track_high_thresh", "track_low_thresh",
                   "new_track_thresh", "match_thresh", "second_match_thresh",
                   "track_buffer")
        bt = ByteTracker(**{k: v for k, v in tracker_kwargs.items()
                            if k in allowed})
        self.detector = detector
        self._tracker = BoxTracker(detector=detector, tracker=bt)
        self.tracker_model_name = tracker_model_name

    def update(self, image):
        return self._tracker.update(image)

    __call__ = update
