"""kornia-layout alias: ``kornia_tpu.filters`` mirrors ``kornia.filters``.

Functional ops live in ``kornia_tpu.ops.filters``; the reference's class API
(GaussianBlur2d, Sobel, …) is mirrored with frozen-config callables
(reference: kornia/filters/__init__.py export list)."""

from .ops.filters import *  # noqa: F401,F403
from .ops.filters import __all__  # noqa: F401
from .ops import filters as _f
from .ops.enhance import otsu_threshold  # noqa: F401  (reference exports it here too)
from .models.diffusion import StableDiffusionDissolving  # noqa: F401
from .core.module import fn_module as _fn_module

_CLASS_TO_FN = {
    "BilateralBlur": "bilateral_blur",
    "BlurPool2D": "blur_pool2d",
    "BoxBlur": "box_blur",
    "Canny": "canny",
    "EdgeAwareBlurPool2D": "edge_aware_blur_pool2d",
    "GaussianBlur2d": "gaussian_blur2d",
    "GuidedBlur": "guided_blur",
    "InRange": "in_range",
    "JointBilateralBlur": "joint_bilateral_blur",
    "Laplacian": "laplacian",
    "MaxBlurPool2D": "max_blur_pool2d",
    "MedianBlur": "median_blur",
    "MotionBlur": "motion_blur",
    "MotionBlur3D": "motion_blur3d",
    "Sobel": "sobel",
    "SpatialGradient": "spatial_gradient",
    "SpatialGradient3d": "spatial_gradient3d",
    "UnsharpMask": "unsharp_mask",
}

for _cls, _fname in _CLASS_TO_FN.items():
    globals()[_cls] = _fn_module(getattr(_f, _fname), _cls)
del _cls, _fname

OtsuThreshold = _fn_module(otsu_threshold, "OtsuThreshold")
