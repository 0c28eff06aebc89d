"""kornia-layout alias: ``kornia_tpu.color`` mirrors ``kornia.color``.

Functional ops live in ``kornia_tpu.ops.color``; the reference's
``nn.Module`` classes (RgbToHsv, Sepia, …) are mirrored as thin frozen-config
callables built by :func:`kornia_tpu.core.module.fn_module`
(reference: kornia/color/__init__.py export list)."""

from typing import List

from .ops.color import *  # noqa: F401,F403
from .ops import color as _f
from .ops.colormap import ApplyColorMap, ColorMap, ColorMapType  # noqa: F401
from .core.module import fn_module as _fn_module

# reference: kornia/color/_colormap_data.py:26 — a plain type alias
RGBColor = List[float]

_CLASS_TO_FN = {
    "RgbToGrayscale": "rgb_to_grayscale",
    "BgrToGrayscale": "bgr_to_grayscale",
    "GrayscaleToRgb": "grayscale_to_rgb",
    "RgbToBgr": "rgb_to_bgr",
    "BgrToRgb": "bgr_to_rgb",
    "RgbToRgba": "rgb_to_rgba",
    "BgrToRgba": "bgr_to_rgba",
    "RgbaToRgb": "rgba_to_rgb",
    "RgbaToBgr": "rgba_to_bgr",
    "RgbToLinearRgb": "rgb_to_linear_rgb",
    "LinearRgbToRgb": "linear_rgb_to_rgb",
    "RgbToHsv": "rgb_to_hsv",
    "HsvToRgb": "hsv_to_rgb",
    "RgbToHls": "rgb_to_hls",
    "HlsToRgb": "hls_to_rgb",
    "RgbToXyz": "rgb_to_xyz",
    "XyzToRgb": "xyz_to_rgb",
    "RgbToLab": "rgb_to_lab",
    "LabToRgb": "lab_to_rgb",
    "RgbToLuv": "rgb_to_luv",
    "LuvToRgb": "luv_to_rgb",
    "RgbToYcbcr": "rgb_to_ycbcr",
    "YcbcrToRgb": "ycbcr_to_rgb",
    "RgbToYuv": "rgb_to_yuv",
    "YuvToRgb": "yuv_to_rgb",
    "RgbToYuv420": "rgb_to_yuv420",
    "Yuv420ToRgb": "yuv420_to_rgb",
    "RgbToYuv422": "rgb_to_yuv422",
    "Yuv422ToRgb": "yuv422_to_rgb",
    "RgbToRaw": "rgb_to_raw",
    "RawToRgb": "raw_to_rgb",
    "RawToRgb2x2Downscaled": "raw_to_rgb_2x2_downscaled",
    "RgbToRgb255": "rgb_to_rgb255",
    "Rgb255ToRgb": "rgb255_to_rgb",
    "NormalsToRgb255": "normals_to_rgb255",
    "Rgb255ToNormals": "rgb255_to_normals",
    "Sepia": "sepia",
}

for _cls, _fname in _CLASS_TO_FN.items():
    globals()[_cls] = _fn_module(getattr(_f, _fname), _cls)
del _cls, _fname
