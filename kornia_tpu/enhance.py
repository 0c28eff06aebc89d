"""kornia-layout alias: ``kornia_tpu.enhance`` mirrors ``kornia.enhance``.

Functional ops live in ``kornia_tpu.ops.enhance`` / ``ops.jpeg``; the
reference's class API is mirrored with frozen-config callables plus a
stateful ZCAWhitening (reference: kornia/enhance/__init__.py)."""

import jax.numpy as _jnp

from .ops.enhance import *  # noqa: F401,F403
from .ops import enhance as _f
from .ops.jpeg import jpeg_codec_differentiable  # noqa: F401
from .core.module import fn_module as _fn_module

_CLASS_TO_FN = {
    "AddWeighted": "add_weighted",
    "AdjustBrightness": "adjust_brightness",
    "AdjustBrightnessAccumulative": "adjust_brightness_accumulative",
    "AdjustContrast": "adjust_contrast",
    "AdjustContrastWithMeanSubtraction": "adjust_contrast_with_mean_subtraction",
    "AdjustGamma": "adjust_gamma",
    "AdjustHue": "adjust_hue",
    "AdjustLog": "adjust_log",
    "AdjustSaturation": "adjust_saturation",
    "AdjustSaturationWithGraySubtraction":
        "adjust_saturation_with_gray_subtraction",
    "AdjustSigmoid": "adjust_sigmoid",
    "Denormalize": "denormalize",
    "IntegralImage": "integral_image",
    "IntegralTensor": "integral_tensor",
    "Invert": "invert",
    "Normalize": "normalize",
    "Rescale": "rescale_intensity",
    "Threshold": "threshold",
}

for _cls, _fname in _CLASS_TO_FN.items():
    globals()[_cls] = _fn_module(getattr(_f, _fname), _cls)
del _cls, _fname

JPEGCodecDifferentiable = _fn_module(jpeg_codec_differentiable,
                                     "JPEGCodecDifferentiable")


class ZCAWhitening:
    """Stateful ZCA whitening: fit() estimates (T, mean, T_inv) from data,
    __call__ applies them (reference: enhance/zca.py:34 ZCAWhitening)."""

    def __init__(self, dim: int = 0, eps: float = 1e-6,
                 unbiased: bool = True, compute_inv: bool = False,
                 detach_transforms: bool = True):
        self.dim = dim
        self.eps = eps
        self.unbiased = unbiased
        self.compute_inv = compute_inv
        self.detach_transforms = detach_transforms
        self.fitted = False

    def fit(self, x) -> "ZCAWhitening":
        import jax
        out = _f.zca_mean(x, self.dim, self.unbiased, self.eps,
                          self.compute_inv)
        if self.compute_inv:
            self.transform_matrix, self.mean_vector, self.transform_inv = out
        else:
            self.transform_matrix, self.mean_vector = out
            self.transform_inv = None
        if self.detach_transforms:
            self.transform_matrix = jax.lax.stop_gradient(
                self.transform_matrix)
            self.mean_vector = jax.lax.stop_gradient(self.mean_vector)
            if self.transform_inv is not None:
                self.transform_inv = jax.lax.stop_gradient(
                    self.transform_inv)
        self.fitted = True
        return self

    def __call__(self, x, include_fit: bool = False):
        if include_fit or not self.fitted:
            self.fit(x)
        return _f.linear_transform(x, self.transform_matrix,
                                   self.mean_vector, self.dim)

    forward = __call__

    def inverse_transform(self, x):
        if not (self.fitted and self.compute_inv):
            raise RuntimeError(
                "fit(compute_inv=True) must run before inverse_transform")
        from .core.dtype import as_float
        x = as_float(x)
        flat = _jnp.moveaxis(x, self.dim, 0).reshape(x.shape[self.dim], -1)
        out = flat @ self.transform_inv + self.mean_vector
        return _jnp.moveaxis(
            out.reshape(_jnp.moveaxis(x, self.dim, 0).shape), 0, self.dim)
