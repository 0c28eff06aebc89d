"""2D intensity augmentations
(reference: kornia/augmentation/_2d/intensity/, 36 ops, ~5k LoC)."""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops import color as C
from ..ops import enhance as E
from ..ops import filters as F
from .base import IntensityAugmentationBase2D

__all__ = [
    "ColorJiggle",
    "RandomDissolving",
    "ColorJitter",
    "RandomBrightness",
    "RandomContrast",
    "RandomSaturation",
    "RandomHue",
    "RandomGamma",
    "RandomGrayscale",
    "RandomGaussianBlur",
    "RandomGaussianNoise",
    "RandomMotionBlur",
    "RandomBoxBlur",
    "RandomMedianBlur",
    "RandomSolarize",
    "RandomPosterize",
    "RandomSharpness",
    "RandomEqualize",
    "RandomCLAHE",
    "RandomAutoContrast",
    "RandomInvert",
    "RandomChannelShuffle",
    "RandomChannelDropout",
    "RandomErasing",
    "RandomSaltAndPepper",
    "RandomRGBShift",
    "RandomPlanckianJitter",
    "RandomLinearIllumination",
    "RandomPlasmaBrightness",
    "RandomPlasmaShadow",
    "RandomJPEG",
    "Normalize",
    "Denormalize",
]


def _as_range(r, default):
    if r is None:
        return default
    if isinstance(r, (int, float)):
        return (float(r), float(r))
    return (float(r[0]), float(r[1]))


class RandomBrightness(IntensityAugmentationBase2D):
    """(reference: _2d/intensity/brightness.py)."""

    def __init__(self, brightness=(0.8, 1.2), clip_output=True, **kw):
        super().__init__(**kw)
        self.rng = _as_range(brightness, (0.8, 1.2))
        self.clip_output = clip_output

    def sample_params(self, key, batch, shape):
        return {"factor": self._uniform(key, batch, *self.rng)}

    def apply(self, x, params):
        # reference RandomBrightness samples a factor around 1 and applies
        # the ADDITIVE adjust with (factor - 1)
        return E.adjust_brightness(x, params["factor"] - 1.0,
                                   self.clip_output)


class RandomContrast(IntensityAugmentationBase2D):
    def __init__(self, contrast=(0.8, 1.2), clip_output=True, **kw):
        super().__init__(**kw)
        self.rng = _as_range(contrast, (0.8, 1.2))
        self.clip_output = clip_output

    def sample_params(self, key, batch, shape):
        return {"factor": self._uniform(key, batch, *self.rng)}

    def apply(self, x, params):
        # reference RandomContrast uses the MULTIPLICATIVE adjust_contrast
        # (_2d/intensity/contrast.py:90), not the mean-subtraction variant
        return E.adjust_contrast(x, params["factor"], self.clip_output)


class RandomSaturation(IntensityAugmentationBase2D):
    def __init__(self, saturation=(0.8, 1.2), **kw):
        super().__init__(**kw)
        self.rng = _as_range(saturation, (0.8, 1.2))

    def sample_params(self, key, batch, shape):
        return {"factor": self._uniform(key, batch, *self.rng)}

    def apply(self, x, params):
        return E.adjust_saturation(x, params["factor"])


class RandomHue(IntensityAugmentationBase2D):
    def __init__(self, hue=(-0.1, 0.1), **kw):
        super().__init__(**kw)
        self.rng = _as_range(hue, (-0.1, 0.1))

    def sample_params(self, key, batch, shape):
        return {"factor": self._uniform(key, batch, *self.rng)}

    def apply(self, x, params):
        return E.adjust_hue(x, params["factor"] * 2.0 * jnp.pi)


class RandomGamma(IntensityAugmentationBase2D):
    def __init__(self, gamma=(0.8, 1.2), gain=(1.0, 1.0), **kw):
        super().__init__(**kw)
        self.g_rng = _as_range(gamma, (0.8, 1.2))
        self.gain_rng = _as_range(gain, (1.0, 1.0))

    def sample_params(self, key, batch, shape):
        k1, k2 = jax.random.split(key)
        return {"gamma": self._uniform(k1, batch, *self.g_rng),
                "gain": self._uniform(k2, batch, *self.gain_rng)}

    def apply(self, x, params):
        return E.adjust_gamma(x, params["gamma"], params["gain"])


class ColorJiggle(IntensityAugmentationBase2D):
    """Sequential brightness/contrast/saturation/hue in random-free fixed
    order (reference: _2d/intensity/color_jiggle.py)."""

    def __init__(self, brightness=0.2, contrast=0.2, saturation=0.2,
                 hue=0.1, **kw):
        super().__init__(**kw)
        b = brightness if isinstance(brightness, (tuple, list)) else (
            max(0.0, 1 - brightness), 1 + brightness)
        c = contrast if isinstance(contrast, (tuple, list)) else (
            max(0.0, 1 - contrast), 1 + contrast)
        s = saturation if isinstance(saturation, (tuple, list)) else (
            max(0.0, 1 - saturation), 1 + saturation)
        h = hue if isinstance(hue, (tuple, list)) else (-hue, hue)
        self.b, self.c, self.s, self.h = b, c, s, h

    def sample_params(self, key, batch, shape):
        ks = jax.random.split(key, 4)
        return {
            "brightness": self._uniform(ks[0], batch, *self.b),
            "contrast": self._uniform(ks[1], batch, *self.c),
            "saturation": self._uniform(ks[2], batch, *self.s),
            "hue": self._uniform(ks[3], batch, *self.h),
        }

    def apply(self, x, params):
        x = E.adjust_brightness(x, params["brightness"] - 1.0)
        x = E.adjust_contrast(x, params["contrast"])
        x = E.adjust_saturation(x, params["saturation"])
        x = E.adjust_hue(x, params["hue"] * 2.0 * jnp.pi)
        return x


ColorJitter = ColorJiggle  # torchvision-compatible alias (reference keeps both)


class RandomGrayscale(IntensityAugmentationBase2D):
    def __init__(self, p: float = 0.1, **kw):
        super().__init__(p=p, **kw)

    def apply(self, x, params):
        return C.grayscale_to_rgb(C.rgb_to_grayscale(x))


class RandomGaussianBlur(IntensityAugmentationBase2D):
    def __init__(self, kernel_size=(3, 3), sigma=(0.1, 2.0), **kw):
        super().__init__(**kw)
        self.kernel_size = kernel_size if isinstance(kernel_size, tuple) else (
            kernel_size, kernel_size)
        self.sigma_rng = _as_range(sigma, (0.1, 2.0))

    def sample_params(self, key, batch, shape):
        return {"sigma": self._uniform(key, batch, *self.sigma_rng)}

    def apply(self, x, params):
        # per-sample sigma: build batched kernels
        ky, kx = self.kernel_size
        gy = F.get_gaussian_kernel1d(ky, params["sigma"])  # (B, ky)
        gx = F.get_gaussian_kernel1d(kx, params["sigma"])
        out = F.filter2d(x, gy[..., :, None], border_type="reflect")
        return F.filter2d(out, gx[..., None, :], border_type="reflect")


class RandomGaussianNoise(IntensityAugmentationBase2D):
    def __init__(self, mean: float = 0.0, std: float = 1.0, **kw):
        super().__init__(**kw)
        self.mean = mean
        self.std = std

    def sample_params(self, key, batch, shape):
        return {"noise": self.mean + self.std * jax.random.normal(key, shape)}

    def apply(self, x, params):
        # reference adds the sampled noise UNclipped
        # (_2d/intensity/gaussian_noise.py:71)
        return x + params["noise"]


class RandomMotionBlur(IntensityAugmentationBase2D):
    def __init__(self, kernel_size: int = 5, angle=(-45.0, 45.0),
                 direction=(-1.0, 1.0), **kw):
        super().__init__(**kw)
        self.kernel_size = kernel_size
        self.angle_rng = _as_range(angle, (-45.0, 45.0))
        self.dir_rng = _as_range(direction, (-1.0, 1.0))

    def sample_params(self, key, batch, shape):
        k1, k2 = jax.random.split(key)
        return {"angle": self._uniform(k1, batch, *self.angle_rng),
                "direction": self._uniform(k2, batch, *self.dir_rng)}

    def apply(self, x, params):
        return F.motion_blur(x, self.kernel_size, params["angle"],
                             params["direction"])


class RandomBoxBlur(IntensityAugmentationBase2D):
    def __init__(self, kernel_size=(3, 3), **kw):
        super().__init__(**kw)
        self.kernel_size = kernel_size

    def apply(self, x, params):
        return F.box_blur(x, self.kernel_size)


class RandomMedianBlur(IntensityAugmentationBase2D):
    def __init__(self, kernel_size=(3, 3), **kw):
        super().__init__(**kw)
        self.kernel_size = kernel_size

    def apply(self, x, params):
        return F.median_blur(x, self.kernel_size)


class RandomSolarize(IntensityAugmentationBase2D):
    def __init__(self, thresholds=0.1, additions=0.1, **kw):
        super().__init__(**kw)
        t = thresholds if isinstance(thresholds, (tuple, list)) else (
            0.5 - thresholds, 0.5 + thresholds)
        a = additions if isinstance(additions, (tuple, list)) else (
            -additions, additions)
        self.t_rng, self.a_rng = t, a

    def sample_params(self, key, batch, shape):
        k1, k2 = jax.random.split(key)
        return {"thresholds": self._uniform(k1, batch, *self.t_rng),
                "additions": self._uniform(k2, batch, *self.a_rng)}

    def apply(self, x, params):
        return E.solarize(x, params["thresholds"], params["additions"])


class RandomPosterize(IntensityAugmentationBase2D):
    def __init__(self, bits=3, **kw):
        super().__init__(**kw)
        self.bits_rng = bits if isinstance(bits, (tuple, list)) else (bits, 8)

    def sample_params(self, key, batch, shape):
        lo, hi = self.bits_rng
        if self.same_on_batch:
            b = jax.random.randint(key, (), lo, hi + 1)
            bits = jnp.broadcast_to(b, (batch,))
        else:
            bits = jax.random.randint(key, (batch,), lo, hi + 1)
        return {"bits": bits}

    def apply(self, x, params):
        return E.posterize(x, params["bits"])


class RandomSharpness(IntensityAugmentationBase2D):
    def __init__(self, sharpness=0.5, **kw):
        super().__init__(**kw)
        s = sharpness if isinstance(sharpness, (tuple, list)) else (0.0, sharpness)
        self.s_rng = s

    def sample_params(self, key, batch, shape):
        return {"factor": self._uniform(key, batch, *self.s_rng)}

    def apply(self, x, params):
        return E.sharpness(x, params["factor"])


class RandomEqualize(IntensityAugmentationBase2D):
    def apply(self, x, params):
        return E.equalize(x)


class RandomCLAHE(IntensityAugmentationBase2D):
    def __init__(self, clip_limit=(40.0, 40.0), grid_size=(8, 8), **kw):
        super().__init__(**kw)
        self.clip_rng = _as_range(clip_limit, (40.0, 40.0))
        self.grid_size = grid_size

    def apply(self, x, params):
        return E.equalize_clahe(x, self.clip_rng[1], self.grid_size)


class RandomAutoContrast(IntensityAugmentationBase2D):
    def __init__(self, clip_output: bool = True, **kw):
        super().__init__(**kw)
        self.clip_output = clip_output

    def apply(self, x, params):
        out = E.normalize_min_max(x)
        # reference auto_contrast.py:60 clamps by default
        return jnp.clip(out, 0.0, 1.0) if self.clip_output else out


class RandomInvert(IntensityAugmentationBase2D):
    def __init__(self, max_val: float = 1.0, **kw):
        super().__init__(**kw)
        self.max_val = max_val

    def apply(self, x, params):
        return E.invert(x, self.max_val)


class RandomChannelShuffle(IntensityAugmentationBase2D):
    def sample_params(self, key, batch, shape):
        C_ = shape[1]
        if self.same_on_batch:
            perm = jax.random.permutation(key, C_)
            perm = jnp.broadcast_to(perm, (batch, C_))
        else:
            perm = jax.vmap(lambda k: jax.random.permutation(k, C_))(
                jax.random.split(key, batch))
        return {"perm": perm}

    def apply(self, x, params):
        return jnp.take_along_axis(
            x, params["perm"][:, :, None, None].astype(jnp.int32), axis=1)


class RandomChannelDropout(IntensityAugmentationBase2D):
    def __init__(self, num_drop_channels: int = 1, fill_value: float = 0.0, **kw):
        super().__init__(**kw)
        self.num_drop = num_drop_channels
        self.fill_value = fill_value

    def sample_params(self, key, batch, shape):
        C_ = shape[1]
        scores = jax.random.uniform(key, (batch, C_))
        _, idx = jax.lax.top_k(scores, self.num_drop)
        drop = jnp.zeros((batch, C_), bool)
        drop = drop.at[jnp.arange(batch)[:, None], idx].set(True)
        return {"drop": drop}

    def apply(self, x, params):
        m = params["drop"][:, :, None, None]
        return jnp.where(m, self.fill_value, x)


class RandomErasing(IntensityAugmentationBase2D):
    """Rectangle erasing (reference: _2d/intensity/erasing.py)."""

    def __init__(self, scale=(0.02, 0.33), ratio=(0.3, 3.3), value=0.0, **kw):
        super().__init__(**kw)
        self.scale = scale
        self.ratio = ratio
        self.value = value

    def sample_params(self, key, batch, shape):
        H, W = shape[-2:]
        ks = jax.random.split(key, 4)
        area = self._uniform(ks[0], batch, *self.scale) * H * W
        log_ratio = self._uniform(ks[1], batch, jnp.log(self.ratio[0]),
                                  jnp.log(self.ratio[1]))
        ratio = jnp.exp(log_ratio)
        h = jnp.sqrt(area * ratio)
        w = jnp.sqrt(area / ratio)
        h = jnp.clip(h, 1, H)
        w = jnp.clip(w, 1, W)
        y0 = self._uniform(ks[2], batch, 0.0, 1.0) * (H - h)
        x0 = self._uniform(ks[3], batch, 0.0, 1.0) * (W - w)
        return {"y0": y0, "x0": x0, "h": h, "w": w}

    def apply(self, x, params):
        H, W = x.shape[-2:]
        ys = jnp.arange(H, dtype=x.dtype)[None, :, None]
        xs = jnp.arange(W, dtype=x.dtype)[None, None, :]
        y0 = params["y0"][:, None, None]
        x0 = params["x0"][:, None, None]
        h = params["h"][:, None, None]
        w = params["w"][:, None, None]
        inside = ((ys >= y0) & (ys < y0 + h) & (xs >= x0) & (xs < x0 + w))
        return jnp.where(inside[:, None], self.value, x)


class RandomSaltAndPepper(IntensityAugmentationBase2D):
    def __init__(self, amount=(0.01, 0.06), salt_vs_pepper=(0.4, 0.6), **kw):
        super().__init__(**kw)
        self.amount = _as_range(amount, (0.01, 0.06))
        self.svp = _as_range(salt_vs_pepper, (0.4, 0.6))

    def sample_params(self, key, batch, shape):
        k1, k2, k3, k4 = jax.random.split(key, 4)
        B, C_, H, W = shape
        amount = self._uniform(k1, batch, *self.amount)[:, None, None]
        svp = self._uniform(k2, batch, *self.svp)[:, None, None]
        u = jax.random.uniform(k3, (B, H, W))
        salt = u < amount * svp
        pepper = (u >= amount * svp) & (u < amount)
        return {"salt": salt, "pepper": pepper}

    def apply(self, x, params):
        x = jnp.where(params["salt"][:, None], 1.0, x)
        return jnp.where(params["pepper"][:, None], 0.0, x)


class RandomRGBShift(IntensityAugmentationBase2D):
    def __init__(self, r_shift_limit=0.5, g_shift_limit=0.5,
                 b_shift_limit=0.5, **kw):
        super().__init__(**kw)
        self.limits = (r_shift_limit, g_shift_limit, b_shift_limit)

    def sample_params(self, key, batch, shape):
        ks = jax.random.split(key, 3)
        return {
            "r": self._uniform(ks[0], batch, -self.limits[0], self.limits[0]),
            "g": self._uniform(ks[1], batch, -self.limits[1], self.limits[1]),
            "b": self._uniform(ks[2], batch, -self.limits[2], self.limits[2]),
        }

    def apply(self, x, params):
        return E.shift_rgb(x, params["r"], params["g"], params["b"])


# Planckian-locus r/b gain tables from the Planckian Jitter paper
# (Zini et al. 2022), identical to the reference's published constants
# (_2d/intensity/planckian_jitter.py pl tables) — round-5 parity batch 3
# caught the previous 14-entry CIE approximation deviating up to 9e-2
_PLANCKIAN_BLACKBODY = jnp.array(
    [[1.6736, 0.0032], [1.4810, 0.3926], [1.3538, 0.5748], [1.2616, 0.7077],
     [1.1907, 0.8133], [1.1335, 0.9008], [1.0862, 0.9747], [1.0460, 1.0387],
     [1.0115, 1.0940], [0.9810, 1.1423], [0.9543, 1.1852], [0.9302, 1.2233],
     [0.9086, 1.2573], [0.8891, 1.2879], [0.8713, 1.3155], [0.8552, 1.3406],
     [0.8402, 1.3633], [0.8262, 1.3840], [0.8134, 1.4029], [0.8015, 1.4203],
     [0.7905, 1.4367], [0.7802, 1.4513], [0.7704, 1.4651], [0.7615, 1.4779],
     [0.7528, 1.4900]])
_PLANCKIAN_CIED = jnp.array(
    [[1.3185, 0.5175], [1.2206, 0.6531], [1.1464, 0.7622], [1.0873, 0.8534],
     [1.0387, 0.9309], [0.9972, 0.9972], [0.9618, 1.0549], [0.9301, 1.1053],
     [0.9021, 1.1496], [0.8772, 1.1889], [0.8543, 1.2238], [0.8334, 1.2548],
     [0.8142, 1.2829], [0.7966, 1.3085], [0.7804, 1.3316], [0.7649, 1.3523],
     [0.7508, 1.3715], [0.7374, 1.3891], [0.7249, 1.4052], [0.7131, 1.4202],
     [0.7021, 1.4338], [0.6915, 1.4465], [0.6817, 1.4584]])


class RandomPlanckianJitter(IntensityAugmentationBase2D):
    """Physically-plausible white-balance jitter
    (reference: _2d/intensity/planckian_jitter.py). mode: 'blackbody'
    (25 illuminants) or 'CIED' (23)."""

    def __init__(self, mode: str = "blackbody", **kw):
        super().__init__(**kw)
        if mode not in ("blackbody", "CIED"):
            raise ValueError(f"mode must be blackbody or CIED, got {mode}")
        self.pl = (_PLANCKIAN_BLACKBODY if mode == "blackbody"
                   else _PLANCKIAN_CIED)

    def sample_params(self, key, batch, shape):
        n = self.pl.shape[0]
        if self.same_on_batch:
            i = jax.random.randint(key, (), 0, n)
            idx = jnp.broadcast_to(i, (batch,))
        else:
            idx = jax.random.randint(key, (batch,), 0, n)
        return {"gains": self.pl[idx]}

    def apply(self, x, params):
        g = params["gains"]
        r = jnp.clip(x[:, 0:1] * g[:, 0].reshape(-1, 1, 1, 1), 0, 1)
        b = jnp.clip(x[:, 2:3] * g[:, 1].reshape(-1, 1, 1, 1), 0, 1)
        return jnp.concatenate([r, x[:, 1:2], b], axis=1)


class RandomLinearIllumination(IntensityAugmentationBase2D):
    """Linear illumination gradient (reference: _2d/intensity/illumination.py)."""

    def __init__(self, gain=(0.01, 0.2), **kw):
        super().__init__(**kw)
        self.gain_rng = _as_range(gain, (0.01, 0.2))

    def sample_params(self, key, batch, shape):
        k1, k2 = jax.random.split(key)
        return {"gain": self._uniform(k1, batch, *self.gain_rng),
                "angle": self._uniform(k2, batch, -jnp.pi, jnp.pi)}

    def apply(self, x, params):
        H, W = x.shape[-2:]
        ys = jnp.linspace(-1, 1, H)[None, :, None]
        xs = jnp.linspace(-1, 1, W)[None, None, :]
        a = params["angle"][:, None, None]
        ramp = xs * jnp.cos(a) + ys * jnp.sin(a)  # (B, H, W)
        gain = params["gain"][:, None, None]
        return jnp.clip(x + (gain * ramp)[:, None], 0.0, 1.0)


class RandomPlasmaBrightness(IntensityAugmentationBase2D):
    """Fractal brightness field (reference: _2d/intensity/plasma.py)."""

    def __init__(self, roughness=(0.1, 0.7), intensity=(0.0, 0.4), **kw):
        super().__init__(**kw)
        self.roughness = _as_range(roughness, (0.1, 0.7))
        self.intensity = _as_range(intensity, (0.0, 0.4))

    def sample_params(self, key, batch, shape):
        from ..contrib.ops import diamond_square
        k1, k2, k3 = jax.random.split(key, 3)
        B, C_, H, W = shape
        rough = float(jnp.mean(jnp.asarray(self.roughness)))
        field = diamond_square((B, 1, H, W), rough, key=k1)
        return {"field": field,
                "intensity": self._uniform(k3, batch, *self.intensity)}

    def apply(self, x, params):
        i = params["intensity"][:, None, None, None]
        return jnp.clip(x + i * (2.0 * params["field"] - 1.0), 0.0, 1.0)


class RandomPlasmaShadow(IntensityAugmentationBase2D):
    def __init__(self, roughness=(0.1, 0.7), shade_intensity=(-1.0, 0.0),
                 shade_quantity=(0.0, 1.0), **kw):
        super().__init__(**kw)
        self.roughness = _as_range(roughness, (0.1, 0.7))
        self.intensity = _as_range(shade_intensity, (-1.0, 0.0))
        self.quantity = _as_range(shade_quantity, (0.0, 1.0))

    def sample_params(self, key, batch, shape):
        from ..contrib.ops import diamond_square
        k1, k2, k3 = jax.random.split(key, 3)
        B, C_, H, W = shape
        rough = float(jnp.mean(jnp.asarray(self.roughness)))
        field = diamond_square((B, 1, H, W), rough, key=k1)
        return {"field": field,
                "intensity": self._uniform(k2, batch, *self.intensity),
                "quantity": self._uniform(k3, batch, *self.quantity)}

    def apply(self, x, params):
        shade = (params["field"] < params["quantity"][:, None, None, None])
        i = params["intensity"][:, None, None, None]
        return jnp.clip(x + shade * i, 0.0, 1.0)


class RandomJPEG(IntensityAugmentationBase2D):
    """Differentiable JPEG degradation (reference: _2d/intensity/jpeg.py,
    backed by enhance/jpeg.py). H, W must be multiples of 16."""

    def __init__(self, jpeg_quality=(10.0, 90.0), **kw):
        super().__init__(**kw)
        self.quality_rng = _as_range(jpeg_quality, (10.0, 90.0))

    def sample_params(self, key, batch, shape):
        return {"quality": self._uniform(key, batch, *self.quality_rng)}

    def apply(self, x, params):
        from ..ops.jpeg import jpeg_codec_differentiable
        return jpeg_codec_differentiable(x, params["quality"])


class Normalize(IntensityAugmentationBase2D):
    def __init__(self, mean, std, **kw):
        super().__init__(p=1.0, **kw)
        self.mean = mean
        self.std = std

    def apply(self, x, params):
        return E.normalize(x, self.mean, self.std)


class Denormalize(IntensityAugmentationBase2D):
    def __init__(self, mean, std, **kw):
        super().__init__(p=1.0, **kw)
        self.mean = mean
        self.std = std

    def apply(self, x, params):
        return E.denormalize(x, self.mean, self.std)


class RandomDissolving(IntensityAugmentationBase2D):
    """One-step reverse-diffusion 'dissolve'
    (reference: _2d/intensity/dissolving.py:27, backed by
    models/diffusion.py StableDiffusionDissolving). The reference samples
    step_range=(100, 500) against a 50-entry DDIM timestep table (an
    out-of-range index under torch); here the sampled step is drawn over
    the valid [0, num_ddim_steps) range. H, W must be multiples of 8."""

    def __init__(self, step_range=None, model=None, **kw):
        kw.setdefault("same_on_batch", True)
        super().__init__(**kw)
        if model is None:
            from ..models.diffusion import StableDiffusionDissolving
            model = StableDiffusionDissolving()
        self._dslv = model
        n = self._dslv.cfg.num_ddim_steps
        self.step_range = step_range or (0, n - 1)

    def sample_params(self, key, batch, shape):
        lo, hi = self.step_range
        step = jax.random.randint(key, (batch,), int(lo), int(hi) + 1)
        return {"step": step}

    def apply(self, x, params):
        return self._dslv.dissolve(x, params["step"][0])


class RandomSnow(IntensityAugmentationBase2D):
    """Brighten dark L-channel regions to simulate snow (reference:
    _2d/intensity/random_snow.py:28 — HLS threshold + brightness gain)."""

    def __init__(self, snow_coefficient=(0.5, 0.5), brightness=(2.0, 2.0),
                 **kw):
        kw.setdefault("p", 1.0)
        super().__init__(**kw)
        self.snow_rng = _as_range(snow_coefficient, (0.5, 0.5))
        self.bright_rng = _as_range(brightness, (2.0, 2.0))

    def sample_params(self, key, batch, shape):
        k1, k2 = jax.random.split(key)
        # reference squeezes the coefficient toward 0.5: x/2 + 0.25
        # (PlainUniformGenerator center=0.5 bounds=(0,1) semantics)
        snow = self._uniform(k1, batch, *self.snow_rng)
        return {"snow_coefficient": snow,
                "brightness": self._uniform(k2, batch, *self.bright_rng)}

    def apply(self, x, params):
        hls = C.rgb_to_hls(x)
        snow = params["snow_coefficient"][:, None, None]
        bright = params["brightness"][:, None, None, None]
        light = hls[:, 1]
        mask = (light < snow).astype(x.dtype)[:, None]
        mask = mask * jnp.array([0.0, 1.0, 0.0]).reshape(1, 3, 1, 1)
        new = jnp.clip(hls * mask * bright, 0.0, 1.0)
        return C.hls_to_rgb(hls * (1.0 - mask) + new)


class RandomRain(IntensityAugmentationBase2D):
    """Draw random rain streaks (value 200/255) (reference:
    _2d/intensity/random_rain.py:29).

    TPU formulation: the reference python-loops over images, drops, and
    line pixels with dynamic sizes; here every image scatters a fixed
    (max_drops, max_line_len) coordinate lattice in one `.at[].set`,
    with masks deactivating drops beyond the sampled count."""

    def __init__(self, number_of_drops=(1000, 2000), drop_height=(5, 20),
                 drop_width=(-5, 5), **kw):
        super().__init__(**kw)
        self.n_rng = (int(number_of_drops[0]), int(number_of_drops[1]))
        self.h_rng = (int(drop_height[0]), int(drop_height[1]))
        self.w_rng = (int(drop_width[0]), int(drop_width[1]))

    def sample_params(self, key, batch, shape):
        k1, k2, k3, k4 = jax.random.split(key, 4)
        nmax = self.n_rng[1]
        return {
            "n": jax.random.randint(k1, (batch,), self.n_rng[0],
                                    self.n_rng[1] + 1),
            "height": jax.random.randint(k2, (batch,), self.h_rng[0],
                                         self.h_rng[1] + 1),
            "width": jax.random.randint(k3, (batch,), self.w_rng[0],
                                        self.w_rng[1] + 1),
            "coords": jax.random.uniform(k4, (batch, nmax, 2)),
        }

    def apply(self, x, params):
        B, Cc, H, W = x.shape
        nmax = params["coords"].shape[1]
        lmax = max(self.h_rng[1], abs(self.w_rng[0]), abs(self.w_rng[1]), 1)
        h = params["height"].astype(x.dtype)  # (B,)
        w = params["width"].astype(x.dtype)
        cy = params["coords"][..., 0] * (H - h[:, None] - 1.0)
        cx = jnp.where(
            (w > 0)[:, None],
            params["coords"][..., 1] * (W - w[:, None] - 1.0),
            params["coords"][..., 1] * (W + w[:, None] - 1.0) - w[:, None])
        t = jnp.linspace(0.0, 1.0, lmax)  # (L,)
        yy = (cy[..., None] + jnp.floor(t * h[:, None, None])).astype(jnp.int32)
        xx = (cx[..., None] + jnp.floor(t * w[:, None, None])).astype(jnp.int32)
        drop_ok = (jnp.arange(nmax)[None] < params["n"][:, None])[..., None]
        yy = jnp.clip(yy, 0, H - 1)
        xx = jnp.clip(xx, 0, W - 1)
        flat_idx = yy * W + xx  # (B, N, L)
        val = jnp.asarray(200.0 / 255.0, x.dtype)

        def paint(img_flat, idx, ok):
            # img_flat (C, H*W); idx (N, L); masked scatter
            idx = jnp.where(ok, idx, H * W)  # out-of-range rows dropped
            return img_flat.at[:, idx.reshape(-1)].set(
                val, mode="drop", unique_indices=False)

        out = jax.vmap(paint)(x.reshape(B, Cc, H * W), flat_idx, drop_ok)
        return out.reshape(B, Cc, H, W)


class RandomGaussianIllumination(IntensityAugmentationBase2D):
    """Additive 2D gaussian illumination (reference:
    _2d/intensity/gaussian_illumination.py:27)."""

    def __init__(self, gain=(0.01, 0.15), center=(0.1, 0.9),
                 sigma=(0.2, 1.0), sign=(-1.0, 1.0), **kw):
        super().__init__(**kw)
        self.gain_rng = _as_range(gain, (0.01, 0.15))
        self.center_rng = _as_range(center, (0.1, 0.9))
        self.sigma_rng = _as_range(sigma, (0.2, 1.0))
        self.sign_rng = _as_range(sign, (-1.0, 1.0))

    def sample_params(self, key, batch, shape):
        ks = jax.random.split(key, 6)
        return {
            "gain": self._uniform(ks[0], batch, *self.gain_rng),
            "cx": self._uniform(ks[1], batch, *self.center_rng),
            "cy": self._uniform(ks[2], batch, *self.center_rng),
            "sx": self._uniform(ks[3], batch, *self.sigma_rng),
            "sy": self._uniform(ks[4], batch, *self.sigma_rng),
            "sign": jnp.where(
                self._uniform(ks[5], batch, *self.sign_rng) >= 0, 1.0, -1.0),
        }

    def apply(self, x, params):
        B, Cc, H, W = x.shape
        # per-axis gaussian profiles at pixel resolution (generator:
        # gaussian_illumination.py:125-130)
        from ..ops.filters import gaussian
        gx = gaussian(W, (params["sx"] * W)[:, None],
                      mean=jnp.round(params["cx"] * W)[:, None])  # (B, W)
        gy = gaussian(H, (params["sy"] * H)[:, None],
                      mean=jnp.round(params["cy"] * H)[:, None])  # (B, H)
        grad = gy[:, :, None] * gx[:, None, :]  # (B, H, W)
        mn = jnp.min(grad, axis=(-2, -1), keepdims=True)
        mx = jnp.max(grad, axis=(-2, -1), keepdims=True)
        grad = (grad - mn) / jnp.maximum(mx - mn, 1e-12)
        grad = (params["sign"] * params["gain"])[:, None, None] * grad
        return jnp.clip(x + grad[:, None], 0.0, 1.0)


class RandomLinearCornerIllumination(IntensityAugmentationBase2D):
    """Additive corner-anchored linear illumination (reference:
    _2d/intensity/linear_illumination.py:134)."""

    def __init__(self, gain=(0.01, 0.2), sign=(-1.0, 1.0), **kw):
        super().__init__(**kw)
        self.gain_rng = _as_range(gain, (0.01, 0.2))
        self.sign_rng = _as_range(sign, (-1.0, 1.0))

    def sample_params(self, key, batch, shape):
        ks = jax.random.split(key, 3)
        return {
            "gain": self._uniform(ks[0], batch, *self.gain_rng),
            "sign": jnp.where(
                self._uniform(ks[1], batch, *self.sign_rng) >= 0, 1.0, -1.0),
            "corner": jax.random.randint(ks[2], (batch,), 0, 4),
        }

    def apply(self, x, params):
        B, Cc, H, W = x.shape
        yg = jnp.linspace(0.0, 1.0, H)[:, None] * jnp.ones((1, W))
        xg = jnp.linspace(0.0, 1.0, W)[None, :] * jnp.ones((H, 1))
        base = jnp.stack([xg + yg, -xg + yg, xg - yg, 1.0 - (xg + yg)])
        grad = base[params["corner"]]  # (B, H, W)
        mn = jnp.min(grad, axis=(-2, -1), keepdims=True)
        mx = jnp.max(grad, axis=(-2, -1), keepdims=True)
        grad = (grad - mn) / jnp.maximum(mx - mn, 1e-12)
        grad = (params["sign"] * params["gain"])[:, None, None] * grad
        return jnp.clip(x + grad[:, None], 0.0, 1.0)


class RandomPlasmaContrast(IntensityAugmentationBase2D):
    """Fractal contrast field: (x-0.5)·4·plasma + 0.5 (reference:
    _2d/intensity/plasma.py RandomPlasmaContrast)."""

    def __init__(self, roughness=(0.1, 0.7), **kw):
        super().__init__(**kw)
        self.roughness = _as_range(roughness, (0.1, 0.7))

    def sample_params(self, key, batch, shape):
        from ..contrib.ops import diamond_square
        k1, _ = jax.random.split(key)
        B, Cc, H, W = shape
        rough = float(jnp.mean(jnp.asarray(self.roughness)))
        return {"field": diamond_square((B, 1, H, W), rough, key=k1)}

    def apply(self, x, params):
        return jnp.clip((x - 0.5) * 4.0 * params["field"] + 0.5, 0.0, 1.0)


# reference spelling aliases (kornia/augmentation/__init__.py exports both)
RandomClahe = RandomCLAHE
RandomSaltAndPepperNoise = RandomSaltAndPepper

__all__ += [
    "RandomSnow", "RandomRain", "RandomGaussianIllumination",
    "RandomLinearCornerIllumination", "RandomPlasmaContrast",
    "RandomClahe", "RandomSaltAndPepperNoise",
]
