"""Per-op augmentation parity vs reference kornia with INJECTED params.

For each op: run the reference (torch) with p=1.0 on a fixed input, pull
the params it sampled out of `aug._params`, translate them into our
param dict, run our op with `params=` forced, and compare outputs.
This is the VERDICT item-8 sweep (>= 15 aug ops, exact sampled-parameter
injection — the method that caught the round-1 brightness/hue/sharpness
semantic bugs).
"""

import sys
import types

import numpy as np
import pytest

sys.path.append("/root/reference")
sys.modules.setdefault("kornia_rs", types.ModuleType("kornia_rs"))

torch = pytest.importorskip("torch")
kornia = pytest.importorskip("kornia")
import kornia.augmentation as KA

import jax
import jax.numpy as jnp

import kornia_tpu.augmentation as A

pytestmark = pytest.mark.slow  # heavy leg: run with --runslow

B = 2
rng = np.random.default_rng(11)
IMG = rng.random((B, 3, 24, 24)).astype(np.float32)

_TRUE = jnp.ones((B,), bool)


def _j(t):
    return jnp.asarray(t.numpy() if hasattr(t, "numpy") else t)


# name -> (ref ctor, our ctor, param translator, atol, quantile_mode)
# translator: reference _params dict -> our params dict
CASES = {
    "RandomBrightness": (
        lambda: KA.RandomBrightness(brightness=(0.8, 1.2), p=1.0),
        lambda: A.RandomBrightness(brightness=(0.8, 1.2), p=1.0),
        lambda p: {"factor": _j(p["brightness_factor"]).reshape(-1)},
        1e-5, False),
    "RandomContrast": (
        lambda: KA.RandomContrast(contrast=(0.8, 1.2), p=1.0),
        lambda: A.RandomContrast(contrast=(0.8, 1.2), p=1.0),
        lambda p: {"factor": _j(p["contrast_factor"]).reshape(-1)},
        1e-5, False),
    "RandomSaturation": (
        lambda: KA.RandomSaturation(saturation=(0.5, 1.5), p=1.0),
        lambda: A.RandomSaturation(saturation=(0.5, 1.5), p=1.0),
        lambda p: {"factor": _j(p["saturation_factor"]).reshape(-1)},
        1e-4, False),
    "RandomHue": (
        lambda: KA.RandomHue(hue=(-0.2, 0.2), p=1.0),
        lambda: A.RandomHue(hue=(-0.2, 0.2), p=1.0),
        lambda p: {"factor": _j(p["hue_factor"]).reshape(-1)},
        1e-4, False),
    "RandomGamma": (
        lambda: KA.RandomGamma((0.5, 1.5), (0.8, 1.2), p=1.0),
        lambda: A.RandomGamma((0.5, 1.5), (0.8, 1.2), p=1.0),
        lambda p: {"gamma": _j(p["gamma_factor"]).reshape(-1),
                   "gain": _j(p["gain_factor"]).reshape(-1)},
        1e-5, False),
    "RandomSolarize": (
        lambda: KA.RandomSolarize(0.2, 0.1, p=1.0),
        lambda: A.RandomSolarize(0.2, 0.1, p=1.0),
        lambda p: {"thresholds": _j(p["thresholds"]).reshape(-1),
                   "additions": _j(p["additions"]).reshape(-1)},
        1e-5, False),
    "RandomPosterize": (
        lambda: KA.RandomPosterize(3, p=1.0),
        lambda: A.RandomPosterize(3, p=1.0),
        lambda p: {"bits": _j(p["bits_factor"]).reshape(-1)},
        1e-5, False),
    "RandomSharpness": (
        lambda: KA.RandomSharpness(0.8, p=1.0),
        lambda: A.RandomSharpness(0.8, p=1.0),
        lambda p: {"factor": _j(p["sharpness"]).reshape(-1)},
        1e-4, False),
    "RandomInvert": (
        lambda: KA.RandomInvert(p=1.0),
        lambda: A.RandomInvert(p=1.0),
        lambda p: {},
        1e-6, False),
    "RandomGrayscale": (
        lambda: KA.RandomGrayscale(p=1.0),
        lambda: A.RandomGrayscale(p=1.0),
        lambda p: {},
        1e-5, False),
    "RandomEqualize": (
        lambda: KA.RandomEqualize(p=1.0),
        lambda: A.RandomEqualize(p=1.0),
        lambda p: {},
        1e-4, False),
    "RandomVerticalFlip": (
        lambda: KA.RandomVerticalFlip(p=1.0),
        lambda: A.RandomVerticalFlip(p=1.0),
        lambda p: {},
        1e-6, False),
    "RandomGaussianBlur": (
        lambda: KA.RandomGaussianBlur((5, 5), (0.3, 2.0), p=1.0),
        lambda: A.RandomGaussianBlur((5, 5), (0.3, 2.0), p=1.0),
        lambda p: {"sigma": _j(p["sigma"])},
        1e-4, False),
    "RandomChannelShuffle": (
        lambda: KA.RandomChannelShuffle(p=1.0),
        lambda: A.RandomChannelShuffle(p=1.0),
        lambda p: {"perm": _j(p["channels"]).astype(jnp.int32)},
        1e-6, False),
    "RandomErasing": (
        lambda: KA.RandomErasing(p=1.0),
        lambda: A.RandomErasing(p=1.0),
        lambda p: {"x0": _j(p["xs"]), "y0": _j(p["ys"]),
                   "w": _j(p["widths"]), "h": _j(p["heights"])},
        1e-5, False),
    "RandomRotation": (
        lambda: KA.RandomRotation(30.0, p=1.0, align_corners=True),
        lambda: A.RandomRotation(30.0, p=1.0),
        lambda p: {"degrees": _j(p["degrees"]).reshape(-1)},
        2e-2, True),
    "RandomGaussianNoise": (
        lambda: KA.RandomGaussianNoise(p=1.0),
        lambda: A.RandomGaussianNoise(p=1.0),
        lambda p: {"noise": _j(p["gaussian_noise"])},
        1e-5, False),
    "RandomRGBShift": (
        lambda: KA.RandomRGBShift(p=1.0),
        lambda: A.RandomRGBShift(p=1.0),
        lambda p: {"r": _j(p["r_shift"]).reshape(-1),
                   "g": _j(p["g_shift"]).reshape(-1),
                   "b": _j(p["b_shift"]).reshape(-1)},
        1e-5, False),
    "RandomMotionBlur": (
        lambda: KA.RandomMotionBlur(5, 35.0, 0.5, p=1.0),
        lambda: A.RandomMotionBlur(5, 35.0, 0.5, p=1.0),
        lambda p: {"angle": _j(p["angle_factor"]).reshape(-1),
                   "direction": _j(p["direction_factor"]).reshape(-1)},
        1e-3, True),
    "RandomJPEG": (
        lambda: KA.RandomJPEG(jpeg_quality=(30.0, 90.0), p=1.0),
        lambda: A.RandomJPEG(jpeg_quality=(30.0, 90.0), p=1.0),
        lambda p: {"quality": _j(p["jpeg_quality"]).reshape(-1)},
        1e-5, False),
}


IMG32 = rng.random((B, 3, 32, 32)).astype(np.float32)
# ops whose codec path needs dims divisible by 16 (chroma subsampling)
_NEEDS_32 = {"RandomJPEG"}


@pytest.mark.parametrize("name", sorted(CASES))
def test_aug_op_parity(name):
    make_ref, make_ours, translate, atol, quantile = CASES[name]
    img = IMG32 if name in _NEEDS_32 else IMG
    ref = make_ref()
    with torch.no_grad():
        out_ref = ref(torch.from_numpy(img)).numpy()
    params = translate(ref._params)
    params["apply_mask"] = _TRUE
    ours = make_ours()
    out = np.asarray(ours(jnp.asarray(img), params=params))
    assert out.shape == out_ref.shape, f"{name}: shape mismatch"
    d = np.abs(out - out_ref)
    if quantile:
        # resampling/codec ops: interiors must agree, boundary pixels may
        # differ by interpolation convention
        assert np.quantile(d, 0.98) < atol, \
            f"{name}: q98 diff {np.quantile(d, 0.98):.2e}"
    else:
        assert d.max() < atol, f"{name}: max diff {d.max():.2e}"
