"""AugmentationSequential parity vs the reference, forward AND inverse,
with IDENTICAL sampled parameters injected into both libraries
(VERDICT round-1 item 4; reference: kornia/augmentation/container/
augment.py:431 forward, :303 inverse, container/ops.py dispatch).

Direction of injection: the reference pipeline samples its params first;
the values (angle, crop box, brightness factor) are extracted from its
ParamItem records and fed into our pipeline's `params=` argument.
"""

import sys
import types

import numpy as np
import pytest

sys.path.append("/root/reference")
sys.modules.setdefault("kornia_rs", types.ModuleType("kornia_rs"))

torch = pytest.importorskip("torch")
kornia = pytest.importorskip("kornia")

import jax
import jax.numpy as jnp

import kornia_tpu.augmentation as A

pytestmark = pytest.mark.slow  # heavy leg: run with --runslow

rng = np.random.default_rng(7)
B, C, H, W = 2, 3, 30, 32
IMG = rng.random((B, C, H, W)).astype(np.float32)
MASK = (rng.random((B, 1, H, W)) > 0.5).astype(np.float32)
BBOX = np.array([[[4.0, 5.0, 20.0, 18.0], [8.0, 2.0, 28.0, 12.0]]]
                ).repeat(B, 0).astype(np.float32)
KPTS = rng.uniform(2, 26, (B, 5, 2)).astype(np.float32)


def _t(a):
    return torch.from_numpy(np.asarray(a))


def _ref_pipeline(crop=None):
    import kornia.augmentation as KA
    augs = [
        KA.RandomHorizontalFlip(p=1.0),
        KA.RandomRotation(degrees=30.0, p=1.0, align_corners=True),
        KA.RandomBrightness(brightness=(0.8, 1.2), p=1.0),
    ]
    if crop is not None:
        augs.insert(2, KA.RandomCrop(crop, p=1.0, align_corners=True,
                                     cropping_mode="resample"))
    return KA.AugmentationSequential(
        *augs, data_keys=["input", "mask", "bbox_xyxy", "keypoints"])


def _our_pipeline(crop=None):
    augs = [
        A.RandomHorizontalFlip(p=1.0),
        A.RandomRotation(degrees=30.0, p=1.0),
        A.RandomBrightness(brightness=(0.8, 1.2), p=1.0),
    ]
    if crop is not None:
        augs.insert(2, A.RandomCrop(crop))
    return A.AugmentationSequential(
        *augs, data_keys=["input", "mask", "bbox_xyxy", "keypoints"])


def _inject_params(ref_seq, crop=None):
    """Extract the reference's sampled values → our params list."""
    ref_params = ref_seq._params
    ours = []
    by_name = {}
    for item in ref_params:
        by_name[item.name] = item.data
    true_mask = jnp.ones((B,), bool)
    for name, data in by_name.items():
        if name.startswith("RandomHorizontalFlip"):
            ours.append({"apply_mask": true_mask})
        elif name.startswith("RandomRotation"):
            deg = jnp.asarray(data["degrees"].numpy())
            ours.append({"degrees": deg, "apply_mask": true_mask})
        elif name.startswith("RandomCrop"):
            src = data["src"].numpy()  # (B, 4, 2) corner quad
            ours.append({"x0": jnp.asarray(src[:, 0, 0].astype(np.float32)),
                         "y0": jnp.asarray(src[:, 0, 1].astype(np.float32)),
                         "apply_mask": true_mask})
        elif name.startswith("RandomBrightness"):
            fac = jnp.asarray(data["brightness_factor"].numpy().reshape(-1))
            ours.append({"factor": fac, "apply_mask": true_mask})
    return ours


@pytest.mark.parametrize("crop", [None, (20, 24)])
def test_forward_parity(crop):
    ref = _ref_pipeline(crop)
    with torch.no_grad():
        r_img, r_mask, r_bbox, r_kpts = ref(
            _t(IMG), _t(MASK), _t(BBOX), _t(KPTS))
    ours = _our_pipeline(crop)
    params = _inject_params(ref, crop)
    o_img, o_mask, o_bbox, o_kpts = ours(
        jnp.asarray(IMG), jnp.asarray(MASK), jnp.asarray(BBOX),
        jnp.asarray(KPTS), params=params)

    np.testing.assert_allclose(np.asarray(o_kpts), r_kpts.numpy(),
                               atol=1e-3, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(o_bbox), r_bbox.numpy(),
                               atol=1e-3, rtol=1e-4)
    # images: interiors match; interpolation-boundary pixels may differ
    d_img = np.abs(np.asarray(o_img) - r_img.numpy())
    assert np.quantile(d_img, 0.98) < 2e-2, np.quantile(d_img, 0.98)
    # nearest-mask: a thin border of pixels may round differently
    d_mask = (np.asarray(o_mask) != r_mask.numpy()).mean()
    assert d_mask < 0.06, d_mask


@pytest.mark.parametrize("crop", [None, (20, 24)])
def test_inverse_parity(crop):
    ref = _ref_pipeline(crop)
    with torch.no_grad():
        r_out = ref(_t(IMG), _t(MASK), _t(BBOX), _t(KPTS))
        r_inv = ref.inverse(*r_out)
    ours = _our_pipeline(crop)
    params = _inject_params(ref, crop)
    o_out = ours(jnp.asarray(IMG), jnp.asarray(MASK), jnp.asarray(BBOX),
                 jnp.asarray(KPTS), params=params)
    o_inv = ours.inverse(*o_out)

    np.testing.assert_allclose(np.asarray(o_inv[3]), r_inv[3].numpy(),
                               atol=2e-3, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(o_inv[2]), r_inv[2].numpy(),
                               atol=2e-3, rtol=1e-4)
    # inverse keypoints of forward keypoints == originals (round trip)
    np.testing.assert_allclose(np.asarray(o_inv[3]), KPTS, atol=1e-2)


def test_size_changing_pipeline_shapes():
    ours = _our_pipeline((20, 24))
    o_img, o_mask, o_bbox, o_kpts = ours(
        jnp.asarray(IMG), jnp.asarray(MASK), jnp.asarray(BBOX),
        jnp.asarray(KPTS), key=jax.random.PRNGKey(0))
    assert o_img.shape == (B, C, 20, 24)
    assert o_mask.shape == (B, 1, 20, 24)
    inv_img = ours.inverse(o_img)
    assert inv_img.shape == (B, C, H, W)
