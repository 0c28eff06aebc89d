"""Fuzz-style random-shape/dtype sweeps across the op contract
(VERDICT r3 item 4; the reference parametrizes every op over shape
cardinalities and dtypes, /root/reference/TESTING.md:41-57 — here the
same coverage is driven mechanically from shape/property registries).

Legs per op family:
- SHAPES: odd, non-square, tiny and lane-unaligned sizes — anything that
  relies on even division, squareness or 128-alignment breaks here.
- DTYPES: f32 and bf16 (TPU storage dtype) preserve shape and finiteness.
- PROPERTIES: algebraic invariants that hold for any input (roundtrips,
  involutions, identity parameters, monotonicity, constant preservation)
  — these catch sign/axis/convention bugs that smoke tests cannot.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import kornia_tpu as kt
from kornia_tpu import ops

pytestmark = pytest.mark.slow  # heavy leg: run with --runslow

# odd / non-square / tiny / lane-unaligned
SHAPES = [(1, 7, 9), (2, 17, 31), (1, 32, 15), (2, 13, 128), (1, 5, 5)]


def _img(shape, c=3, key=0):
    b, h, w = shape
    return jax.random.uniform(jax.random.PRNGKey(key), (b, c, h, w),
                              dtype=jnp.float32)


# ---------------------------------------------------------------------------
# Color roundtrips at every fuzz shape
# ---------------------------------------------------------------------------

_COLOR_ROUNDTRIPS = {
    "hsv": (ops.rgb_to_hsv, ops.hsv_to_rgb, 1e-5),
    "hls": (ops.rgb_to_hls, ops.hls_to_rgb, 1e-5),
    "lab": (ops.rgb_to_lab, ops.lab_to_rgb, 1e-4),
    "luv": (ops.rgb_to_luv, ops.luv_to_rgb, 1e-4),
    "xyz": (ops.rgb_to_xyz, ops.xyz_to_rgb, 1e-5),
    # published ycbcr/yuv coefficient pairs are not exact inverses — the
    # reference kornia round-trips with the same ~2e-4 / ~8e-4 error
    "ycbcr": (ops.rgb_to_ycbcr, ops.ycbcr_to_rgb, 5e-4),
    "yuv": (ops.rgb_to_yuv, ops.yuv_to_rgb, 2e-3),
    "linear": (ops.rgb_to_linear_rgb, ops.linear_rgb_to_rgb, 1e-5),
}


@pytest.mark.parametrize("shape", SHAPES)
@pytest.mark.parametrize("space", sorted(_COLOR_ROUNDTRIPS))
def test_color_roundtrip_fuzz(space, shape):
    fwd, bwd, tol = _COLOR_ROUNDTRIPS[space]
    x = _img(shape, key=11) * 0.9 + 0.05  # stay off gamut edges
    np.testing.assert_allclose(np.asarray(bwd(fwd(x))), np.asarray(x),
                               atol=tol)


@pytest.mark.parametrize("shape", SHAPES)
def test_gray_shape_fuzz(shape):
    b, h, w = shape
    g = ops.rgb_to_grayscale(_img(shape))
    assert g.shape == (b, 1, h, w)
    assert bool(jnp.isfinite(g).all())


# ---------------------------------------------------------------------------
# Enhance identities
# ---------------------------------------------------------------------------

_ENHANCE_IDENTITIES = {
    "brightness_0": lambda x: ops.adjust_brightness(x, 0.0),
    "contrast_1": lambda x: ops.adjust_contrast(x, 1.0),
    "gamma_1": lambda x: ops.adjust_gamma(x, 1.0),
    "saturation_1": lambda x: ops.adjust_saturation(x, 1.0),
    "hue_0": lambda x: ops.adjust_hue(x, 0.0),
    "invert_twice": lambda x: ops.invert(ops.invert(x)),
    "solarize_above_1": lambda x: ops.solarize(x, 1.01),
    "posterize_8": lambda x: ops.posterize(x, 8),
    "sharpness_1": lambda x: ops.sharpness(x, 1.0),
}


@pytest.mark.parametrize("shape", SHAPES)
@pytest.mark.parametrize("name", sorted(_ENHANCE_IDENTITIES))
def test_enhance_identity_fuzz(name, shape):
    x = _img(shape, key=13)
    out = _ENHANCE_IDENTITIES[name](x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=2e-5)


@pytest.mark.parametrize("shape", SHAPES)
def test_normalize_roundtrip_fuzz(shape):
    x = _img(shape, key=14)
    mean = jnp.asarray([0.4, 0.5, 0.6])
    std = jnp.asarray([0.2, 0.25, 0.3])
    out = ops.denormalize(ops.normalize(x, mean, std), mean, std)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-5)


# ---------------------------------------------------------------------------
# Filters: constant preservation + blur mass conservation
# ---------------------------------------------------------------------------

_CONST_FILTERS = {
    "gaussian_5": lambda x: ops.gaussian_blur2d(x, 5, 1.5),
    "gaussian_7x3": lambda x: ops.gaussian_blur2d(x, (7, 3), (2.0, 1.0)),
    "box_3": lambda x: ops.box_blur(x, 3),
    # median_blur zero-pads (reference torch semantics) so borders are NOT
    # constant-preserving — it gets its own interior-only test below

    "bilateral": lambda x: ops.bilateral_blur(x, 5, 0.1, (1.5, 1.5)),
}


@pytest.mark.parametrize("shape", SHAPES)
@pytest.mark.parametrize("name", sorted(_CONST_FILTERS))
def test_filter_preserves_constant_fuzz(name, shape):
    b, h, w = shape
    x = jnp.full((b, 3, h, w), 0.375, jnp.float32)
    out = _CONST_FILTERS[name](x)
    assert out.shape == x.shape
    np.testing.assert_allclose(np.asarray(out), 0.375, atol=1e-5)


@pytest.mark.parametrize("shape", SHAPES)
def test_median_constant_interior_fuzz(shape):
    """median_blur zero-pads (reference torch semantics: filters/median.py)
    — the INTERIOR must still be constant-preserving at any shape."""
    b, h, w = shape
    if h < 3 or w < 3:
        pytest.skip("too small")
    x = jnp.full((b, 3, h, w), 0.375, jnp.float32)
    out = ops.median_blur(x, 3)
    np.testing.assert_allclose(np.asarray(out[..., 1:-1, 1:-1]), 0.375,
                               atol=1e-6)


@pytest.mark.parametrize("shape", SHAPES)
def test_blur_is_smoothing_fuzz(shape):
    """Blur must not expand the value range (positivity of the kernel)."""
    x = _img(shape, key=15)
    out = ops.gaussian_blur2d(x, 5, 1.2)
    assert float(out.max()) <= float(x.max()) + 1e-5
    assert float(out.min()) >= float(x.min()) - 1e-5


@pytest.mark.parametrize("shape", SHAPES)
@pytest.mark.parametrize("k", [3, 5])
def test_sobel_constant_is_zero_fuzz(shape, k):
    b, h, w = shape
    if h < k + 2 or w < k + 2:
        pytest.skip("kernel larger than image")
    x = jnp.full((b, 1, h, w), 0.7, jnp.float32)
    g = ops.spatial_gradient(x, mode="sobel", order=1)
    interior = g[..., k:-k, k:-k] if h > 2 * k and w > 2 * k else g
    np.testing.assert_allclose(np.asarray(interior), 0.0, atol=1e-5)


# ---------------------------------------------------------------------------
# Morphology orderings (flat SE): erosion <= input <= dilation
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("shape", SHAPES)
def test_morphology_order_fuzz(shape):
    x = _img(shape, c=1, key=16)
    se = jnp.ones((3, 3))
    dil = ops.dilation(x, se)
    ero = ops.erosion(x, se)
    assert bool(jnp.all(dil >= x - 1e-6))
    assert bool(jnp.all(ero <= x + 1e-6))
    # opening <= input <= closing
    assert bool(jnp.all(ops.opening(x, se) <= x + 1e-6))
    assert bool(jnp.all(ops.closing(x, se) >= x - 1e-6))


@pytest.mark.parametrize("shape", SHAPES)
def test_morphology_idempotence_fuzz(shape):
    """Opening and closing are idempotent: op(op(x)) == op(x)."""
    x = _img(shape, c=1, key=17)
    se = jnp.ones((3, 3))
    for op in (ops.opening, ops.closing):
        once = op(x, se)
        twice = op(once, se)
        np.testing.assert_allclose(np.asarray(twice), np.asarray(once),
                                   atol=1e-6)


# ---------------------------------------------------------------------------
# Warp / geometry: identity transforms, flip involutions, resize contracts
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("shape", SHAPES)
def test_warp_identity_fuzz(shape):
    b, h, w = shape
    x = _img(shape, key=18)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32)[None], (b, 3, 3))
    out = kt.geometry.warp_perspective(x, eye, (h, w))
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-4)
    out_a = kt.geometry.warp_affine(x, eye[:, :2], (h, w))
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(x), atol=1e-4)


@pytest.mark.parametrize("shape", SHAPES)
def test_flip_involution_fuzz(shape):
    x = _img(shape, key=19)
    np.testing.assert_allclose(np.asarray(ops.hflip(ops.hflip(x))),
                               np.asarray(x), atol=0)
    np.testing.assert_allclose(np.asarray(ops.vflip(ops.vflip(x))),
                               np.asarray(x), atol=0)
    r = ops.rot180(ops.rot180(x))
    np.testing.assert_allclose(np.asarray(r), np.asarray(x), atol=0)


@pytest.mark.parametrize("shape", SHAPES)
@pytest.mark.parametrize("interp", ["bilinear", "nearest"])
def test_resize_shape_contract_fuzz(shape, interp):
    b, h, w = shape
    x = _img(shape, key=20)
    for th, tw in [(h * 2, w * 2), (max(h // 2, 1), max(w // 2, 1)),
                   (h + 1, max(w - 1, 1)), (1, 1)]:
        out = kt.geometry.resize(x, (th, tw), interp)
        assert out.shape == (b, 3, th, tw)
        assert bool(jnp.isfinite(out).all())


@pytest.mark.parametrize("shape", SHAPES)
def test_center_crop_fuzz(shape):
    b, h, w = shape
    if h < 4 or w < 4:
        pytest.skip("too small to crop")
    x = _img(shape, key=21)
    out = ops.center_crop(x, (h - 2, w - 2))
    assert out.shape == (b, 3, h - 2, w - 2)


@pytest.mark.parametrize("pad_mode", ["zeros", "border", "reflection"])
def test_grid_sample_oob_fuzz(pad_mode):
    """Far-out-of-bounds grids must stay finite under every padding mode."""
    x = _img((2, 9, 13), key=22)
    grid = jnp.stack(jnp.meshgrid(jnp.linspace(-9.0, 9.0, 13),
                                  jnp.linspace(-7.0, 7.0, 9),
                                  indexing="xy"), -1)[None]
    grid = jnp.broadcast_to(grid, (2, 9, 13, 2))
    out = kt.geometry.grid_sample(x, grid, "bilinear", pad_mode, True)
    assert out.shape == x.shape
    assert bool(jnp.isfinite(out).all())


# ---------------------------------------------------------------------------
# bf16 leg: shape + finiteness for a representative op per family
# ---------------------------------------------------------------------------

_BF16_OPS = {
    "rgb_to_hsv": lambda x: ops.rgb_to_hsv(x),
    "gaussian_blur2d": lambda x: ops.gaussian_blur2d(x, 5, 1.5),
    "adjust_contrast": lambda x: ops.adjust_contrast(x, 1.3),
    "dilation": lambda x: ops.dilation(x, jnp.ones((3, 3))),
    "warp_affine": lambda x: kt.geometry.warp_affine(
        x, jnp.broadcast_to(jnp.eye(3, dtype=x.dtype)[None, :2],
                            (x.shape[0], 2, 3)),
        x.shape[-2:]),
    "sobel": lambda x: ops.sobel(x),
}


@pytest.mark.parametrize("shape", SHAPES[:3])
@pytest.mark.parametrize("name", sorted(_BF16_OPS))
def test_bf16_fuzz(name, shape):
    x = _img(shape, key=23).astype(jnp.bfloat16)
    out = _BF16_OPS[name](x)
    assert out.shape[-2:] == x.shape[-2:]
    assert bool(jnp.isfinite(out.astype(jnp.float32)).all())


# ---------------------------------------------------------------------------
# Geometry conversions: roundtrips on random batches
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("batch", [(1,), (4,), (2, 3)])
def test_quaternion_matrix_roundtrip_fuzz(batch):
    q = jax.random.normal(jax.random.PRNGKey(30), (*batch, 4))
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    R = kt.geometry.quaternion_to_rotation_matrix(q)
    q2 = kt.geometry.rotation_matrix_to_quaternion(R)
    # q and -q encode the same rotation: compare via |<q, q2>|
    dot = jnp.abs(jnp.sum(q * q2, -1))
    np.testing.assert_allclose(np.asarray(dot), 1.0, atol=1e-5)


@pytest.mark.parametrize("batch", [(1,), (5,)])
def test_axis_angle_roundtrip_fuzz(batch):
    aa = 0.8 * jax.random.normal(jax.random.PRNGKey(31), (*batch, 3))
    R = kt.geometry.axis_angle_to_rotation_matrix(aa)
    aa2 = kt.geometry.rotation_matrix_to_axis_angle(R)
    np.testing.assert_allclose(np.asarray(aa2), np.asarray(aa), atol=1e-4)
    # orthonormality
    RtR = jnp.einsum("...ij,...ik->...jk", R, R)
    eye = jnp.broadcast_to(jnp.eye(3), RtR.shape)
    np.testing.assert_allclose(np.asarray(RtR), np.asarray(eye), atol=1e-5)


@pytest.mark.parametrize("n", [1, 7])
def test_homography_point_roundtrip_fuzz(n):
    H = jnp.eye(3)[None] + 0.05 * jax.random.normal(
        jax.random.PRNGKey(32), (2, 3, 3))
    pts = jax.random.normal(jax.random.PRNGKey(33), (2, n, 2))
    fwd = kt.geometry.transform_points(H, pts)
    back = kt.geometry.transform_points(jnp.linalg.inv(H), fwd)
    np.testing.assert_allclose(np.asarray(back), np.asarray(pts), atol=1e-4)


@pytest.mark.parametrize("batch", [1, 6])
def test_se3_exp_log_roundtrip_fuzz(batch):
    from kornia_tpu.geometry.liegroup import Se3
    tau = 0.5 * jax.random.normal(jax.random.PRNGKey(34), (batch, 6))
    g = Se3.exp(tau)
    tau2 = g.log()
    np.testing.assert_allclose(np.asarray(tau2), np.asarray(tau), atol=1e-5)


@pytest.mark.parametrize("batch", [1, 6])
def test_so3_composition_inverse_fuzz(batch):
    from kornia_tpu.geometry.liegroup import So3
    a = So3.exp(0.7 * jax.random.normal(jax.random.PRNGKey(35), (batch, 3)))
    b = So3.exp(0.7 * jax.random.normal(jax.random.PRNGKey(36), (batch, 3)))
    prod = (a * b) * (a * b).inverse()
    np.testing.assert_allclose(np.asarray(prod.log()), 0.0, atol=1e-5)


# ---------------------------------------------------------------------------
# convert_points / normalize round trips at odd image sizes
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("hw", [(7, 9), (31, 17), (128, 13)])
def test_pixel_normalize_roundtrip_fuzz(hw):
    h, w = hw
    pts = jax.random.uniform(jax.random.PRNGKey(37), (2, 11, 2)) * \
        jnp.asarray([w - 1.0, h - 1.0])
    K = jnp.asarray([[[50.0, 0, w / 2], [0, 50.0, h / 2], [0, 0, 1]]])
    K = jnp.broadcast_to(K, (2, 3, 3))
    norm = kt.geometry.normalize_points_with_intrinsics(pts, K)
    back = kt.geometry.denormalize_points_with_intrinsics(norm, K)
    np.testing.assert_allclose(np.asarray(back), np.asarray(pts), atol=1e-3)


@pytest.mark.parametrize("shape", SHAPES)
def test_normalize_pixel_grid_roundtrip_fuzz(shape):
    _, h, w = shape
    if h < 2 or w < 2:
        pytest.skip("degenerate")
    pix = jax.random.uniform(jax.random.PRNGKey(38), (2, 9, 2)) * \
        jnp.asarray([w - 1.0, h - 1.0])
    norm = kt.geometry.normalize_pixel_coordinates(pix, h, w)
    back = kt.geometry.denormalize_pixel_coordinates(norm, h, w)
    np.testing.assert_allclose(np.asarray(back), np.asarray(pix), atol=1e-3)
    assert float(jnp.abs(norm).max()) <= 1.0 + 1e-5
