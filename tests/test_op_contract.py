"""Per-op contract sweep (SURVEY.md §4: the reference enforces a 6-method
per-op test contract; here the jit-equivalence and differentiability legs
are enforced mechanically across a broad slice of the op layer).

For every op in the registry:
- eager output == jitted output (bitwise-close),
- `jax.grad` of a scalar functional is finite (autodiff-closed),
- output is finite on well-conditioned input.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import kornia_tpu as kt
from kornia_tpu.feature.responses import (dog_response_single,
                                          gftt_response, harris_response,
                                          hessian_response)

_KEY = jax.random.PRNGKey(7)
_IMG = jax.random.uniform(_KEY, (2, 3, 24, 24), dtype=jnp.float32)
_GRAY = jax.random.uniform(_KEY, (2, 1, 24, 24), dtype=jnp.float32)
from kornia_tpu.ops.pyramid import pyrdown as _pyrdown, pyrup as _pyrup

_M3 = jnp.broadcast_to(
    jnp.asarray([[0.98, 0.05, 1.0], [-0.04, 1.01, -0.5], [1e-4, -2e-4, 1.0]],
                jnp.float32)[None], (2, 3, 3))

# name -> (fn, input)
OPS = {
    "rgb_to_grayscale": (kt.ops.rgb_to_grayscale, _IMG),
    "rgb_to_hsv": (kt.ops.rgb_to_hsv, _IMG),
    "hsv_to_rgb": (lambda x: kt.ops.hsv_to_rgb(kt.ops.rgb_to_hsv(x)), _IMG),
    "rgb_to_lab": (kt.ops.rgb_to_lab, _IMG),
    "rgb_to_yuv": (kt.ops.rgb_to_yuv, _IMG),
    "rgb_to_xyz": (kt.ops.rgb_to_xyz, _IMG),
    "sepia": (kt.ops.sepia, _IMG),
    "adjust_brightness": (lambda x: kt.ops.adjust_brightness(x, 0.2), _IMG),
    "adjust_contrast": (lambda x: kt.ops.adjust_contrast(x, 1.2), _IMG),
    "adjust_saturation": (lambda x: kt.ops.adjust_saturation(x, 1.4), _IMG),
    "adjust_hue": (lambda x: kt.ops.adjust_hue(x, 0.4), _IMG),
    "adjust_gamma": (lambda x: kt.ops.adjust_gamma(x, 1.3), _IMG),
    "adjust_sigmoid": (lambda x: kt.ops.adjust_sigmoid(x), _IMG),
    "adjust_log": (lambda x: kt.ops.adjust_log(x), _IMG),
    "invert": (kt.ops.invert, _IMG),
    "solarize": (lambda x: kt.ops.solarize(x, 0.5), _IMG),
    "sharpness": (lambda x: kt.ops.sharpness(x, 0.6), _IMG),
    "add_weighted": (lambda x: kt.ops.add_weighted(x, 0.7, x * 0.5, 0.3,
                                                   0.01), _IMG),
    "normalize_min_max": (kt.ops.normalize_min_max, _IMG),
    "gaussian_blur2d": (lambda x: kt.ops.gaussian_blur2d(x, 5, 1.2), _IMG),
    "box_blur": (lambda x: kt.ops.box_blur(x, 3), _IMG),
    "median_blur": (lambda x: kt.ops.median_blur(x, 3), _IMG),
    "bilateral_blur": (lambda x: kt.ops.bilateral_blur(x, 3, 0.1,
                                                       (1.5, 1.5)), _IMG),
    "unsharp_mask": (lambda x: kt.ops.unsharp_mask(x, 3, 1.0), _IMG),
    "motion_blur": (lambda x: kt.ops.motion_blur(x, 5, 30.0, 0.0), _IMG),
    "sobel": (kt.ops.sobel, _IMG),
    "spatial_gradient": (kt.ops.spatial_gradient, _IMG),
    "laplacian": (lambda x: kt.ops.laplacian(x, 3), _IMG),
    "dilation": (lambda x: kt.morphology.dilation(x, jnp.ones((3, 3))),
                 _IMG),
    "erosion": (lambda x: kt.morphology.erosion(x, jnp.ones((3, 3))), _IMG),
    "opening": (lambda x: kt.morphology.opening(x, jnp.ones((3, 3))), _IMG),
    "top_hat": (lambda x: kt.morphology.top_hat(x, jnp.ones((3, 3))), _IMG),
    "resize_up": (lambda x: kt.ops.resize(x, (32, 32)), _IMG),
    "resize_down": (lambda x: kt.ops.resize(x, (12, 12)), _IMG),
    "rotate": (lambda x: kt.ops.rotate(x, jnp.asarray(25.0)), _IMG),
    "warp_perspective": (lambda x: kt.ops.warp_perspective(x, _M3,
                                                           (24, 24)), _IMG),
    "hflip": (kt.ops.hflip, _IMG),
    "vflip": (kt.ops.vflip, _IMG),
    "center_crop": (lambda x: kt.ops.center_crop(x, (12, 12)), _IMG),
    "pyrdown": (_pyrdown, _IMG),
    "pyrup": (_pyrup, _IMG),
    "harris_response": (harris_response, _GRAY),
    "gftt_response": (gftt_response, _GRAY),
    "hessian_response": (hessian_response, _GRAY),
    "dog_response_single": (dog_response_single, _GRAY),
    "ssim_self": (lambda x: kt.losses.ssim_loss(x, x * 0.9 + 0.05, 5), _IMG),
    "total_variation": (lambda x: kt.losses.total_variation(x).sum(), _IMG),
    "integral_image": (kt.ops.integral_image, _GRAY),
    "equalize_clahe": (lambda x: kt.ops.equalize_clahe(x), _IMG),
}


@pytest.mark.parametrize("name", sorted(OPS))
def test_op_contract(name):
    fn, x = OPS[name]
    eager = fn(x)
    jitted = jax.jit(fn)(x)
    leaves_e = jax.tree_util.tree_leaves(eager)
    leaves_j = jax.tree_util.tree_leaves(jitted)
    for e, j in zip(leaves_e, leaves_j):
        assert bool(jnp.isfinite(e).all()), f"{name}: non-finite eager out"
        # atol 1e-4: XLA fusion may reorder f32 ops (e.g. lab's cube
        # roots on a [0, 100] output scale)
        np.testing.assert_allclose(np.asarray(j), np.asarray(e), atol=1e-4,
                                   rtol=1e-4,
                                   err_msg=f"{name}: jit != eager")

    def scalar(inp):
        out = fn(inp)
        return sum(jnp.sum(jnp.square(leaf))
                   for leaf in jax.tree_util.tree_leaves(out))

    g = jax.grad(scalar)(x)
    assert bool(jnp.isfinite(g).all()), f"{name}: non-finite grad"
