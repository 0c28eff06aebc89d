"""Per-op contract sweep (SURVEY.md §4; reference TESTING.md:41-57 demands
smoke/exception/cardinality/jit/gradcheck/module legs per op — here the
legs that generalize are enforced MECHANICALLY across the op surface).

For every op in the registry:
- eager output == jitted output (bitwise-close),
- `jax.grad` of a scalar functional is finite (autodiff-closed),
- CARDINALITY: the op maps batch item 0 identically whether the batch has
  1 or 2 items (per-sample ops only; batch-statistic ops opt out),
- BF16: the op runs on bfloat16 input, preserves shape and stays finite
  (TPU-native storage dtype).

A separate sweep (`test_op_raises`) drives the exception leg: malformed
ranks/channel counts must raise at trace time (core/check.py contract).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import kornia_tpu as kt
from kornia_tpu.feature.responses import (dog_response_single,
                                          gftt_response, harris_response,
                                          hessian_response)
from kornia_tpu.ops.pyramid import (build_laplacian_pyramid, build_pyramid,
                                    pyrdown, pyrup)

_KEY = jax.random.PRNGKey(7)
_IMG = jax.random.uniform(_KEY, (2, 3, 16, 16), dtype=jnp.float32)
_GRAY = jax.random.uniform(_KEY, (2, 1, 16, 16), dtype=jnp.float32)
_VOL = jax.random.uniform(_KEY, (2, 1, 6, 8, 8), dtype=jnp.float32)
_PTS2 = jax.random.normal(jax.random.PRNGKey(3), (2, 8, 2))
_PTS3 = jax.random.normal(jax.random.PRNGKey(4), (2, 8, 3)) + \
    jnp.array([0.0, 0.0, 4.0])
_K33 = jnp.broadcast_to(
    jnp.asarray([[100.0, 0, 8], [0, 100, 8], [0, 0, 1]])[None], (2, 3, 3))
_M3 = jnp.broadcast_to(
    jnp.asarray([[0.98, 0.05, 1.0], [-0.04, 1.01, -0.5], [1e-4, -2e-4, 1.0]],
                jnp.float32)[None], (2, 3, 3))
_M23 = _M3[:, :2, :]
_SE = jnp.ones((3, 3))
_Q = jax.random.normal(jax.random.PRNGKey(5), (2, 4))
_Q = _Q / jnp.linalg.norm(_Q, axis=-1, keepdims=True)
_AA = 0.3 * jax.random.normal(jax.random.PRNGKey(6), (2, 3))
_DEPTH = 1.0 + jax.random.uniform(jax.random.PRNGKey(8), (2, 1, 16, 16))
_LOGITS = jax.random.normal(jax.random.PRNGKey(9), (2, 4, 16, 16))
_LABELS = jax.random.randint(jax.random.PRNGKey(10), (2, 16, 16), 0, 4)

# name -> (fn, input-or-tuple-of-inputs) + optional flag dict:
#   grad=False  — integer/threshold outputs, no useful gradient
#   card=False  — op mixes statistics across the batch
#   bf16=False  — op is numerically f32-only by contract (solve/eig paths)
#   tol=...     — per-op jit-vs-eager tolerance override
# Tuple inputs are splatted (fn(*xs)); the cardinality leg slices EVERY
# batched element jointly, the grad leg differentiates w.r.t. the first.
_GRID = kt.geometry.create_meshgrid(16, 16, False)  # (1, 16, 16, 2)
_MAPX = jnp.broadcast_to(_GRID[..., 0], (2, 16, 16)) + 0.7
_MAPY = jnp.broadcast_to(_GRID[..., 1], (2, 16, 16)) - 0.3

OPS = {
    # ---- color -------------------------------------------------------
    "rgb_to_grayscale": (kt.ops.rgb_to_grayscale, _IMG),
    "bgr_to_grayscale": (kt.ops.bgr_to_grayscale, _IMG),
    "grayscale_to_rgb": (kt.ops.grayscale_to_rgb, _GRAY),
    "rgb_to_bgr": (kt.ops.rgb_to_bgr, _IMG),
    "bgr_to_rgb": (kt.ops.bgr_to_rgb, _IMG),
    "rgb_to_rgba": (lambda x: kt.ops.rgb_to_rgba(x, 1.0), _IMG),
    "rgba_to_rgb": (lambda x: kt.ops.rgba_to_rgb(
        kt.ops.rgb_to_rgba(x, 1.0)), _IMG),
    "bgr_to_rgba": (lambda x: kt.ops.bgr_to_rgba(x, 1.0), _IMG),
    "rgba_to_bgr": (lambda x: kt.ops.rgba_to_bgr(
        kt.ops.rgb_to_rgba(x, 1.0)), _IMG),
    "rgb_to_hsv": (kt.ops.rgb_to_hsv, _IMG),
    "hsv_to_rgb": (lambda x: kt.ops.hsv_to_rgb(kt.ops.rgb_to_hsv(x)), _IMG),
    "rgb_to_hls": (kt.ops.rgb_to_hls, _IMG),
    "hls_to_rgb": (lambda x: kt.ops.hls_to_rgb(kt.ops.rgb_to_hls(x)), _IMG),
    "rgb_to_lab": (kt.ops.rgb_to_lab, _IMG),
    "lab_to_rgb": (lambda x: kt.ops.lab_to_rgb(kt.ops.rgb_to_lab(x)), _IMG),
    "rgb_to_luv": (kt.ops.rgb_to_luv, _IMG),
    "luv_to_rgb": (lambda x: kt.ops.luv_to_rgb(kt.ops.rgb_to_luv(x)), _IMG),
    "rgb_to_yuv": (kt.ops.rgb_to_yuv, _IMG),
    "yuv_to_rgb": (lambda x: kt.ops.yuv_to_rgb(kt.ops.rgb_to_yuv(x)), _IMG),
    "rgb_to_ycbcr": (kt.ops.rgb_to_ycbcr, _IMG),
    "ycbcr_to_rgb": (lambda x: kt.ops.ycbcr_to_rgb(
        kt.ops.rgb_to_ycbcr(x)), _IMG),
    "rgb_to_xyz": (kt.ops.rgb_to_xyz, _IMG),
    "xyz_to_rgb": (lambda x: kt.ops.xyz_to_rgb(kt.ops.rgb_to_xyz(x)), _IMG),
    "rgb_to_linear_rgb": (kt.ops.rgb_to_linear_rgb, _IMG),
    "linear_rgb_to_rgb": (kt.ops.linear_rgb_to_rgb, _IMG),
    "rgb_to_y": (kt.ops.rgb_to_y, _IMG),
    "rgb_to_yuv420": (lambda x: kt.ops.rgb_to_yuv420(x)[0], _IMG),
    "rgb_to_yuv422": (lambda x: kt.ops.rgb_to_yuv422(x)[0], _IMG),
    "sepia": (kt.ops.sepia, _IMG),
    "apply_colormap": (lambda x: kt.ops.apply_colormap(
        x, kt.ops.colormap.ColorMap("viridis").colors), _GRAY,
        {"grad": False, "bf16": False}),
    # ---- enhance -----------------------------------------------------
    "adjust_brightness": (lambda x: kt.ops.adjust_brightness(x, 0.2), _IMG),
    "adjust_brightness_accumulative": (
        lambda x: kt.ops.adjust_brightness_accumulative(x, 0.2), _IMG),
    "adjust_contrast": (lambda x: kt.ops.adjust_contrast(x, 1.2), _IMG),
    "adjust_contrast_with_mean_subtraction": (
        lambda x: kt.ops.adjust_contrast_with_mean_subtraction(x, 1.2), _IMG),
    "adjust_saturation": (lambda x: kt.ops.adjust_saturation(x, 1.4), _IMG),
    "adjust_saturation_raw": (
        lambda x: kt.ops.adjust_saturation_raw(x, 1.4), _IMG),
    "adjust_saturation_with_gray_subtraction": (
        lambda x: kt.ops.adjust_saturation_with_gray_subtraction(x, 1.4),
        _IMG),
    "adjust_hue": (lambda x: kt.ops.adjust_hue(x, 0.4), _IMG),
    "adjust_gamma": (lambda x: kt.ops.adjust_gamma(x, 1.3), _IMG),
    "adjust_sigmoid": (lambda x: kt.ops.adjust_sigmoid(x), _IMG),
    "adjust_log": (lambda x: kt.ops.adjust_log(x), _IMG),
    "invert": (kt.ops.invert, _IMG),
    "solarize": (lambda x: kt.ops.solarize(x, 0.5), _IMG),
    "posterize": (lambda x: kt.ops.posterize(x, 3), _IMG, {"grad": False}),
    "sharpness": (lambda x: kt.ops.sharpness(x, 0.6), _IMG),
    "equalize": (kt.ops.equalize, _IMG, {"grad": False}),
    "equalize3d": (kt.ops.equalize3d, _VOL, {"grad": False}),
    "equalize_clahe": (lambda x: kt.ops.equalize_clahe(x), _IMG),
    "add_weighted": (lambda x: kt.ops.add_weighted(x, 0.7, x * 0.5, 0.3,
                                                   0.01), _IMG),
    "normalize": (lambda x: kt.ops.normalize(
        x, jnp.array([0.5, 0.5, 0.5]), jnp.array([0.2, 0.2, 0.2])), _IMG),
    "denormalize": (lambda x: kt.ops.denormalize(
        x, jnp.array([0.5, 0.5, 0.5]), jnp.array([0.2, 0.2, 0.2])), _IMG),
    "normalize_min_max": (kt.ops.normalize_min_max, _IMG),
    "shift_rgb": (kt.ops.shift_rgb,
                  (_IMG, jnp.full((2,), 0.1), jnp.full((2,), -0.05),
                   jnp.full((2,), 0.02))),
    "threshold_binary": (lambda x: kt.ops.threshold_binary(x, 0.5),
                         _IMG, {"grad": False}),
    "in_range": (lambda x: kt.ops.in_range(x, (0.2,), (0.8,)), _IMG,
                 {"grad": False}),
    "rescale_intensity": (lambda x: kt.ops.rescale_intensity(x, 1.5),
                          _IMG),
    "otsu_threshold": (lambda x: kt.ops.otsu_threshold(x)[1], _IMG,
                       {"grad": False}),
    "zca_whiten": (lambda x: kt.ops.zca_whiten(x.reshape(2, -1)), _IMG,
                   {"card": False, "bf16": False, "tol": 2e-3,
                    "grad": False}),  # eigh grad NaN on rank-deficient cov
    "linear_transform": (lambda x: kt.ops.linear_transform(
        x.reshape(2, -1), jnp.eye(x[0].size), jnp.zeros((1, x[0].size))),
        _IMG, {"bf16": False, "card": False}),
    "histogram": (lambda x: kt.ops.histogram(
        x.reshape(2, -1), jnp.linspace(0, 1, 10), jnp.asarray(0.1)), _IMG),
    "histogram2d": (lambda x: kt.ops.histogram2d(
        x.reshape(2, -1), x.reshape(2, -1)[:, ::-1],
        jnp.linspace(0, 1, 8), jnp.asarray(0.1)), _IMG),
    "image_histogram2d": (lambda x: kt.ops.image_histogram2d(
        x, 0.0, 1.0, 16)[0], _IMG),
    # ---- filters -----------------------------------------------------
    "gaussian_blur2d": (lambda x: kt.ops.gaussian_blur2d(x, 5, 1.2), _IMG),
    "box_blur": (lambda x: kt.ops.box_blur(x, 3), _IMG),
    "median_blur": (lambda x: kt.ops.median_blur(x, 3), _IMG),
    "bilateral_blur": (lambda x: kt.ops.bilateral_blur(x, 3, 0.1,
                                                       (1.5, 1.5)), _IMG),
    "joint_bilateral_blur": (lambda x: kt.ops.joint_bilateral_blur(
        x, x * 0.9, 3, 0.1, (1.5, 1.5)), _IMG),
    "guided_blur": (lambda x: kt.ops.guided_blur(x, x, 3, 0.01), _IMG),
    "unsharp_mask": (lambda x: kt.ops.unsharp_mask(x, 3, 1.0), _IMG),
    "motion_blur": (lambda x: kt.ops.motion_blur(x, 5, 30.0, 0.0), _IMG),
    "motion_blur3d": (lambda x: kt.ops.motion_blur3d(
        x, 3, jnp.array([30.0, 0.0, 0.0]), 0.0), _VOL),
    "filter2d": (lambda x: kt.ops.filter2d(
        x, jnp.ones((1, 3, 3)) / 9.0), _IMG),
    "filter2d_separable": (lambda x: kt.ops.filter2d_separable(
        x, jnp.ones((1, 3)) / 3, jnp.ones((1, 3)) / 3), _IMG),
    "filter3d": (lambda x: kt.ops.filter3d(
        x, jnp.ones((1, 3, 3, 3)) / 27.0), _VOL),
    "convolve2d": (lambda x: kt.ops.convolve2d(
        x, jnp.ones((1, 3, 3)) / 9.0), _IMG),
    "correlate2d": (lambda x: kt.ops.correlate2d(
        x, jnp.ones((1, 3, 3)) / 9.0), _IMG),
    "fft_conv2d": (lambda x: kt.ops.fft_conv2d(
        x, jnp.ones((1, 5, 5)) / 25.0), _IMG, {"bf16": False}),
    "blur_pool2d": (lambda x: kt.ops.blur_pool2d(x, 3), _IMG),
    "max_blur_pool2d": (lambda x: kt.ops.max_blur_pool2d(x, 3), _IMG),
    "edge_aware_blur_pool2d": (
        lambda x: kt.ops.edge_aware_blur_pool2d(x, 3), _IMG,
        {"bf16": False}),
    "sobel": (kt.ops.sobel, _IMG),
    "spatial_gradient": (kt.ops.spatial_gradient, _IMG),
    "spatial_gradient_diff": (
        lambda x: kt.ops.spatial_gradient(x, mode="diff"), _IMG),
    "spatial_gradient3d": (kt.ops.spatial_gradient3d, _VOL),
    "laplacian": (lambda x: kt.ops.laplacian(x, 3), _IMG),
    "canny": (lambda x: kt.ops.canny(x)[0], _IMG,
              {"grad": False, "bf16": False}),
    "integral_image": (kt.ops.integral_image, _GRAY),
    "integral_tensor": (kt.ops.integral_tensor, _GRAY),
    # ---- kernel factories (sigma-differentiable _t variants) ---------
    "get_gaussian_kernel1d_t": (
        lambda s: kt.ops.get_gaussian_kernel1d_t(5, s),
        jnp.asarray([[1.2]]), {"card": False}),
    "get_gaussian_kernel2d_t": (
        lambda s: kt.ops.get_gaussian_kernel2d_t((5, 5), s),
        jnp.asarray([[1.2, 1.2]]), {"card": False}),
    "get_motion_kernel2d": (
        lambda a: kt.ops.get_motion_kernel2d(5, a, 0.0),
        jnp.asarray([35.0]), {"card": False}),
    # ---- morphology --------------------------------------------------
    "dilation": (lambda x: kt.morphology.dilation(x, _SE), _IMG),
    "erosion": (lambda x: kt.morphology.erosion(x, _SE), _IMG),
    "opening": (lambda x: kt.morphology.opening(x, _SE), _IMG),
    "closing": (lambda x: kt.morphology.closing(x, _SE), _IMG),
    "morph_gradient": (lambda x: kt.morphology.gradient(x, _SE), _IMG),
    "top_hat": (lambda x: kt.morphology.top_hat(x, _SE), _IMG),
    "bottom_hat": (lambda x: kt.morphology.bottom_hat(x, _SE), _IMG),
    # ---- warp / transform --------------------------------------------
    "resize_up": (lambda x: kt.ops.resize(x, (24, 24)), _IMG),
    "resize_down": (lambda x: kt.ops.resize(x, (8, 8)), _IMG),
    "resize_nearest": (lambda x: kt.ops.resize(
        x, (24, 24), interpolation="nearest"), _IMG, {"grad": False}),
    "rescale": (lambda x: kt.ops.rescale(x, (1.5, 1.5)), _IMG),
    "rotate": (lambda x: kt.ops.rotate(x, jnp.asarray(25.0)), _IMG),
    "translate": (kt.ops.translate,
                  (_IMG, jnp.broadcast_to(jnp.asarray([[1.5, -0.5]]),
                                          (2, 2)))),
    "scale": (kt.ops.scale,
              (_IMG, jnp.broadcast_to(jnp.asarray([[1.2, 0.9]]), (2, 2)))),
    "shear": (kt.ops.shear,
              (_IMG, jnp.broadcast_to(jnp.asarray([[0.1, 0.05]]), (2, 2)))),
    "affine": (kt.ops.affine, (_IMG, _M23)),
    "warp_affine": (lambda x, m: kt.ops.warp_affine(x, m, (16, 16)),
                    (_IMG, _M23)),
    "warp_perspective": (lambda x, m: kt.ops.warp_perspective(
        x, m, (16, 16)), (_IMG, _M3)),
    "homography_warp": (lambda x, m: kt.ops.homography_warp(
        x, m, (16, 16), normalized_homography=False), (_IMG, _M3)),
    "remap": (lambda x, mx, my: kt.ops.remap(x, mx, my),
              (_IMG, _MAPX, _MAPY)),
    "elastic_transform2d": (lambda x, n: kt.ops.elastic_transform2d(x, n),
                            (_IMG, jnp.zeros((2, 2, 16, 16)) + 0.01)),
    "warp_image_tps": (kt.ops.warp_image_tps,
                       (_IMG, _PTS2 * 0.1, jnp.zeros((2, 8, 2)),
                        jnp.zeros((2, 3, 2)))),
    "upscale_double": (kt.ops.upscale_double, _IMG),
    "rot180": (kt.ops.rot180, _IMG),
    "hflip": (kt.ops.hflip, _IMG),
    "vflip": (kt.ops.vflip, _IMG),
    "center_crop": (lambda x: kt.ops.center_crop(x, (8, 8)), _IMG),
    "crop_by_indices": (lambda x: kt.ops.crop_by_indices(
        x, 2, 3, (8, 8)), _IMG),
    "crop_and_resize": (lambda x, b: kt.ops.crop_and_resize(x, b, (8, 8)),
                        (_IMG, jnp.broadcast_to(jnp.asarray(
                            [[[2.0, 2], [9, 2], [9, 9], [2, 9]]]),
                            (2, 4, 2)))),
    "invert_affine_transform": (kt.ops.invert_affine_transform, _M23),
    "normalize_homography": (
        lambda m: kt.ops.normalize_homography(m, (16, 16), (16, 16)), _M3),
    "denormalize_homography": (
        lambda m: kt.ops.denormalize_homography(m, (16, 16), (16, 16)), _M3),
    "get_perspective_transform": (
        lambda p: kt.ops.get_perspective_transform(
            p, p * 1.05 + 0.1), jnp.broadcast_to(jnp.asarray(
                [[[0.0, 0], [15, 0], [15, 15], [0, 15]]]), (2, 4, 2)),
        {"bf16": False}),
    "get_rotation_matrix2d": (
        lambda c: kt.ops.get_rotation_matrix2d(
            c, jnp.full((2,), 30.0), jnp.ones((2, 2))),
        jnp.full((2, 2), 8.0), {"card": False}),
    "get_affine_matrix2d": (
        lambda t: kt.ops.get_affine_matrix2d(
            t, jnp.full((2, 2), 8.0), jnp.ones((2, 2)),
            jnp.full((2,), 15.0)), jnp.ones((2, 2)), {"card": False}),
    "get_tps_transform": (
        lambda p: kt.ops.get_tps_transform(p, p * 1.1)[0], _PTS2 * 0.1,
        {"bf16": False}),
    "pyrdown": (pyrdown, _IMG),
    "pyrup": (pyrup, _IMG),
    "build_pyramid_l2": (lambda x: build_pyramid(x, 3)[-1], _IMG),
    "build_laplacian_pyramid_l2": (
        lambda x: build_laplacian_pyramid(x, 3)[-1], _IMG),
    # ---- 3d warp ------------------------------------------------------
    "warp_affine3d": (lambda v, m: kt.geometry.warp_affine3d(
        v, m, (6, 8, 8)),
        (_VOL, jnp.broadcast_to(jnp.eye(3, 4)[None], (2, 3, 4)))),
    "rotate3d": (kt.geometry.rotate3d,
                 (_VOL, jnp.full((2,), 10.0), jnp.full((2,), 5.0),
                  jnp.full((2,), 2.0))),
    "center_crop3d": (lambda v: kt.geometry.center_crop3d(
        v, (4, 6, 6)), _VOL),
    "crop_by_transform_mat3d": (
        lambda v, m: kt.geometry.crop_by_transform_mat3d(v, m, (4, 6, 6)),
        (_VOL, jnp.broadcast_to(jnp.eye(4)[None], (2, 4, 4)))),
    # ---- geometry: conversions / points ------------------------------
    "deg2rad": (kt.geometry.deg2rad, jnp.asarray([[10.0, 45.0]])),
    "rad2deg": (kt.geometry.rad2deg, jnp.asarray([[0.3, 1.0]])),
    "convert_points_to_homogeneous": (
        kt.geometry.convert_points_to_homogeneous, _PTS2),
    "convert_points_from_homogeneous": (
        kt.geometry.convert_points_from_homogeneous, _PTS3),
    "convert_affinematrix_to_homography": (
        kt.geometry.convert_affinematrix_to_homography, _M23),
    "angle_to_rotation_matrix": (
        kt.geometry.angle_to_rotation_matrix, jnp.asarray([[25.0, -10.0]])),
    "axis_angle_to_rotation_matrix": (
        kt.geometry.axis_angle_to_rotation_matrix, _AA),
    "axis_angle_to_quaternion": (
        kt.geometry.axis_angle_to_quaternion, _AA),
    "quaternion_to_axis_angle": (
        kt.geometry.quaternion_to_axis_angle, _Q),
    "quaternion_to_rotation_matrix": (
        kt.geometry.quaternion_to_rotation_matrix, _Q),
    "rotation_matrix_to_quaternion": (
        lambda q: kt.geometry.rotation_matrix_to_quaternion(
            kt.geometry.quaternion_to_rotation_matrix(q)), _Q),
    "rotation_matrix_to_axis_angle": (
        lambda q: kt.geometry.rotation_matrix_to_axis_angle(
            kt.geometry.quaternion_to_rotation_matrix(q)), _Q),
    "quaternion_log_to_exp": (
        kt.geometry.quaternion_log_to_exp, _AA * 0.1),
    "quaternion_exp_to_log": (kt.geometry.quaternion_exp_to_log, _Q),
    "normalize_quaternion": (kt.geometry.normalize_quaternion, _Q),
    "euler_from_quaternion": (
        lambda q: jnp.stack(kt.geometry.euler_from_quaternion(
            q[:, 0], q[:, 1], q[:, 2], q[:, 3]), -1), _Q),
    "quaternion_from_euler": (
        lambda e: jnp.stack(kt.geometry.quaternion_from_euler(
            e[:, 0], e[:, 1], e[:, 2]), -1), _AA * 0.2),
    "normalize_pixel_coordinates": (
        lambda p: kt.geometry.normalize_pixel_coordinates(p, 16, 16),
        _PTS2 * 3 + 8),
    "denormalize_pixel_coordinates": (
        lambda p: kt.geometry.denormalize_pixel_coordinates(p, 16, 16),
        _PTS2 * 0.3),
    "cart2pol": (lambda p: jnp.stack(
        kt.geometry.cart2pol(p[..., 0], p[..., 1]), -1), _PTS2 + 3.0),
    "pol2cart": (lambda p: jnp.stack(
        kt.geometry.pol2cart(p[..., 0] + 2.0, p[..., 1]), -1), _PTS2),
    "compose_transformations": (
        lambda m: kt.geometry.compose_transformations(m, m),
        jnp.broadcast_to(jnp.eye(4)[None], (2, 4, 4))),
    "inverse_transformation": (
        kt.geometry.inverse_transformation,
        jnp.broadcast_to(jnp.eye(4)[None], (2, 4, 4)).at[:, 0, 3].set(2.0)),
    "transform_points": (
        lambda p: kt.geometry.transform_points(_M3, p), _PTS2),
    "cross_product_matrix": (kt.geometry.cross_product_matrix, _AA),
    # ---- geometry: camera / depth ------------------------------------
    "project_points": (
        lambda X: kt.geometry.project_points(X, _K33[:, None]), _PTS3),
    "unproject_points": (
        lambda p: kt.geometry.unproject_points(
            p, jnp.ones_like(p[..., :1]) * 3.0, _K33[:, None]),
        _PTS2 * 2 + 8),
    "distort_points": (
        lambda p: kt.geometry.distort_points(
            p, _K33, jnp.zeros((2, 4)).at[:, 0].set(0.1)), _PTS2 + 8),
    "undistort_points": (
        lambda p: kt.geometry.undistort_points(
            p, _K33, jnp.zeros((2, 4)).at[:, 0].set(0.1)), _PTS2 + 8),
    "depth_to_3d_v2": (
        lambda d: kt.geometry.depth_to_3d_v2(d[:, 0], _K33), _DEPTH),
    "depth_to_normals": (
        lambda d: kt.geometry.depth_to_normals(d, _K33), _DEPTH),
    "depth_from_disparity": (
        lambda d: kt.geometry.depth_from_disparity(d, 0.1, 100.0), _DEPTH),
    # ---- geometry: epipolar ------------------------------------------
    "essential_from_Rt": (
        lambda q: kt.geometry.essential_from_Rt(
            kt.geometry.quaternion_to_rotation_matrix(q),
            jnp.zeros((2, 3, 1)),
            kt.geometry.quaternion_to_rotation_matrix(q[::-1]),
            jnp.ones((2, 3, 1))), _Q),
    "fundamental_from_essential": (
        lambda q: kt.geometry.fundamental_from_essential(
            kt.geometry.essential_from_Rt(
                kt.geometry.quaternion_to_rotation_matrix(q),
                jnp.zeros((2, 3, 1)),
                kt.geometry.quaternion_to_rotation_matrix(q[::-1]),
                jnp.ones((2, 3, 1))), _K33, _K33), _Q),
    "compute_correspond_epilines": (
        lambda p: kt.geometry.compute_correspond_epilines(p, _M3), _PTS2),
    "sampson_epipolar_distance": (
        lambda p: kt.geometry.sampson_epipolar_distance(
            p, p + 0.01, _M3), _PTS2),
    "symmetrical_epipolar_distance": (
        lambda p: kt.geometry.symmetrical_epipolar_distance(
            p, p + 0.01, _M3), _PTS2),
    # ---- geometry: subpix / spatial softargmax ------------------------
    "spatial_softmax2d": (kt.geometry.spatial_softmax2d, _GRAY),
    "spatial_expectation2d": (
        lambda x: kt.geometry.spatial_expectation2d(
            kt.geometry.spatial_softmax2d(x)), _GRAY),
    "conv_soft_argmax2d": (
        lambda x: kt.geometry.conv_soft_argmax2d(x)[0], _GRAY),
    "render_gaussian2d": (
        lambda m: kt.geometry.render_gaussian2d(
            m, jnp.ones_like(m), (16, 16)), _PTS2 * 2 + 8),
    "nms2d": (lambda x: kt.geometry.nms2d(x, (3, 3)), _GRAY,
              {"grad": False}),
    # ---- responses ----------------------------------------------------
    "harris_response": (harris_response, _GRAY),
    "gftt_response": (gftt_response, _GRAY),
    "hessian_response": (hessian_response, _GRAY),
    "dog_response_single": (dog_response_single, _GRAY),
    # ---- losses -------------------------------------------------------
    "ssim_loss": (lambda x: kt.losses.ssim_loss(x, x * 0.9 + 0.05, 5), _IMG),
    "ssim3d_loss": (lambda v: kt.losses.ssim3d_loss(
        v, v * 0.9 + 0.05, 3), _VOL),
    "ms_ssim_loss": (lambda x: kt.losses.ms_ssim_loss(
        jnp.tile(x, (1, 1, 4, 4)), jnp.tile(x * 0.9 + 0.05, (1, 1, 4, 4))),
        _IMG),
    "psnr_loss": (lambda x: kt.losses.psnr_loss(x, x * 0.9 + 0.02, 1.0),
                  _IMG),
    "total_variation": (lambda x: kt.losses.total_variation(x).sum(), _IMG),
    "charbonnier_loss": (
        lambda x: kt.losses.charbonnier_loss(x, x * 0.9), _IMG),
    "cauchy_loss": (lambda x: kt.losses.cauchy_loss(x, x * 0.9), _IMG),
    "geman_mcclure_loss": (
        lambda x: kt.losses.geman_mcclure_loss(x, x * 0.9), _IMG),
    "welsch_loss": (lambda x: kt.losses.welsch_loss(x, x * 0.9), _IMG),
    "inverse_depth_smoothness_loss": (
        lambda d: kt.losses.inverse_depth_smoothness_loss(
            d, jnp.tile(jnp.mean(d, 1, keepdims=True), (1, 3, 1, 1))),
        _DEPTH),
    "js_div_loss_2d": (lambda x: kt.losses.js_div_loss_2d(
        kt.geometry.spatial_softmax2d(x),
        kt.geometry.spatial_softmax2d(x * 0.9)), _GRAY),
    "kl_div_loss_2d": (lambda x: kt.losses.kl_div_loss_2d(
        kt.geometry.spatial_softmax2d(x),
        kt.geometry.spatial_softmax2d(x * 0.9)), _GRAY),
    "dice_loss": (kt.losses.dice_loss, (_LOGITS, _LABELS)),
    "focal_loss": (lambda l, t: kt.losses.focal_loss(
        l, t, alpha=0.5, gamma=2.0), (_LOGITS, _LABELS)),
    "binary_focal_loss_with_logits": (
        lambda l, t: kt.losses.binary_focal_loss_with_logits(
            l[:, :1], (t[:, None] > 1).astype(jnp.float32),
            alpha=0.25, gamma=2.0), (_LOGITS, _LABELS)),
    "tversky_loss": (lambda l, t: kt.losses.tversky_loss(
        l, t, 0.5, 0.5), (_LOGITS, _LABELS)),
    "lovasz_softmax_loss": (
        kt.losses.lovasz_softmax_loss, (_LOGITS, _LABELS), {"bf16": False}),
    "lovasz_hinge_loss": (lambda l, t: kt.losses.lovasz_hinge_loss(
        l[:, :1], (t[:, None] > 1).astype(jnp.float32)),
        (_LOGITS, _LABELS), {"bf16": False}),
    # ---- metrics ------------------------------------------------------
    "psnr_metric": (lambda x: kt.metrics.psnr(x, x * 0.95 + 0.02, 1.0),
                    _IMG),
    "ssim_metric": (lambda x: kt.metrics.ssim(x, x * 0.9 + 0.05, 5), _IMG),
    "aepe": (lambda f: kt.metrics.aepe(f, f * 0.9), _PTS2),
    "mean_iou_bbox": (
        lambda b: kt.metrics.mean_iou_bbox(b, b + 0.5),
        jnp.asarray([[1.0, 1, 6, 6], [4, 4, 10, 10]]), {"card": False}),
}


def _entry(name):
    rec = OPS[name]
    fn, x = rec[0], rec[1]
    flags = rec[2] if len(rec) > 2 else {}
    xs = x if isinstance(x, tuple) else (x,)
    return fn, xs, flags


@pytest.mark.parametrize("name", sorted(OPS))
def test_op_contract(name):
    fn, xs, flags = _entry(name)
    tol = flags.get("tol", 1e-4)
    eager = fn(*xs)
    jitted = jax.jit(fn)(*xs)
    leaves_e = jax.tree_util.tree_leaves(eager)
    leaves_j = jax.tree_util.tree_leaves(jitted)
    for e, j in zip(leaves_e, leaves_j):
        assert bool(jnp.isfinite(e).all()), f"{name}: non-finite eager out"
        # default atol 1e-4: XLA fusion may reorder f32 ops (e.g. lab's
        # cube roots on a [0, 100] output scale)
        np.testing.assert_allclose(np.asarray(j), np.asarray(e), atol=tol,
                                   rtol=tol,
                                   err_msg=f"{name}: jit != eager")

    # cardinality: item 0 is invariant to the rest of the batch; every
    # batched argument is sliced jointly
    if flags.get("card", True) and xs[0].shape and xs[0].shape[0] == 2:
        sub = fn(*(a[0:1] if hasattr(a, "ndim") and a.ndim and
                   a.shape[0] == 2 else a for a in xs))
        for full, s in zip(leaves_e, jax.tree_util.tree_leaves(sub)):
            if full.ndim and s.ndim and full.shape[0] == 2 \
                    and s.shape[0] == 1:
                np.testing.assert_allclose(
                    np.asarray(s[0]), np.asarray(full[0]), atol=1e-4,
                    rtol=1e-4, err_msg=f"{name}: batch-cardinality broken")

    # bf16 leg: runs, keeps shape, stays finite (float args cast only)
    if flags.get("bf16", True):
        out16 = fn(*(a.astype(jnp.bfloat16)
                     if hasattr(a, "dtype") and
                     jnp.issubdtype(a.dtype, jnp.floating) else a
                     for a in xs))
        for e, o in zip(leaves_e, jax.tree_util.tree_leaves(out16)):
            assert o.shape == e.shape, f"{name}: bf16 changed shape"
            assert bool(jnp.isfinite(o.astype(jnp.float32)).all()), \
                f"{name}: non-finite under bf16"

    if flags.get("grad", True):
        def scalar(inp):
            out = fn(inp, *xs[1:])
            return sum(jnp.sum(jnp.square(leaf))
                       for leaf in jax.tree_util.tree_leaves(out))

        g = jax.grad(scalar)(xs[0])
        assert bool(jnp.isfinite(g).all()), f"{name}: non-finite grad"


# -----------------------------------------------------------------------------
# Exception leg: malformed inputs must raise at TRACE time (core/check.py)
# -----------------------------------------------------------------------------

BAD_CALLS = {
    "filter2d_rank3": lambda: kt.ops.filter2d(
        jnp.zeros((3, 8, 8)), jnp.ones((1, 3, 3))),
    "filter2d_kernel_rank1": lambda: kt.ops.filter2d(
        jnp.zeros((1, 1, 8, 8)), jnp.ones((9,))),
    "rgb_to_grayscale_1ch": lambda: kt.ops.rgb_to_grayscale(
        jnp.zeros((1, 1, 8, 8))),
    "rgb_to_hsv_4ch": lambda: kt.ops.rgb_to_hsv(jnp.zeros((1, 4, 8, 8))),
    "grayscale_to_rgb_3ch": lambda: kt.ops.grayscale_to_rgb(
        jnp.zeros((1, 3, 8, 8))),
    "gaussian_blur_even_kernel": lambda: kt.ops.gaussian_blur2d(
        jnp.zeros((1, 1, 8, 8)), 4, 1.0),
    "median_blur_rank3": lambda: kt.ops.median_blur(jnp.zeros((3, 8, 8)), 3),
    "warp_perspective_bad_M": lambda: kt.ops.warp_perspective(
        jnp.zeros((1, 1, 8, 8)), jnp.eye(3), (8, 8)),
    "warp_affine_bad_M": lambda: kt.ops.warp_affine(
        jnp.zeros((1, 1, 8, 8)), jnp.zeros((1, 3, 3)), (8, 8)),
    "dilation_rank3": lambda: kt.morphology.dilation(
        jnp.zeros((3, 8, 8)), jnp.ones((3, 3))),
    "normalize_bad_stats": lambda: kt.ops.normalize(
        jnp.zeros((1, 3, 8, 8)), jnp.zeros((2,)), jnp.ones((2,))),
    "posterize_bad_bits": lambda: kt.ops.posterize(
        jnp.zeros((1, 1, 8, 8)), 9),
    "convert_points_to_homogeneous_rank1": (
        lambda: kt.geometry.convert_points_to_homogeneous(jnp.zeros((3,)))),
    "quaternion_to_rotation_matrix_bad_last": (
        lambda: kt.geometry.quaternion_to_rotation_matrix(
            jnp.zeros((2, 3)))),
    "crop_and_resize_bad_boxes": lambda: kt.ops.crop_and_resize(
        jnp.zeros((1, 1, 8, 8)), jnp.zeros((1, 3, 2)), (4, 4)),
    "histogram_bad_bins": lambda: kt.ops.histogram(
        jnp.zeros((2, 5)), jnp.zeros((3, 4)), jnp.asarray(0.1)),
    "ssim_mismatched": lambda: kt.losses.ssim_loss(
        jnp.zeros((1, 1, 8, 8)), jnp.zeros((1, 1, 6, 6)), 5),
    "resize_bad_size": lambda: kt.ops.resize(
        jnp.zeros((1, 1, 8, 8)), (0, 4)),
}


@pytest.mark.parametrize("name", sorted(BAD_CALLS))
def test_op_raises(name):
    with pytest.raises((ValueError, TypeError, AssertionError)):
        jax.jit(BAD_CALLS[name])()
