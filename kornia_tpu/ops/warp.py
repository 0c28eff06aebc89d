"""Dense warping: grid_sample and everything built on it.

This is the single hottest path in the framework (SURVEY.md §3.4): every
affine/perspective warp, crop, resize, elastic/TPS transform and LAF patch
extraction funnels into :func:`grid_sample`.

TPU-first design:
  * ``grid_sample`` is formulated as 4 (bilinear) / 16 (bicubic) flat
    gathers over the (H*W)-flattened image + fused lerp — XLA lowers these
    to efficient dynamic-gathers and fuses the weighting arithmetic. A
    Pallas kernel (``kornia_tpu.ops.pallas_kernels``) covers the
    VMEM-tileable cases.
  * Static output shapes everywhere; `align_corners` and padding modes
    resolved at trace time.

Reference parity: F.grid_sample semantics; warp_perspective/warp_affine/
remap (kornia/geometry/transform/imgwarp.py:69,169,581),
get_perspective_transform (:431), get_rotation_matrix2d (:490),
affine matrices (:692,805), homography_warp (:1368), resize/rotate/scale
(transform/affwarp.py), crops (transform/crop2d.py), elastic
(elastic_transform.py), TPS (thin_plate_spline.py:259), flips (flips.py).
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from jax import lax

from ..core.check import check, check_shape
from ..core.dtype import as_float
from ..core.grid import create_meshgrid
from ..core.linalg import inverse_3x3

__all__ = [
    "grid_sample",
    "remap",
    "normal_transform_pixel",
    "normalize_homography",
    "denormalize_homography",
    "warp_perspective",
    "warp_affine",
    "homography_warp",
    "HomographyWarper",
    "get_perspective_transform",
    "get_rotation_matrix2d",
    "get_shear_matrix2d",
    "get_affine_matrix2d",
    "get_translation_matrix2d",
    "invert_affine_transform",
    "crop_and_resize",
    "crop_by_boxes",
    "crop_by_indices",
    "center_crop",
    "resize",
    "rescale",
    "affine",
    "rotate",
    "translate",
    "scale",
    "shear",
    "elastic_transform2d",
    "get_tps_transform",
    "warp_points_tps",
    "warp_image_tps",
    "hflip",
    "vflip",
    "rot180",
    "upscale_double",
]


# -----------------------------------------------------------------------------
# grid_sample
# -----------------------------------------------------------------------------

def _unnormalize(coord: jax.Array, size: int, align_corners: bool) -> jax.Array:
    """[-1, 1] → pixel coordinates (torch grid_sample convention)."""
    if align_corners:
        return (coord + 1.0) * 0.5 * (size - 1)
    return ((coord + 1.0) * size - 1.0) * 0.5


def _reflect(x: jax.Array, lo: float, hi: float) -> jax.Array:
    """Reflect coordinates into [lo, hi] (torch 'reflection' semantics)."""
    span = hi - lo
    x = jnp.abs(x - lo)
    x = jnp.mod(x, 2.0 * span)
    return hi - jnp.abs(x - span)


def _gather_hw(img_flat: jax.Array, idx: jax.Array) -> jax.Array:
    """img_flat: (B, C, H*W); idx: (B, N) int32 → (B, C, N)."""
    B, C, _ = img_flat.shape
    idxb = jnp.broadcast_to(idx[:, None, :], (B, C, idx.shape[-1]))
    return jnp.take_along_axis(img_flat, idxb, axis=2)


def _cubic_weights(t: jax.Array, a: float = -0.75):
    """Keys cubic convolution weights (a=-0.75, torch convention) for the
    4 taps at distances (1+t, t, 1-t, 2-t) from the sample point."""

    def w1(x):  # |x| <= 1
        return ((a + 2.0) * x - (a + 3.0)) * x * x + 1.0

    def w2(x):  # 1 < |x| < 2
        return (((x - 5.0) * x + 8.0) * x - 4.0) * a

    return w2(1.0 + t), w1(t), w1(1.0 - t), w2(2.0 - t)


def grid_sample(
    image: jax.Array,
    grid: jax.Array,
    mode: str = "bilinear",
    padding_mode: str = "zeros",
    align_corners: bool = False,
) -> jax.Array:
    """Sample (B, C, H, W) at normalized grid (B, Ho, Wo, 2) of (x, y).

    Semantics match ``torch.nn.functional.grid_sample``. This is the
    framework's canonical gather kernel (SURVEY.md §3.4).
    """
    image = as_float(image)
    check(image.ndim == 4, f"grid_sample expects (B,C,H,W), got {image.shape}")
    check(grid.ndim == 4 and grid.shape[-1] == 2,
          f"grid must be (B,Ho,Wo,2), got {grid.shape}")
    B, C, H, W = image.shape
    Ho, Wo = grid.shape[1:3]
    dtype = image.dtype
    gx = _unnormalize(grid[..., 0].astype(dtype), W, align_corners)
    gy = _unnormalize(grid[..., 1].astype(dtype), H, align_corners)

    def reflect_coord(c, size):
        if align_corners:
            return _reflect(c, 0.0, size - 1)
        return jnp.clip(_reflect(c, -0.5, size - 0.5), 0, size - 1)

    # bilinear/nearest reflect the continuous coordinate (torch semantics);
    # bicubic keeps the raw coordinate for the weights and reflects each
    # integer tap index individually.
    if padding_mode == "reflection" and mode != "bicubic":
        gx = reflect_coord(gx, W)
        gy = reflect_coord(gy, H)

    img_flat = image.reshape(B, C, H * W)

    def tap(iy, ix):
        """Gather at integer (iy, ix) with out-of-bounds handling."""
        if padding_mode == "reflection" and mode == "bicubic":
            ix = jnp.round(reflect_coord(ix.astype(dtype), W)).astype(jnp.int32)
            iy = jnp.round(reflect_coord(iy.astype(dtype), H)).astype(jnp.int32)
        if padding_mode == "zeros":
            valid = (ix >= 0) & (ix < W) & (iy >= 0) & (iy < H)
            ixc = jnp.clip(ix, 0, W - 1)
            iyc = jnp.clip(iy, 0, H - 1)
            v = _gather_hw(img_flat, (iyc * W + ixc).reshape(B, -1))
            v = v.reshape(B, C, Ho, Wo)
            return v * valid[:, None].astype(dtype)
        ixc = jnp.clip(ix, 0, W - 1)
        iyc = jnp.clip(iy, 0, H - 1)
        v = _gather_hw(img_flat, (iyc * W + ixc).reshape(B, -1))
        return v.reshape(B, C, Ho, Wo)

    if mode == "nearest":
        ix = jnp.round(gx).astype(jnp.int32)
        iy = jnp.round(gy).astype(jnp.int32)
        return tap(iy, ix)

    if mode == "bilinear":
        x0 = jnp.floor(gx)
        y0 = jnp.floor(gy)
        wx = (gx - x0)[:, None]
        wy = (gy - y0)[:, None]
        x0i = x0.astype(jnp.int32)
        y0i = y0.astype(jnp.int32)
        v00 = tap(y0i, x0i)
        v01 = tap(y0i, x0i + 1)
        v10 = tap(y0i + 1, x0i)
        v11 = tap(y0i + 1, x0i + 1)
        top = v00 * (1 - wx) + v01 * wx
        bot = v10 * (1 - wx) + v11 * wx
        return top * (1 - wy) + bot * wy

    if mode == "bicubic":
        x0 = jnp.floor(gx)
        y0 = jnp.floor(gy)
        tx = (gx - x0)[:, None]
        ty = (gy - y0)[:, None]
        wx = _cubic_weights(tx)
        wy = _cubic_weights(ty)
        x0i = x0.astype(jnp.int32)
        y0i = y0.astype(jnp.int32)
        out = jnp.zeros((B, C, Ho, Wo), dtype=dtype)
        for j in range(4):
            row = jnp.zeros((B, C, Ho, Wo), dtype=dtype)
            for i in range(4):
                row = row + wx[i] * tap(y0i + j - 1, x0i + i - 1)
            out = out + wy[j] * row
        return out

    raise ValueError(f"unknown interpolation mode: {mode}")


def remap(
    image: jax.Array,
    map_x: jax.Array,
    map_y: jax.Array,
    mode: str = "bilinear",
    padding_mode: str = "zeros",
    align_corners: bool = True,
    normalized_coordinates: bool = False,
) -> jax.Array:
    """Sample at explicit per-pixel (x, y) maps
    (reference: imgwarp.py:581)."""
    image = as_float(image)
    if map_x.ndim == 2:
        map_x = map_x[None]
        map_y = map_y[None]
    H, W = image.shape[-2:]
    if not normalized_coordinates:
        map_x = 2.0 * map_x / max(W - 1, 1) - 1.0
        map_y = 2.0 * map_y / max(H - 1, 1) - 1.0
    grid = jnp.stack([map_x, map_y], axis=-1)
    if grid.shape[0] != image.shape[0]:
        grid = jnp.broadcast_to(grid, (image.shape[0], *grid.shape[1:]))
    return grid_sample(image, grid, mode, padding_mode, align_corners)


# -----------------------------------------------------------------------------
# Homography normalization and dense warps
# -----------------------------------------------------------------------------

def normal_transform_pixel(height: int, width: int, dtype=jnp.float32) -> jax.Array:
    """3x3 matrix: pixel coords → [-1, 1] NDC (reference: conversions.py
    normal_transform_pixel)."""
    tr = jnp.array(
        [[2.0 / max(width - 1, 1), 0.0, -1.0],
         [0.0, 2.0 / max(height - 1, 1), -1.0],
         [0.0, 0.0, 1.0]],
        dtype=dtype,
    )
    return tr[None]


def normalize_homography(
    H_pix: jax.Array, dsize_src: Tuple[int, int], dsize_dst: Tuple[int, int]
) -> jax.Array:
    """Pixel-space homography → NDC-space (reference: conversions.py:1063)."""
    check_shape(H_pix, ["*", "3", "3"], "homography")
    hs, ws = dsize_src
    hd, wd = dsize_dst
    src_norm = normal_transform_pixel(hs, ws, H_pix.dtype)
    dst_norm = normal_transform_pixel(hd, wd, H_pix.dtype)
    return dst_norm @ H_pix @ inverse_3x3(src_norm)


def denormalize_homography(
    H_norm: jax.Array, dsize_src: Tuple[int, int], dsize_dst: Tuple[int, int]
) -> jax.Array:
    hs, ws = dsize_src
    hd, wd = dsize_dst
    src_norm = normal_transform_pixel(hs, ws, H_norm.dtype)
    dst_norm = normal_transform_pixel(hd, wd, H_norm.dtype)
    return inverse_3x3(dst_norm) @ H_norm @ src_norm


def transform_points(trans: jax.Array, points: jax.Array) -> jax.Array:
    """Apply (..., D+1, D+1) homogeneous transform to (..., N, D) points
    (reference: geometry/linalg.py:183)."""
    d = points.shape[-1]
    ph = jnp.concatenate([points, jnp.ones_like(points[..., :1])], axis=-1)
    out = jnp.einsum("...ij,...nj->...ni", trans, ph)
    return out[..., :d] / (out[..., d:] + jnp.where(out[..., d:] >= 0, 1e-8, -1e-8))


def warp_grid(M_norm: jax.Array, dsize: Tuple[int, int], dtype=jnp.float32) -> jax.Array:
    """Build the sampling grid for a normalized homography (src←dst)."""
    h, w = dsize
    grid = create_meshgrid(h, w, True, dtype)  # (1, H, W, 2)
    B = M_norm.shape[0]
    pts = grid.reshape(1, -1, 2)
    pts = jnp.broadcast_to(pts, (B, h * w, 2))
    warped = transform_points(M_norm, pts)
    return warped.reshape(B, h, w, 2)


def warp_perspective(
    image: jax.Array,
    M: jax.Array,
    dsize: Tuple[int, int],
    mode: str = "bilinear",
    padding_mode: str = "zeros",
    align_corners: bool = True,
    fill_value: Optional[jax.Array] = None,
) -> jax.Array:
    """Warp by a 3x3 homography, dst = warp(src, M) with M: src→dst
    (reference: imgwarp.py:69)."""
    image = as_float(image)
    check_shape(image, ["B", "C", "H", "W"], "image")
    check_shape(M, ["B", "3", "3"], "M")
    if M.shape[0] == 1 and image.shape[0] > 1:
        M = jnp.broadcast_to(M, (image.shape[0], 3, 3))
    h_src, w_src = image.shape[-2:]
    M_norm = normalize_homography(M.astype(image.dtype), (h_src, w_src), dsize)
    M_inv = inverse_3x3(M_norm)
    grid = warp_grid(M_inv, dsize, image.dtype)
    if fill_value is not None:
        # warp a constant-1 mask alongside and composite fill color
        out = grid_sample(image, grid, mode, "zeros", align_corners)
        mask = grid_sample(jnp.ones_like(image[:, :1]), grid, mode, "zeros",
                           align_corners)
        fill = jnp.asarray(fill_value, dtype=image.dtype).reshape(1, -1, 1, 1)
        return out + (1.0 - mask) * fill
    return grid_sample(image, grid, mode, padding_mode, align_corners)


def _affine_to_homography(A: jax.Array) -> jax.Array:
    """(B, 2, 3) → (B, 3, 3)."""
    B = A.shape[0]
    bottom = jnp.broadcast_to(
        jnp.array([[[0.0, 0.0, 1.0]]], dtype=A.dtype), (B, 1, 3)
    )
    return jnp.concatenate([A, bottom], axis=1)


def warp_affine(
    image: jax.Array,
    M: jax.Array,
    dsize: Tuple[int, int],
    mode: str = "bilinear",
    padding_mode: str = "zeros",
    align_corners: bool = True,
    fill_value: Optional[jax.Array] = None,
) -> jax.Array:
    """Warp by a 2x3 affine matrix (reference: imgwarp.py:169)."""
    check_shape(M, ["B", "2", "3"], "M")
    return warp_perspective(
        image, _affine_to_homography(M.astype(jnp.float32)), dsize, mode,
        padding_mode, align_corners, fill_value,
    )


def homography_warp(
    image: jax.Array,
    H_norm: jax.Array,
    dsize: Tuple[int, int],
    mode: str = "bilinear",
    padding_mode: str = "zeros",
    align_corners: bool = False,
    normalized_homography: bool = True,
) -> jax.Array:
    """Warp with an NDC-space homography (reference: imgwarp.py:1368)."""
    if not normalized_homography:
        return warp_perspective(image, H_norm, dsize, mode, padding_mode, True)
    grid = warp_grid(inverse_3x3(H_norm.astype(jnp.float32)), dsize)
    return grid_sample(image, grid, mode, padding_mode, align_corners)


# -----------------------------------------------------------------------------
# Transform-matrix factories
# -----------------------------------------------------------------------------

def get_perspective_transform(src: jax.Array, dst: jax.Array) -> jax.Array:
    """3x3 homography mapping 4 src points to 4 dst points, batched.

    Closed-form 8x8 solve (reference: imgwarp.py:431, closed form at :410);
    on TPU we build the standard DLT system and use a conditioned f32 solve.
    """
    check_shape(src, ["B", "4", "2"], "src")
    check_shape(dst, ["B", "4", "2"], "dst")
    src = as_float(src)
    dst = as_float(dst)
    B = src.shape[0]
    x, y = src[..., 0], src[..., 1]
    u, v = dst[..., 0], dst[..., 1]
    zeros = jnp.zeros_like(x)
    ones = jnp.ones_like(x)
    ax = jnp.stack([x, y, ones, zeros, zeros, zeros, -u * x, -u * y], axis=-1)
    ay = jnp.stack([zeros, zeros, zeros, x, y, ones, -v * x, -v * y], axis=-1)
    A = jnp.concatenate([ax, ay], axis=1)  # (B, 8, 8)
    b = jnp.concatenate([u, v], axis=1)[..., None]  # (B, 8, 1)
    from ..core.linalg import solve_refined
    h = solve_refined(A, b)[..., 0]
    H = jnp.concatenate([h, jnp.ones((B, 1), dtype=h.dtype)], axis=-1)
    return H.reshape(B, 3, 3)


def get_rotation_matrix2d(center: jax.Array, angle: jax.Array,
                          scale: jax.Array) -> jax.Array:
    """(B, 2, 3) rotation-with-center matrix, angle in degrees CCW
    (reference: imgwarp.py:490). scale (B, 2) = (sx, sy):
    A = R(θ) · diag(sx, sy), t = c − A·c (exact reference composition)."""
    center = as_float(center)
    angle = as_float(angle)
    scale = as_float(scale)
    rad = jnp.deg2rad(angle)
    c = jnp.cos(rad)
    s = jnp.sin(rad)
    sx, sy = scale[..., 0], scale[..., 1]
    a00 = c * sx
    a01 = s * sy
    a10 = -s * sx
    a11 = c * sy
    cx, cy = center[..., 0], center[..., 1]
    tx = cx - (a00 * cx + a01 * cy)
    ty = cy - (a10 * cx + a11 * cy)
    row0 = jnp.stack([a00, a01, tx], axis=-1)
    row1 = jnp.stack([a10, a11, ty], axis=-1)
    return jnp.stack([row0, row1], axis=-2)


def get_translation_matrix2d(translation: jax.Array) -> jax.Array:
    """(B, 2) → (B, 3, 3)."""
    translation = as_float(translation)
    B = translation.shape[0]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=translation.dtype), (B, 3, 3))
    return eye.at[:, :2, 2].set(translation)


def get_shear_matrix2d(center: jax.Array, sx: Optional[jax.Array] = None,
                       sy: Optional[jax.Array] = None) -> jax.Array:
    """(B, 3, 3) shear about a center (reference: imgwarp.py get_shear_matrix2d)."""
    center = as_float(center)
    B = center.shape[0]
    sx = jnp.zeros(B, center.dtype) if sx is None else as_float(sx)
    sy = jnp.zeros(B, center.dtype) if sy is None else as_float(sy)
    tanx = jnp.tan(sx)
    tany = jnp.tan(sy)
    cx, cy = center[..., 0], center[..., 1]
    ones = jnp.ones_like(cx)
    zeros = jnp.zeros_like(cx)
    # shear matrix with recentering (matches reference composition)
    m00 = ones
    m01 = tanx
    m02 = -tanx * cy
    m10 = tany
    m11 = tanx * tany + ones
    m12 = -tany * cx - tanx * tany * cy
    row0 = jnp.stack([m00, m01, m02 + cx - cx], axis=-1)
    row1 = jnp.stack([m10, m11, m12], axis=-1)
    row2 = jnp.stack([zeros, zeros, ones], axis=-1)
    M = jnp.stack([row0, row1, row2], axis=-2)
    # recenter: T(c) S T(-c)
    T = get_translation_matrix2d(center)
    Tn = get_translation_matrix2d(-center)
    S = jnp.stack(
        [jnp.stack([ones, tanx, zeros], -1),
         jnp.stack([tany, tanx * tany + ones, zeros], -1),
         jnp.stack([zeros, zeros, ones], -1)], axis=-2)
    return T @ S @ Tn


def get_affine_matrix2d(
    translations: jax.Array, center: jax.Array, scale: jax.Array,
    angle: jax.Array, sx: Optional[jax.Array] = None,
    sy: Optional[jax.Array] = None,
) -> jax.Array:
    """Compose T·Shear·R_center·S into a (B, 3, 3) affine
    (reference: imgwarp.py:692)."""
    A = get_rotation_matrix2d(center, angle, scale)
    H = _affine_to_homography(A)
    H = get_translation_matrix2d(translations) @ H
    if sx is not None or sy is not None:
        H = H @ get_shear_matrix2d(center, sx, sy)
    return H


def invert_affine_transform(M: jax.Array) -> jax.Array:
    """(B, 2, 3) inverse affine (reference: imgwarp.py invert_affine_transform)."""
    return inverse_3x3(_affine_to_homography(as_float(M)))[:, :2, :]


# -----------------------------------------------------------------------------
# Crops and resize
# -----------------------------------------------------------------------------

def crop_by_boxes(image: jax.Array, src_box: jax.Array, dst_box: jax.Array,
                  mode: str = "bilinear", align_corners: bool = True) -> jax.Array:
    """Crop via perspective transform between two quads
    (reference: transform/crop2d.py crop_by_boxes)."""
    M = get_perspective_transform(src_box, dst_box)
    h = int(round(float(dst_box[0, 2, 1])) ) + 1
    w = int(round(float(dst_box[0, 2, 0]))) + 1
    return warp_perspective(image, M, (h, w), mode, align_corners=align_corners)


def crop_and_resize(image: jax.Array, boxes: jax.Array, size: Tuple[int, int],
                    mode: str = "bilinear", align_corners: bool = True) -> jax.Array:
    """boxes: (B, 4, 2) corner quads (x, y), order TL,TR,BR,BL
    (reference: crop2d.py crop_and_resize)."""
    h, w = size
    dst = jnp.array(
        [[0.0, 0.0], [w - 1.0, 0.0], [w - 1.0, h - 1.0], [0.0, h - 1.0]],
        dtype=jnp.float32,
    )
    dst = jnp.broadcast_to(dst, (boxes.shape[0], 4, 2))
    M = get_perspective_transform(as_float(boxes), dst)
    return warp_perspective(image, M, size, mode, align_corners=align_corners)


def crop_by_indices(image: jax.Array, top: int, left: int,
                    size: Tuple[int, int]) -> jax.Array:
    return lax.dynamic_slice(
        image, (0, 0, top, left), (*image.shape[:2], *size)
    )


def center_crop(image: jax.Array, size: Tuple[int, int],
                mode: str = "bilinear", align_corners: bool = True) -> jax.Array:
    """(reference: crop2d.py center_crop)."""
    H, W = image.shape[-2:]
    h, w = size
    top = (H - h) // 2
    left = (W - w) // 2
    if top >= 0 and left >= 0:
        return crop_by_indices(image, top, left, size)
    # upsample case: go through crop_and_resize
    cy, cx = (H - 1) / 2.0, (W - 1) / 2.0
    x0, x1 = cx - (w - 1) / 2.0, cx + (w - 1) / 2.0
    y0, y1 = cy - (h - 1) / 2.0, cy + (h - 1) / 2.0
    box = jnp.array([[[x0, y0], [x1, y0], [x1, y1], [x0, y1]]], dtype=jnp.float32)
    box = jnp.broadcast_to(box, (image.shape[0], 4, 2))
    return crop_and_resize(image, box, size, mode, align_corners)


def resize(
    image: jax.Array,
    size: Union[int, Tuple[int, int]],
    interpolation: str = "bilinear",
    align_corners: Optional[bool] = None,
    side: str = "short",
    antialias: bool = False,
) -> jax.Array:
    """Resize with torch/kornia semantics (reference: affwarp.py:551).

    int `size` resizes the `side` ("short"/"long"/"vert"/"horz") preserving
    aspect ratio. Antialias uses jax.image's resize (area-weighted).
    """
    image = as_float(image)
    H, W = image.shape[-2:]
    if isinstance(size, int):
        if side == "short":
            if H < W:
                size = (size, max(1, int(round(W * size / H))))
            else:
                size = (max(1, int(round(H * size / W))), size)
        elif side == "long":
            if H > W:
                size = (size, max(1, int(round(W * size / H))))
            else:
                size = (max(1, int(round(H * size / W))), size)
        elif side == "vert":
            size = (size, W)
        else:
            size = (H, size)
    h, w = size
    if h <= 0 or w <= 0:
        raise ValueError(f"resize target must be positive, got {(h, w)}")
    if (h, w) == (H, W):
        return image
    method = {"bilinear": "bilinear", "nearest": "nearest", "bicubic": "bicubic",
              "area": "bilinear", "linear": "bilinear"}[interpolation]
    if interpolation == "nearest":
        out = jax.image.resize(image, (*image.shape[:-2], h, w), method="nearest")
        return out
    if antialias and (h < H or w < W):
        return jax.image.resize(image, (*image.shape[:-2], h, w), method=method,
                                antialias=True)
    # align_corners grid-sample path for exact torch parity
    ac = bool(align_corners) if align_corners is not None else False
    grid = create_meshgrid(h, w, True, image.dtype)
    grid = jnp.broadcast_to(grid, (image.shape[0], h, w, 2))
    if not ac:
        # convert align_corners=True grid to half-pixel sampling positions
        sx = W / w
        sy = H / h
        xs = (jnp.arange(w, dtype=image.dtype) + 0.5) * sx - 0.5
        ys = (jnp.arange(h, dtype=image.dtype) + 0.5) * sy - 0.5
        gx = 2.0 * xs / max(W - 1, 1) - 1.0
        gy = 2.0 * ys / max(H - 1, 1) - 1.0
        gyy, gxx = jnp.meshgrid(gy, gx, indexing="ij")
        grid = jnp.broadcast_to(jnp.stack([gxx, gyy], -1)[None],
                                (image.shape[0], h, w, 2))
    return grid_sample(image, grid, mode=method, padding_mode="border",
                       align_corners=True)


def rescale(image: jax.Array, factor: Union[float, Tuple[float, float]],
            interpolation: str = "bilinear", antialias: bool = False) -> jax.Array:
    fy, fx = (factor, factor) if isinstance(factor, (int, float)) else factor
    H, W = image.shape[-2:]
    return resize(image, (int(H * fy), int(W * fx)), interpolation,
                  antialias=antialias)


def upscale_double(image: jax.Array) -> jax.Array:
    H, W = image.shape[-2:]
    return resize(image, (2 * H, 2 * W), "bilinear", align_corners=True)


# -----------------------------------------------------------------------------
# High-level affine ops (reference: transform/affwarp.py)
# -----------------------------------------------------------------------------

def affine(image: jax.Array, M: jax.Array, mode: str = "bilinear",
           padding_mode: str = "zeros", align_corners: bool = True) -> jax.Array:
    H, W = image.shape[-2:]
    return warp_affine(image, M, (H, W), mode, padding_mode, align_corners)


def _center_of(image: jax.Array) -> jax.Array:
    B = image.shape[0]
    H, W = image.shape[-2:]
    c = jnp.array([(W - 1) / 2.0, (H - 1) / 2.0], dtype=jnp.float32)
    return jnp.broadcast_to(c, (B, 2))


def rotate(image: jax.Array, angle: jax.Array,
           center: Optional[jax.Array] = None, mode: str = "bilinear",
           padding_mode: str = "zeros", align_corners: bool = True) -> jax.Array:
    image = as_float(image)
    angle = jnp.atleast_1d(as_float(angle))
    if center is None:
        center = _center_of(image)
    scale = jnp.ones((image.shape[0], 2), dtype=image.dtype)
    M = get_rotation_matrix2d(center, angle, scale)
    return affine(image, M, mode, padding_mode, align_corners)


def translate(image: jax.Array, translation: jax.Array, mode: str = "bilinear",
              padding_mode: str = "zeros", align_corners: bool = True) -> jax.Array:
    image = as_float(image)
    M = get_translation_matrix2d(as_float(translation))[:, :2, :]
    return affine(image, M, mode, padding_mode, align_corners)


def scale(image: jax.Array, scale_factor: jax.Array,
          center: Optional[jax.Array] = None, mode: str = "bilinear",
          padding_mode: str = "zeros", align_corners: bool = True) -> jax.Array:
    image = as_float(image)
    scale_factor = as_float(scale_factor)
    if scale_factor.ndim == 1:
        scale_factor = jnp.stack([scale_factor, scale_factor], axis=-1)
    if center is None:
        center = _center_of(image)
    angle = jnp.zeros(image.shape[0], dtype=image.dtype)
    M = get_rotation_matrix2d(center, angle, scale_factor)
    return affine(image, M, mode, padding_mode, align_corners)


def shear(image: jax.Array, shear_factor: jax.Array, mode: str = "bilinear",
          padding_mode: str = "zeros", align_corners: bool = True) -> jax.Array:
    image = as_float(image)
    shear_factor = as_float(shear_factor)
    center = _center_of(image)
    M = get_shear_matrix2d(center, shear_factor[..., 0], shear_factor[..., 1])
    return affine(image, M[:, :2, :], mode, padding_mode, align_corners)


# -----------------------------------------------------------------------------
# Elastic and TPS
# -----------------------------------------------------------------------------

def elastic_transform2d(
    image: jax.Array,
    noise: jax.Array,
    kernel_size: Tuple[int, int] = (63, 63),
    sigma: Tuple[float, float] = (32.0, 32.0),
    alpha: Tuple[float, float] = (1.0, 1.0),
    align_corners: bool = False,
    mode: str = "bilinear",
    padding_mode: str = "zeros",
) -> jax.Array:
    """Elastic deformation driven by smoothed noise (B, 2, H, W)
    (reference: elastic_transform.py; separable smoothing — the reference's
    1000x perf fix, benchmarks/augmentation/per_op.py:20-23)."""
    from .filters import gaussian_blur2d
    image = as_float(image)
    B, C, H, W = image.shape
    # reference smooths with CONSTANT (zero) border and clamps the warped
    # grid to [-1, 1] (elastic_transform.py:110-120; caught by the
    # round-4 parity sweep)
    disp = gaussian_blur2d(noise, kernel_size, sigma,
                           border_type="constant")
    disp_x = alpha[0] * disp[:, 0]
    disp_y = alpha[1] * disp[:, 1]
    grid = create_meshgrid(H, W, True, image.dtype)
    grid = jnp.broadcast_to(grid, (B, H, W, 2))
    warped = jnp.clip(
        jnp.stack([grid[..., 0] + disp_x, grid[..., 1] + disp_y], axis=-1),
        -1.0, 1.0)
    return grid_sample(image, warped, mode, padding_mode, align_corners)


def _tps_rbf(d2: jax.Array, eps: float = 1e-8) -> jax.Array:
    """U(r) = r^2 log r = 0.5 r^2 log(r^2 + eps) — the reference's
    `_kernel_distance` (thin_plate_spline.py:45; the 0.5 factor and the
    eps-inside-log must match for WEIGHT-level parity, caught by the
    round-4 parity sweep)."""
    return 0.5 * d2 * jnp.log(d2 + eps)


def get_tps_transform(points_src: jax.Array, points_dst: jax.Array
                      ) -> Tuple[jax.Array, jax.Array]:
    """Thin-plate-spline coefficients mapping dst→src control points
    (reference: thin_plate_spline.py get_tps_transform). The kernel
    matrix pairs SRC against DST (the dst points are the kernel centers
    downstream — reference line 98)."""
    points_src = as_float(points_src)
    points_dst = as_float(points_dst)
    B, N, _ = points_src.shape
    d2 = jnp.sum(
        (points_src[:, :, None, :] - points_dst[:, None, :, :]) ** 2, axis=-1
    )
    K = _tps_rbf(d2)
    P = jnp.concatenate([jnp.ones((B, N, 1), points_src.dtype), points_src], axis=-1)
    zeros = jnp.zeros((B, 3, 3), points_src.dtype)
    top = jnp.concatenate([K, P], axis=-1)
    bot = jnp.concatenate([jnp.swapaxes(P, -1, -2), zeros], axis=-1)
    L = jnp.concatenate([top, bot], axis=-2)  # (B, N+3, N+3)
    Y = jnp.concatenate(
        [points_dst, jnp.zeros((B, 3, 2), points_src.dtype)], axis=-2
    )
    from ..core.linalg import solve_refined
    params = solve_refined(L, Y)
    return params[:, :N, :], params[:, N:, :]  # kernel weights, affine weights


def warp_points_tps(points: jax.Array, control_points: jax.Array,
                    kernel_weights: jax.Array, affine_weights: jax.Array) -> jax.Array:
    """Apply TPS to points (reference: thin_plate_spline.py warp_points_tps)."""
    d2 = jnp.sum((points[:, :, None, :] - control_points[:, None, :, :]) ** 2, -1)
    U = _tps_rbf(d2)
    warped = (
        affine_weights[:, None, 0, :]
        + jnp.einsum("bnd,bdk->bnk", points, affine_weights[:, 1:, :])
        + jnp.einsum("bnm,bmk->bnk", U, kernel_weights)
    )
    return warped


def warp_image_tps(image: jax.Array, kernel_centers: jax.Array,
                   kernel_weights: jax.Array, affine_weights: jax.Array,
                   align_corners: bool = False) -> jax.Array:
    """(reference: thin_plate_spline.py warp_image_tps). Kernel centers and
    weights describe the dst→src mapping in normalized coords [-1,1]."""
    image = as_float(image)
    B, C, H, W = image.shape
    grid = create_meshgrid(H, W, True, image.dtype)
    pts = jnp.broadcast_to(grid.reshape(1, -1, 2), (B, H * W, 2))
    src_pts = warp_points_tps(pts, kernel_centers, kernel_weights, affine_weights)
    return grid_sample(image, src_pts.reshape(B, H, W, 2), "bilinear", "zeros",
                       align_corners)


# -----------------------------------------------------------------------------
# Flips
# -----------------------------------------------------------------------------

class HomographyWarper:
    """Cached-grid homography warper (reference:
    geometry/transform/homography_warper.py:173): precomputes the
    destination meshgrid once; each call only transforms + samples."""

    def __init__(self, height: int, width: int, mode: str = "bilinear",
                 padding_mode: str = "zeros",
                 normalized_coordinates: bool = True):
        self.height = height
        self.width = width
        self.mode = mode
        self.padding_mode = padding_mode
        self.normalized_coordinates = normalized_coordinates
        self.grid = create_meshgrid(height, width, normalized_coordinates)
        self._warped_grid: Optional[jax.Array] = None

    def precompute_warp_grid(self, src_homo_dst: jax.Array) -> None:
        self._warped_grid = self.warp_grid(src_homo_dst)

    def warp_grid(self, src_homo_dst: jax.Array) -> jax.Array:
        B = src_homo_dst.shape[0]
        pts = jnp.broadcast_to(
            self.grid.reshape(1, -1, 2), (B, self.height * self.width, 2))
        warped = transform_points(src_homo_dst, pts)
        return warped.reshape(B, self.height, self.width, 2)

    def __call__(self, patch_src: jax.Array,
                 src_homo_dst: Optional[jax.Array] = None) -> jax.Array:
        if src_homo_dst is not None:
            grid = self.warp_grid(src_homo_dst)
        else:
            assert self._warped_grid is not None, \
                "call precompute_warp_grid or pass src_homo_dst"
            grid = self._warped_grid
        return grid_sample(patch_src, grid, self.mode, self.padding_mode,
                           align_corners=True)


def hflip(image: jax.Array) -> jax.Array:
    return jnp.flip(image, axis=-1)


def vflip(image: jax.Array) -> jax.Array:
    return jnp.flip(image, axis=-2)


def rot180(image: jax.Array) -> jax.Array:
    return jnp.flip(image, axis=(-2, -1))


def crop_by_transform_mat(image: jax.Array, transform: jax.Array,
                          out_size: Tuple[int, int], mode: str = "bilinear",
                          padding_mode: str = "zeros",
                          align_corners: bool = True) -> jax.Array:
    """warp_affine with a (B, 3, 3) crop transform (reference:
    crop2d.py:274)."""
    image = as_float(image)
    M = jnp.broadcast_to(as_float(transform),
                         (image.shape[0], 3, 3)).astype(image.dtype)
    return warp_affine(image, M[:, :2, :], out_size, mode, padding_mode,
                       align_corners)


def resize_to_be_divisible(image: jax.Array, divisible_factor: int,
                           interpolation: str = "bilinear",
                           align_corners: Optional[bool] = None,
                           side: str = "short",
                           antialias: bool = False) -> jax.Array:
    """Resize so H and W are multiples of `divisible_factor`
    (reference: affwarp.py:636)."""
    H, W = image.shape[-2:]
    h = round(H / divisible_factor) * divisible_factor
    w = round(W / divisible_factor) * divisible_factor
    return resize(image, (h, w), interpolation, align_corners, side,
                  antialias)


__all__ += ["crop_by_transform_mat", "resize_to_be_divisible"]


class BaseWarper:
    """Warper interface (reference: homography_warper.py:34 BaseWarper)."""

    def __init__(self, height: int, width: int):
        self.height = height
        self.width = width

    def __call__(self, patch_src, src_homo_dst):
        raise NotImplementedError

    forward = __call__


__all__ += ["BaseWarper"]
