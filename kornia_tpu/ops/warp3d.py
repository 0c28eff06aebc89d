"""3D volumetric warping (reference: kornia/geometry/transform/imgwarp.py
warp_affine3d:966, warp_perspective3d:1315, homography_warp3d:1445, and
crop3d.py)."""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.check import check, check_shape
from ..core.dtype import as_float
from ..core.grid import create_meshgrid3d

__all__ = [
    "grid_sample3d",
    "warp_affine3d",
    "warp_perspective3d",
    "get_projective_transform",
    "affine3d",
    "rotate3d",
    "crop_by_boxes3d",
    "center_crop3d",
    "crop3d",
]


def grid_sample3d(volume: jax.Array, grid: jax.Array,
                  mode: str = "bilinear", padding_mode: str = "zeros",
                  align_corners: bool = True) -> jax.Array:
    """(B, C, D, H, W) sampled at (B, Do, Ho, Wo, 3) (x, y, z) normalized
    coords. Trilinear via 8 flat gathers."""
    volume = as_float(volume)
    B, C, D, H, W = volume.shape
    Do, Ho, Wo = grid.shape[1:4]
    dtype = volume.dtype

    def unnorm(c, size):
        if align_corners:
            return (c + 1.0) * 0.5 * (size - 1)
        return ((c + 1.0) * size - 1.0) * 0.5

    gx = unnorm(grid[..., 0].astype(dtype), W)
    gy = unnorm(grid[..., 1].astype(dtype), H)
    gz = unnorm(grid[..., 2].astype(dtype), D)
    flat = volume.reshape(B, C, D * H * W)

    def tap(iz, iy, ix):
        valid = ((ix >= 0) & (ix < W) & (iy >= 0) & (iy < H)
                 & (iz >= 0) & (iz < D))
        ixc = jnp.clip(ix, 0, W - 1)
        iyc = jnp.clip(iy, 0, H - 1)
        izc = jnp.clip(iz, 0, D - 1)
        idx = (izc * H + iyc) * W + ixc
        idxb = jnp.broadcast_to(idx.reshape(B, 1, -1), (B, C, idx[0].size))
        v = jnp.take_along_axis(flat, idxb, axis=2).reshape(B, C, Do, Ho, Wo)
        if padding_mode == "zeros":
            return v * valid[:, None].astype(dtype)
        return v

    if mode == "nearest":
        return tap(jnp.round(gz).astype(jnp.int32),
                   jnp.round(gy).astype(jnp.int32),
                   jnp.round(gx).astype(jnp.int32))

    x0 = jnp.floor(gx)
    y0 = jnp.floor(gy)
    z0 = jnp.floor(gz)
    wx = (gx - x0)[:, None]
    wy = (gy - y0)[:, None]
    wz = (gz - z0)[:, None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    z0i = z0.astype(jnp.int32)
    out = jnp.zeros((B, C, Do, Ho, Wo), dtype)
    for dz in (0, 1):
        for dy in (0, 1):
            for dx in (0, 1):
                w = ((wz if dz else 1 - wz) * (wy if dy else 1 - wy)
                     * (wx if dx else 1 - wx))
                out = out + w * tap(z0i + dz, y0i + dy, x0i + dx)
    return out


def get_projective_transform(center: jax.Array, angles: jax.Array,
                             scales: jax.Array) -> jax.Array:
    """3D affine (B, 3, 4) rotating around a center, where ``angles`` (B, 3)
    in DEGREES is interpreted as an axis-angle vector — NOT Euler angles —
    matching the reference exactly (imgwarp.py:1045-1093)."""
    from ..geometry.conversions import axis_angle_to_rotation_matrix
    center = as_float(center)
    angles_rad = jnp.deg2rad(as_float(angles))
    R = axis_angle_to_rotation_matrix(angles_rad)  # (B, 3, 3)
    scales = jnp.asarray(scales, R.dtype)
    if scales.ndim == 1:
        scales = scales[:, None]
    # reference: rmat @ (eye * scales.unsqueeze(1)) — per-column scaling,
    # isotropic for (B, 1), anisotropic diag for (B, 3)
    S = jnp.eye(3, dtype=R.dtype) * scales[:, None, :]
    R = R @ S
    t = center[..., None] - R @ center[..., None]
    return jnp.concatenate([R, t], axis=-1)


def affine3d(tensor: jax.Array, matrix: jax.Array, mode: str = "bilinear",
             padding_mode: str = "zeros",
             align_corners: bool = False) -> jax.Array:
    """Apply a (B, 3, 4) affine to a (B, C, D, H, W) volume, output size
    preserved (reference: affwarp.py:191)."""
    tensor = as_float(tensor)
    D, H, W = tensor.shape[-3:]
    return warp_affine3d(tensor, matrix, (D, H, W), mode, padding_mode,
                         align_corners)


def rotate3d(tensor: jax.Array, yaw: jax.Array, pitch: jax.Array,
             roll: jax.Array, center: Optional[jax.Array] = None,
             mode: str = "bilinear", padding_mode: str = "zeros",
             align_corners: bool = False) -> jax.Array:
    """Rotate a (B, C, D, H, W) volume anti-clockwise about its centre by
    (yaw, pitch, roll) degrees (reference: affwarp.py:312)."""
    tensor = as_float(tensor)
    B = tensor.shape[0]
    D, H, W = tensor.shape[-3:]
    if center is None:
        center = jnp.array([(W - 1) / 2.0, (H - 1) / 2.0, (D - 1) / 2.0],
                           tensor.dtype)
    center = jnp.broadcast_to(jnp.asarray(center, tensor.dtype), (B, 3))
    ypr = jnp.stack([jnp.broadcast_to(jnp.asarray(a, tensor.dtype), (B,))
                     for a in (yaw, pitch, roll)], axis=-1)
    M = get_projective_transform(center, ypr, jnp.ones((B, 1), tensor.dtype))
    return affine3d(tensor, M, mode, padding_mode, align_corners)


def warp_affine3d(src: jax.Array, M: jax.Array,
                  dsize: Tuple[int, int, int], flags: str = "bilinear",
                  padding_mode: str = "zeros",
                  align_corners: bool = True) -> jax.Array:
    """(B, C, D, H, W) with (B, 3, 4) affine (reference: imgwarp.py:966)."""
    src = as_float(src)
    check_shape(M, ["B", "3", "4"], "M")
    B = src.shape[0]
    bottom = jnp.broadcast_to(jnp.array([[[0.0, 0, 0, 1.0]]]), (B, 1, 4))
    M4 = jnp.concatenate([M.astype(src.dtype), bottom], axis=1)
    return warp_perspective3d(src, M4, dsize, flags, padding_mode,
                              align_corners)


def warp_perspective3d(src: jax.Array, M: jax.Array,
                       dsize: Tuple[int, int, int], flags: str = "bilinear",
                       padding_mode: str = "zeros",
                       align_corners: bool = True) -> jax.Array:
    """(B, C, D, H, W) with (B, 4, 4) (reference: imgwarp.py:1315)."""
    src = as_float(src)
    B, C, D, H, W = src.shape
    Do, Ho, Wo = dsize
    # normalize: pixel → NDC for both src and dst
    def norm_mat(d, h, w):
        tr = jnp.eye(4, dtype=src.dtype)
        tr = tr.at[0, 0].set(2.0 / max(w - 1, 1)).at[1, 1].set(
            2.0 / max(h - 1, 1)).at[2, 2].set(2.0 / max(d - 1, 1))
        tr = tr.at[:3, 3].set(-1.0)
        return tr

    src_norm = norm_mat(D, H, W)
    dst_norm = norm_mat(Do, Ho, Wo)
    # matrix algebra in f32 even for bf16 images: inverses/solves are
    # f32 compute (bf16 is a storage dtype; CPU lapack has no bf16 kernel)
    M_norm = (dst_norm[None] @ M.astype(jnp.float32)
              @ jnp.linalg.inv(src_norm.astype(jnp.float32))[None])
    M_inv = jnp.linalg.inv(M_norm).astype(src.dtype)
    grid = create_meshgrid3d(Do, Ho, Wo, True, src.dtype)  # (1, Do, Ho, Wo, 3)
    if not align_corners:
        # torch F.affine_grid(align_corners=False) emits half-pixel-center
        # NDC: linspace(-1, 1, n) * (n - 1) / n per axis (xyz order)
        grid = grid * jnp.asarray([(Wo - 1) / Wo, (Ho - 1) / Ho,
                                   (Do - 1) / Do], src.dtype)
    pts = jnp.broadcast_to(grid.reshape(1, -1, 3), (B, Do * Ho * Wo, 3))
    ph = jnp.concatenate([pts, jnp.ones_like(pts[..., :1])], axis=-1)
    warped = jnp.einsum("bij,bnj->bni", M_inv, ph)
    w_ = warped[..., 3:4]
    warped = warped[..., :3] / jnp.where(jnp.abs(w_) > 1e-8, w_, 1e-8)
    grid_w = warped.reshape(B, Do, Ho, Wo, 3)
    return grid_sample3d(src, grid_w, flags, padding_mode, align_corners)


def crop_by_boxes3d(src: jax.Array, src_box: jax.Array, dst_box: jax.Array,
                    dsize: Tuple[int, int, int]) -> jax.Array:
    """Crop via the affine mapping the src hexahedron to the dst one
    (reference: crop3d.py crop_by_boxes3d). Boxes: (B, 8, 3) vertices."""
    # solve least-squares affine from 8 point correspondences
    src_pts = as_float(src_box)
    dst_pts = as_float(dst_box)
    B = src_pts.shape[0]
    ones = jnp.ones((B, 8, 1), src_pts.dtype)
    A = jnp.concatenate([dst_pts, ones], axis=-1)  # (B, 8, 4) dst→src map
    # M (4, 3): src = A @ M
    AtA = jnp.einsum("bni,bnj->bij", A, A)
    Atb = jnp.einsum("bni,bnk->bik", A, src_pts)
    M = jnp.linalg.solve((AtA + 1e-8 * jnp.eye(4)).astype(jnp.float32),
                         Atb.astype(jnp.float32))  # (B, 4, 3)
    M44 = jnp.concatenate(
        [jnp.swapaxes(M, -1, -2),
         jnp.broadcast_to(jnp.array([[[0.0, 0, 0, 1.0]]]), (B, 1, 4))], axis=1)
    # warp_perspective3d expects src→dst; we built dst→src, so invert
    return warp_perspective3d(
        src, jnp.linalg.inv(M44.astype(jnp.float32)).astype(src.dtype), dsize)


def crop3d(src: jax.Array, start: Tuple[int, int, int],
           size: Tuple[int, int, int]) -> jax.Array:
    """Static slice crop."""
    B, C = src.shape[:2]
    return jax.lax.dynamic_slice(
        src, (0, 0, *start), (B, C, *size))


def center_crop3d(src: jax.Array, size: Tuple[int, int, int]) -> jax.Array:
    """(reference: crop3d.py center_crop3d)."""
    D, H, W = src.shape[-3:]
    d, h, w = size
    return crop3d(src, ((D - d) // 2, (H - h) // 2, (W - w) // 2), size)


# -----------------------------------------------------------------------------
# 3D transform factories / warps completing the reference surface
# (reference: imgwarp.py:331,805,852,1100,1445; crop3d.py:29,351)
# -----------------------------------------------------------------------------

def warp_grid3d(grid: jax.Array, src_homo_dst: jax.Array) -> jax.Array:
    """Transform a (1|B, D, H, W, 3) grid by (B, 4, 4) homographies
    (reference: imgwarp.py:331)."""
    B = src_homo_dst.shape[0]
    D, H, W = grid.shape[-4:-1]
    pts = jnp.broadcast_to(grid.reshape(-1, D * H * W, 3),
                           (B, D * H * W, 3)).astype(src_homo_dst.dtype)
    ph = jnp.concatenate([pts, jnp.ones_like(pts[..., :1])], axis=-1)
    out = jnp.einsum("bij,bnj->bni", src_homo_dst, ph)
    w_ = out[..., 3:4]
    out = out[..., :3] / jnp.where(jnp.abs(w_) > 1e-8, w_, 1e-8)
    return out.reshape(B, D, H, W, 3)


def homography_warp3d(patch_src: jax.Array, src_homo_dst: jax.Array,
                      dsize: Tuple[int, int, int], mode: str = "bilinear",
                      padding_mode: str = "zeros",
                      align_corners: bool = False,
                      normalized_coordinates: bool = True) -> jax.Array:
    """Warp (B, C, D, H, W) by NORMALIZED-coordinate 3D homographies
    (reference: imgwarp.py:1445)."""
    patch_src = as_float(patch_src)
    D, H, W = dsize
    grid = create_meshgrid3d(D, H, W, normalized_coordinates,
                             patch_src.dtype)
    warped = warp_grid3d(grid, src_homo_dst.astype(patch_src.dtype))
    return grid_sample3d(patch_src, warped, mode, padding_mode,
                         align_corners)


def get_perspective_transform3d(src: jax.Array, dst: jax.Array) -> jax.Array:
    """(B, 4, 4) projective transform from 5 of the 8 box-corner
    correspondences — indices (0, 1, 2, 5, 7), matching the reference's
    15x15 linear system exactly (reference: imgwarp.py:1100)."""
    src = as_float(src)
    dst = as_float(dst).astype(src.dtype)
    check(src.shape[-2:] == (8, 3) and src.shape == dst.shape,
          f"expected (B, 8, 3) pairs, got {src.shape} / {dst.shape}")
    B = src.shape[0]
    idx = jnp.array([0, 1, 2, 5, 7])
    s = src[:, idx]  # (B, 5, 3)
    d = dst[:, idx]
    ones = jnp.ones_like(s[..., :1])
    sh = jnp.concatenate([s, ones], axis=-1)  # (B, 5, 4)
    zeros = jnp.zeros_like(sh)

    def rows(axis):
        # [s 1 | 0 | 0 | -s*d_axis] with the (s 1) block at position `axis`
        blocks = [zeros, zeros, zeros]
        blocks[axis] = sh
        return jnp.concatenate(blocks + [-s * d[..., axis:axis + 1]], axis=-1)

    A = jnp.concatenate([rows(0), rows(1), rows(2)], axis=1)  # (B, 15, 15)
    b = jnp.concatenate([d[..., 0], d[..., 1], d[..., 2]], axis=1)[..., None]
    X = jnp.linalg.solve(A, b)[..., 0]  # (B, 15)
    M = jnp.concatenate([X, jnp.ones((B, 1), src.dtype)], axis=-1)
    return M.reshape(B, 4, 4)


def _shear_matrix3d_entries(sxy, sxz, syx, syz, szx, szy):
    """(reference: imgwarp.py:_compute_shear_matrix_3d)."""
    ones = jnp.ones_like(sxy)
    m00, m10, m20 = ones, sxy, sxz
    m01 = syx
    m11 = sxy * syx + ones
    m21 = sxz * syx + syz
    m02 = syx * szy + szx
    m12 = sxy * szx + szy * m11
    m22 = sxz * szx + szy * m21 + ones
    return m00, m10, m20, m01, m11, m21, m02, m12, m22


def get_shear_matrix3d(center: jax.Array, sxy=None, sxz=None, syx=None,
                       syz=None, szx=None, szy=None) -> jax.Array:
    """(B, 4, 4) ordered 3D shear about a center, angles in radians
    (reference: imgwarp.py:852)."""
    center = as_float(center)
    B = center.shape[0]
    z = jnp.zeros((B,), center.dtype)
    vals = [jnp.broadcast_to(jnp.asarray(v, center.dtype), (B,))
            if v is not None else z for v in (sxy, sxz, syx, syz, szx, szy)]
    sxy_t, sxz_t, syx_t, syz_t, szx_t, szy_t = [jnp.tan(v) for v in vals]
    x, y, zc = center[:, 0], center[:, 1], center[:, 2]
    # translation offsets from the POSITIVE-tan entries
    m00, m10, m20, m01, m11, m21, m02, m12, m22 = _shear_matrix3d_entries(
        sxy_t, sxz_t, syx_t, syz_t, szx_t, szy_t)
    m03 = m01 * y + m02 * zc
    m13 = m10 * x + m11 * y + m12 * zc - y
    m23 = m20 * x + m21 * y + m22 * zc - zc
    # linear part from the NEGATIVE-tan entries (reference convention)
    m00, m10, m20, m01, m11, m21, m02, m12, m22 = _shear_matrix3d_entries(
        -sxy_t, -sxz_t, -syx_t, -syz_t, -szx_t, -szy_t)
    rows = jnp.stack([m00, m01, m02, m03,
                      m10, m11, m12, m13,
                      m20, m21, m22, m23], axis=-1).reshape(B, 3, 4)
    bottom = jnp.broadcast_to(
        jnp.array([[[0.0, 0, 0, 1.0]]], center.dtype), (B, 1, 4))
    return jnp.concatenate([rows, bottom], axis=1)


def get_affine_matrix3d(translations: jax.Array, center: jax.Array,
                        scale: jax.Array, angles: jax.Array,
                        sxy=None, sxz=None, syx=None, syz=None,
                        szx=None, szy=None) -> jax.Array:
    """(B, 4, 4) affine from translation/center/scale/axis-angle-degrees
    (+ optional shears) (reference: imgwarp.py:805)."""
    M = get_projective_transform(center, -as_float(angles), scale)  # (B, 3, 4)
    M = M.at[..., 3].add(as_float(translations))
    B = M.shape[0]
    bottom = jnp.broadcast_to(
        jnp.array([[[0.0, 0, 0, 1.0]]], M.dtype), (B, 1, 4))
    M4 = jnp.concatenate([M, bottom], axis=1)
    if any(s is not None for s in (sxy, sxz, syx, syz, szx, szy)):
        M4 = M4 @ get_shear_matrix3d(center, sxy, sxz, syx, syz, szx, szy)
    return M4


def crop_and_resize3d(src: jax.Array, boxes: jax.Array,
                      size: Tuple[int, int, int],
                      interpolation: str = "bilinear",
                      align_corners: bool = False) -> jax.Array:
    """Extract (B, 8, 3)-vertex sub-volumes and resize to `size`
    (reference: crop3d.py:29)."""
    d, h, w = size
    dst = jnp.array(
        [[0, 0, 0], [w - 1, 0, 0], [w - 1, h - 1, 0], [0, h - 1, 0],
         [0, 0, d - 1], [w - 1, 0, d - 1], [w - 1, h - 1, d - 1],
         [0, h - 1, d - 1]], jnp.float32)
    dst = jnp.broadcast_to(dst, (boxes.shape[0], 8, 3))
    return crop_by_boxes3d(src, boxes, dst, size)


def crop_by_transform_mat3d(src: jax.Array, transform: jax.Array,
                            out_size: Tuple[int, int, int],
                            mode: str = "bilinear",
                            padding_mode: str = "zeros",
                            align_corners: bool = True) -> jax.Array:
    """warp_affine3d with a (B, 4, 4) crop transform (reference:
    crop3d.py:351)."""
    return warp_affine3d(src, as_float(transform)[:, :3, :], out_size, mode,
                         padding_mode, align_corners)


__all__ += [
    "warp_grid3d", "homography_warp3d", "get_perspective_transform3d",
    "get_shear_matrix3d", "get_affine_matrix3d", "crop_and_resize3d",
    "crop_by_transform_mat3d",
]
