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
    M_norm = dst_norm[None] @ M.astype(src.dtype) @ jnp.linalg.inv(src_norm)[None]
    M_inv = jnp.linalg.inv(M_norm)
    grid = create_meshgrid3d(Do, Ho, Wo, True, src.dtype)  # (1, Do, Ho, Wo, 3)
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
    M = jnp.linalg.solve(AtA + 1e-8 * jnp.eye(4), Atb)  # (B, 4, 3)
    M44 = jnp.concatenate(
        [jnp.swapaxes(M, -1, -2),
         jnp.broadcast_to(jnp.array([[[0.0, 0, 0, 1.0]]]), (B, 1, 4))], axis=1)
    # warp_perspective3d expects src→dst; we built dst→src, so invert
    return warp_perspective3d(src, jnp.linalg.inv(M44), dsize)


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
