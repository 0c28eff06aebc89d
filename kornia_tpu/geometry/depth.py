"""Depth-map geometry (reference: kornia/geometry/depth.py, 617 LoC)."""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.check import check, check_shape
from ..core.dtype import as_float
from ..core.grid import create_meshgrid
from .camera import cam2pixel, pixel2cam
from .linalg import inverse_transformation

__all__ = [
    "depth_to_3d",
    "depth_to_3d_v2",
    "depth_to_normals",
    "depth_from_disparity",
    "depth_from_plane_equation",
    "warp_frame_depth",
    "unproject_meshgrid",
]


def unproject_meshgrid(height: int, width: int, camera_matrix: jax.Array
                       ) -> jax.Array:
    """(H, W, 3) rays on the z=1 plane for every pixel."""
    grid = create_meshgrid(height, width, False, camera_matrix.dtype)[0]
    fx = camera_matrix[..., 0, 0]
    fy = camera_matrix[..., 1, 1]
    cx = camera_matrix[..., 0, 2]
    cy = camera_matrix[..., 1, 2]
    x = (grid[..., 0] - cx[..., None, None]) / fx[..., None, None]
    y = (grid[..., 1] - cy[..., None, None]) / fy[..., None, None]
    return jnp.stack([x, y, jnp.ones_like(x)], axis=-1)


def depth_to_3d(depth: jax.Array, camera_matrix: jax.Array,
                normalize_points: bool = False) -> jax.Array:
    """(B, 1, H, W) depth → (B, 3, H, W) camera-frame points
    (reference: depth.py:100)."""
    check_shape(depth, ["B", "1", "H", "W"], "depth")
    depth = as_float(depth)
    B, _, H, W = depth.shape
    rays = unproject_meshgrid(H, W, camera_matrix)  # (B?, H, W, 3)
    if rays.ndim == 3:
        rays = rays[None]
    if normalize_points:
        rays = rays / jnp.linalg.norm(rays, axis=-1, keepdims=True)
    pts = rays * depth[:, 0, :, :, None]
    return jnp.moveaxis(pts, -1, 1)


def depth_to_3d_v2(depth: jax.Array, camera_matrix: jax.Array,
                   normalize_points: bool = False) -> jax.Array:
    """(..., H, W) depth → (..., H, W, 3) (reference: depth.py:148)."""
    depth = as_float(depth)
    H, W = depth.shape[-2:]
    rays = unproject_meshgrid(H, W, camera_matrix)
    if normalize_points:
        rays = rays / jnp.linalg.norm(rays, axis=-1, keepdims=True)
    return rays * depth[..., None]


def depth_to_normals(depth: jax.Array, camera_matrix: jax.Array,
                     normalize_points: bool = False) -> jax.Array:
    """Surface normals from depth via gradient cross products
    (reference: depth.py:195)."""
    pts = depth_to_3d(depth, camera_matrix, normalize_points)  # (B, 3, H, W)
    # reference differentiates the pointcloud with SOBEL spatial_gradient
    # (depth.py:229), not central differences — the smoothing changes the
    # normals everywhere (caught by the round-4 parity sweep)
    from ..ops.filters import spatial_gradient
    g = spatial_gradient(pts)  # (B, 3, 2, H, W)
    a = jnp.moveaxis(g[:, :, 0], 1, -1)  # (B, H, W, 3) d/dx
    b = jnp.moveaxis(g[:, :, 1], 1, -1)  # d/dy
    normals = jnp.cross(a, b)
    n = jnp.linalg.norm(normals, axis=-1, keepdims=True)
    normals = normals / jnp.maximum(n, 1e-8)
    return jnp.moveaxis(normals, -1, 1)


def depth_from_disparity(disparity: jax.Array, baseline, focal) -> jax.Array:
    """(reference: depth.py:579)."""
    disparity = as_float(disparity)
    baseline = jnp.asarray(baseline, disparity.dtype)
    focal = jnp.asarray(focal, disparity.dtype)
    return baseline * focal / jnp.where(jnp.abs(disparity) > 1e-8, disparity, 1e-8)


def depth_from_plane_equation(plane_normals: jax.Array,
                              plane_offsets: jax.Array,
                              points_uv: jax.Array,
                              camera_matrix: jax.Array,
                              eps: float = 1e-8) -> jax.Array:
    """Depth of pixels under a plane hypothesis (reference: depth.py:235).
    plane_normals (B, 3), plane_offsets (B, 1), points_uv (B, N, 2)."""
    fx = camera_matrix[..., 0, 0][..., None]
    fy = camera_matrix[..., 1, 1][..., None]
    cx = camera_matrix[..., 0, 2][..., None]
    cy = camera_matrix[..., 1, 2][..., None]
    x = (points_uv[..., 0] - cx) / fx
    y = (points_uv[..., 1] - cy) / fy
    denom = (plane_normals[..., 0:1] * x + plane_normals[..., 1:2] * y
             + plane_normals[..., 2:3])
    return plane_offsets / jnp.where(jnp.abs(denom) > eps, denom, eps)


def warp_frame_depth(image_src: jax.Array, depth_dst: jax.Array,
                     src_trans_dst: jax.Array, camera_matrix: jax.Array,
                     normalize_points: bool = False) -> jax.Array:
    """Warp src into the dst frame using dst depth + relative pose
    (reference: depth.py:279). The epipolar view-synthesis primitive."""
    check_shape(image_src, ["B", "C", "H", "W"], "image_src")
    image_src = as_float(image_src)
    B, C, H, W = image_src.shape
    pts_dst = depth_to_3d(depth_dst, camera_matrix, normalize_points)  # (B,3,H,W)
    pts = jnp.moveaxis(pts_dst, 1, -1).reshape(B, -1, 3)
    R = src_trans_dst[..., :3, :3]
    t = src_trans_dst[..., :3, 3]
    pts_src = jnp.einsum("bij,bnj->bni", R, pts) + t[:, None, :]
    from .camera import project_points
    uv = project_points(pts_src, camera_matrix[..., None, :, :])
    uv = uv.reshape(B, H, W, 2)
    gx = 2.0 * uv[..., 0] / max(W - 1, 1) - 1.0
    gy = 2.0 * uv[..., 1] / max(H - 1, 1) - 1.0
    grid = jnp.stack([gx, gy], axis=-1)
    from ..ops.warp import grid_sample
    return grid_sample(image_src, grid, "bilinear", "zeros", True)


class DepthWarper:
    """Warp a dst-frame patch into the src frame given src depth
    (reference: depth.py:325 DepthWarper).

    Functional JAX analogue: holds the dst pinhole + output size; after
    :meth:`compute_projection_matrix` the instance is a pure callable
    ``warper(depth_src, patch_dst)`` whose math is fully jittable.
    """

    def __init__(self, pinhole_dst, height: int, width: int,
                 mode: str = "bilinear", padding_mode: str = "zeros",
                 align_corners: bool = True):
        self.height, self.width = height, width
        self.mode, self.padding_mode = mode, padding_mode
        self.align_corners = align_corners
        self.eps = 1e-6
        self._pinhole_dst = pinhole_dst
        self._pinhole_src = None
        self._dst_proj_src = None

    def compute_projection_matrix(self, pinhole_src) -> "DepthWarper":
        """dst_proj_src = K_dst · E_dst · E_src⁻¹ (reference: depth.py:378)."""
        src_E = pinhole_src.extrinsics
        R = src_E[..., :3, :3]
        t = src_E[..., :3, 3:]
        Rinv = jnp.swapaxes(R, -1, -2)
        inv_extr = jnp.broadcast_to(
            jnp.eye(4, dtype=src_E.dtype), src_E.shape)
        inv_extr = inv_extr.at[..., :3, :3].set(Rinv)
        inv_extr = inv_extr.at[..., :3, 3:].set(-Rinv @ t)
        dst_trans_src = self._pinhole_dst.extrinsics @ inv_extr
        self._dst_proj_src = self._pinhole_dst.intrinsics @ dst_trans_src
        self._pinhole_src = pinhole_src
        return self

    def warp_grid(self, depth_src: jax.Array) -> jax.Array:
        """Normalized (B, H, W, 2) sampling grid (reference: depth.py:471)."""
        if self._dst_proj_src is None or self._pinhole_src is None:
            raise ValueError("call compute_projection_matrix first")
        check_shape(depth_src, ["B", "1", "H", "W"], "depth_src")
        from .camera import cam2pixel, pixel2cam
        from ..core.grid import normalize_pixel_coordinates
        from ..ops.warp import create_meshgrid
        B, _, H, W = depth_src.shape
        pix = create_meshgrid(H, W, normalized_coordinates=False,
                              dtype=depth_src.dtype)  # (1, H, W, 2)
        pix = jnp.broadcast_to(pix, (B, H, W, 2))
        cam_src = pixel2cam(depth_src,
                            self._pinhole_src.intrinsics_inverse(), pix)
        pix_src = cam2pixel(cam_src, self._dst_proj_src)
        return normalize_pixel_coordinates(pix_src, self.height, self.width)

    def __call__(self, depth_src: jax.Array, patch_dst: jax.Array) -> jax.Array:
        from ..ops.warp import grid_sample
        return grid_sample(as_float(patch_dst), self.warp_grid(depth_src),
                           self.mode, self.padding_mode, self.align_corners)

    forward = __call__

    def compute_subpixel_step(self) -> jax.Array:
        """Inverse-depth step for sub-pixel accurate depth sweeps
        (Szeliski & Scharstein 2002; reference: depth.py:434)."""
        delta_d = 0.01
        cx, cy = self.width / 2.0, self.height / 2.0
        P = self._dst_proj_src
        pts = jnp.array([[cx, cy, 1.0 - delta_d, 1.0],
                         [cx, cy, 1.0 + delta_d, 1.0]], P.dtype).T[None]
        flow = P @ pts  # (B, 4, 2)
        z = 1.0 / flow[:, 2]
        xy = jnp.stack([flow[:, 0] * z, flow[:, 1] * z], axis=-1)
        dxdd = jnp.linalg.norm(xy[:, 1] - xy[:, 0], axis=-1) / (2.0 * delta_d)
        return jnp.min(0.5 / dxdd)


def depth_warp(pinhole_dst, pinhole_src, depth_src: jax.Array,
               patch_dst: jax.Array, height: int, width: int,
               align_corners: bool = True) -> jax.Array:
    """One-shot :class:`DepthWarper` (reference: depth.py:544)."""
    warper = DepthWarper(pinhole_dst, height, width,
                         align_corners=align_corners)
    warper.compute_projection_matrix(pinhole_src)
    return warper(depth_src, patch_dst)


__all__ += ["DepthWarper", "depth_warp"]
