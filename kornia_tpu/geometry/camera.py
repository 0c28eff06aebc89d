"""Camera models: pinhole, distortion models, projections, stereo
(reference: kornia/geometry/camera/ 2.1k LoC + kornia/sensors/camera/).

``PinholeCamera`` is a pytree dataclass over (intrinsics, extrinsics,
height, width) — batched, jit/vmap/grad-closed, usable as BA state.
Distortion models are pure functions so they can be composed with any
projection model (mirroring the reference's composable
CameraModel = projection x distortion design, sensors/camera/camera_model.py:68).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.check import check_shape
from ..core.dtype import as_float

__all__ = [
    "PinholeCamera",
    "project_points",
    "unproject_points",
    "project_points_z1",
    "unproject_points_z1",
    "project_points_orthographic",
    "unproject_points_orthographic",
    "distort_points_affine",
    "undistort_points_affine",
    "distort_points_kannala_brandt",
    "undistort_points_kannala_brandt",
    "cam2pixel",
    "pixel2cam",
    "StereoCamera",
]


# -----------------------------------------------------------------------------
# Perspective projection (reference: camera/perspective.py:98)
# -----------------------------------------------------------------------------

def project_points(points_3d: jax.Array, camera_matrix: jax.Array) -> jax.Array:
    """(..., 3) x (..., 3, 3) → (..., 2) pixel coords."""
    points_3d = as_float(points_3d)
    z = points_3d[..., 2:3]
    xy = points_3d[..., :2] / jnp.where(jnp.abs(z) > 1e-8, z, 1e-8)
    fx = camera_matrix[..., 0, 0]
    fy = camera_matrix[..., 1, 1]
    cx = camera_matrix[..., 0, 2]
    cy = camera_matrix[..., 1, 2]
    u = xy[..., 0] * fx + cx
    v = xy[..., 1] * fy + cy
    return jnp.stack([u, v], axis=-1)


def unproject_points(points_2d: jax.Array, depth: jax.Array,
                     camera_matrix: jax.Array, normalize: bool = False) -> jax.Array:
    """(..., 2) + depth → (..., 3) (reference: perspective.py unproject)."""
    points_2d = as_float(points_2d)
    depth = as_float(depth)
    fx = camera_matrix[..., 0, 0]
    fy = camera_matrix[..., 1, 1]
    cx = camera_matrix[..., 0, 2]
    cy = camera_matrix[..., 1, 2]
    x = (points_2d[..., 0] - cx) / fx
    y = (points_2d[..., 1] - cy) / fy
    xyz = jnp.stack([x, y, jnp.ones_like(x)], axis=-1)
    if normalize:
        xyz = xyz / jnp.linalg.norm(xyz, axis=-1, keepdims=True)
    if depth.ndim == xyz.ndim - 1:
        depth = depth[..., None]
    return xyz * depth


def project_points_z1(points_3d: jax.Array) -> jax.Array:
    """Perspective divide only (reference: camera/projection_z1.py)."""
    z = points_3d[..., 2:3]
    return points_3d[..., :2] / jnp.where(jnp.abs(z) > 1e-8, z, 1e-8)


def unproject_points_z1(points_2d: jax.Array,
                        extension: Optional[jax.Array] = None) -> jax.Array:
    if extension is None:
        extension = jnp.ones_like(points_2d[..., :1])
    elif extension.ndim == points_2d.ndim - 1:
        extension = extension[..., None]
    return jnp.concatenate([points_2d * extension, extension], axis=-1)


def project_points_orthographic(points_3d: jax.Array) -> jax.Array:
    """(reference: camera/projection_orthographic.py)."""
    return points_3d[..., :2]


def unproject_points_orthographic(points_2d: jax.Array,
                                  extension: jax.Array) -> jax.Array:
    if extension.ndim == points_2d.ndim - 1:
        extension = extension[..., None]
    return jnp.concatenate([points_2d, extension], axis=-1)


# -----------------------------------------------------------------------------
# Distortion models
# -----------------------------------------------------------------------------

def distort_points_affine(points: jax.Array, params: jax.Array) -> jax.Array:
    """params (..., 4) = (fx, fy, cx, cy) (reference:
    camera/distortion_affine.py:132)."""
    fx, fy, cx, cy = (params[..., 0], params[..., 1], params[..., 2],
                      params[..., 3])
    return jnp.stack([points[..., 0] * fx + cx, points[..., 1] * fy + cy],
                     axis=-1)


def undistort_points_affine(points: jax.Array, params: jax.Array) -> jax.Array:
    fx, fy, cx, cy = (params[..., 0], params[..., 1], params[..., 2],
                      params[..., 3])
    return jnp.stack([(points[..., 0] - cx) / fx, (points[..., 1] - cy) / fy],
                     axis=-1)


def distort_points_kannala_brandt(points: jax.Array, params: jax.Array
                                  ) -> jax.Array:
    """Fisheye (KB) distortion on z=1 plane coords; params (..., 8) =
    (fx, fy, cx, cy, k1, k2, k3, k4)
    (reference: camera/distortion_kannala_brandt.py:237)."""
    points = as_float(points)
    fx, fy, cx, cy = (params[..., 0], params[..., 1], params[..., 2],
                      params[..., 3])
    k1, k2, k3, k4 = (params[..., 4], params[..., 5], params[..., 6],
                      params[..., 7])
    x, y = points[..., 0], points[..., 1]
    r = jnp.sqrt(x * x + y * y + 1e-12)
    theta = jnp.arctan(r)
    t2 = theta * theta
    theta_d = theta * (1.0 + t2 * (k1 + t2 * (k2 + t2 * (k3 + t2 * k4))))
    scale = theta_d / r
    u = fx * scale * x + cx
    v = fy * scale * y + cy
    return jnp.stack([u, v], axis=-1)


def undistort_points_kannala_brandt(points: jax.Array, params: jax.Array,
                                    iters: int = 8) -> jax.Array:
    """Newton inversion of the KB model, fixed trip count (reference:
    distortion_kannala_brandt.py undistort — iterative there too)."""
    points = as_float(points)
    fx, fy, cx, cy = (params[..., 0], params[..., 1], params[..., 2],
                      params[..., 3])
    k1, k2, k3, k4 = (params[..., 4], params[..., 5], params[..., 6],
                      params[..., 7])
    un = (points[..., 0] - cx) / fx
    vn = (points[..., 1] - cy) / fy
    theta_d = jnp.sqrt(un * un + vn * vn + 1e-12)

    def body(theta, _):
        t2 = theta * theta
        poly = 1.0 + t2 * (k1 + t2 * (k2 + t2 * (k3 + t2 * k4)))
        dpoly = 3.0 * k1 * t2 + 5.0 * k2 * t2**2 + 7.0 * k3 * t2**3 + 9.0 * k4 * t2**4
        f = theta * poly - theta_d
        df = poly + dpoly
        return theta - f / jnp.where(jnp.abs(df) > 1e-8, df, 1e-8), None

    theta, _ = jax.lax.scan(body, theta_d, None, length=iters)
    r = jnp.tan(theta)
    scale = r / jnp.maximum(theta_d, 1e-12)
    return jnp.stack([un * scale, vn * scale], axis=-1)


# -----------------------------------------------------------------------------
# PinholeCamera container (reference: camera/pinhole.py:28)
# -----------------------------------------------------------------------------

@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class PinholeCamera:
    """Batched pinhole camera: intrinsics (B, 4, 4), extrinsics (B, 4, 4)
    world→camera, image sizes (B,)."""

    intrinsics: jax.Array
    extrinsics: jax.Array
    height: jax.Array
    width: jax.Array

    def tree_flatten(self):
        return (self.intrinsics, self.extrinsics, self.height, self.width), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @classmethod
    def from_parameters(cls, fx, fy, cx, cy, height, width, tx=None, ty=None,
                        tz=None, batch_size: Optional[int] = None) -> "PinholeCamera":
        fx = jnp.atleast_1d(jnp.asarray(fx, jnp.float32))
        B = fx.shape[0]
        K = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (B, 4, 4))
        K = K.at[:, 0, 0].set(fx)
        K = K.at[:, 1, 1].set(jnp.broadcast_to(jnp.asarray(fy, jnp.float32), (B,)))
        K = K.at[:, 0, 2].set(jnp.broadcast_to(jnp.asarray(cx, jnp.float32), (B,)))
        K = K.at[:, 1, 2].set(jnp.broadcast_to(jnp.asarray(cy, jnp.float32), (B,)))
        E = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (B, 4, 4))
        if tx is not None:
            E = E.at[:, 0, 3].set(jnp.broadcast_to(jnp.asarray(tx, jnp.float32), (B,)))
        if ty is not None:
            E = E.at[:, 1, 3].set(jnp.broadcast_to(jnp.asarray(ty, jnp.float32), (B,)))
        if tz is not None:
            E = E.at[:, 2, 3].set(jnp.broadcast_to(jnp.asarray(tz, jnp.float32), (B,)))
        h = jnp.broadcast_to(jnp.asarray(height, jnp.float32), (B,))
        w = jnp.broadcast_to(jnp.asarray(width, jnp.float32), (B,))
        return cls(K, E, h, w)

    @property
    def batch_size(self) -> int:
        return self.intrinsics.shape[0]

    @property
    def fx(self):
        return self.intrinsics[..., 0, 0]

    @property
    def fy(self):
        return self.intrinsics[..., 1, 1]

    @property
    def cx(self):
        return self.intrinsics[..., 0, 2]

    @property
    def cy(self):
        return self.intrinsics[..., 1, 2]

    @property
    def tx(self):
        return self.extrinsics[..., 0, 3]

    @property
    def ty(self):
        return self.extrinsics[..., 1, 3]

    @property
    def tz(self):
        return self.extrinsics[..., 2, 3]

    @property
    def camera_matrix(self) -> jax.Array:
        return self.intrinsics[..., :3, :3]

    @property
    def rotation_matrix(self) -> jax.Array:
        return self.extrinsics[..., :3, :3]

    @property
    def translation_vector(self) -> jax.Array:
        return self.extrinsics[..., :3, 3:4]

    def intrinsics_inverse(self) -> jax.Array:
        K = self.intrinsics
        out = jnp.broadcast_to(jnp.eye(4, dtype=K.dtype), K.shape)
        fx, fy, cx, cy = self.fx, self.fy, self.cx, self.cy
        out = out.at[..., 0, 0].set(1.0 / fx)
        out = out.at[..., 1, 1].set(1.0 / fy)
        out = out.at[..., 0, 2].set(-cx / fx)
        out = out.at[..., 1, 2].set(-cy / fy)
        return out

    def project(self, points_3d: jax.Array) -> jax.Array:
        """World points (..., N, 3) → pixels (..., N, 2)."""
        R = self.rotation_matrix
        t = self.translation_vector
        pc = jnp.einsum("...ij,...nj->...ni", R, points_3d) + t[..., 0][..., None, :]
        return project_points(pc, self.camera_matrix[..., None, :, :])

    def unproject(self, points_2d: jax.Array, depth: jax.Array) -> jax.Array:
        """Pixels (..., N, 2) + depth → world points (..., N, 3)."""
        pc = unproject_points(points_2d, depth,
                              self.camera_matrix[..., None, :, :])
        R = self.rotation_matrix
        t = self.translation_vector
        Rt = jnp.swapaxes(R, -1, -2)
        return jnp.einsum("...ij,...nj->...ni", Rt, pc - t[..., 0][..., None, :])

    def scale(self, factor) -> "PinholeCamera":
        f = jnp.asarray(factor, self.intrinsics.dtype)
        K = self.intrinsics
        K = K.at[..., 0, 0].mul(f).at[..., 1, 1].mul(f)
        K = K.at[..., 0, 2].mul(f).at[..., 1, 2].mul(f)
        return PinholeCamera(K, self.extrinsics, self.height * f, self.width * f)


def cam2pixel(cam_coords: jax.Array, dst_proj: jax.Array,
              eps: float = 1e-12) -> jax.Array:
    """(B, H, W, 3) camera coords → (B, H, W, 2) pixels via (B, 4, 4)
    projection (reference: pinhole.py:717)."""
    b, h, w = cam_coords.shape[:3]
    pts = cam_coords.reshape(b, -1, 3)
    ph = jnp.concatenate([pts, jnp.ones_like(pts[..., :1])], axis=-1)
    proj = jnp.einsum("bij,bnj->bni", dst_proj, ph)
    z = proj[..., 2:3]
    uv = proj[..., :2] / jnp.where(jnp.abs(z) > eps, z, eps)
    return uv.reshape(b, h, w, 2)


def pixel2cam(depth: jax.Array, intrinsics_inv: jax.Array,
              pixel_coords: jax.Array) -> jax.Array:
    """(B, 1, H, W) depth + (B, 4, 4) K⁻¹ + (B, H, W, 2) pix →
    (B, H, W, 3) camera coords (reference: pinhole.py:691)."""
    b, _, h, w = depth.shape
    ones = jnp.ones_like(pixel_coords[..., :1])
    ph = jnp.concatenate([pixel_coords, ones, ones], axis=-1).reshape(b, -1, 4)
    cam = jnp.einsum("bij,bnj->bni", intrinsics_inv, ph)[..., :3]
    cam = cam.reshape(b, h, w, 3)
    return cam * depth[:, 0, :, :, None]


# -----------------------------------------------------------------------------
# Stereo (reference: camera/stereo.py:50)
# -----------------------------------------------------------------------------

@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class StereoCamera:
    """Rectified stereo rig from left/right rectified camera matrices
    (B, 3, 4)."""

    rectified_left_camera: jax.Array
    rectified_right_camera: jax.Array

    def tree_flatten(self):
        return (self.rectified_left_camera, self.rectified_right_camera), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def fx(self):
        return self.rectified_left_camera[..., 0, 0]

    @property
    def fy(self):
        return self.rectified_left_camera[..., 1, 1]

    @property
    def cx_left(self):
        return self.rectified_left_camera[..., 0, 2]

    @property
    def cx_right(self):
        return self.rectified_right_camera[..., 0, 2]

    @property
    def cy(self):
        return self.rectified_left_camera[..., 1, 2]

    @property
    def tx(self):
        """Baseline from the right camera's horizontal offset."""
        return -self.rectified_right_camera[..., 0, 3] / self.fx

    @property
    def Q(self) -> jax.Array:
        """4x4 disparity-to-depth reprojection matrix (reference:
        stereo.py Q matrix)."""
        B = self.rectified_left_camera.shape[0]
        dtype = self.rectified_left_camera.dtype
        Q = jnp.zeros((B, 4, 4), dtype)
        Q = Q.at[:, 0, 0].set(1.0)
        Q = Q.at[:, 0, 3].set(-self.cx_left)
        Q = Q.at[:, 1, 1].set(1.0)
        Q = Q.at[:, 1, 3].set(-self.cy)
        Q = Q.at[:, 2, 3].set(self.fx)
        Q = Q.at[:, 3, 2].set(1.0 / self.tx)
        Q = Q.at[:, 3, 3].set((self.cx_left - self.cx_right) / self.tx)
        return Q

    def reproject_disparity_to_3D(self, disparity: jax.Array) -> jax.Array:
        """(B, 1, H, W) disparity → (B, H, W, 3) points
        (reference: stereo.py:313)."""
        B, _, H, W = disparity.shape
        dtype = disparity.dtype
        xs = jnp.arange(W, dtype=dtype)
        ys = jnp.arange(H, dtype=dtype)
        gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
        uvd1 = jnp.stack(
            [jnp.broadcast_to(gx, (B, H, W)),
             jnp.broadcast_to(gy, (B, H, W)),
             disparity[:, 0], jnp.ones((B, H, W), dtype)], axis=-1)
        pts = jnp.einsum("bij,bhwj->bhwi", self.Q, uvd1)
        w = pts[..., 3:4]
        return pts[..., :3] / jnp.where(jnp.abs(w) > 1e-8, w, 1e-8)


# -----------------------------------------------------------------------------
# Projection/distortion Jacobians (reference: camera/distortion_affine.py:102,
# distortion_kannala_brandt.py:167, projection_z1.py:97,
# projection_orthographic.py dx_project_points_orthographic).
#
# TPU-native route: jax.jacfwd of the forward maps gives the exact
# closed-form Jacobians (the reference hand-transcribes sympy output); only
# the trivially-constant affine/orthographic cases are written directly.
# -----------------------------------------------------------------------------

def dx_distort_points_affine(points: jax.Array, params: jax.Array
                             ) -> jax.Array:
    """∂(u,v)/∂(x,y) = diag(fx, fy) (reference: distortion_affine.py:102)."""
    params = as_float(params)
    fx, fy = params[..., 0], params[..., 1]
    z = jnp.zeros_like(fx)
    J = jnp.stack([jnp.stack([fx, z], -1), jnp.stack([z, fy], -1)], -2)
    return jnp.broadcast_to(J, (*points.shape[:-1], 2, 2))


def _pointwise_jacobian(fn, points: jax.Array, *args) -> jax.Array:
    """jacfwd of a (..., n)→(..., m) map, vmapped over flattened leading
    dims; returns (..., m, n)."""
    pts = as_float(points)
    lead = pts.shape[:-1]
    flat = pts.reshape(-1, pts.shape[-1])
    if args:
        flat_args = [jnp.broadcast_to(as_float(a), lead + a.shape[-1:])
                     .reshape(-1, a.shape[-1]) for a in args]
        J = jax.vmap(lambda p, *aa: jax.jacfwd(fn)(p, *aa))(flat, *flat_args)
    else:
        J = jax.vmap(jax.jacfwd(fn))(flat)
    return J.reshape(*lead, J.shape[-2], J.shape[-1])


def dx_distort_points_kannala_brandt(points: jax.Array, params: jax.Array
                                     ) -> jax.Array:
    """Exact (..., 2, 2) KB-distortion Jacobian via forward-mode autodiff
    (reference: distortion_kannala_brandt.py:167)."""
    return _pointwise_jacobian(distort_points_kannala_brandt, points, params)


def dx_project_points_z1(points_in_camera: jax.Array) -> jax.Array:
    """∂π/∂X = [[1/z, 0, -x/z²], [0, 1/z, -y/z²]]
    (reference: projection_z1.py:97)."""
    p = as_float(points_in_camera)
    x, y, zc = p[..., 0], p[..., 1], p[..., 2]
    inv_z = 1.0 / zc
    z0 = jnp.zeros_like(x)
    row0 = jnp.stack([inv_z, z0, -x * inv_z * inv_z], -1)
    row1 = jnp.stack([z0, inv_z, -y * inv_z * inv_z], -1)
    return jnp.stack([row0, row1], -2)


def dx_project_points_orthographic(points_in_camera: jax.Array) -> jax.Array:
    """Constant 1 (reference: projection_orthographic.py)."""
    return jnp.ones_like(as_float(points_in_camera)[..., 0:1])


__all__ += [
    "dx_distort_points_affine", "dx_distort_points_kannala_brandt",
    "dx_project_points_z1", "dx_project_points_orthographic",
]
