"""Geometric representation conversions
(reference: kornia/geometry/conversions.py:79-1580, 1617 LoC).

All functions are batched over arbitrary leading dims and grad-closed.
Quaternions are (w, x, y, z) (reference QuaternionCoeffOrder.WXYZ).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..core.check import check, check_shape
from ..core.dtype import as_float

__all__ = [
    "rad2deg", "deg2rad",
    "pol2cart", "cart2pol",
    "convert_points_from_homogeneous", "convert_points_to_homogeneous",
    "convert_affinematrix_to_homography", "convert_affinematrix_to_homography3d",
    "angle_axis_to_rotation_matrix", "rotation_matrix_to_angle_axis",
    "rotation_matrix_to_quaternion", "quaternion_to_rotation_matrix",
    "quaternion_to_angle_axis", "angle_axis_to_quaternion",
    "quaternion_log_to_exp", "quaternion_exp_to_log",
    "euler_from_quaternion", "quaternion_from_euler",
    "normalize_quaternion",
    "normalize_pixel_coordinates", "denormalize_pixel_coordinates",
    "normalize_pixel_coordinates3d", "denormalize_pixel_coordinates3d",
    "normalize_homography", "denormalize_homography", "normalize_homography3d",
    "normalize_points_with_intrinsics", "denormalize_points_with_intrinsics",
    "vector_to_skew_symmetric_matrix",
    "axis_angle_to_rotation_matrix", "rotation_matrix_to_axis_angle",
    "Rt_to_matrix4x4", "matrix4x4_to_Rt",
    "camtoworld_to_worldtocam_Rt", "worldtocam_to_camtoworld_Rt",
    "camtoworld_graphics_to_vision_4x4", "camtoworld_vision_to_graphics_4x4",
    "ARKitQTVecs_to_ColmapQTVecs",
]

from ..core.grid import (  # re-export pixel coordinate helpers
    denormalize_pixel_coordinates,
    denormalize_pixel_coordinates3d,
    normalize_pixel_coordinates,
    normalize_pixel_coordinates3d,
)
from ..ops.warp import denormalize_homography, normalize_homography  # noqa: F401

_EPS = 1e-8


def rad2deg(x: jax.Array) -> jax.Array:
    return as_float(x) * (180.0 / jnp.pi)


def deg2rad(x: jax.Array) -> jax.Array:
    return as_float(x) * (jnp.pi / 180.0)


def pol2cart(rho: jax.Array, phi: jax.Array) -> Tuple[jax.Array, jax.Array]:
    return rho * jnp.cos(phi), rho * jnp.sin(phi)


def cart2pol(x: jax.Array, y: jax.Array, eps: float = _EPS) -> Tuple[jax.Array, jax.Array]:
    rho = jnp.sqrt(x * x + y * y + eps)
    return rho, jnp.arctan2(y, x)


def convert_points_from_homogeneous(points: jax.Array, eps: float = _EPS) -> jax.Array:
    """(..., N, D+1) → (..., N, D) with guarded divide (reference :205)."""
    z = points[..., -1:]
    scale = jnp.where(jnp.abs(z) > eps, 1.0 / (z + jnp.where(z >= 0, eps, -eps)),
                      jnp.ones_like(z))
    return points[..., :-1] * scale


def convert_points_to_homogeneous(points: jax.Array) -> jax.Array:
    if points.ndim < 2:
        raise ValueError(
            f"points must be at least (N, D), got shape {points.shape}")
    return jnp.concatenate([points, jnp.ones_like(points[..., :1])], axis=-1)


def convert_affinematrix_to_homography(A: jax.Array) -> jax.Array:
    """(..., 2, 3) → (..., 3, 3)."""
    check_shape(A, ["*", "2", "3"], "A")
    pad = jnp.zeros((*A.shape[:-2], 1, 3), dtype=A.dtype)
    pad = pad.at[..., 0, 2].set(1.0)
    return jnp.concatenate([A, pad], axis=-2)


def convert_affinematrix_to_homography3d(A: jax.Array) -> jax.Array:
    check_shape(A, ["*", "3", "4"], "A")
    pad = jnp.zeros((*A.shape[:-2], 1, 4), dtype=A.dtype)
    pad = pad.at[..., 0, 3].set(1.0)
    return jnp.concatenate([A, pad], axis=-2)


# -----------------------------------------------------------------------------
# Rotation representations
# -----------------------------------------------------------------------------

def vector_to_skew_symmetric_matrix(v: jax.Array) -> jax.Array:
    """(..., 3) → (..., 3, 3) hat operator (reference :1580)."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zeros = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zeros, -z, y], axis=-1),
            jnp.stack([z, zeros, -x], axis=-1),
            jnp.stack([-y, x, zeros], axis=-1),
        ],
        axis=-2,
    )


def axis_angle_to_rotation_matrix(axis_angle: jax.Array) -> jax.Array:
    """Rodrigues formula, (..., 3) → (..., 3, 3) (reference :379).

    Uses the numerically-stable small-angle Taylor branch."""
    axis_angle = as_float(axis_angle)
    theta2 = jnp.sum(axis_angle * axis_angle, axis=-1, keepdims=True)[..., None]
    theta = jnp.sqrt(jnp.maximum(theta2, 1e-20))
    K = vector_to_skew_symmetric_matrix(axis_angle)
    K2 = K @ K
    eye = jnp.broadcast_to(jnp.eye(3, dtype=axis_angle.dtype), K.shape)
    sin_t = jnp.sin(theta)
    cos_t = jnp.cos(theta)
    # full Rodrigues
    R_full = eye + (sin_t / theta) * K + ((1.0 - cos_t) / jnp.maximum(theta2, 1e-20)) * K2
    # Taylor: sin(t)/t ≈ 1 - t²/6; (1-cos t)/t² ≈ 1/2 - t²/24
    R_taylor = eye + (1.0 - theta2 / 6.0) * K + (0.5 - theta2 / 24.0) * K2
    small = theta2 < 1e-8
    return jnp.where(small, R_taylor, R_full)


angle_axis_to_rotation_matrix = axis_angle_to_rotation_matrix


def rotation_matrix_to_quaternion(R: jax.Array, eps: float = _EPS) -> jax.Array:
    """(..., 3, 3) → (..., 4) wxyz (reference :502). Branch-free max-trace
    selection (Shepperd's method) for numerical stability in f32."""
    check_shape(R, ["*", "3", "3"], "R")
    R = as_float(R)
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    def safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, eps))

    # four candidate solutions
    qw_0 = safe_sqrt(1.0 + tr) / 2.0
    q0 = jnp.stack([qw_0, (m21 - m12) / (4 * qw_0 + eps),
                    (m02 - m20) / (4 * qw_0 + eps),
                    (m10 - m01) / (4 * qw_0 + eps)], axis=-1)
    qx_1 = safe_sqrt(1.0 + m00 - m11 - m22) / 2.0
    q1 = jnp.stack([(m21 - m12) / (4 * qx_1 + eps), qx_1,
                    (m01 + m10) / (4 * qx_1 + eps),
                    (m02 + m20) / (4 * qx_1 + eps)], axis=-1)
    qy_2 = safe_sqrt(1.0 - m00 + m11 - m22) / 2.0
    q2 = jnp.stack([(m02 - m20) / (4 * qy_2 + eps),
                    (m01 + m10) / (4 * qy_2 + eps), qy_2,
                    (m12 + m21) / (4 * qy_2 + eps)], axis=-1)
    qz_3 = safe_sqrt(1.0 - m00 - m11 + m22) / 2.0
    q3 = jnp.stack([(m10 - m01) / (4 * qz_3 + eps),
                    (m02 + m20) / (4 * qz_3 + eps),
                    (m12 + m21) / (4 * qz_3 + eps), qz_3], axis=-1)

    # pick the best-conditioned branch per element
    c0 = tr > 0
    c1 = (m00 >= m11) & (m00 >= m22)
    c2 = m11 >= m22
    q = jnp.where(c0[..., None], q0,
                  jnp.where(c1[..., None], q1,
                            jnp.where(c2[..., None], q2, q3)))
    return normalize_quaternion(q)


def normalize_quaternion(q: jax.Array, eps: float = 1e-12) -> jax.Array:
    if q.shape[-1] != 4:
        raise ValueError(f"quaternion must be (..., 4) wxyz, got {q.shape}")
    return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), eps)


def quaternion_to_rotation_matrix(q: jax.Array) -> jax.Array:
    """(..., 4) wxyz → (..., 3, 3) (reference :615)."""
    q = normalize_quaternion(as_float(q))
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    tx, ty, tz = 2 * x, 2 * y, 2 * z
    twx, twy, twz = tx * w, ty * w, tz * w
    txx, txy, txz = tx * x, ty * x, tz * x
    tyy, tyz, tzz = ty * y, tz * y, tz * z
    return jnp.stack(
        [
            jnp.stack([1 - (tyy + tzz), txy - twz, txz + twy], axis=-1),
            jnp.stack([txy + twz, 1 - (txx + tzz), tyz - twx], axis=-1),
            jnp.stack([txz - twy, tyz + twx, 1 - (txx + tyy)], axis=-1),
        ],
        axis=-2,
    )


def quaternion_to_angle_axis(q: jax.Array, eps: float = _EPS) -> jax.Array:
    """(..., 4) wxyz → (..., 3) (reference :691)."""
    q = as_float(q)
    # canonicalize to the w >= 0 hemisphere so the returned angle is the
    # shortest (<= pi) — double-cover disambiguation
    q = jnp.where(q[..., 0:1] < 0, -q, q)
    w = q[..., 0]
    xyz = q[..., 1:]
    sin_sq = jnp.sum(xyz * xyz, axis=-1)
    sin_t = jnp.sqrt(jnp.maximum(sin_sq, 1e-20))
    angle = 2.0 * jnp.arctan2(sin_t, w)
    k_big = angle / jnp.maximum(sin_t, eps)
    k = jnp.where(sin_sq > eps * eps, k_big, 2.0)  # small-angle: 2/w ≈ 2
    return xyz * k[..., None]


def angle_axis_to_quaternion(axis_angle: jax.Array, eps: float = _EPS) -> jax.Array:
    """(..., 3) → (..., 4) wxyz (reference :756)."""
    axis_angle = as_float(axis_angle)
    theta2 = jnp.sum(axis_angle * axis_angle, axis=-1, keepdims=True)
    theta = jnp.sqrt(jnp.maximum(theta2, 1e-20))
    half = 0.5 * theta
    k_big = jnp.sin(half) / theta
    k_small = 0.5 - theta2 / 48.0
    k = jnp.where(theta2 > eps * eps, k_big, k_small)
    w = jnp.where(theta2 > eps * eps, jnp.cos(half), 1.0 - theta2 / 8.0)
    return jnp.concatenate([w, axis_angle * k], axis=-1)


rotation_matrix_to_axis_angle = None  # defined below


def rotation_matrix_to_angle_axis(R: jax.Array) -> jax.Array:
    """(..., 3, 3) → (..., 3) via quaternion (reference :443)."""
    return quaternion_to_angle_axis(rotation_matrix_to_quaternion(R))


rotation_matrix_to_axis_angle = rotation_matrix_to_angle_axis


def quaternion_log_to_exp(q_log: jax.Array, eps: float = _EPS) -> jax.Array:
    """(..., 3) log-quaternion → (..., 4) unit quaternion (reference :829)."""
    q_log = as_float(q_log)
    n = jnp.linalg.norm(q_log, axis=-1, keepdims=True)
    w = jnp.cos(n)
    xyz = q_log * jnp.sin(n) / jnp.maximum(n, eps)
    return jnp.concatenate([w, xyz], axis=-1)


def quaternion_exp_to_log(q: jax.Array, eps: float = _EPS) -> jax.Array:
    """(..., 4) unit quaternion → (..., 3) (reference :869)."""
    q = as_float(q)
    w = q[..., :1]
    xyz = q[..., 1:]
    n = jnp.linalg.norm(xyz, axis=-1, keepdims=True)
    theta = jnp.arctan2(n, w)
    return xyz * theta / jnp.maximum(n, eps)


def euler_from_quaternion(w: jax.Array, x: jax.Array, y: jax.Array, z: jax.Array
                          ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """wxyz → (roll, pitch, yaw) XYZ euler (reference :1294)."""
    yy = y * y
    sinr_cosp = 2.0 * (w * x + y * z)
    cosr_cosp = 1.0 - 2.0 * (x * x + yy)
    roll = jnp.arctan2(sinr_cosp, cosr_cosp)
    sinp = 2.0 * (w * y - z * x)
    pitch = jnp.where(jnp.abs(sinp) >= 1.0,
                      jnp.sign(sinp) * (jnp.pi / 2.0), jnp.arcsin(jnp.clip(sinp, -1, 1)))
    siny_cosp = 2.0 * (w * z + x * y)
    cosy_cosp = 1.0 - 2.0 * (yy + z * z)
    yaw = jnp.arctan2(siny_cosp, cosy_cosp)
    return roll, pitch, yaw


def quaternion_from_euler(roll: jax.Array, pitch: jax.Array, yaw: jax.Array
                          ) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """(roll, pitch, yaw) → wxyz components (reference :1335)."""
    cy = jnp.cos(yaw * 0.5)
    sy = jnp.sin(yaw * 0.5)
    cp = jnp.cos(pitch * 0.5)
    sp = jnp.sin(pitch * 0.5)
    cr = jnp.cos(roll * 0.5)
    sr = jnp.sin(roll * 0.5)
    w = cr * cp * cy + sr * sp * sy
    x = sr * cp * cy - cr * sp * sy
    y = cr * sp * cy + sr * cp * sy
    z = cr * cp * sy - sr * sp * cy
    return w, x, y, z


# -----------------------------------------------------------------------------
# Homography / intrinsics normalization
# -----------------------------------------------------------------------------

def normalize_homography3d(H: jax.Array, dsize_src: Tuple[int, int, int],
                           dsize_dst: Tuple[int, int, int]) -> jax.Array:
    """Pixel→NDC for volumetric homographies (reference :1155)."""
    def transform(d, h, w, dtype):
        tr = jnp.eye(4, dtype=dtype)
        tr = tr.at[0, 0].set(2.0 / max(w - 1, 1)).at[1, 1].set(2.0 / max(h - 1, 1))
        tr = tr.at[2, 2].set(2.0 / max(d - 1, 1))
        tr = tr.at[:3, 3].set(-1.0)
        return tr[None]

    ds, hs, ws = dsize_src
    dd, hd, wd = dsize_dst
    src_tr = transform(ds, hs, ws, H.dtype)
    dst_tr = transform(dd, hd, wd, H.dtype)
    return dst_tr @ H @ jnp.linalg.inv(src_tr)


def normalize_points_with_intrinsics(points: jax.Array, K: jax.Array) -> jax.Array:
    """Pixel → normalized camera coords (reference :1411)."""
    fx = K[..., 0, 0][..., None]
    fy = K[..., 1, 1][..., None]
    cx = K[..., 0, 2][..., None]
    cy = K[..., 1, 2][..., None]
    x = (points[..., 0] - cx) / fx
    y = (points[..., 1] - cy) / fy
    return jnp.stack([x, y], axis=-1)


def denormalize_points_with_intrinsics(points: jax.Array, K: jax.Array) -> jax.Array:
    fx = K[..., 0, 0][..., None]
    fy = K[..., 1, 1][..., None]
    cx = K[..., 0, 2][..., None]
    cy = K[..., 1, 2][..., None]
    x = points[..., 0] * fx + cx
    y = points[..., 1] * fy + cy
    return jnp.stack([x, y], axis=-1)


# -----------------------------------------------------------------------------
# Camera convention converters (reference :1469-1580)
# -----------------------------------------------------------------------------

def Rt_to_matrix4x4(R: jax.Array, t: jax.Array) -> jax.Array:
    """(..., 3, 3), (..., 3, 1) → (..., 4, 4)."""
    top = jnp.concatenate([R, t], axis=-1)
    bottom = jnp.zeros((*R.shape[:-2], 1, 4), dtype=R.dtype)
    bottom = bottom.at[..., 0, 3].set(1.0)
    return jnp.concatenate([top, bottom], axis=-2)


def matrix4x4_to_Rt(M: jax.Array) -> Tuple[jax.Array, jax.Array]:
    return M[..., :3, :3], M[..., :3, 3:4]


def camtoworld_to_worldtocam_Rt(R: jax.Array, t: jax.Array) -> Tuple[jax.Array, jax.Array]:
    Rt = jnp.swapaxes(R, -1, -2)
    return Rt, -(Rt @ t)


def worldtocam_to_camtoworld_Rt(R: jax.Array, t: jax.Array) -> Tuple[jax.Array, jax.Array]:
    Rt = jnp.swapaxes(R, -1, -2)
    return Rt, -(Rt @ t)


_GRAPHICS_FLIP = jnp.diag(jnp.array([1.0, -1.0, -1.0, 1.0]))


def camtoworld_graphics_to_vision_4x4(M: jax.Array) -> jax.Array:
    """OpenGL (y-up, z-back) → vision (y-down, z-forward) (reference :1469)."""
    return M @ _GRAPHICS_FLIP.astype(M.dtype)


def camtoworld_vision_to_graphics_4x4(M: jax.Array) -> jax.Array:
    return M @ _GRAPHICS_FLIP.astype(M.dtype)


def ARKitQTVecs_to_ColmapQTVecs(qvec: jax.Array, tvec: jax.Array
                                ) -> Tuple[jax.Array, jax.Array]:
    """ARKit camera-to-world (graphics) → COLMAP world-to-camera (vision)
    (reference :1549)."""
    R = quaternion_to_rotation_matrix(qvec)
    t = tvec.reshape(*tvec.shape[:-1], 3, 1)
    M = Rt_to_matrix4x4(R, t)
    M = camtoworld_graphics_to_vision_4x4(M)
    R2, t2 = matrix4x4_to_Rt(M)
    R3, t3 = camtoworld_to_worldtocam_Rt(R2, t2)
    return rotation_matrix_to_quaternion(R3), t3[..., 0]


def angle_to_rotation_matrix(angle: jax.Array) -> jax.Array:
    """Angles in DEGREES (any shape) → (*, 2, 2) rotation matrices
    (reference: conversions.py:1043)."""
    ang = deg2rad(as_float(angle))
    c, s = jnp.cos(ang), jnp.sin(ang)
    return jnp.stack([c, s, -s, c], axis=-1).reshape(*ang.shape, 2, 2)


def camtoworld_graphics_to_vision_Rt(R: jax.Array, t: jax.Array
                                     ) -> Tuple[jax.Array, jax.Array]:
    """Flip y/z axes of a cam-to-world pose: OpenGL → OpenCV convention
    (reference: conversions.py:1396)."""
    check_shape(R, ["B", "3", "3"], "R")
    check_shape(t, ["B", "3", "1"], "t")
    return matrix4x4_to_Rt(
        camtoworld_graphics_to_vision_4x4(Rt_to_matrix4x4(R, t)))


def camtoworld_vision_to_graphics_Rt(R: jax.Array, t: jax.Array
                                     ) -> Tuple[jax.Array, jax.Array]:
    """Flip y/z axes of a cam-to-world pose: OpenCV → OpenGL convention
    (reference: conversions.py:1463)."""
    check_shape(R, ["B", "3", "3"], "R")
    check_shape(t, ["B", "3", "1"], "t")
    return matrix4x4_to_Rt(
        camtoworld_vision_to_graphics_4x4(Rt_to_matrix4x4(R, t)))


def normal_transform_pixel3d(depth: int, height: int, width: int,
                             dtype=jnp.float32) -> jax.Array:
    """(1, 4, 4) pixel→[-1,1] normalization transform for volumes
    (reference: conversions.py:1138)."""
    tr = jnp.eye(4, dtype=dtype)
    tr = tr.at[0, 0].set(2.0 / max(width - 1, 1))
    tr = tr.at[1, 1].set(2.0 / max(height - 1, 1))
    tr = tr.at[2, 2].set(2.0 / max(depth - 1, 1))
    tr = tr.at[:3, 3].set(-1.0)
    return tr[None]


# the reference renamed angle_axis → axis_angle in v0.7; both spellings
# are part of its public surface (conversions.py:610,759)
axis_angle_to_quaternion = angle_axis_to_quaternion
quaternion_to_axis_angle = quaternion_to_angle_axis

__all__ += [
    "angle_to_rotation_matrix",
    "camtoworld_graphics_to_vision_Rt", "camtoworld_vision_to_graphics_Rt",
    "normal_transform_pixel3d",
    "axis_angle_to_quaternion", "quaternion_to_axis_angle",
]
