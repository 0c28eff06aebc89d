"""Homography estimation (reference: kornia/geometry/homography.py, 406 LoC).

f64-free numerics: every DLT runs on Hartley-normalized coordinates, so the
Gram-matrix eigh in ``lstsq_nullspace`` stays well-conditioned in f32
(replacing the reference's `_torch_svd_cast` f64 promotion).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.linalg import f32_matmul_precision
from ..core.check import check, check_shape
from ..core.dtype import as_float
from ..core.linalg import lstsq_nullspace, nullspace_qr
from .linalg import transform_points

__all__ = [
    "normalize_points",
    "find_homography_dlt",
    "find_homography_dlt_iterated",
    "find_homography_lines_dlt",
    "symmetric_transfer_error",
    "oneway_transfer_error",
    "line_segment_transfer_error_one_way",
    "sample_is_valid_for_homography",
]


def normalize_points(points: jax.Array, eps: float = 1e-8
                     ) -> Tuple[jax.Array, jax.Array]:
    """Hartley normalization: zero-mean, sqrt(2) RMS distance
    (reference: epipolar/fundamental.py:31 normalize_points). Returns
    (normalized points, 3x3 transform)."""
    mean = jnp.mean(points, axis=-2, keepdims=True)
    dists = jnp.linalg.norm(points - mean, axis=-1)
    scale = jnp.sqrt(2.0) / (jnp.mean(dists, axis=-1) + eps)  # (...,)
    s = scale[..., None, None]
    T = jnp.zeros((*points.shape[:-2], 3, 3), dtype=points.dtype)
    T = T.at[..., 0, 0].set(scale).at[..., 1, 1].set(scale).at[..., 2, 2].set(1.0)
    T = T.at[..., 0, 2].set(-scale * mean[..., 0, 0])
    T = T.at[..., 1, 2].set(-scale * mean[..., 0, 1])
    return (points - mean) * s, T


@f32_matmul_precision
def find_homography_dlt(
    points1: jax.Array,
    points2: jax.Array,
    weights: Optional[jax.Array] = None,
    solver: str = "svd",
) -> jax.Array:
    """Weighted DLT homography from ≥4 correspondences
    (reference: homography.py:175). (B, N, 2) x2 → (B, 3, 3)."""
    check_shape(points1, ["B", "N", "2"], "points1")
    points1 = as_float(points1)
    points2 = as_float(points2)
    B, N, _ = points1.shape
    p1n, T1 = normalize_points(points1)
    p2n, T2 = normalize_points(points2)
    x1, y1 = p1n[..., 0], p1n[..., 1]
    x2, y2 = p2n[..., 0], p2n[..., 1]
    ones = jnp.ones_like(x1)
    zeros = jnp.zeros_like(x1)
    # 2 equations per correspondence: (B, 2N, 9)
    ax = jnp.stack([zeros, zeros, zeros, -x1, -y1, -ones,
                    y2 * x1, y2 * y1, y2], axis=-1)
    ay = jnp.stack([x1, y1, ones, zeros, zeros, zeros,
                    -x2 * x1, -x2 * y1, -x2], axis=-1)
    A = jnp.concatenate([ax, ay], axis=1)
    if weights is not None:
        w = jnp.concatenate([weights, weights], axis=1)[..., None]
        A = A * jnp.sqrt(jnp.maximum(w, 0.0))
    if N == 4:
        # minimal sample: exact 1-dim nullspace by Householder QR of Aᵀ —
        # f32 eigh(AᵀA) loses the solution on near-degenerate samples
        # (see core/linalg.py nullspace_qr)
        h = nullspace_qr(A)[..., 0]
    else:
        h = lstsq_nullspace(A)
    H_norm = h.reshape(B, 3, 3)
    from ..core.linalg import inverse_3x3
    H = inverse_3x3(T2) @ H_norm @ T1
    return H / (H[..., 2:3, 2:3] + jnp.where(H[..., 2:3, 2:3] >= 0, 1e-8, -1e-8))


def oneway_transfer_error(pts1: jax.Array, pts2: jax.Array, H: jax.Array,
                          squared: bool = True, eps: float = 1e-8) -> jax.Array:
    """d(H p1, p2)² (reference: homography.py:32)."""
    p1_in_2 = transform_points(H, pts1)
    err = jnp.sum((p1_in_2 - pts2) ** 2, axis=-1)
    return err if squared else jnp.sqrt(err + eps)


def symmetric_transfer_error(pts1: jax.Array, pts2: jax.Array, H: jax.Array,
                             squared: bool = True, eps: float = 1e-8) -> jax.Array:
    """d(H p1, p2)² + d(H⁻¹ p2, p1)² (reference: homography.py:91)."""
    from ..core.linalg import inverse_3x3
    H_inv = inverse_3x3(H)
    e1 = oneway_transfer_error(pts1, pts2, H, True, eps)
    e2 = oneway_transfer_error(pts2, pts1, H_inv, True, eps)
    err = e1 + e2
    return err if squared else jnp.sqrt(err + eps)


@f32_matmul_precision
def find_homography_dlt_iterated(
    points1: jax.Array,
    points2: jax.Array,
    weights: jax.Array,
    soft_inl_th: float = 3.0,
    n_iter: int = 5,
) -> jax.Array:
    """IRLS-polished DLT (reference: homography.py:243)."""
    H = find_homography_dlt(points1, points2, weights)

    def body(H, _):
        err = oneway_transfer_error(points1, points2, H, squared=True)
        w = jnp.exp(-err / (2.0 * soft_inl_th**2))
        H_new = find_homography_dlt(points1, points2, w)
        return H_new, None

    H, _ = jax.lax.scan(body, H, None, length=n_iter)
    return H


def find_homography_lines_dlt(
    ls1: jax.Array, ls2: jax.Array, weights: Optional[jax.Array] = None
) -> jax.Array:
    """Homography from line-segment correspondences (B, N, 2, 2)
    (reference: homography.py:309). Each segment contributes the constraint
    that transformed endpoints lie on the destination line."""
    ls1 = as_float(ls1)
    ls2 = as_float(ls2)
    B, N = ls1.shape[:2]
    ps1, pe1 = ls1[..., 0, :], ls1[..., 1, :]
    ps2, pe2 = ls2[..., 0, :], ls2[..., 1, :]
    # normalize endpoints jointly
    pts1_all = jnp.concatenate([ps1, pe1], axis=1)
    pts2_all = jnp.concatenate([ps2, pe2], axis=1)
    p1n, T1 = normalize_points(pts1_all)
    p2n, T2 = normalize_points(pts2_all)
    ps1n, pe1n = p1n[:, :N], p1n[:, N:]
    ps2n, pe2n = p2n[:, :N], p2n[:, N:]
    # dst line through normalized endpoints (homogeneous cross product)
    ones = jnp.ones((B, N, 1), ls1.dtype)
    p2s_h = jnp.concatenate([ps2n, ones], axis=-1)
    p2e_h = jnp.concatenate([pe2n, ones], axis=-1)
    line2 = jnp.cross(p2s_h, p2e_h)
    line2 = line2 / jnp.maximum(
        jnp.linalg.norm(line2[..., :2], axis=-1, keepdims=True), 1e-8)
    a, b, c = line2[..., 0], line2[..., 1], line2[..., 2]

    def constraint(p):
        x, y = p[..., 0], p[..., 1]
        return jnp.stack(
            [a * x, a * y, a, b * x, b * y, b, c * x, c * y, c], axis=-1
        )

    A = jnp.concatenate([constraint(ps1n), constraint(pe1n)], axis=1)
    if weights is not None:
        w = jnp.concatenate([weights, weights], axis=1)[..., None]
        A = A * jnp.sqrt(jnp.maximum(w, 0.0))
    if N == 4:
        # minimal sample: exact 1-dim nullspace (see find_homography_dlt)
        h = nullspace_qr(A)[..., 0]
    else:
        h = lstsq_nullspace(A)
    H_norm = h.reshape(B, 3, 3)
    from ..core.linalg import inverse_3x3
    H = inverse_3x3(T2) @ H_norm @ T1
    return H / (H[..., 2:3, 2:3] + jnp.where(H[..., 2:3, 2:3] >= 0, 1e-8, -1e-8))


def line_segment_transfer_error_one_way(
    ls1: jax.Array, ls2: jax.Array, H: jax.Array, squared: bool = False
) -> jax.Array:
    """Endpoint-to-line distance after transfer (reference: homography.py:136)."""
    ps1, pe1 = ls1[..., 0, :], ls1[..., 1, :]
    ps2, pe2 = ls2[..., 0, :], ls2[..., 1, :]
    ps1_in2 = transform_points(H, ps1)
    pe1_in2 = transform_points(H, pe1)
    ones = jnp.ones_like(ps2[..., :1])
    line2 = jnp.cross(jnp.concatenate([ps2, ones], -1),
                      jnp.concatenate([pe2, ones], -1))
    n = jnp.maximum(jnp.linalg.norm(line2[..., :2], axis=-1), 1e-8)
    d1 = jnp.abs(jnp.sum(line2[..., :2] * ps1_in2, -1) + line2[..., 2]) / n
    d2 = jnp.abs(jnp.sum(line2[..., :2] * pe1_in2, -1) + line2[..., 2]) / n
    err = 0.5 * (d1 + d2)
    return err**2 if squared else err


def sample_is_valid_for_homography(points1: jax.Array, points2: jax.Array
                                   ) -> jax.Array:
    """Oriented-constraint degeneracy check for 4-point samples
    (reference: homography.py:270). (B, 4, 2) x2 → (B,) bool."""
    check_shape(points1, ["B", "4", "2"], "points1")
    ones = jnp.ones_like(points1[..., :1])
    p1h = jnp.concatenate([points1, ones], axis=-1)
    p2h = jnp.concatenate([points2, ones], axis=-1)

    def orient(ph):
        # sign of the triple products over the sample's point triplets
        l_12 = jnp.cross(ph[:, 0], ph[:, 1])
        l_34 = jnp.cross(ph[:, 2], ph[:, 3])
        s3 = jnp.sum(l_12 * ph[:, 2], axis=-1)
        s4 = jnp.sum(l_12 * ph[:, 3], axis=-1)
        s1 = jnp.sum(l_34 * ph[:, 0], axis=-1)
        s2 = jnp.sum(l_34 * ph[:, 1], axis=-1)
        return jnp.stack([s1, s2, s3, s4], axis=-1)

    sign1 = jnp.sign(orient(p1h))
    sign2 = jnp.sign(orient(p2h))
    return jnp.all(sign1 == sign2, axis=-1)


# reference: homography.py:29 — a plain alias for (H, mask) returns
TupleTensor = Tuple[jax.Array, jax.Array]


def find_homography_lines_dlt_iterated(ls1: jax.Array, ls2: jax.Array,
                                       weights: jax.Array,
                                       soft_inl_th: float = 4.0,
                                       n_iter: int = 5) -> jax.Array:
    """IRLS over the line-segment DLT (reference: homography.py:382)."""
    H = find_homography_lines_dlt(ls1, ls2, weights)
    for _ in range(n_iter - 1):
        errors = line_segment_transfer_error_one_way(ls1, ls2, H, False)
        w_new = jnp.exp(-errors / (2.0 * soft_inl_th**2))
        H = find_homography_lines_dlt(ls1, ls2, w_new)
    return H


__all__ += ["TupleTensor", "find_homography_lines_dlt_iterated"]
