"""Calibration: PnP, Brown-Conrady distortion, undistortion
(reference: kornia/geometry/calibration/, 650 LoC)."""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.linalg import f32_matmul_precision
from ..core.check import check_shape
from ..core.dtype import as_float
from ..core.linalg import lstsq_nullspace

__all__ = [
    "pnp_ransac",
    "solve_pnp_dlt",
    "distort_points",
    "undistort_points",
    "undistort_image",
    "tilt_projection",
]


def solve_pnp_dlt(world_points: jax.Array, img_points: jax.Array,
                  intrinsics: jax.Array, svd_eps: float = 1e-4
                  ) -> jax.Array:
    """DLT PnP: (B, N≥6, 3) world + (B, N, 2) pixels + (B, 3, 3) K →
    (B, 3, 4) world→cam (reference: calibration/pnp.py:59)."""
    check_shape(world_points, ["B", "N", "3"], "world_points")
    world_points = as_float(world_points)
    img_points = as_float(img_points)
    B, N, _ = world_points.shape
    # normalize pixels by intrinsics
    from .conversions import normalize_points_with_intrinsics
    xn = normalize_points_with_intrinsics(img_points, intrinsics)
    # normalize world points (centroid + scale) for conditioning
    cen = jnp.mean(world_points, axis=1, keepdims=True)
    scale = jnp.maximum(
        jnp.mean(jnp.linalg.norm(world_points - cen, axis=-1), axis=1), 1e-8)
    wp = (world_points - cen) / scale[:, None, None]
    X, Y, Z = wp[..., 0], wp[..., 1], wp[..., 2]
    u, v = xn[..., 0], xn[..., 1]
    zeros = jnp.zeros_like(X)
    ones = jnp.ones_like(X)
    r1 = jnp.stack([X, Y, Z, ones, zeros, zeros, zeros, zeros,
                    -u * X, -u * Y, -u * Z, -u], axis=-1)
    r2 = jnp.stack([zeros, zeros, zeros, zeros, X, Y, Z, ones,
                    -v * X, -v * Y, -v * Z, -v], axis=-1)
    A = jnp.concatenate([r1, r2], axis=1)  # (B, 2N, 12)
    p = lstsq_nullspace(A).reshape(B, 3, 4)
    # fix sign: require points in front (positive depth for centroid)
    depth_c = p[:, 2, 3]
    p = p * jnp.sign(depth_c + (depth_c == 0))[:, None, None]
    # enforce orthonormal rotation via SVD (procrustes)
    R_raw = p[:, :, :3]
    U, S, Vt = jnp.linalg.svd(R_raw)
    det = jnp.linalg.det(U @ Vt)
    D = jnp.stack([jnp.ones_like(det), jnp.ones_like(det), det], axis=-1)
    R = (U * D[:, None, :]) @ Vt
    s = jnp.mean(S, axis=-1)
    t = p[:, :, 3] / s[:, None]
    # undo world normalization: R (X - cen)/scale + t → R X + (t*scale - R cen)...
    # world→cam: x = R ((X - cen)/scale) + t  ⇒  x = (R/scale) X + (t - R cen/scale)
    # we want unit-scale rotation: since wp was scaled isotropically the
    # estimated R is valid; translation must be rescaled:
    t_full = (t - jnp.einsum("bij,bj->bi", R, cen[:, 0]) / scale[:, None]) * scale[:, None]
    return jnp.concatenate([R, t_full[..., None]], axis=-1)


@f32_matmul_precision
def pnp_ransac(world_points: jax.Array, img_points: jax.Array,
               key: jax.Array, inl_th: float, mask: Optional[jax.Array] = None,
               batch_size: int = 256, gn_iters: int = 5
               ) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Robust 3D-2D pose: batched minimal DLT samples + MSAC scoring +
    pose-only Gauss-Newton polish on the inlier set, one jitted program
    (no reference counterpart — kornia's PnP is the plain DLT,
    calibration/pnp.py:59; the RANSAC wrapper is this framework's VO
    tracking primitive).

    world_points: (N, 3); img_points: (N, 2) NORMALIZED camera coords;
    inl_th: inlier threshold in normalized units. Returns
    (R (3, 3), t (3,), inliers (N,), inlier_count) — world→camera.
    """
    world_points = as_float(world_points)
    img_points = as_float(img_points)
    N = world_points.shape[0]
    if mask is None:
        mask = jnp.ones(N, dtype=bool)
    th2 = inl_th * inl_th

    # --- minimal samples (6-pt DLT), gumbel top-k over valid entries ----
    logits = jnp.where(mask, 0.0, -jnp.inf)
    g = jax.random.gumbel(key, (batch_size, N)) + logits[None]
    _, sidx = jax.lax.top_k(g, 6)  # (S, 6)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=world_points.dtype),
                           (batch_size, 3, 3))
    P = solve_pnp_dlt(world_points[sidx], img_points[sidx], eye)  # (S, 3, 4)

    def reproj_err2(P_):
        Xc = jnp.einsum("sij,nj->sni", P_[:, :, :3], world_points) \
            + P_[:, None, :, 3]
        z = Xc[..., 2]
        proj = Xc[..., :2] / jnp.where(jnp.abs(z) > 1e-8, z, 1e-8)[..., None]
        err = jnp.sum((proj - img_points[None]) ** 2, -1)
        return jnp.where(z > 1e-6, err, jnp.inf)  # cheirality

    err = reproj_err2(P)  # (S, N)
    err = jnp.where(mask[None], err, th2)
    msac = jnp.sum(jnp.clip(err, 0.0, th2), -1)
    best = jnp.argmin(msac)
    P_best = P[best]

    # --- pose-only GN on the (soft-updated) inlier set ------------------
    def project_res(Rm, tm):
        Xc = world_points @ Rm.T + tm
        z = jnp.where(jnp.abs(Xc[:, 2]) > 1e-8, Xc[:, 2], 1e-8)
        return Xc[:, :2] / z[:, None] - img_points, Xc[:, 2]

    def gn_step(carry, _):
        Rm, tm = carry
        r, z = project_res(Rm, tm)
        w = (jnp.sum(r * r, -1) < th2) & (z > 1e-6) & mask
        wf = w.astype(Rm.dtype)

        def res_at(dx):
            Rn = _exp_so3_cal(dx[:3]) @ Rm
            tn = tm + dx[3:]
            rr, _ = project_res(Rn, tn)
            return (rr * wf[:, None]).reshape(-1)

        J = jax.jacfwd(res_at)(jnp.zeros(6, Rm.dtype))  # (2N, 6)
        r0 = (r * wf[:, None]).reshape(-1)
        H = J.T @ J + 1e-6 * jnp.eye(6, dtype=Rm.dtype)
        dx = -jnp.linalg.solve(H, J.T @ r0)
        Rn = _exp_so3_cal(dx[:3]) @ Rm
        tn = tm + dx[3:]
        rn, zn = project_res(Rn, tn)
        better = jnp.sum(jnp.clip(jnp.sum(rn * rn, -1), 0, th2) * wf) < \
            jnp.sum(jnp.clip(jnp.sum(r * r, -1), 0, th2) * wf)
        Rm = jnp.where(better, Rn, Rm)
        tm = jnp.where(better, tn, tm)
        return (Rm, tm), None

    (R, t), _ = jax.lax.scan(gn_step, (P_best[:, :3], P_best[:, 3]), None,
                             length=gn_iters)
    r, z = project_res(R, t)
    inliers = (jnp.sum(r * r, -1) < th2) & (z > 1e-6) & mask
    return R, t, inliers, jnp.sum(inliers)


def refine_pose_gn(world_points: jax.Array, img_points: jax.Array,
                   R0: jax.Array, t0: jax.Array, huber_delta: float,
                   mask: jax.Array, iters: int = 8
                   ) -> Tuple[jax.Array, jax.Array]:
    """Motion-only robust pose polish (ORB-SLAM's pose optimization role):
    huber-IRLS Gauss-Newton over se3 from an initial (R0, t0), minimizing
    reprojection of `world_points` onto normalized `img_points` over the
    masked set. Steps are accept-if-better on the huber cost; an empty
    mask is a no-op. Standalone utility: slam/vo.py deliberately does NOT
    call it — the per-step polish degraded strong-baseline sequences
    (round-4 finding), so VO relies on windowed BA for refinement
    instead. Kept public for motion-only relocalization uses."""
    from ..losses.robust import huber_weight
    d2 = huber_delta * huber_delta

    def project_res(Rm, tm):
        Xc = world_points @ Rm.T + tm
        z = jnp.where(jnp.abs(Xc[:, 2]) > 1e-8, Xc[:, 2], 1e-8)
        return Xc[:, :2] / z[:, None] - img_points, Xc[:, 2]

    def cost(Rm, tm):
        r, z = project_res(Rm, tm)
        r2 = jnp.sum(r * r, -1)
        ok = mask & (z > 1e-6)
        # huber rho
        rho = jnp.where(r2 < d2, r2,
                        2.0 * huber_delta * jnp.sqrt(jnp.maximum(r2, 1e-18))
                        - d2)
        return jnp.sum(jnp.where(ok, rho, 0.0))

    def gn_step(carry, _):
        Rm, tm, cm = carry
        r, z = project_res(Rm, tm)
        r2 = jnp.sum(r * r, -1)
        w = huber_weight(r2, huber_delta) * (mask & (z > 1e-6))
        sw = jnp.sqrt(w)[:, None]

        def res_at(dx):
            Rn = _exp_so3_cal(dx[:3]) @ Rm
            tn = tm + dx[3:]
            rr, _ = project_res(Rn, tn)
            return (rr * sw).reshape(-1)

        J = jax.jacfwd(res_at)(jnp.zeros(6, Rm.dtype))
        r0 = (r * sw).reshape(-1)
        H = J.T @ J + 1e-6 * jnp.eye(6, dtype=Rm.dtype)
        dx = -jnp.linalg.solve(H, J.T @ r0)
        Rn = _exp_so3_cal(dx[:3]) @ Rm
        tn = tm + dx[3:]
        cn = cost(Rn, tn)
        better = cn < cm
        return (jnp.where(better, Rn, Rm), jnp.where(better, tn, tm),
                jnp.where(better, cn, cm)), None

    (R, t, _), _ = jax.lax.scan(gn_step, (R0, t0, cost(R0, t0)), None,
                                length=iters)
    return R, t


def _exp_so3_cal(w: jax.Array) -> jax.Array:
    """Rodrigues exp map, DIFFERENTIABLE AT ZERO (local copy to avoid an
    import cycle).

    The naive `norm(w)`-based form has a NaN jacobian at w = 0 — exactly
    where every Gauss-Newton step linearizes — which silently turned the
    GN polish loops (`pnp_ransac`, `refine_pose_gn`) into no-ops: the
    NaN update always failed accept-if-better (round-4 finding). Taylor
    branches + the where-inside-sqrt guard keep value AND jacobian
    finite everywhere."""
    th2 = jnp.sum(w * w)
    small = th2 < 1e-12
    th = jnp.sqrt(jnp.where(small, 1.0, th2))
    A = jnp.where(small, 1.0 - th2 / 6.0, jnp.sin(th) / th)
    B = jnp.where(small, 0.5 - th2 / 24.0, (1.0 - jnp.cos(th)) / th2)
    Kx = jnp.array([[0.0, -w[2], w[1]], [w[2], 0.0, -w[0]],
                    [-w[1], w[0], 0.0]], w.dtype)
    return jnp.eye(3, dtype=w.dtype) + A * Kx + B * (Kx @ Kx)


def distort_points(points: jax.Array, K: jax.Array, dist: jax.Array,
                   new_K: Optional[jax.Array] = None) -> jax.Array:
    """Apply Brown-Conrady distortion to pixel points
    (reference: calibration/distort.py). dist: (B, ≤14) OpenCV order."""
    points = as_float(points)
    d = jnp.zeros((*dist.shape[:-1], 14), dtype=points.dtype)
    d = d.at[..., : dist.shape[-1]].set(dist)
    if new_K is None:
        new_K = K
    fx = new_K[..., 0, 0][..., None]
    fy = new_K[..., 1, 1][..., None]
    cx = new_K[..., 0, 2][..., None]
    cy = new_K[..., 1, 2][..., None]
    x = (points[..., 0] - cx) / fx
    y = (points[..., 1] - cy) / fy
    k1, k2, p1, p2, k3 = (d[..., 0:1], d[..., 1:2], d[..., 2:3], d[..., 3:4],
                          d[..., 4:5])
    k4, k5, k6 = d[..., 5:6], d[..., 6:7], d[..., 7:8]
    s1, s2, s3, s4 = d[..., 8:9], d[..., 9:10], d[..., 10:11], d[..., 11:12]
    r2 = x * x + y * y
    rad = (1.0 + k1 * r2 + k2 * r2**2 + k3 * r2**3) / (
        1.0 + k4 * r2 + k5 * r2**2 + k6 * r2**3)
    xd = x * rad + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x) \
        + s1 * r2 + s2 * r2**2
    yd = y * rad + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y \
        + s3 * r2 + s4 * r2**2
    fxo = K[..., 0, 0][..., None]
    fyo = K[..., 1, 1][..., None]
    cxo = K[..., 0, 2][..., None]
    cyo = K[..., 1, 2][..., None]
    return jnp.stack([xd * fxo + cxo, yd * fyo + cyo], axis=-1)


def undistort_points(points: jax.Array, K: jax.Array, dist: jax.Array,
                     new_K: Optional[jax.Array] = None,
                     num_iters: int = 5) -> jax.Array:
    """Iterative undistortion (OpenCV scheme, fixed trip count)
    (reference: calibration/undistort.py undistort_points)."""
    points = as_float(points)
    d = jnp.zeros((*dist.shape[:-1], 14), dtype=points.dtype)
    d = d.at[..., : dist.shape[-1]].set(dist)
    fx = K[..., 0, 0][..., None]
    fy = K[..., 1, 1][..., None]
    cx = K[..., 0, 2][..., None]
    cy = K[..., 1, 2][..., None]
    x0 = (points[..., 0] - cx) / fx
    y0 = (points[..., 1] - cy) / fy
    k1, k2, p1, p2, k3 = (d[..., 0], d[..., 1], d[..., 2], d[..., 3], d[..., 4])
    k4, k5, k6 = d[..., 5], d[..., 6], d[..., 7]
    s1, s2, s3, s4 = d[..., 8], d[..., 9], d[..., 10], d[..., 11]

    def body(xy, _):
        x, y = xy
        r2 = x * x + y * y
        inv_rad = (1.0 + k4[..., None] * r2 + k5[..., None] * r2**2 + k6[..., None] * r2**3) / (
            1.0 + k1[..., None] * r2 + k2[..., None] * r2**2 + k3[..., None] * r2**3)
        dx = (2.0 * p1[..., None] * x * y + p2[..., None] * (r2 + 2.0 * x * x)
              + s1[..., None] * r2 + s2[..., None] * r2**2)
        dy = (p1[..., None] * (r2 + 2.0 * y * y) + 2.0 * p2[..., None] * x * y
              + s3[..., None] * r2 + s4[..., None] * r2**2)
        x_new = (x0 - dx) * inv_rad
        y_new = (y0 - dy) * inv_rad
        return (x_new, y_new), None

    (x, y), _ = jax.lax.scan(body, (x0, y0), None, length=num_iters)
    if new_K is None:
        new_K = K
    fxn = new_K[..., 0, 0][..., None]
    fyn = new_K[..., 1, 1][..., None]
    cxn = new_K[..., 0, 2][..., None]
    cyn = new_K[..., 1, 2][..., None]
    return jnp.stack([x * fxn + cxn, y * fyn + cyn], axis=-1)


def undistort_image(image: jax.Array, K: jax.Array, dist: jax.Array
                    ) -> jax.Array:
    """Undistort via inverse-mapping remap (reference: undistort.py
    undistort_image)."""
    image = as_float(image)
    B, C, H, W = image.shape
    ys, xs = jnp.meshgrid(jnp.arange(H, dtype=image.dtype),
                          jnp.arange(W, dtype=image.dtype), indexing="ij")
    grid = jnp.stack([xs, ys], axis=-1).reshape(1, -1, 2)
    grid = jnp.broadcast_to(grid, (B, H * W, 2))
    src = distort_points(grid, K, dist)  # where each output pixel samples
    map_x = src[..., 0].reshape(B, H, W)
    map_y = src[..., 1].reshape(B, H, W)
    from ..ops.warp import remap
    return remap(image, map_x, map_y, align_corners=True)


def tilt_projection(taux: jax.Array, tauy: jax.Array,
                    return_inverse: bool = False):
    """Scheimpflug tilt projection matrix (reference:
    calibration/pnp.py tilt_projection)."""
    cx = jnp.cos(taux)
    sx = jnp.sin(taux)
    cy = jnp.cos(tauy)
    sy = jnp.sin(tauy)
    Rx = jnp.stack([
        jnp.stack([jnp.ones_like(cx), jnp.zeros_like(cx), jnp.zeros_like(cx)], -1),
        jnp.stack([jnp.zeros_like(cx), cx, sx], -1),
        jnp.stack([jnp.zeros_like(cx), -sx, cx], -1)], -2)
    Ry = jnp.stack([
        jnp.stack([cy, jnp.zeros_like(cy), -sy], -1),
        jnp.stack([jnp.zeros_like(cy), jnp.ones_like(cy), jnp.zeros_like(cy)], -1),
        jnp.stack([sy, jnp.zeros_like(cy), cy], -1)], -2)
    R = Ry @ Rx
    pz = R[..., 2, 2]
    P = jnp.zeros_like(R)
    P = P.at[..., 0, 0].set(pz).at[..., 1, 1].set(pz)
    P = P.at[..., 0, 2].set(-R[..., 0, 2]).at[..., 1, 2].set(-R[..., 1, 2])
    P = P.at[..., 2, 2].set(1.0)
    tilt = P @ jnp.swapaxes(R, -1, -2)
    if return_inverse:
        inv_P = jnp.zeros_like(P)
        inv_P = inv_P.at[..., 0, 0].set(1.0 / pz).at[..., 1, 1].set(1.0 / pz)
        inv_P = inv_P.at[..., 0, 2].set(R[..., 0, 2] / pz)
        inv_P = inv_P.at[..., 1, 2].set(R[..., 1, 2] / pz)
        inv_P = inv_P.at[..., 2, 2].set(1.0)
        return tilt, R @ inv_P
    return tilt