"""Subpixel localization: NMS, soft-argmax, quadratic interpolation, DSNT
(reference: kornia/geometry/subpix/, 2.8k LoC)."""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from ..core.check import check, check_shape
from ..core.dtype import as_float
from ..core.grid import create_meshgrid

__all__ = [
    "nms2d",
    "nms3d",
    "spatial_softmax2d",
    "spatial_expectation2d",
    "spatial_soft_argmax2d",
    "render_gaussian2d",
    "conv_soft_argmax2d",
    "conv_soft_argmax3d",
    "conv_quad_interp3d",
]


def nms2d(x: jax.Array, kernel_size: Tuple[int, int] = (3, 3),
          mask_only: bool = False) -> jax.Array:
    """Hard NMS: keep values STRICTLY greater than every neighbor in the
    window (center excluded; replicate padding) — exact reference
    semantics (subpix/nms.py NonMaximaSuppression2d: plateaus die)."""
    x = as_float(x)
    kh, kw = kernel_size
    B, C, H, W = x.shape
    xp = jnp.pad(x, [(0, 0), (0, 0), (kh // 2, (kh - 1) // 2),
                     (kw // 2, (kw - 1) // 2)], mode="edge")
    max_non_center = jnp.full_like(x, -jnp.inf)
    for dy in range(kh):
        for dx in range(kw):
            if dy == kh // 2 and dx == kw // 2:
                continue
            tap = lax.dynamic_slice(xp, (0, 0, dy, dx), (B, C, H, W))
            max_non_center = jnp.maximum(max_non_center, tap)
    mask = x > max_non_center
    if mask_only:
        return mask
    return x * mask.astype(x.dtype)


def nms3d(x: jax.Array, kernel_size: Tuple[int, int, int] = (3, 3, 3),
          mask_only: bool = False) -> jax.Array:
    """(B, C, D, H, W) NMS, STRICTLY greater than every neighbor (center
    excluded; replicate padding so borders/plateaus die) — exact reference
    semantics (subpix/nms.py:332 NonMaximaSuppression3d)."""
    x = as_float(x)
    kd, kh, kw = kernel_size
    B, C, D, H, W = x.shape
    xp = jnp.pad(x, [(0, 0), (0, 0), (kd // 2, (kd - 1) // 2),
                     (kh // 2, (kh - 1) // 2), (kw // 2, (kw - 1) // 2)],
                 mode="edge")
    max_non_center = jnp.full_like(x, -jnp.inf)
    for dz in range(kd):
        for dy in range(kh):
            for dx in range(kw):
                if dz == kd // 2 and dy == kh // 2 and dx == kw // 2:
                    continue
                tap = lax.dynamic_slice(xp, (0, 0, dz, dy, dx),
                                        (B, C, D, H, W))
                max_non_center = jnp.maximum(max_non_center, tap)
    mask = x > max_non_center
    if mask_only:
        return mask
    return x * mask.astype(x.dtype)


def spatial_softmax2d(x: jax.Array, temperature=1.0) -> jax.Array:
    """Per-channel softmax over H*W (reference: subpix/dsnt.py:39)."""
    x = as_float(x)
    B, C, H, W = x.shape
    flat = x.reshape(B, C, -1) * temperature
    return jax.nn.softmax(flat, axis=-1).reshape(B, C, H, W)


def spatial_expectation2d(p: jax.Array, normalized_coordinates: bool = True
                          ) -> jax.Array:
    """Expected (x, y) under a spatial distribution
    (reference: dsnt.py:76)."""
    B, C, H, W = p.shape
    grid = create_meshgrid(H, W, normalized_coordinates, p.dtype)  # (1,H,W,2)
    ex = jnp.sum(p * grid[0, ..., 0], axis=(-2, -1))
    ey = jnp.sum(p * grid[0, ..., 1], axis=(-2, -1))
    return jnp.stack([ex, ey], axis=-1)  # (B, C, 2)


def spatial_soft_argmax2d(x: jax.Array, temperature=1.0,
                          normalized_coordinates: bool = True) -> jax.Array:
    """(reference: subpix/spatial_soft_argmax.py:546)."""
    return spatial_expectation2d(spatial_softmax2d(x, temperature),
                                 normalized_coordinates)


def render_gaussian2d(mean: jax.Array, std: jax.Array, size: Tuple[int, int],
                      normalized_coordinates: bool = True) -> jax.Array:
    """Render isotropic gaussians at (B, N, 2) means
    (reference: dsnt.py:121)."""
    H, W = size
    grid = create_meshgrid(H, W, normalized_coordinates, mean.dtype)[0]
    dx = grid[None, None, ..., 0] - mean[..., 0][..., None, None]
    dy = grid[None, None, ..., 1] - mean[..., 1][..., None, None]
    sx = std[..., 0][..., None, None]
    sy = std[..., 1][..., None, None]
    g = jnp.exp(-0.5 * ((dx / sx) ** 2 + (dy / sy) ** 2))
    return g / jnp.maximum(jnp.sum(g, axis=(-2, -1), keepdims=True), 1e-12)


def _window_sum(x: jax.Array, k: Tuple[int, int], stride: Tuple[int, int],
                pad: int) -> jax.Array:
    return lax.reduce_window(
        x, 0.0, lax.add, (1, 1, *k), (1, 1, *stride),
        [(0, 0), (0, 0), (pad, pad), (pad, pad)],
    )


def conv_soft_argmax2d(
    x: jax.Array,
    kernel_size: Tuple[int, int] = (3, 3),
    stride: Tuple[int, int] = (1, 1),
    padding: Tuple[int, int] = (1, 1),
    temperature=1.0,
    normalized_coordinates: bool = True,
    output_value: bool = False,
):
    """Windowed soft-argmax: per window, softmax-weighted coordinates
    (reference: subpix/spatial_soft_argmax.py:303).

    Implemented with pooled exp-sums instead of unfold: two reduce_window
    passes compute the normalizer and the coordinate expectations — no
    (B, C·k², L) unfold tensor, TPU friendly."""
    x = as_float(x)
    B, C, H, W = x.shape
    kh, kw = kernel_size
    ph, pw = padding
    # numeric stabilization: subtract global max (cheap, exact for softmax)
    x_s = (x - jax.lax.stop_gradient(jnp.max(x, axis=(-2, -1), keepdims=True))) / jnp.maximum(
        jnp.asarray(temperature, x.dtype), 1e-8)
    e = jnp.exp(x_s)
    grid = create_meshgrid(H, W, False, x.dtype)[0]  # pixel coords
    gx = jnp.broadcast_to(grid[..., 0], (B, C, H, W))
    gy = jnp.broadcast_to(grid[..., 1], (B, C, H, W))

    def pool(t):
        return lax.reduce_window(
            t, 0.0, lax.add, (1, 1, kh, kw), (1, 1, *stride),
            [(0, 0), (0, 0), (ph, ph), (pw, pw)],
        )

    den = jnp.maximum(pool(e), 1e-12)
    ex = pool(e * gx) / den
    ey = pool(e * gy) / den
    if normalized_coordinates:
        ex = 2.0 * ex / max(W - 1, 1) - 1.0
        ey = 2.0 * ey / max(H - 1, 1) - 1.0
    coords = jnp.stack([ex, ey], axis=2)  # (B, C, 2, Ho, Wo)
    if output_value:
        val = pool(e * x) / den
        return coords, val
    return coords


def conv_soft_argmax3d(
    x: jax.Array,
    kernel_size: Tuple[int, int, int] = (3, 3, 3),
    stride: Tuple[int, int, int] = (1, 1, 1),
    padding: Tuple[int, int, int] = (1, 1, 1),
    temperature=1.0,
    normalized_coordinates: bool = False,
    output_value: bool = True,
):
    """(B, C, D, H, W) windowed soft-argmax (reference: :417)."""
    x = as_float(x)
    B, C, D, H, W = x.shape
    x_s = (x - jax.lax.stop_gradient(jnp.max(x, axis=(-3, -2, -1), keepdims=True))) / jnp.maximum(
        jnp.asarray(temperature, x.dtype), 1e-8)
    e = jnp.exp(x_s)
    zs = jnp.arange(D, dtype=x.dtype).reshape(D, 1, 1)
    ys = jnp.arange(H, dtype=x.dtype).reshape(1, H, 1)
    xs = jnp.arange(W, dtype=x.dtype).reshape(1, 1, W)
    gz = jnp.broadcast_to(zs, (B, C, D, H, W))
    gy = jnp.broadcast_to(ys, (B, C, D, H, W))
    gx = jnp.broadcast_to(xs, (B, C, D, H, W))

    def pool(t):
        return lax.reduce_window(
            t, 0.0, lax.add, (1, 1, *kernel_size), (1, 1, *stride),
            [(0, 0), (0, 0), (padding[0],) * 2, (padding[1],) * 2,
             (padding[2],) * 2],
        )

    den = jnp.maximum(pool(e), 1e-12)
    ez = pool(e * gz) / den
    ey = pool(e * gy) / den
    ex = pool(e * gx) / den
    if normalized_coordinates:
        ez = 2.0 * ez / max(D - 1, 1) - 1.0
        ey = 2.0 * ey / max(H - 1, 1) - 1.0
        ex = 2.0 * ex / max(W - 1, 1) - 1.0
    coords = jnp.stack([ex, ey, ez], axis=2)
    if output_value:
        val = pool(e * x) / den
        return coords, val
    return coords


def quad_fit3d_planes(x: jax.Array, eps: float = 1e-7
                      ) -> Tuple[jax.Array, jax.Array, jax.Array,
                                 jax.Array]:
    """The raw quadratic fit: returns (ox, oy, os, dval) planes, each
    (B, C, D, H, W), with NO strict-maxima bonus applied.

    Sign symmetry worth knowing (used by ScaleSpaceDetector): fitting -x
    negates gradient AND Hessian, so the offset -H^-1 g is IDENTICAL and
    dval negates — the minima branch of a detector needs NO second fit.
    """
    x = as_float(x)
    B, C, D, H, W = x.shape
    # first and second derivatives by central differences
    xp = jnp.pad(x, [(0, 0), (0, 0), (1, 1), (1, 1), (1, 1)], mode="edge")

    def sl(dz, dy, dx):
        return lax.dynamic_slice(xp, (0, 0, 1 + dz, 1 + dy, 1 + dx),
                                 (B, C, D, H, W))

    gx = 0.5 * (sl(0, 0, 1) - sl(0, 0, -1))
    gy = 0.5 * (sl(0, 1, 0) - sl(0, -1, 0))
    gs = 0.5 * (sl(1, 0, 0) - sl(-1, 0, 0))
    dxx = sl(0, 0, 1) + sl(0, 0, -1) - 2 * x
    dyy = sl(0, 1, 0) + sl(0, -1, 0) - 2 * x
    dss = sl(1, 0, 0) + sl(-1, 0, 0) - 2 * x
    dxy = 0.25 * (sl(0, 1, 1) - sl(0, 1, -1) - sl(0, -1, 1) + sl(0, -1, -1))
    dxs = 0.25 * (sl(1, 0, 1) - sl(1, 0, -1) - sl(-1, 0, 1) + sl(-1, 0, -1))
    dys = 0.25 * (sl(1, 1, 0) - sl(1, -1, 0) - sl(-1, 1, 0) + sl(-1, -1, 0))
    # Solve H dx = -g with regularization; clamp offsets to [-0.5, 0.5].
    # The degeneracy test MUST be scale-invariant: response magnitudes are
    # arbitrary (GFTT scores are ~1e-4, so det(H) ~ 1e-12 — an absolute
    # eps silently zeroed every offset and quantized keypoints to the
    # integer grid, costing ~1 px of localization accuracy).
    #
    # TPU-critical: the solve stays PURE COMPONENT ARITHMETIC on the
    # (B, C, D, H, W) planes. Stacking into (..., 3, 3)/(..., 3) arrays
    # puts 3-wide minor dimensions into the (8, 128) tile layout — a
    # ~40x padded-memory blowup that made this stage ~half the whole
    # detector (round-4 profile: detector 35 ms/frame at 480p; the
    # stacked form dominated it).
    hscale = jnp.maximum(
        jnp.maximum(jnp.maximum(jnp.abs(dxx), jnp.abs(dyy)),
                    jnp.maximum(jnp.abs(dss), jnp.abs(dxy))),
        jnp.maximum(jnp.maximum(jnp.abs(dxs), jnp.abs(dys)), 1e-20))
    a = dxx / hscale + eps
    b = dxy / hscale
    c = dxs / hscale
    d_ = dyy / hscale + eps
    e = dys / hscale
    f = dss / hscale + eps
    gxn = gx / hscale
    gyn = gy / hscale
    gsn = gs / hscale
    # cofactors of the symmetric [[a,b,c],[b,d,e],[c,e,f]]
    A00 = d_ * f - e * e
    A01 = c * e - b * f
    A02 = b * e - c * d_
    det = a * A00 + b * A01 + c * A02
    ok = jnp.abs(det) > 1e-6
    inv_det = jnp.where(ok, 1.0 / jnp.where(ok, det, 1.0), 0.0)
    A11 = a * f - c * c
    A12 = b * c - a * e
    A22 = a * d_ - b * b
    # offset = -H^-1 g (symmetric inverse via cofactors)
    ox = -(A00 * gxn + A01 * gyn + A02 * gsn) * inv_det
    oy = -(A01 * gxn + A11 * gyn + A12 * gsn) * inv_det
    os_ = -(A02 * gxn + A12 * gyn + A22 * gsn) * inv_det
    ox = jnp.clip(ox, -0.5, 0.5)
    oy = jnp.clip(oy, -0.5, 0.5)
    os_ = jnp.clip(os_, -0.5, 0.5)
    dval = 0.5 * (gx * ox + gy * oy + gs * os_)
    return ox, oy, os_, dval


def conv_quad_interp3d_planes(
        x: jax.Array, strict_maxima_bonus: float = 10.0,
        eps: float = 1e-7
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Quadratic subpixel refinement, PLANES form: returns
    (ox, oy, os, refined), each (B, C, D, H, W) — the offset components
    stay separate planes so a detector can top-k on `refined` and gather
    offsets ONLY at the winners instead of materializing a
    (B, C, 3, D, H, W) coords volume."""
    x = as_float(x)
    ox, oy, os_, dval = quad_fit3d_planes(x, eps)
    y_refined = x + dval
    if strict_maxima_bonus > 0:
        pooled = lax.reduce_window(
            x, -jnp.inf, lax.max, (1, 1, 3, 3, 3), (1, 1, 1, 1, 1), "SAME")
        is_max = (x == pooled)
        y_refined = y_refined + strict_maxima_bonus * is_max.astype(x.dtype)
    return ox, oy, os_, y_refined


def conv_quad_interp3d(x: jax.Array, strict_maxima_bonus: float = 10.0,
                       eps: float = 1e-7) -> Tuple[jax.Array, jax.Array]:
    """Quadratic subpixel refinement of 3D local maxima in a (B, C, D, H, W)
    scale-space response (reference: subpix/spatial_soft_argmax.py:665 —
    the SIFT-style detector's localization step).

    Returns (coords (B, C, 3, D, H, W) with (x, y, s) offsets applied to
    the integer grid, refined values (B, C, D, H, W)). Hot callers that
    only need offsets at a few winners should use
    `conv_quad_interp3d_planes` instead of materializing `coords`."""
    x = as_float(x)
    B, C, D, H, W = x.shape
    ox, oy, os_, y_refined = conv_quad_interp3d_planes(
        x, strict_maxima_bonus, eps)
    zs = jnp.arange(D, dtype=x.dtype).reshape(D, 1, 1)
    ys = jnp.arange(H, dtype=x.dtype).reshape(1, H, 1)
    xs = jnp.arange(W, dtype=x.dtype).reshape(1, 1, W)
    cx = jnp.broadcast_to(xs, (B, C, D, H, W)) + ox
    cy = jnp.broadcast_to(ys, (B, C, D, H, W)) + oy
    cs = jnp.broadcast_to(zs, (B, C, D, H, W)) + os_
    coords = jnp.stack([cx, cy, cs], axis=2)
    return coords, y_refined


def nms3d_minmax(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Strict local-maxima AND local-minima 3x3x3 NMS masks in one pass
    (reference: subpix/nms.py:341). Borders/plateaus die (replicate pad +
    strict comparison), matching the 26-neighbour strict semantics."""
    x = as_float(x)
    B, C, D, H, W = x.shape
    xp = jnp.pad(x, [(0, 0), (0, 0), (1, 1), (1, 1), (1, 1)], mode="edge")
    max_n = jnp.full_like(x, -jnp.inf)
    min_n = jnp.full_like(x, jnp.inf)
    for dz in range(3):
        for dy in range(3):
            for dx in range(3):
                if dz == 1 and dy == 1 and dx == 1:
                    continue
                tap = lax.dynamic_slice(xp, (0, 0, dz, dy, dx),
                                        (B, C, D, H, W))
                max_n = jnp.maximum(max_n, tap)
                min_n = jnp.minimum(min_n, tap)
    return x > max_n, x < min_n


def _solve_sym3x3(dxx, dyy, dss, dxy, dxs, dys, bx, by, bs, eps=1e-12):
    """Cramer solve of the symmetric 3x3 Hessian system, batched over any
    shape. Returns (sx, sy, ss, solved_mask)."""
    det = (dxx * (dyy * dss - dys * dys) - dxy * (dxy * dss - dys * dxs)
           + dxs * (dxy * dys - dyy * dxs))
    ok = jnp.abs(det) > eps
    safe = jnp.where(ok, det, 1.0)
    det_x = (bx * (dyy * dss - dys * dys) - dxy * (by * dss - dys * bs)
             + dxs * (by * dys - dyy * bs))
    det_y = (dxx * (by * dss - dys * bs) - bx * (dxy * dss - dys * dxs)
             + dxs * (dxy * bs - by * dxs))
    det_s = (dxx * (dyy * bs - by * dys) - dxy * (dxy * bs - by * dxs)
             + bx * (dxy * dys - dyy * dxs))
    z = jnp.zeros_like(det)
    return (jnp.where(ok, det_x / safe, z), jnp.where(ok, det_y / safe, z),
            jnp.where(ok, det_s / safe, z), ok)


def iterative_quad_interp3d(x: jax.Array, n_iters: int = 5,
                            strict_maxima_bonus: float = 10.0,
                            max_subpixel_shift: float = 0.6,
                            allow_scale_steps: bool = True,
                            precomputed_nms_mask: Optional[jax.Array] = None,
                            max_candidates: Optional[int] = None
                            ) -> Tuple[jax.Array, jax.Array]:
    """Iterative (HessAff/SIFT-style) subpixel 3D extremum localization
    (reference: subpix/spatial_soft_argmax.py:996).

    TPU formulation: instead of the reference's data-dependent candidate
    gather (``torch.where`` on the NMS mask → dynamic shapes), refinement
    runs DENSELY at every voxel with static shapes and the NMS mask selects
    outputs at the end — identical results, jit/vmap/grad-closed.
    ``max_candidates`` is accepted for API parity but ignored (the dense
    pass already covers all candidates in fixed time).

    Returns (coords (B, C, 3, D, H, W) ordered [scale, x, y], values).
    """
    x = as_float(x)
    check(x.ndim == 5, f"expected (B, C, D, H, W), got {x.shape}")
    B, C, D, H, W = x.shape
    zs = jnp.arange(D, dtype=x.dtype).reshape(D, 1, 1)
    ys = jnp.arange(H, dtype=x.dtype).reshape(1, H, 1)
    xs = jnp.arange(W, dtype=x.dtype).reshape(1, 1, W)
    grid_coords = jnp.stack([
        jnp.broadcast_to(zs, (B, C, D, H, W)),
        jnp.broadcast_to(xs, (B, C, D, H, W)),
        jnp.broadcast_to(ys, (B, C, D, H, W))], axis=2)
    if D < 3 or H < 3 or W < 3:
        return grid_coords, x

    nms = (precomputed_nms_mask if precomputed_nms_mask is not None
           else nms3d(x, (3, 3, 3), True))
    inp = x.reshape(B * C, D, H, W)
    di = jnp.broadcast_to(jnp.arange(D).reshape(D, 1, 1), (D, H, W))
    hi = jnp.broadcast_to(jnp.arange(H).reshape(1, H, 1), (D, H, W))
    wi = jnp.broadcast_to(jnp.arange(W).reshape(1, 1, W), (D, H, W))
    d_cur = jnp.broadcast_to(di, inp.shape)
    h_cur = jnp.broadcast_to(hi, inp.shape)
    w_cur = jnp.broadcast_to(wi, inp.shape)
    shift = jnp.zeros((3,) + inp.shape, x.dtype)  # (3=[s,x,y], BC, D, H, W)
    gds = jnp.zeros_like(inp)
    valid = jnp.ones(inp.shape, bool)

    def tap(dc, hc, wc, dz, dy, dx):
        zz = jnp.clip(dc + dz, 0, D - 1)
        yy = jnp.clip(hc + dy, 0, H - 1)
        xx = jnp.clip(wc + dx, 0, W - 1)
        return jnp.take_along_axis(
            inp.reshape(B * C, -1),
            (zz * (H * W) + yy * W + xx).reshape(B * C, -1),
            axis=1).reshape(inp.shape)

    def body(i, carry):
        d_cur, h_cur, w_cur, shift, gds, valid = carry
        dc = jnp.clip(d_cur, 1, D - 2)
        hc = jnp.clip(h_cur, 1, H - 2)
        wc = jnp.clip(w_cur, 1, W - 2)
        c000 = tap(dc, hc, wc, 0, 0, 0)
        p_xm, p_xp = tap(dc, hc, wc, 0, 0, -1), tap(dc, hc, wc, 0, 0, 1)
        p_ym, p_yp = tap(dc, hc, wc, 0, -1, 0), tap(dc, hc, wc, 0, 1, 0)
        p_sm, p_sp = tap(dc, hc, wc, -1, 0, 0), tap(dc, hc, wc, 1, 0, 0)
        gx = 0.5 * (p_xp - p_xm)
        gy = 0.5 * (p_yp - p_ym)
        gs = 0.5 * (p_sp - p_sm)
        dxx = p_xp - 2 * c000 + p_xm
        dyy = p_yp - 2 * c000 + p_ym
        dss = p_sp - 2 * c000 + p_sm
        dxy = 0.25 * (tap(dc, hc, wc, 0, 1, 1) - tap(dc, hc, wc, 0, 1, -1)
                      - tap(dc, hc, wc, 0, -1, 1) + tap(dc, hc, wc, 0, -1, -1))
        dxs = 0.25 * (tap(dc, hc, wc, 1, 0, 1) - tap(dc, hc, wc, 1, 0, -1)
                      - tap(dc, hc, wc, -1, 0, 1) + tap(dc, hc, wc, -1, 0, -1))
        dys = 0.25 * (tap(dc, hc, wc, 1, 1, 0) - tap(dc, hc, wc, 1, -1, 0)
                      - tap(dc, hc, wc, -1, 1, 0) + tap(dc, hc, wc, -1, -1, 0))
        sx, sy, ss, ok = _solve_sym3x3(dxx, dyy, dss, dxy, dxs, dys,
                                       -gx, -gy, -gs)
        valid = valid & ok
        vf = valid.astype(x.dtype)
        sx, sy, ss = sx * vf, sy * vf, ss * vf
        shift = jnp.where(valid[None], jnp.stack([ss, sx, sy]), shift)
        gds = jnp.where(valid, gx * sx + gy * sy + gs * ss, gds)
        new_w = w_cur + (valid & (sx > max_subpixel_shift)).astype(jnp.int32) \
            - (valid & (sx < -max_subpixel_shift)).astype(jnp.int32)
        valid = valid & (new_w >= 1) & (new_w <= W - 2)
        w_cur = jnp.clip(new_w, 0, W - 1)
        new_h = h_cur + (valid & (sy > max_subpixel_shift)).astype(jnp.int32) \
            - (valid & (sy < -max_subpixel_shift)).astype(jnp.int32)
        valid = valid & (new_h >= 1) & (new_h <= H - 2)
        h_cur = jnp.clip(new_h, 0, H - 1)
        if allow_scale_steps:
            new_d = d_cur \
                + (valid & (ss > max_subpixel_shift)).astype(jnp.int32) \
                - (valid & (ss < -max_subpixel_shift)).astype(jnp.int32)
            valid = valid & (new_d >= 1) & (new_d <= D - 2)
            d_cur = jnp.clip(new_d, 0, D - 1)
        return d_cur, h_cur, w_cur, shift, gds, valid

    d_cur, h_cur, w_cur, shift, gds, valid = lax.fori_loop(
        0, n_iters, body, (d_cur, h_cur, w_cur, shift, gds, valid))
    valid = valid & (jnp.abs(shift) <= 1.5).all(axis=0)
    fdt = x.dtype
    final_s = jnp.where(valid, d_cur.astype(fdt) + shift[0],
                        di.astype(fdt))
    final_x = jnp.where(valid, w_cur.astype(fdt) + shift[1],
                        wi.astype(fdt))
    final_y = jnp.where(valid, h_cur.astype(fdt) + shift[2],
                        hi.astype(fdt))
    refined = jnp.stack([final_s, final_x, final_y],
                        axis=1).reshape(B, C, 3, D, H, W)
    coords = jnp.where(nms[:, :, None], refined, grid_coords)
    val_center = tap(d_cur, h_cur, w_cur, 0, 0, 0)
    y_ref = val_center + 0.5 * jnp.where(valid, gds, 0.0)
    if strict_maxima_bonus > 0:
        y_ref = y_ref + strict_maxima_bonus * valid.astype(fdt)
    y_max = jnp.where(nms, y_ref.reshape(B, C, D, H, W), x)
    return coords, y_max


__all__ += ["nms3d_minmax", "iterative_quad_interp3d"]
