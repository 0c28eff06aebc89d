"""Local Affine Frames (reference: kornia/feature/laf.py, 634 LoC).

A LAF stack is (B, N, 2, 3): per keypoint an affine frame [A | c] mapping
the unit circle to an image ellipse, with c the center in pixels.
All ops are batched and grad-closed; padded keypoints are carried through
by validity masks at the call sites (static shapes).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.check import check, check_laf
from ..core.dtype import as_float
from ..core.linalg import det_2x2, inverse_2x2

# test hook: force the Pallas patch-sampling path (interpret mode) off-TPU
_FORCE_PALLAS = False

__all__ = [
    "get_laf_scale",
    "set_laf_scale",
    "get_laf_center",
    "get_laf_orientation",
    "set_laf_orientation",
    "laf_from_center_scale_ori",
    "scale_laf",
    "make_upright",
    "ellipse_to_laf",
    "laf_to_boundary_points",
    "normalize_laf",
    "denormalize_laf",
    "laf_is_inside_image",
    "laf_from_three_points",
    "laf_to_three_points",
    "rotate_laf",
    "extract_patches_from_pyramid",
    "extract_patches_simple",
    "perspective_transform_lafs",
]


def get_laf_scale(laf: jax.Array) -> jax.Array:
    """(B, N, 2, 3) → (B, N, 1, 1) sqrt|det A| (reference: laf.py:45)."""
    check_laf(laf)
    # eps is added to the SIGNED det before abs (reference: laf.py:46)
    d = jnp.abs(det_2x2(laf[..., :2, :2]) + 1e-10)
    return jnp.sqrt(d)[..., None, None]


def set_laf_scale(laf: jax.Array, scale: jax.Array) -> jax.Array:
    cur = get_laf_scale(laf)
    A = laf[..., :2, :2] * (scale / cur)
    return jnp.concatenate([A, laf[..., :2, 2:]], axis=-1)


def scale_laf(laf: jax.Array, scale_coef) -> jax.Array:
    """Multiply the linear part by a coefficient (reference: laf.py:103)."""
    scale = jnp.asarray(scale_coef, laf.dtype)
    A = laf[..., :2, :2] * scale
    return jnp.concatenate([A, laf[..., :2, 2:]], axis=-1)


def get_laf_center(laf: jax.Array) -> jax.Array:
    check_laf(laf)
    return laf[..., :2, 2]


def get_laf_orientation(laf: jax.Array) -> jax.Array:
    """Degrees (B, N, 1) (reference: laf.py get_laf_orientation:
    atan2(A01, A00) under the [[c, s], [-s, c]] convention)."""
    check_laf(laf)
    ang = jnp.arctan2(laf[..., 0, 1], laf[..., 0, 0])
    return jnp.rad2deg(ang)[..., None]


def set_laf_orientation(laf: jax.Array, angles_degrees: jax.Array) -> jax.Array:
    cur = get_laf_orientation(laf)
    return rotate_laf(laf, angles_degrees - cur)


def rotate_laf(laf: jax.Array, angles_degrees: jax.Array) -> jax.Array:
    """Right-multiply the linear part by a rotation (reference: laf.py
    rotate_laf)."""
    rad = jnp.deg2rad(as_float(angles_degrees))[..., 0]
    c = jnp.cos(rad)
    s = jnp.sin(rad)
    rot = jnp.stack(
        [jnp.stack([c, s], -1), jnp.stack([-s, c], -1)], axis=-2
    )  # note: image y-down convention
    A = laf[..., :2, :2] @ rot
    return jnp.concatenate([A, laf[..., :2, 2:]], axis=-1)


def laf_from_center_scale_ori(xy: jax.Array,
                              scale: Optional[jax.Array] = None,
                              ori: Optional[jax.Array] = None) -> jax.Array:
    """(B, N, 2) centers (+ scale (B, N, 1, 1), ori degrees (B, N, 1)) →
    (B, N, 2, 3) (reference: laf.py:128)."""
    xy = as_float(xy)
    B, N = xy.shape[:2]
    if scale is None:
        scale = jnp.ones((B, N, 1, 1), xy.dtype)
    if ori is None:
        ori = jnp.zeros((B, N, 1), xy.dtype)
    rad = jnp.deg2rad(ori[..., 0])
    c = jnp.cos(rad)
    s = jnp.sin(rad)
    A = jnp.stack(
        [jnp.stack([c, s], -1), jnp.stack([-s, c], -1)], axis=-2
    ) * scale
    return jnp.concatenate([A, xy[..., None]], axis=-1)


def make_upright(laf: jax.Array, eps: float = 1e-9) -> jax.Array:
    """Remove rotation keeping ellipse shape (reference: laf.py:184).
    Via Cholesky-like decomposition of A Aᵀ (lower-triangular sqrt)."""
    check_laf(laf)
    A = laf[..., :2, :2]
    det = get_laf_scale(laf)[..., 0, 0]  # (B, N)
    # Cholesky of A Aᵀ written the reference's way (laf.py:200-214):
    # l22 = det/b2a2 (not sqrt(C11 - l21²), which cancels catastrophically
    # for near-singular A and is what degenerate AffNet outputs produce).
    a00, a01 = A[..., 0, 0], A[..., 0, 1]
    a10, a11 = A[..., 1, 0], A[..., 1, 1]
    b2a2 = jnp.sqrt(a01 * a01 + a00 * a00) + eps
    l11 = b2a2 / det
    l21 = (a11 * a01 + a10 * a00) / (b2a2 * det)
    l22 = det / b2a2
    zeros = jnp.zeros_like(l11)
    L = jnp.stack(
        [jnp.stack([l11, zeros], -1), jnp.stack([l21, l22], -1)], axis=-2
    ) * det[..., None, None]
    return jnp.concatenate([L, laf[..., :2, 2:]], axis=-1)


def ellipse_to_laf(ells: jax.Array) -> jax.Array:
    """(B, N, 5) (x, y, a, b, c) ellipse params → LAF
    (reference: laf.py:217)."""
    ells = as_float(ells)
    xy = ells[..., :2]
    a = ells[..., 2]
    b = ells[..., 3]
    c = ells[..., 4]
    # inverse sqrt of the [[a, b], [b, c]] matrix via eigendecomposition
    M = jnp.stack(
        [jnp.stack([a, b], -1), jnp.stack([b, c], -1)], axis=-2
    )
    vals, vecs = jnp.linalg.eigh(M)
    inv_sqrt = vecs @ (
        (1.0 / jnp.sqrt(jnp.maximum(vals, 1e-9)))[..., None] * jnp.swapaxes(vecs, -1, -2)
    )
    laf = jnp.concatenate([inv_sqrt, xy[..., None]], axis=-1)
    return make_upright(laf)


def laf_to_boundary_points(laf: jax.Array, n_pts: int = 50) -> jax.Array:
    """Sample the LAF ellipse boundary (B, N, n_pts, 2)
    (reference: laf.py laf_to_boundary_points)."""
    check_laf(laf)
    t = jnp.linspace(0, 2 * jnp.pi, n_pts, dtype=laf.dtype)
    circle = jnp.stack([jnp.cos(t), jnp.sin(t), jnp.ones_like(t)], axis=-1)
    return jnp.einsum("bnij,pj->bnpi", laf, circle)


def normalize_laf(laf: jax.Array, images: jax.Array) -> jax.Array:
    """Pixel → [0, 1]-ish coords, scale by min side (reference: laf.py:316)."""
    H, W = images.shape[-2:]
    mins = float(min(H, W))
    coef = jnp.array([[1.0 / mins, 1.0 / mins, 1.0 / W],
                      [1.0 / mins, 1.0 / mins, 1.0 / H]], dtype=laf.dtype)
    return laf * coef


def denormalize_laf(laf: jax.Array, images: jax.Array) -> jax.Array:
    H, W = images.shape[-2:]
    mins = float(min(H, W))
    coef = jnp.array([[mins, mins, W], [mins, mins, H]], dtype=laf.dtype)
    return laf * coef


def laf_is_inside_image(laf: jax.Array, images: jax.Array,
                        border: int = 0) -> jax.Array:
    """(B, N) bool: LAF ellipse fully inside the image
    (reference: laf.py laf_is_touching_boundary inverse)."""
    H, W = images.shape[-2:]
    pts = laf_to_boundary_points(laf, 12)
    ok_x = (pts[..., 0] >= border) & (pts[..., 0] <= W - 1 - border)
    ok_y = (pts[..., 1] >= border) & (pts[..., 1] <= H - 1 - border)
    return jnp.all(ok_x & ok_y, axis=-1)


def laf_from_three_points(threepts: jax.Array) -> jax.Array:
    """(B, N, 2, 3) [origin, x-axis pt, y-axis pt columns] → LAF
    (reference: laf.py laf_from_three_points)."""
    c = threepts[..., :, 2]
    A = threepts[..., :, :2] - c[..., None]
    return jnp.concatenate([A, c[..., None]], axis=-1)


def laf_to_three_points(laf: jax.Array) -> jax.Array:
    c = laf[..., :, 2]
    pts = laf[..., :, :2] + c[..., None]
    return jnp.concatenate([pts, c[..., None]], axis=-1)


def perspective_transform_lafs(trans: jax.Array, lafs: jax.Array) -> jax.Array:
    """Apply (B, 3, 3) homographies to LAFs (reference: laf.py:567),
    via the three-points representation."""
    from ..geometry.linalg import transform_points
    check_laf(lafs)
    threepts = laf_to_three_points(lafs)  # (B, N, 2, 3)
    B, N = threepts.shape[:2]
    pts = jnp.swapaxes(threepts, -1, -2).reshape(B, N * 3, 2)
    warped = transform_points(trans, pts)
    warped = jnp.swapaxes(warped.reshape(B, N, 3, 2), -1, -2)
    return laf_from_three_points(warped)


def generate_patch_grid_from_normalized_laf(img: jax.Array, laf: jax.Array,
                                            PS: int = 32) -> jax.Array:
    """Sampling grid for each LAF (B, N, PS, PS, 2) in [-1, 1] coords.

    Matches the reference exactly (laf.py:379): the base grid is torch's
    ``affine_grid(align_corners=False)`` grid — pixel-centre spacing, i.e.
    linspace(-1, 1, PS) * (PS-1)/PS — mapped through the pixel-unit LAF and
    renormalized with the align-corners-TRUE formula 2*p/(size-1) - 1 (the
    reference then samples this grid with align_corners=False; that mixed
    convention is part of its observable behaviour)."""
    B, N = laf.shape[:2]
    H, W = img.shape[-2:]
    t = jnp.linspace(-1.0, 1.0, PS, dtype=laf.dtype) * ((PS - 1) / PS)
    gy, gx = jnp.meshgrid(t, t, indexing="ij")
    grid = jnp.stack([gx, gy, jnp.ones_like(gx)], axis=-1)  # (PS, PS, 3)
    pix = jnp.einsum("bnij,pqj->bnpqi", laf, grid)  # (B, N, PS, PS, 2) pixels
    # pixels → normalized [-1, 1]
    nx = 2.0 * pix[..., 0] / max(W - 1, 1) - 1.0
    ny = 2.0 * pix[..., 1] / max(H - 1, 1) - 1.0
    return jnp.stack([nx, ny], axis=-1)


def extract_patches_simple(img: jax.Array, laf: jax.Array, PS: int = 32,
                           normalize_lafs: bool = False) -> jax.Array:
    """Sample a (B, N, C, PS, PS) patch per LAF with bilinear grid_sample
    (reference: laf.py extract_patches_simple)."""
    from ..ops.warp import grid_sample
    img = as_float(img)
    B, N = laf.shape[:2]
    C = img.shape[1]
    grid = generate_patch_grid_from_normalized_laf(img, laf, PS)
    grid_flat = grid.reshape(B, N * PS, PS, 2)
    out = grid_sample(img, grid_flat, "bilinear", "border", False)
    return out.reshape(B, C, N, PS, PS).transpose(0, 2, 1, 3, 4)


def extract_patches_from_pyramid(img: jax.Array, laf: jax.Array, PS: int = 32,
                                 normalize_lafs_before: bool = True,
                                 pallas_fallback_budget: int = 64,
                                 pallas_mode: Optional[str] = None
                                 ) -> jax.Array:
    """Scale-aware patch extraction: each LAF samples from the pyramid
    level matching its scale (reference: laf.py:451).

    TPU-path caveat (ADVICE r4): at most `pallas_fallback_budget`
    keypoints whose sample extent exceeds the Pallas window budget
    (126 px per axis) are resampled exactly through the XLA fallback;
    any excess beyond the budget keeps window-clamped samples. Isotropic
    detector LAFs never exceed the window for PS <= 44; raise the budget
    (or it auto-disables the fast path — set it >= N to force exactness)
    when feeding strongly anisotropic AffNet shapes at scale.

    TPU formulation: pack every pyramid level into ONE vertically-stacked
    atlas image and run a single bilinear gather pass — per-keypoint level
    selection becomes elementwise math on (L,)-table lookups instead of
    one full gather per level (the gather is this stage's entire cost on
    TPU; one pass instead of L)."""
    img = as_float(img)
    B, N = laf.shape[:2]
    C, H, W = img.shape[1:]
    scale = get_laf_scale(laf)[..., 0, 0]  # (B, N) in pixels (radius)
    # level bookkeeping matches the reference exactly (laf.py:475-505):
    # pyr_idx = clamp(log2(2*scale/PS), 0, max_level-1), with the pyramid
    # construction stopping early once a level is smaller than PS (LAFs
    # indexed past the stop keep zero patches, as in the reference).
    max_level = min(H, W) // PS
    num_levels = max(1, max_level)
    levels = [img]
    from ..ops.pyramid import pyrdown
    for _ in range(num_levels - 1):
        nxt = pyrdown(levels[-1])
        if min(nxt.shape[-2:]) < PS:
            break
        levels.append(nxt)
    L = len(levels)
    lvl = jnp.floor(jnp.log2(jnp.maximum(2.0 * scale / PS, 1e-6)))
    lvl = jnp.clip(lvl, 0, max(0, max_level - 1)).astype(jnp.int32)  # (B, N)
    in_range = lvl <= (L - 1)
    lvl_c = jnp.minimum(lvl, L - 1)

    # --- atlas: levels stacked along y ---------------------------------
    hs = [lv.shape[-2] for lv in levels]
    ws = [lv.shape[-1] for lv in levels]
    offs = [0]
    for h_ in hs[:-1]:
        offs.append(offs[-1] + h_)
    Htot = sum(hs)
    atlas = jnp.zeros((B, C, Htot, W), img.dtype)
    for li, limg in enumerate(levels):
        atlas = atlas.at[:, :, offs[li]:offs[li] + hs[li], : ws[li]].set(limg)

    h_t = jnp.asarray(hs, laf.dtype)
    w_t = jnp.asarray(ws, laf.dtype)
    off_t = jnp.asarray(offs, laf.dtype)
    sc_t = jnp.minimum(h_t, w_t) / min(H, W)

    # patch grid in level pixel units (the reference's mixed convention:
    # affine_grid(align_corners=False) spacing, renormalized align-corners
    # -TRUE, sampled align_corners=False — reproduced per level below)
    t = jnp.linspace(-1.0, 1.0, PS, dtype=laf.dtype) * ((PS - 1) / PS)
    gy, gx = jnp.meshgrid(t, t, indexing="ij")
    grid3 = jnp.stack([gx, gy, jnp.ones_like(gx)], axis=-1)  # (PS, PS, 3)
    sc = sc_t[lvl_c]  # (B, N)
    A = laf[..., :2, :2] * sc[..., None, None]
    ctr = laf[..., :2, 2] * jnp.stack(
        [w_t[lvl_c] / W, h_t[lvl_c] / H], axis=-1)  # (B, N, 2)
    laf_l = jnp.concatenate([A, ctr[..., None]], axis=-1)
    pix = jnp.einsum("bnij,pqj->bnpqi", laf_l, grid3)  # (B, N, PS, PS, 2)

    wl = w_t[lvl_c][..., None, None]
    hl = h_t[lvl_c][..., None, None]
    # align-corners-TRUE renormalize + align-corners-FALSE sample ==
    # effective source pixel p*size/(size-1) - 0.5, then 'border' clamp
    # INSIDE the level rect (so patches never bleed across atlas rows)
    px = pix[..., 0] * wl / jnp.maximum(wl - 1.0, 1.0) - 0.5
    py = pix[..., 1] * hl / jnp.maximum(hl - 1.0, 1.0) - 0.5
    px = jnp.clip(px, 0.0, wl - 1.0)
    py = jnp.clip(py, 0.0, hl - 1.0) + off_t[lvl_c][..., None, None]

    def _xla_sample():
        nx = 2.0 * px / max(W - 1, 1) - 1.0
        ny = 2.0 * py / max(Htot - 1, 1) - 1.0
        grid = jnp.stack([nx, ny], axis=-1).reshape(B, N * PS, PS, 2)
        from ..ops.warp import grid_sample
        s = grid_sample(atlas, grid, "bilinear", "border", True)
        return s.reshape(B, C, N, PS, PS).transpose(0, 2, 1, 3, 4)

    # TPU fast path: per-keypoint DMA window + 2-hot matmul bilinear in a
    # Pallas kernel — XLA's flat gather costs ~12 ns/element, which made
    # this stage the front end's biggest cost (ROADMAP round-3 profile).
    # The kernel's window is bbox-anchored: coverage is exact while a
    # keypoint's sample extent is <= 126 px per axis. For isotropic LAFs
    # the pyramid level bounds the extent at 2*sqrt(2)*PS < 126 for
    # PS <= 44; strongly ANISOTROPIC LAFs (e.g. elongated AffNet shapes,
    # ADVICE r3 medium) can exceed it — those keypoints are resampled
    # through a BUDGETED XLA fallback: up to _FB keypoints are compacted
    # and gathered (fixed shapes, ~1 ms), NOT a lax.cond over the full
    # N-keypoint XLA path — under vmap a cond executes BOTH branches,
    # which made every batched pipeline pay the 56 ms gather path
    # (round-4 regression: 16.2 -> 4.6 pairs/s until this fix).
    use_pallas = (B == 1 and C == 1 and W >= 256 and Htot >= 128
                  and PS <= 44
                  and (jax.default_backend() == "tpu" or _FORCE_PALLAS))
    if use_pallas:
        import os
        from ..ops.pallas_kernels import patch_sample_mxu
        from ..ops.warp import grid_sample
        pxf = px.reshape(N, PS * PS)
        pyf = py.reshape(N, PS * PS)
        # y budget 118 (window 128 = pad-free MXU contraction dim),
        # x budget 126 (window 256)
        fits = ((jnp.max(pxf, 1) - jnp.min(pxf, 1) <= 126.0)
                & (jnp.max(pyf, 1) - jnp.min(pyf, 1) <= 118.0))  # (N,)
        fast = patch_sample_mxu(
            atlas[0, 0], pxf, pyf,
            interpret=jax.default_backend() != "tpu",
            mode=pallas_mode
            or os.environ.get("KORNIA_TPU_PATCH_MODE", "split"))
        _FB = min(pallas_fallback_budget, N)  # oversized-LAF budget
        bad_idx = jnp.nonzero(~fits, size=_FB, fill_value=0)[0]  # (_FB,)
        nx = 2.0 * pxf[bad_idx] / max(W - 1, 1) - 1.0
        ny = 2.0 * pyf[bad_idx] / max(Htot - 1, 1) - 1.0
        grid = jnp.stack([nx, ny], -1).reshape(1, _FB * PS * PS, 1, 2)
        slow = grid_sample(atlas[:1, :1], grid, "bilinear", "border",
                           True).reshape(_FB, PS * PS)
        patched = jnp.where(fits[bad_idx][:, None], fast[bad_idx], slow)
        out = fast.at[bad_idx].set(patched)
        out = out.reshape(1, N, 1, PS, PS)
        return jnp.where(in_range[:, :, None, None, None], out, 0.0)

    out = _xla_sample()
    return jnp.where(in_range[:, :, None, None, None], out, 0.0)
