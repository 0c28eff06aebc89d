"""Color-space conversions (reference: kornia/color/, 5.3k LoC, ~84 exports).

All ops take ``(..., C, H, W)`` float arrays in [0, 1] (unless stated) and
are pure elementwise maps — XLA fuses entire conversion chains into a
single VPU kernel, so there is no benefit to hand-written kernels here.

Conventions match the reference: HSV hue in radians [0, 2pi); Lab/Luv use
the D65 illuminant; Y'CbCr is BT.601 full-range.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..core.check import check
from ..core.dtype import as_float

__all__ = [
    "rgb_to_grayscale", "bgr_to_grayscale", "grayscale_to_rgb",
    "rgb_to_bgr", "bgr_to_rgb",
    "rgb_to_rgba", "bgr_to_rgba", "rgba_to_rgb", "rgba_to_bgr",
    "rgb_to_linear_rgb", "linear_rgb_to_rgb",
    "rgb_to_hsv", "hsv_to_rgb",
    "rgb_to_hls", "hls_to_rgb",
    "rgb_to_xyz", "xyz_to_rgb",
    "rgb_to_lab", "lab_to_rgb",
    "rgb_to_luv", "luv_to_rgb",
    "rgb_to_ycbcr", "ycbcr_to_rgb",
    "rgb_to_yuv", "yuv_to_rgb",
    "rgb_to_yuv420", "yuv420_to_rgb", "rgb_to_yuv422", "yuv422_to_rgb",
    "rgb_to_raw", "raw_to_rgb", "raw_to_rgb_2x2_downscaled", "CFA",
    "rgb_to_y", "rgb_to_rgb255", "rgb255_to_rgb",
    "normals_to_rgb255", "rgb255_to_normals",
    "sepia", "sepia_from_rgb",
    "apply_colormap",
]


def _split3(x: jax.Array) -> Tuple[jax.Array, jax.Array, jax.Array]:
    check(x.ndim >= 3 and x.shape[-3] == 3,
          f"expected (..., 3, H, W) color image, got {x.shape}")
    return x[..., 0:1, :, :], x[..., 1:2, :, :], x[..., 2:3, :, :]


def rgb_to_grayscale(image: jax.Array, rgb_weights=None) -> jax.Array:
    """(..., 3, H, W) → (..., 1, H, W). Reference: color/gray.py."""
    image = as_float(image)
    check(image.shape[-3] == 3, f"expected 3 channels, got {image.shape}")
    if rgb_weights is None:
        rgb_weights = jnp.array([0.299, 0.587, 0.114], dtype=image.dtype)
    r, g, b = _split3(image)
    w = rgb_weights
    return w[0] * r + w[1] * g + w[2] * b


def bgr_to_grayscale(image: jax.Array) -> jax.Array:
    return rgb_to_grayscale(bgr_to_rgb(image))


def grayscale_to_rgb(image: jax.Array) -> jax.Array:
    check(image.shape[-3] == 1, f"expected 1 channel, got {image.shape}")
    return jnp.concatenate([image] * 3, axis=-3)


def rgb_to_bgr(image: jax.Array) -> jax.Array:
    check(image.shape[-3] == 3, f"expected 3 channels, got {image.shape}")
    return jnp.flip(image, axis=-3)


bgr_to_rgb = rgb_to_bgr


def rgb_to_rgba(image: jax.Array, alpha_val: float = 1.0) -> jax.Array:
    check(image.shape[-3] == 3, f"expected 3 channels, got {image.shape}")
    a = jnp.full_like(image[..., :1, :, :], alpha_val)
    return jnp.concatenate([image, a], axis=-3)


def bgr_to_rgba(image: jax.Array, alpha_val: float = 1.0) -> jax.Array:
    return rgb_to_rgba(bgr_to_rgb(image), alpha_val)


def rgba_to_rgb(image: jax.Array) -> jax.Array:
    check(image.shape[-3] == 4, f"expected 4 channels, got {image.shape}")
    return image[..., :3, :, :]


def rgba_to_bgr(image: jax.Array) -> jax.Array:
    return rgb_to_bgr(rgba_to_rgb(image))


def rgb_to_linear_rgb(image: jax.Array) -> jax.Array:
    """sRGB gamma → linear (piecewise; reference: color/rgb.py)."""
    image = as_float(image)
    return jnp.where(
        image > 0.04045, jnp.power((image + 0.055) / 1.055, 2.4), image / 12.92
    )


def linear_rgb_to_rgb(image: jax.Array) -> jax.Array:
    image = as_float(image)
    safe = jnp.maximum(image, 1e-12)
    return jnp.where(
        image > 0.0031308, 1.055 * jnp.power(safe, 1 / 2.4) - 0.055, 12.92 * image
    )


def rgb_to_hsv(image: jax.Array, eps: float = 1e-8) -> jax.Array:
    """Hue in radians [0, 2pi) (reference: color/hsv.py)."""
    image = as_float(image)
    r, g, b = _split3(image)
    maxc = jnp.maximum(jnp.maximum(r, g), b)
    minc = jnp.minimum(jnp.minimum(r, g), b)
    v = maxc
    deltac = maxc - minc
    s = deltac / (maxc + eps)
    dd = jnp.where(deltac == 0, 1.0, deltac)
    rc = (maxc - r) / dd
    gc = (maxc - g) / dd
    bc = (maxc - b) / dd
    h = jnp.where(
        maxc == r, bc - gc, jnp.where(maxc == g, 2.0 + rc - bc, 4.0 + gc - rc)
    )
    h = jnp.where(deltac == 0, 0.0, h)
    h = jnp.mod(h / 6.0, 1.0) * (2.0 * jnp.pi)
    return jnp.concatenate([h, s, v], axis=-3)


def hsv_to_rgb(image: jax.Array) -> jax.Array:
    """Branch-free continuous formulation: no floor/select, so hue values
    exactly on bin boundaries (pure colors) are stable under XLA fusion —
    the floor-based reference version flips bins on 1-ulp differences."""
    image = as_float(image)
    h, s, v = _split3(image)
    h6 = h * (6.0 / (2.0 * jnp.pi))

    def channel(n):
        k = jnp.mod(n + h6, 6.0)
        return v - v * s * jnp.clip(jnp.minimum(k, 4.0 - k), 0.0, 1.0)

    return jnp.concatenate([channel(5.0), channel(3.0), channel(1.0)],
                           axis=-3)


def rgb_to_hls(image: jax.Array, eps: float = 1e-8) -> jax.Array:
    """Hue in radians (reference: color/hls.py)."""
    image = as_float(image)
    r, g, b = _split3(image)
    maxc = jnp.maximum(jnp.maximum(r, g), b)
    minc = jnp.minimum(jnp.minimum(r, g), b)
    l = (maxc + minc) / 2.0
    deltac = maxc - minc
    s = jnp.where(
        deltac == 0, 0.0,
        jnp.where(l < 0.5, deltac / (maxc + minc + eps),
                  deltac / (2.0 - maxc - minc + eps)),
    )
    dd = jnp.where(deltac == 0, 1.0, deltac)
    rc = (maxc - r) / dd
    gc = (maxc - g) / dd
    bc = (maxc - b) / dd
    h = jnp.where(
        maxc == r, bc - gc, jnp.where(maxc == g, 2.0 + rc - bc, 4.0 + gc - rc)
    )
    h = jnp.where(deltac == 0, 0.0, h)
    h = jnp.mod(h / 6.0, 1.0) * (2.0 * jnp.pi)
    return jnp.concatenate([h, l, s], axis=-3)


def hls_to_rgb(image: jax.Array) -> jax.Array:
    image = as_float(image)
    h, l, s = _split3(image)
    h = h / (2.0 * jnp.pi) * 12.0

    def f(n):
        k = jnp.mod(n + h, 12.0)
        a = s * jnp.minimum(l, 1.0 - l)
        return l - a * jnp.clip(jnp.minimum(k - 3.0, 9.0 - k), -1.0, 1.0)

    return jnp.concatenate([f(0.0), f(8.0), f(4.0)], axis=-3)


_RGB2XYZ = [[0.412453, 0.357580, 0.180423],
            [0.212671, 0.715160, 0.072169],
            [0.019334, 0.119193, 0.950227]]
_XYZ2RGB = [[3.2404813432005266, -1.5371515162713185, -0.4985363261688878],
            [-0.9692549499965682, 1.8759900014898907, 0.0415559265582928],
            [0.0556466391351772, -0.2040413383665112, 1.0573110696453443]]


def _mat3_mix(image: jax.Array, m) -> jax.Array:
    m = jnp.array(m, dtype=image.dtype)
    a, b, c = _split3(image)
    rows = [m[i, 0] * a + m[i, 1] * b + m[i, 2] * c for i in range(3)]
    return jnp.concatenate(rows, axis=-3)


def rgb_to_xyz(image: jax.Array) -> jax.Array:
    return _mat3_mix(as_float(image), _RGB2XYZ)


def xyz_to_rgb(image: jax.Array) -> jax.Array:
    return _mat3_mix(as_float(image), _XYZ2RGB)


_D65 = (0.95047, 1.0, 1.08883)  # reference lab.py white point


def rgb_to_lab(image: jax.Array) -> jax.Array:
    """CIE Lab, D65 (reference: color/lab.py — exact semantics: clamped
    cube root above the threshold, 116 f(y) − 16 for all y)."""
    image = as_float(image)
    xyz = rgb_to_xyz(rgb_to_linear_rgb(image))
    xn = jnp.array(_D65, dtype=image.dtype)
    x, y, z = _split3(xyz)
    x, y, z = x / xn[0], y / xn[1], z / xn[2]
    thresh = 0.008856

    def f(t):
        return jnp.where(t > thresh,
                         jnp.cbrt(jnp.clip(t, thresh, None)),
                         7.787 * t + 4.0 / 29.0)

    fx, fy, fz = f(x), f(y), f(z)
    L = 116.0 * fy - 16.0
    a = 500.0 * (fx - fy)
    b = 200.0 * (fy - fz)
    return jnp.concatenate([L, a, b], axis=-3)


def lab_to_rgb(image: jax.Array, clip: bool = True) -> jax.Array:
    """(reference: color/lab.py lab_to_rgb)."""
    image = as_float(image)
    L, a, b = _split3(image)
    fy = (L + 16.0) / 116.0
    fx = fy + a / 500.0
    fz = fy - b / 200.0

    def finv(t):
        t3 = t**3
        return jnp.where(t3 > 0.008856, t3, (t - 4.0 / 29.0) / 7.787)

    xn = jnp.array(_D65, dtype=image.dtype)
    x = finv(fx) * xn[0]
    y = finv(fy) * xn[1]
    z = finv(fz) * xn[2]
    rgb = linear_rgb_to_rgb(xyz_to_rgb(jnp.concatenate([x, y, z], axis=-3)))
    return jnp.clip(rgb, 0.0, 1.0) if clip else rgb


def rgb_to_luv(image: jax.Array, eps: float = 1e-12) -> jax.Array:
    """CIE Luv, D65 (reference: color/luv.py)."""
    image = as_float(image)
    xyz = rgb_to_xyz(rgb_to_linear_rgb(image))
    x, y, z = _split3(xyz)
    L = jnp.where(y > 0.008856, 116.0 * jnp.cbrt(jnp.maximum(y, eps)) - 16.0,
                  903.3 * y)
    d = x + 15.0 * y + 3.0 * z + eps
    u_p = 4.0 * x / d
    v_p = 9.0 * y / d
    xn, yn, zn = _D65
    dn = xn + 15.0 * yn + 3.0 * zn
    un = 4.0 * xn / dn
    vn = 9.0 * yn / dn
    u = 13.0 * L * (u_p - un)
    v = 13.0 * L * (v_p - vn)
    return jnp.concatenate([L, u, v], axis=-3)


def luv_to_rgb(image: jax.Array, eps: float = 1e-12) -> jax.Array:
    image = as_float(image)
    L, u, v = _split3(image)
    xn, yn, zn = _D65
    dn = xn + 15.0 * yn + 3.0 * zn
    un = 4.0 * xn / dn
    vn = 9.0 * yn / dn
    y = jnp.where(L > 7.999625, ((L + 16.0) / 116.0) ** 3, L / 903.3) * yn
    Ls = jnp.where(L == 0, eps, L)
    u_p = u / (13.0 * Ls) + un
    v_p = v / (13.0 * Ls) + vn
    v_ps = jnp.where(v_p == 0, eps, v_p)
    x = y * 9.0 * u_p / (4.0 * v_ps)
    z = y * (12.0 - 3.0 * u_p - 20.0 * v_p) / (4.0 * v_ps)
    return linear_rgb_to_rgb(xyz_to_rgb(jnp.concatenate([x, y, z], axis=-3)))


def rgb_to_ycbcr(image: jax.Array) -> jax.Array:
    """BT.601 full-range, Cb/Cr centered at 0.5 (reference: color/ycbcr.py)."""
    image = as_float(image)
    r, g, b = _split3(image)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = (b - y) * 0.564 + 0.5
    cr = (r - y) * 0.713 + 0.5
    return jnp.concatenate([y, cb, cr], axis=-3)


def ycbcr_to_rgb(image: jax.Array) -> jax.Array:
    image = as_float(image)
    y, cb, cr = _split3(image)
    cb = cb - 0.5
    cr = cr - 0.5
    r = y + 1.403 * cr
    g = y - 0.714 * cr - 0.344 * cb
    b = y + 1.773 * cb
    # reference clamps to [0, 1] (color/ycbcr.py ycbcr_to_rgb)
    return jnp.clip(jnp.concatenate([r, g, b], axis=-3), 0.0, 1.0)


def rgb_to_yuv(image: jax.Array) -> jax.Array:
    image = as_float(image)
    r, g, b = _split3(image)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    u = -0.147 * r - 0.289 * g + 0.436 * b
    v = 0.615 * r - 0.515 * g - 0.100 * b
    return jnp.concatenate([y, u, v], axis=-3)


def yuv_to_rgb(image: jax.Array) -> jax.Array:
    image = as_float(image)
    y, u, v = _split3(image)
    r = y + 1.14 * v
    g = y - 0.396 * u - 0.581 * v
    b = y + 2.029 * u
    return jnp.concatenate([r, g, b], axis=-3)


def rgb_to_yuv420(image: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """→ (Y (...,1,H,W), UV (...,2,H/2,W/2)) chroma-subsampled
    (reference: color/yuv.py:536)."""
    yuv = rgb_to_yuv(image)
    y = yuv[..., 0:1, :, :]
    uv = yuv[..., 1:3, :, :]
    B = uv.shape[:-3]
    H, W = uv.shape[-2:]
    uv = uv.reshape(*B, 2, H // 2, 2, W // 2, 2).mean(axis=(-3, -1))
    return y, uv


def yuv420_to_rgb(y: jax.Array, uv: jax.Array) -> jax.Array:
    uv_full = jnp.repeat(jnp.repeat(uv, 2, axis=-2), 2, axis=-1)
    return yuv_to_rgb(jnp.concatenate([y, uv_full], axis=-3))


def rgb_to_yuv422(image: jax.Array) -> Tuple[jax.Array, jax.Array]:
    yuv = rgb_to_yuv(image)
    y = yuv[..., 0:1, :, :]
    uv = yuv[..., 1:3, :, :]
    B = uv.shape[:-3]
    H, W = uv.shape[-2:]
    uv = uv.reshape(*B, 2, H, W // 2, 2).mean(axis=-1)
    return y, uv


def yuv422_to_rgb(y: jax.Array, uv: jax.Array) -> jax.Array:
    uv_full = jnp.repeat(uv, 2, axis=-1)
    return yuv_to_rgb(jnp.concatenate([y, uv_full], axis=-3))


import enum


class CFA(enum.Enum):
    """Bayer color-filter-array layouts, OpenCV naming (reference:
    color/raw.py:30 — ``BG`` means pixel (1,1) is blue)."""

    BG = 0
    GB = 1
    RG = 2
    GR = 3


# CFA layouts: position of (R, Gr, Gb, B) in each 2x2 Bayer cell
_CFA = {"BG": ((0, 0), (0, 1), (1, 0), (1, 1)),
        "GB": ((0, 1), (0, 0), (1, 1), (1, 0)),
        "RG": ((1, 1), (1, 0), (0, 1), (0, 0)),
        "GR": ((1, 0), (1, 1), (0, 0), (0, 1))}


def _cfa_key(cfa) -> str:
    return cfa.name if isinstance(cfa, CFA) else str(cfa)


def rgb_to_raw(image: jax.Array, cfa: str = "BG") -> jax.Array:
    """Mosaic an RGB image into a single-channel Bayer pattern
    (reference: color/raw.py:405)."""
    image = as_float(image)
    H, W = image.shape[-2:]
    ry = jnp.arange(H)[:, None] % 2
    rx = jnp.arange(W)[None, :] % 2
    (r_p, gr_p, gb_p, b_p) = _CFA[_cfa_key(cfa)]
    r, g, b = _split3(image)
    sel_r = (ry == r_p[0]) & (rx == r_p[1])
    sel_b = (ry == b_p[0]) & (rx == b_p[1])
    out = jnp.where(sel_r, r, jnp.where(sel_b, b, g))
    return out


def raw_to_rgb(image: jax.Array, cfa: str = "BG") -> jax.Array:
    """Bilinear demosaic of a Bayer image (reference: color/raw.py)."""
    image = as_float(image)
    check(image.shape[-3] == 1, f"expected 1 channel raw, got {image.shape}")
    H, W = image.shape[-2:]
    ry = (jnp.arange(H)[:, None] % 2)
    rx = (jnp.arange(W)[None, :] % 2)
    (r_p, gr_p, gb_p, b_p) = _CFA[_cfa_key(cfa)]
    m_r = ((ry == r_p[0]) & (rx == r_p[1])).astype(image.dtype)
    m_b = ((ry == b_p[0]) & (rx == b_p[1])).astype(image.dtype)
    m_g = 1.0 - m_r - m_b
    from .filters import filter2d
    kern_rb = jnp.array([[[0.25, 0.5, 0.25], [0.5, 1.0, 0.5], [0.25, 0.5, 0.25]]],
                        dtype=image.dtype)
    kern_g = jnp.array([[[0.0, 0.25, 0.0], [0.25, 1.0, 0.25], [0.0, 0.25, 0.0]]],
                       dtype=image.dtype)

    def interp(masked, kern, mask):
        num = filter2d(masked, kern, border_type="reflect", padding="same")
        den = filter2d(jnp.broadcast_to(mask, masked.shape), kern,
                       border_type="reflect", padding="same")
        return num / jnp.maximum(den, 1e-8)

    r = interp(image * m_r, kern_rb, m_r[None])
    g = interp(image * m_g, kern_g, m_g[None])
    b = interp(image * m_b, kern_rb, m_b[None])
    return jnp.concatenate([r, g, b], axis=-3)


def raw_to_rgb_2x2_downscaled(image: jax.Array, cfa="BG") -> jax.Array:
    """Half-resolution demosaic: each 2x2 Bayer cell becomes one RGB pixel,
    greens averaged (reference: color/raw.py:236)."""
    image = as_float(image)
    check(image.shape[-3] == 1, f"expected 1 channel raw, got {image.shape}")
    H, W = image.shape[-2:]
    check(H % 2 == 0 and W % 2 == 0, f"H/W must be even, got {(H, W)}")
    (r_p, gr_p, gb_p, b_p) = _CFA[_cfa_key(cfa)]
    cells = image.reshape(*image.shape[:-2], H // 2, 2, W // 2, 2)
    cells = jnp.moveaxis(cells, -3, -2)  # (..., 1, H/2, W/2, 2, 2)
    r = cells[..., r_p[0], r_p[1]]
    g = 0.5 * (cells[..., gr_p[0], gr_p[1]] + cells[..., gb_p[0], gb_p[1]])
    b = cells[..., b_p[0], b_p[1]]
    return jnp.concatenate([r, g, b], axis=-3)


def rgb_to_y(image: jax.Array) -> jax.Array:
    """RGB → luma Y (..., 1, H, W) (reference: color/ycbcr.py:64)."""
    image = as_float(image)
    check(image.shape[-3] == 3, f"expected 3 channels, got {image.shape}")
    r, g, b = _split3(image)
    return 0.299 * r + 0.587 * g + 0.114 * b


def rgb_to_rgb255(image: jax.Array) -> jax.Array:
    """[0,1] RGB → clipped [0,255] RGB (reference: color/rgb.py:254)."""
    return jnp.clip(as_float(image) * 255.0, 0.0, 255.0)


def rgb255_to_rgb(image: jax.Array) -> jax.Array:
    """[0,255] RGB → [0,1] RGB (reference: color/rgb.py:311)."""
    return as_float(image) / 255.0


def normals_to_rgb255(image: jax.Array) -> jax.Array:
    """Unit surface normals → [0,255] RGB (reference: color/rgb.py:284)."""
    return jnp.clip(0.5 * (as_float(image) + 1.0), 0.0, 1.0) * 255.0


def rgb255_to_normals(image: jax.Array, eps: float = 1e-12) -> jax.Array:
    """[0,255] RGB → L2-normalized surface normals
    (reference: color/rgb.py:341)."""
    n = (as_float(image) / 255.0) * 2.0 - 1.0
    norm = jnp.linalg.norm(n, axis=-3, keepdims=True)
    return n / jnp.maximum(norm, eps)


def sepia(image: jax.Array, rescale: bool = True, eps: float = 1e-6) -> jax.Array:
    """Sepia tone (reference: color/sepia.py — rescale divides by the
    per-channel max)."""
    image = as_float(image)
    m = [[0.393, 0.769, 0.189], [0.349, 0.686, 0.168], [0.272, 0.534, 0.131]]
    out = _mat3_mix(image, m)
    if rescale:
        mx = jnp.max(out, axis=(-2, -1), keepdims=True)
        out = out / (mx + eps)
    return out


# reference exports the functional under both names (color/sepia.py)
sepia_from_rgb = sepia


def apply_colormap(gray: jax.Array, colormap: jax.Array) -> jax.Array:
    """Map (..., 1, H, W) in [0,1] through an (N, 3) colormap with linear
    interpolation (reference: color/colormap.py:320)."""
    gray = as_float(gray)
    n = colormap.shape[0]
    t = jnp.clip(gray[..., 0, :, :], 0.0, 1.0) * (n - 1)
    i0 = jnp.floor(t).astype(jnp.int32)
    i1 = jnp.minimum(i0 + 1, n - 1)
    w = (t - i0)[..., None]
    c = colormap[i0] * (1 - w) + colormap[i1] * w  # (..., H, W, 3)
    return jnp.moveaxis(c, -1, -3)
