"""Intensity / enhancement ops (reference: kornia/enhance/, 4.5k LoC).

Pure elementwise + reduction pipelines; XLA fuses every adjust chain into
one VPU kernel. Histogram ops use the reference's kernel-density
("soft histogram") formulation which is differentiable and matmul-shaped
(bins x pixels contraction → MXU-friendly).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from ..core.check import check
from ..core.dtype import as_float

__all__ = [
    "add_weighted",
    "adjust_brightness",
    "adjust_brightness_accumulative",
    "adjust_contrast",
    "adjust_contrast_with_mean_subtraction",
    "adjust_saturation", "adjust_saturation_with_gray_subtraction",
    "adjust_hue",
    "adjust_gamma",
    "adjust_sigmoid",
    "adjust_log",
    "invert",
    "solarize",
    "posterize",
    "sharpness",
    "equalize",
    "equalize3d",
    "equalize_clahe",
    "normalize",
    "denormalize",
    "normalize_min_max",
    "histogram",
    "histogram2d",
    "image_histogram2d",
    "integral_tensor",
    "integral_image",
    "zca_mean",
    "zca_whiten",
    "shift_rgb",
    "threshold_binary",
    "otsu_threshold",
]


def add_weighted(src1: jax.Array, alpha: float, src2: jax.Array, beta: float,
                 gamma: float) -> jax.Array:
    """(reference: enhance/core.py:26)."""
    return as_float(src1) * alpha + as_float(src2) * beta + gamma


def adjust_brightness(image: jax.Array, factor, clip_output: bool = True) -> jax.Array:
    """Additive brightness (Szeliski convention — reference:
    enhance/adjust.py adjust_brightness)."""
    image = as_float(image)
    factor = _bcast_factor(factor, image)
    out = image + factor
    return jnp.clip(out, 0.0, 1.0) if clip_output else out


def adjust_brightness_accumulative(image: jax.Array, factor,
                                   clip_output: bool = True) -> jax.Array:
    """Multiplicative (accumulative) brightness (reference:
    adjust.py adjust_brightness_accumulative)."""
    image = as_float(image)
    factor = _bcast_factor(factor, image)
    out = image * factor
    return jnp.clip(out, 0.0, 1.0) if clip_output else out


def _bcast_factor(factor, image: jax.Array) -> jax.Array:
    f = jnp.asarray(factor, dtype=image.dtype)
    if f.ndim == 0:
        return f
    return f.reshape(f.shape[0], *([1] * (image.ndim - 1)))


def adjust_contrast(image: jax.Array, factor, clip_output: bool = True) -> jax.Array:
    image = as_float(image)
    factor = _bcast_factor(factor, image)
    out = image * factor
    return jnp.clip(out, 0.0, 1.0) if clip_output else out


def adjust_contrast_with_mean_subtraction(image: jax.Array, factor) -> jax.Array:
    """(reference: adjust.py adjust_contrast_with_mean_subtraction)."""
    image = as_float(image)
    factor = _bcast_factor(factor, image)
    from .color import rgb_to_grayscale
    if image.shape[-3] == 3:
        mean = jnp.mean(rgb_to_grayscale(image), axis=(-3, -2, -1), keepdims=True)
    else:
        mean = jnp.mean(image, axis=(-3, -2, -1), keepdims=True)
    return jnp.clip(image * factor + mean * (1.0 - factor), 0.0, 1.0)


def adjust_saturation(image: jax.Array, factor) -> jax.Array:
    """Scale the HSV saturation channel (reference: adjust.py
    adjust_saturation via adjust_saturation_raw)."""
    image = as_float(image)
    factor = _bcast_factor(factor, image)
    from .color import hsv_to_rgb, rgb_to_hsv
    hsv = rgb_to_hsv(image)
    s = jnp.clip(hsv[..., 1:2, :, :] * factor, 0.0, 1.0)
    return hsv_to_rgb(jnp.concatenate(
        [hsv[..., 0:1, :, :], s, hsv[..., 2:3, :, :]], axis=-3))


def adjust_saturation_with_gray_subtraction(image: jax.Array, factor
                                            ) -> jax.Array:
    """Torchvision-style blend with grayscale (reference: adjust.py
    adjust_saturation_with_gray_subtraction)."""
    image = as_float(image)
    factor = _bcast_factor(factor, image)
    from .color import rgb_to_grayscale
    gray = rgb_to_grayscale(image)
    return jnp.clip(image * factor + gray * (1.0 - factor), 0.0, 1.0)


def adjust_hue(image: jax.Array, factor) -> jax.Array:
    """Shift hue by `factor` radians (reference: adjust.py adjust_hue)."""
    image = as_float(image)
    from .color import rgb_to_hsv, hsv_to_rgb
    factor = _bcast_factor(factor, image)
    hsv = rgb_to_hsv(image)
    h = jnp.mod(hsv[..., 0:1, :, :] + factor, 2.0 * jnp.pi)
    return hsv_to_rgb(jnp.concatenate([h, hsv[..., 1:, :, :]], axis=-3))


def adjust_gamma(image: jax.Array, gamma, gain=1.0) -> jax.Array:
    image = as_float(image)
    gamma = _bcast_factor(gamma, image)
    gain = _bcast_factor(gain, image)
    return jnp.clip(gain * jnp.power(jnp.maximum(image, 1e-12), gamma), 0.0, 1.0)


def adjust_sigmoid(image: jax.Array, cutoff: float = 0.5, gain: float = 10.0,
                   inv: bool = False) -> jax.Array:
    image = as_float(image)
    out = 1.0 / (1.0 + jnp.exp(gain * (cutoff - image)))
    return 1.0 - out if inv else out


def adjust_log(image: jax.Array, gain: float = 1.0, inv: bool = False,
               clip_output: bool = True) -> jax.Array:
    image = as_float(image)
    if inv:
        out = gain * (jnp.exp2(image) - 1.0)
    else:
        out = gain * jnp.log2(1.0 + image)
    return jnp.clip(out, 0.0, 1.0) if clip_output else out


def invert(image: jax.Array, max_val: float = 1.0) -> jax.Array:
    return max_val - as_float(image)


def solarize(image: jax.Array, thresholds=0.5, additions=None) -> jax.Array:
    """(reference: adjust.py solarize)."""
    image = as_float(image)
    th = _bcast_factor(thresholds, image)
    if additions is not None:
        add = _bcast_factor(additions, image)
        image = jnp.clip(image + add, 0.0, 1.0)
    return jnp.where(image >= th, 1.0 - image, image)


def posterize(image: jax.Array, bits) -> jax.Array:
    """Reduce to `bits` bits per channel (reference: adjust.py posterize)."""
    image = as_float(image)
    if isinstance(bits, int) and not 0 <= bits <= 8:
        raise ValueError(f"posterize bits must be in [0, 8], got {bits}")
    bits = jnp.asarray(bits)
    if bits.ndim == 0:
        q = jnp.floor(image * 255.0).astype(jnp.int32)
        shift = (8 - bits).astype(jnp.int32)
        q = (q >> shift) << shift
        out = q.astype(image.dtype) / 255.0
        # bits == 8 is EXACT identity in the reference (adjust.py posterize
        # doctest asserts it) — no uint8 round trip
        return jnp.where(bits == 8, image, out)
    shift = (8 - bits).astype(jnp.int32).reshape(-1, *([1] * (image.ndim - 1)))
    q = jnp.floor(image * 255.0).astype(jnp.int32)
    q = (q >> shift) << shift
    out = q.astype(image.dtype) / 255.0
    bits_b = bits.reshape(-1, *([1] * (image.ndim - 1)))
    return jnp.where(bits_b == 8, image, out)


def sharpness(image: jax.Array, factor) -> jax.Array:
    """Interpolate blurred→input by `factor` (0 = blurred, 1 = input,
    >1 = sharpened); border pixels stay untouched (reference: adjust.py
    sharpness — exact torch semantics)."""
    image = as_float(image)
    factor = _bcast_factor(factor, image)
    from .filters import filter2d
    kern = jnp.array([[[1.0, 1.0, 1.0], [1.0, 5.0, 1.0], [1.0, 1.0, 1.0]]],
                     dtype=image.dtype) / 13.0
    smooth = jnp.clip(
        filter2d(image, kern, border_type="constant"), 0.0, 1.0)
    # valid conv interior only; borders keep the input
    mask = jnp.zeros(image.shape[-2:], dtype=image.dtype)
    mask = mask.at[1:-1, 1:-1].set(1.0)
    result = image * (1.0 - mask) + smooth * mask
    return jnp.clip(result + (image - result) * factor, 0.0, 1.0)


def equalize(image: jax.Array) -> jax.Array:
    """Per-image, per-channel histogram equalization over 256 levels —
    exact torch/PIL integer LUT algorithm (reference: adjust.py equalize,
    _scale_channel/_build_lut)."""
    image = as_float(image)

    def eq_plane(p: jax.Array) -> jax.Array:
        v = jnp.clip(p * 255.0, 0, 255)
        q = v.astype(jnp.int32)  # truncation, like torch .long()
        # torch histc over [0, 255] with 256 bins has bin width 255/256 —
        # a DIFFERENT quantization than the LUT lookup's truncation
        hist_idx = jnp.clip((v * (256.0 / 255.0)).astype(jnp.int32), 0, 255)
        hist = jnp.zeros((256,), jnp.int32).at[hist_idx.reshape(-1)].add(1)
        last_nz_val = hist[jnp.argmax(
            jnp.where(hist > 0, jnp.arange(256), -1))]
        step = (jnp.sum(hist) - last_nz_val) // 255
        step_safe = jnp.maximum(step, 1)
        lut = (jnp.cumsum(hist) + step // 2) // step_safe
        lut = jnp.concatenate([jnp.zeros(1, lut.dtype), lut[:-1]])
        lut = jnp.clip(lut, 0, 255)
        out = lut[q].astype(p.dtype) / 255.0
        return jnp.where(step == 0, p, out)

    flat = image.reshape(-1, *image.shape[-2:])
    out = jax.vmap(eq_plane)(flat)
    return out.reshape(image.shape)


def equalize3d(volume: jax.Array) -> jax.Array:
    """(B, C, D, H, W) equalization over the volume (reference: adjust.py)."""
    v = as_float(volume)
    B, C, D, H, W = v.shape
    # equalize per (batch, channel) over the whole volume
    out = equalize(v.reshape(B * C, 1, D * H, W))
    return out.reshape(B, C, D, H, W)


def equalize_clahe(
    image: jax.Array,
    clip_limit: float = 40.0,
    grid_size: Tuple[int, int] = (8, 8),
    slow_and_differentiable: bool = False,
) -> jax.Array:
    """CLAHE with EXACT reference/OpenCV semantics (equalization.py:332):
    histc-binned integer histograms, floor'd OpenCV clip redistribution
    (uniform + first-`residual`-bins trick), floor'd integer LUTs, and
    half-tile interpolation (corner half-tiles take one LUT, borders two,
    interior four) — reproduced here as clipped LUT-index pairs with
    parity-selected half-tile weight ramps, so no special-casing is
    needed. All tiles batched; LUT lookups are flat gathers.

    `slow_and_differentiable=True` keeps a smooth variant (soft
    histogram, continuous interpolation) mirroring the reference's
    differentiable mode in role.
    """
    image = as_float(image)
    orig_shape = image.shape
    img = image.reshape(-1, *orig_shape[-3:])  # (B, C, H, W)
    B, C, H, W = img.shape
    gh, gw = grid_size
    nbins = 256
    # tile size: ceil, forced EVEN (reference _compute_tiles even_tile_size)
    th = -(-H // gh)
    tw = -(-W // gw)
    th += th % 2
    tw += tw % 2
    Hp, Wp = th * gh, tw * gw
    img_p = jnp.pad(img, [(0, 0), (0, 0), (0, Hp - H), (0, Wp - W)],
                    mode="reflect")
    tiles = img_p.reshape(B, C, gh, th, gw, tw).transpose(0, 1, 2, 4, 3, 5)
    tiles = tiles.reshape(B * C * gh * gw, th * tw)
    pixels = th * tw

    if slow_and_differentiable:
        # smooth histogram + continuous bilinear LUT interpolation
        q = jnp.clip(jnp.floor(tiles * (nbins - 1) + 0.5), 0,
                     nbins - 1).astype(jnp.int32)
        hist = jax.vmap(lambda qq: jnp.zeros((nbins,), jnp.float32)
                        .at[qq].add(1.0))(q)
        if clip_limit > 0:
            limit = jnp.maximum(clip_limit * pixels / nbins, 1.0)
            excess = jnp.sum(jnp.maximum(hist - limit, 0.0), axis=-1,
                             keepdims=True)
            hist = jnp.minimum(hist, limit) + excess / nbins
        cdf = jnp.cumsum(hist, axis=-1)
        cdf = cdf / cdf[..., -1:]
        luts = cdf.reshape(B, C, gh, gw, nbins)
        ys = jnp.arange(H, dtype=img.dtype)
        xs = jnp.arange(W, dtype=img.dtype)
        ty = ys / th - 0.5
        tx = xs / tw - 0.5
        ty0 = jnp.clip(jnp.floor(ty), 0, gh - 1).astype(jnp.int32)
        tx0 = jnp.clip(jnp.floor(tx), 0, gw - 1).astype(jnp.int32)
        ty1 = jnp.clip(ty0 + 1, 0, gh - 1)
        tx1 = jnp.clip(tx0 + 1, 0, gw - 1)
        wy = jnp.clip(ty - ty0, 0.0, 1.0)[:, None]
        wx = jnp.clip(tx - tx0, 0.0, 1.0)[None, :]
        qimg = jnp.clip(jnp.floor(img * (nbins - 1) + 0.5), 0,
                        nbins - 1).astype(jnp.int32)

        def lut_at(t_y, t_x):
            l = luts[:, :, t_y[:, None], t_x[None, :], :]
            return jnp.take_along_axis(l, qimg[..., None], axis=-1)[..., 0]

        v00 = lut_at(ty0, tx0)
        v01 = lut_at(ty0, tx1)
        v10 = lut_at(ty1, tx0)
        v11 = lut_at(ty1, tx1)
        out = (v00 * (1 - wy) * (1 - wx) + v01 * (1 - wy) * wx
               + v10 * wy * (1 - wx) + v11 * wy * wx)
        return out.astype(image.dtype).reshape(orig_shape)

    # --- exact integer path --------------------------------------------
    # histc semantics: bin = floor(x * 256), value 1.0 lands in bin 255
    q = jnp.clip(jnp.floor(tiles * nbins), 0, nbins - 1).astype(jnp.int32)
    hist = jax.vmap(lambda qq: jnp.zeros((nbins,), jnp.float32)
                    .at[qq].add(1.0))(q)
    if clip_limit > 0:
        # OpenCV redistribution (reference _compute_luts:174-183)
        max_val = max(clip_limit * pixels // nbins, 1.0)
        hist = jnp.minimum(hist, max_val)
        clipped = pixels - jnp.sum(hist, axis=-1, keepdims=True)
        residual = jnp.mod(clipped, float(nbins))
        hist = hist + (clipped - residual) / nbins
        hist = hist + (jnp.arange(nbins, dtype=hist.dtype)[None]
                       < residual).astype(hist.dtype)
    luts = jnp.floor(jnp.clip(jnp.cumsum(hist, axis=-1)
                              * ((nbins - 1) / pixels), 0, nbins - 1))
    luts = luts.reshape(B, C, gh, gw, nbins)

    # half-tile interpolation: half-tile row rr interpolates between tile
    # rows (rr-1)//2 and (rr+1)//2 (clipped — corners/borders collapse to
    # identical LUTs), with the reference's descending weight ramp
    # seq(k) = (2hh-1-k)/(2hh-1) windowed by half-tile parity
    hh, hw = th // 2, tw // 2
    ys = jnp.arange(Hp)
    xs = jnp.arange(Wp)
    rr = ys // hh
    cc = xs // hw
    k = ys % hh
    l = xs % hw
    jt = jnp.clip((rr - 1) // 2, 0, gh - 1)
    jb = jnp.clip((rr + 1) // 2, 0, gh - 1)
    il = jnp.clip((cc - 1) // 2, 0, gw - 1)
    ir = jnp.clip((cc + 1) // 2, 0, gw - 1)
    # odd half-row -> window0 (seq[k]), even -> window1 (seq[hh + k])
    wv = ((2 * hh - 1) - (k + hh * (1 - rr % 2))) / (2.0 * hh - 1)
    wh = ((2 * hw - 1) - (l + hw * (1 - cc % 2))) / (2.0 * hw - 1)
    wv = wv.astype(img.dtype)[None, None, :, None]
    wh = wh.astype(img.dtype)[None, None, None, :]

    # pixel LUT index: (x * 255) truncated (reference gather, line 277)
    qimg = jnp.clip((img_p * (nbins - 1.0)), 0,
                    nbins - 1).astype(jnp.int32)
    flat = luts.reshape(B, C, gh * gw * nbins)

    def lut_at(jv, iv):
        idx = ((jv[:, None] * gw + iv[None, :]) * nbins
               + qimg)  # (B, C, Hp, Wp)
        g = jnp.take_along_axis(flat, idx.reshape(B, C, -1), axis=-1)
        return g.reshape(B, C, Hp, Wp)

    vtl = lut_at(jt, il)
    vtr = lut_at(jt, ir)
    vbl = lut_at(jb, il)
    vbr = lut_at(jb, ir)
    top = vtr + wh * (vtl - vtr)
    bot = vbr + wh * (vbl - vbr)
    out = (bot + wv * (top - bot)) / (nbins - 1.0)
    return out[..., :H, :W].astype(image.dtype).reshape(orig_shape)


def normalize(image: jax.Array, mean, std) -> jax.Array:
    """(reference: enhance/normalize.py)."""
    image = as_float(image)
    mean = jnp.asarray(mean, image.dtype).reshape(-1, 1, 1)
    std = jnp.asarray(std, image.dtype).reshape(-1, 1, 1)
    return (image - mean) / std


def denormalize(image: jax.Array, mean, std) -> jax.Array:
    image = as_float(image)
    mean = jnp.asarray(mean, image.dtype).reshape(-1, 1, 1)
    std = jnp.asarray(std, image.dtype).reshape(-1, 1, 1)
    return image * std + mean


def normalize_min_max(image: jax.Array, min_val: float = 0.0, max_val: float = 1.0,
                      eps: float = 1e-6) -> jax.Array:
    """PER-CHANNEL min-max rescale to [min_val, max_val] (reference:
    enhance/normalize.py:305 reduces over (B, C, -1), NOT per-image —
    round-5 parity batch 3 caught the per-image variant at 7e-3 off)."""
    image = as_float(image)
    B, C = image.shape[0], image.shape[1]
    mn = jnp.min(image.reshape(B, C, -1), axis=-1).reshape(B, C, 1, 1)
    mx = jnp.max(image.reshape(B, C, -1), axis=-1).reshape(B, C, 1, 1)
    return (max_val - min_val) * (image - mn) / (mx - mn + eps) + min_val


def histogram(x: jax.Array, bins: jax.Array, bandwidth: jax.Array,
              epsilon: float = 1e-10) -> jax.Array:
    """Differentiable soft histogram via triangular-ish gaussian KDE
    (reference: enhance/histogram.py:105). x: (B, N) → (B, bins)."""
    x = as_float(x)
    residuals = x[:, None, :] - bins.astype(x.dtype)[None, :, None]
    kernel = jnp.exp(-0.5 * (residuals / bandwidth) ** 2)
    pdf = jnp.mean(kernel, axis=-1)
    return pdf / (jnp.sum(pdf, axis=-1, keepdims=True) + epsilon)


def histogram2d(x1: jax.Array, x2: jax.Array, bins: jax.Array,
                bandwidth: jax.Array, epsilon: float = 1e-10) -> jax.Array:
    """Joint soft histogram (B, bins, bins) (reference: histogram.py:132).

    The joint accumulation is an (bins, N) x (N, bins) matmul → MXU."""
    x1 = as_float(x1)
    x2 = as_float(x2)
    b = bins.astype(x1.dtype)
    k1 = jnp.exp(-0.5 * ((x1[:, None, :] - b[None, :, None]) / bandwidth) ** 2)
    k2 = jnp.exp(-0.5 * ((x2[:, None, :] - b[None, :, None]) / bandwidth) ** 2)
    joint = jnp.einsum("bin,bjn->bij", k1, k2) / x1.shape[-1]
    return joint / (jnp.sum(joint, axis=(-2, -1), keepdims=True) + epsilon)


def image_histogram2d(
    image: jax.Array, min_val: float = 0.0, max_val: float = 255.0,
    n_bins: int = 256, bandwidth: Optional[float] = None,
    centers: Optional[jax.Array] = None, return_pdf: bool = False,
):
    """(reference: histogram.py:166). Returns (hist, pdf)."""
    image = as_float(image)
    if bandwidth is None:
        bandwidth = (max_val - min_val) / n_bins
    if centers is None:
        centers = min_val + bandwidth * (jnp.arange(n_bins, dtype=image.dtype) + 0.5)
    u = jnp.abs(image[..., None] - centers) / bandwidth
    mask = (u <= 1.0).astype(image.dtype)
    hist = jnp.sum(mask, axis=(-4, -3, -2)) if image.ndim >= 4 else jnp.sum(
        mask, axis=tuple(range(image.ndim - 1, image.ndim)))
    hist = jnp.sum(mask.reshape(*image.shape[:-2], -1, n_bins), axis=-2)
    pdf = hist / (jnp.sum(hist, axis=-1, keepdims=True) + 1e-10)
    if return_pdf:
        return hist, pdf
    return hist, jnp.zeros_like(pdf)


def integral_tensor(x: jax.Array) -> jax.Array:
    """Summed-area table over the last 2 dims (reference: enhance/integral.py:26)."""
    return jnp.cumsum(jnp.cumsum(as_float(x), axis=-1), axis=-2)


def integral_image(image: jax.Array) -> jax.Array:
    return integral_tensor(image)


def zca_mean(x: jax.Array, dim: int = 0, unbiased: bool = True,
             eps: float = 1e-7, return_inverse: bool = False):
    """ZCA whitening transform (reference: enhance/zca.py:178).
    Returns (T, mean[, T_inv]); x is flattened except `dim`."""
    x = as_float(x)
    x2 = jnp.moveaxis(x, dim, 0)
    N = x2.shape[0]
    flat = x2.reshape(N, -1)
    mean = jnp.mean(flat, axis=0, keepdims=True)
    xc = flat - mean
    denom = N - 1 if unbiased else N
    cov = xc.T @ xc / denom
    # eps enters ONCE, inside the rsqrt (reference zca.py:178 adds it to
    # the singular values only — adding it to cov too doubled the shift)
    U, S, _ = jnp.linalg.svd(cov)
    s_inv_sqrt = 1.0 / jnp.sqrt(S + eps)
    T = (U * s_inv_sqrt[None, :]) @ U.T
    if return_inverse:
        T_inv = (U * jnp.sqrt(S + eps)[None, :]) @ U.T
        return T, mean, T_inv
    return T, mean


def zca_whiten(x: jax.Array, dim: int = 0, unbiased: bool = True,
               eps: float = 1e-7) -> jax.Array:
    """(reference: enhance/zca.py:276)."""
    x = as_float(x)
    T, mean = zca_mean(x, dim, unbiased, eps)
    x2 = jnp.moveaxis(x, dim, 0)
    N = x2.shape[0]
    flat = x2.reshape(N, -1)
    out = (flat - mean) @ T
    return jnp.moveaxis(out.reshape(x2.shape), 0, dim)


def shift_rgb(image: jax.Array, r_shift, g_shift, b_shift) -> jax.Array:
    """(reference: enhance/shift_rgb.py)."""
    image = as_float(image)
    shifts = jnp.stack(
        [jnp.asarray(r_shift, image.dtype), jnp.asarray(g_shift, image.dtype),
         jnp.asarray(b_shift, image.dtype)], axis=-1
    )
    shifts = shifts.reshape(-1, 3, 1, 1)
    return jnp.clip(image + shifts, 0.0, 1.0)


def threshold_binary(image: jax.Array, threshold, max_val: float = 1.0) -> jax.Array:
    image = as_float(image)
    th = _bcast_factor(threshold, image)
    return jnp.where(image > th, max_val, 0.0)


def otsu_threshold(image: jax.Array, nbins: int = 256,
                   return_mask: bool = False):
    """Otsu's global threshold per image (reference: filters/otsu_thresholding.py).
    Returns (threshold (B,1), [mask])."""
    image = as_float(image)
    B = image.shape[0]
    flat = image.reshape(B, -1)
    mn = jnp.min(flat, axis=-1, keepdims=True)
    mx = jnp.max(flat, axis=-1, keepdims=True)
    span = jnp.maximum(mx - mn, 1e-8)
    q = jnp.clip(((flat - mn) / span * (nbins - 1)).astype(jnp.int32), 0, nbins - 1)
    hist = jax.vmap(lambda qq: jnp.zeros((nbins,), jnp.float32).at[qq].add(1.0))(q)
    p = hist / jnp.sum(hist, axis=-1, keepdims=True)
    omega = jnp.cumsum(p, axis=-1)
    centers = jnp.arange(nbins, dtype=jnp.float32)
    mu = jnp.cumsum(p * centers[None], axis=-1)
    mu_t = mu[:, -1:]
    sigma_b = (mu_t * omega - mu) ** 2 / (omega * (1.0 - omega) + 1e-10)
    idx = jnp.argmax(sigma_b, axis=-1)
    th = mn[:, 0] + (idx.astype(jnp.float32) / (nbins - 1)) * span[:, 0]
    th = th[:, None]
    if return_mask:
        mask = flat > th
        return th, mask.reshape(image.shape)
    return th


# -----------------------------------------------------------------------------
# raw HSV adjusters / threshold / linear transform / rescale
# (surface-parity additions; reference: enhance/adjust.py, threshold.py,
# zca.py:321, rescale.py)
# -----------------------------------------------------------------------------

def adjust_saturation_raw(image: jax.Array, factor) -> jax.Array:
    """Scale S of an HSV image (reference: adjust.py:37)."""
    image = as_float(image)
    factor = _bcast_factor(factor, image)
    s = jnp.clip(image[..., 1:2, :, :] * factor, 0.0, 1.0)
    return jnp.concatenate(
        [image[..., 0:1, :, :], s, image[..., 2:3, :, :]], axis=-3)


def adjust_hue_raw(image: jax.Array, factor) -> jax.Array:
    """Shift H (radians) of an HSV image (reference: adjust.py:166)."""
    image = as_float(image)
    factor = _bcast_factor(factor, image)
    h = jnp.mod(image[..., 0:1, :, :] + factor, 2.0 * jnp.pi)
    return jnp.concatenate([h, image[..., 1:, :, :]], axis=-3)


import enum as _enum


class ThresholdType(_enum.IntEnum):
    """OpenCV-compatible fixed threshold types
    (reference: enhance/threshold.py:30)."""

    THRESH_BINARY = 0
    THRESH_BINARY_INV = 1
    THRESH_TRUNC = 2
    THRESH_TOZERO = 3
    THRESH_TOZERO_INV = 4
    THRESH_OTSU = 8


def threshold(image: jax.Array, thresh, maxval=255.0,
              type=ThresholdType.THRESH_BINARY) -> jax.Array:
    """OpenCV-style fixed-level thresholding
    (reference: enhance/threshold.py:46)."""
    image = as_float(image)
    t = int(type)
    check(not (t & int(ThresholdType.THRESH_OTSU)),
          "THRESH_OTSU is not supported here; use otsu_threshold instead")
    check(t in (0, 1, 2, 3, 4), f"unsupported threshold type {type}")
    thresh = jnp.asarray(thresh, image.dtype)
    maxval = jnp.asarray(maxval, image.dtype)
    mask = image > thresh
    zeros = jnp.zeros_like(image)
    if t == int(ThresholdType.THRESH_BINARY):
        return jnp.where(mask, maxval, zeros)
    if t == int(ThresholdType.THRESH_BINARY_INV):
        return jnp.where(mask, zeros, maxval)
    if t == int(ThresholdType.THRESH_TRUNC):
        return jnp.minimum(image, thresh)
    if t == int(ThresholdType.THRESH_TOZERO):
        return jnp.where(mask, image, zeros)
    return jnp.where(mask, zeros, image)


def linear_transform(x: jax.Array, transform_matrix: jax.Array,
                     mean_vector: jax.Array, dim: int = 0) -> jax.Array:
    """Flatten along `dim`, subtract mean, apply matrix, reshape back
    (reference: enhance/zca.py:321)."""
    x = as_float(x)
    perm = [i for i in range(x.ndim) if i != dim]
    shape = x.shape
    flat = jnp.moveaxis(x, dim, 0).reshape(shape[dim], -1)
    out = (flat - mean_vector.reshape(1, -1)) @ transform_matrix
    out = out.reshape([shape[dim]] + [shape[i] for i in perm])
    return jnp.moveaxis(out, 0, dim)


def rescale_intensity(x: jax.Array, factor) -> jax.Array:
    """Multiply by a scalar factor (reference: enhance/rescale.py Rescale)."""
    return as_float(x) * jnp.asarray(factor, as_float(x).dtype)


__all__ += [
    "adjust_saturation_raw", "adjust_hue_raw", "ThresholdType", "threshold",
    "linear_transform", "rescale_intensity",
]
