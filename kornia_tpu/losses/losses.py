"""Task losses (reference: kornia/losses/, 4.1k LoC).

SSIM/MS-SSIM, PSNR, total variation, focal, dice, tversky, lovasz,
KL/JS divergence, depth smoothness, Hausdorff, one_hot — pure functions,
batched, grad-closed.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..core.check import check
from ..core.dtype import as_float
from ..ops.filters import gaussian_blur2d, get_gaussian_kernel2d, filter2d, spatial_gradient

__all__ = [
    "one_hot",
    "ssim",
    "ssim_loss",
    "ssim3d",
    "ms_ssim_loss",
    "psnr",
    "psnr_loss",
    "total_variation",
    "inverse_depth_smoothness_loss",
    "focal_loss",
    "binary_focal_loss_with_logits",
    "dice_loss",
    "tversky_loss",
    "lovasz_hinge_loss",
    "lovasz_softmax_loss",
    "kl_div_loss_2d",
    "js_div_loss_2d",
    "hausdorff_distance_loss",
]


def _reduce(x: jax.Array, reduction: str) -> jax.Array:
    if reduction == "mean":
        return jnp.mean(x)
    if reduction == "sum":
        return jnp.sum(x)
    return x


def one_hot(labels: jax.Array, num_classes: int, dtype=jnp.float32,
            eps: float = 1e-6) -> jax.Array:
    """(B, ...) int labels → (B, C, ...) (reference: losses/one_hot)."""
    oh = jax.nn.one_hot(labels, num_classes, dtype=dtype, axis=1)
    return oh + eps


# -----------------------------------------------------------------------------
# Structural similarity (reference: losses/ssim.py:26)
# -----------------------------------------------------------------------------

def ssim(img1: jax.Array, img2: jax.Array, window_size: int = 11,
         max_val: float = 1.0, eps: float = 1e-12) -> jax.Array:
    """Per-pixel SSIM map (B, C, H, W)."""
    img1 = as_float(img1)
    img2 = as_float(img2)
    C1 = (0.01 * max_val) ** 2
    C2 = (0.03 * max_val) ** 2
    sigma = 1.5
    mu1 = gaussian_blur2d(img1, window_size, sigma, border_type="reflect")
    mu2 = gaussian_blur2d(img2, window_size, sigma, border_type="reflect")
    mu1_sq = mu1 * mu1
    mu2_sq = mu2 * mu2
    mu12 = mu1 * mu2
    s1 = gaussian_blur2d(img1 * img1, window_size, sigma, border_type="reflect") - mu1_sq
    s2 = gaussian_blur2d(img2 * img2, window_size, sigma, border_type="reflect") - mu2_sq
    s12 = gaussian_blur2d(img1 * img2, window_size, sigma, border_type="reflect") - mu12
    num = (2.0 * mu12 + C1) * (2.0 * s12 + C2)
    den = (mu1_sq + mu2_sq + C1) * (s1 + s2 + C2)
    return num / (den + eps)


def ssim_loss(img1: jax.Array, img2: jax.Array, window_size: int = 11,
              max_val: float = 1.0, reduction: str = "mean") -> jax.Array:
    return _reduce((1.0 - ssim(img1, img2, window_size, max_val)) / 2.0,
                   reduction)


def ssim3d(img1: jax.Array, img2: jax.Array, window_size: int = 11,
           max_val: float = 1.0, eps: float = 1e-12) -> jax.Array:
    """(B, C, D, H, W) SSIM (reference: ssim.py:85)."""
    from ..ops.filters import get_gaussian_kernel3d, filter3d
    img1 = as_float(img1)
    img2 = as_float(img2)
    C1 = (0.01 * max_val) ** 2
    C2 = (0.03 * max_val) ** 2
    kern = get_gaussian_kernel3d(window_size, 1.5, img1.dtype)
    blur = lambda t: filter3d(t, kern, border_type="replicate")
    mu1, mu2 = blur(img1), blur(img2)
    s1 = blur(img1 * img1) - mu1 * mu1
    s2 = blur(img2 * img2) - mu2 * mu2
    s12 = blur(img1 * img2) - mu1 * mu2
    num = (2 * mu1 * mu2 + C1) * (2 * s12 + C2)
    den = (mu1**2 + mu2**2 + C1) * (s1 + s2 + C2)
    return num / (den + eps)


def ms_ssim_loss(img1: jax.Array, img2: jax.Array,
                 weights: Optional[Sequence[float]] = None,
                 window_size: int = 11, reduction: str = "mean") -> jax.Array:
    """Multi-scale SSIM loss (reference: losses/ms_ssim.py)."""
    if weights is None:
        weights = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)
    img1 = as_float(img1)
    img2 = as_float(img2)
    vals = []
    a, b = img1, img2
    from ..ops.warp import rescale
    for i, w in enumerate(weights):
        s = jnp.mean(ssim(a, b, window_size), axis=(1, 2, 3))
        vals.append(jnp.abs(s) ** w)
        if i < len(weights) - 1:
            a = rescale(a, 0.5, antialias=True)
            b = rescale(b, 0.5, antialias=True)
    msssim = jnp.prod(jnp.stack(vals, -1), -1)
    return _reduce(1.0 - msssim, reduction)


def psnr(image: jax.Array, target: jax.Array, max_val: float = 1.0) -> jax.Array:
    """(reference: metrics/psnr.py)."""
    image = as_float(image)
    target = as_float(target)
    mse = jnp.mean((image - target) ** 2)
    return 10.0 * jnp.log10(max_val**2 / jnp.maximum(mse, 1e-12))


def psnr_loss(image: jax.Array, target: jax.Array, max_val: float = 1.0) -> jax.Array:
    return -psnr(image, target, max_val)


def total_variation(img: jax.Array, reduction: str = "sum") -> jax.Array:
    """(reference: losses/total_variation.py — reduces over the SPATIAL
    dims only; output keeps batch and channel dims)."""
    img = as_float(img)
    dh = jnp.abs(img[..., 1:, :] - img[..., :-1, :])
    dw = jnp.abs(img[..., :, 1:] - img[..., :, :-1])
    red = jnp.sum if reduction == "sum" else jnp.mean
    return red(dh, axis=(-2, -1)) + red(dw, axis=(-2, -1))


def inverse_depth_smoothness_loss(idepth: jax.Array, image: jax.Array) -> jax.Array:
    """Edge-aware depth smoothness (reference: losses/depth_smooth.py)."""
    idepth = as_float(idepth)
    image = as_float(image)
    didx = jnp.abs(idepth[..., :, 1:] - idepth[..., :, :-1])
    didy = jnp.abs(idepth[..., 1:, :] - idepth[..., :-1, :])
    imgdx = jnp.mean(jnp.abs(image[..., :, 1:] - image[..., :, :-1]), axis=1,
                     keepdims=True)
    imgdy = jnp.mean(jnp.abs(image[..., 1:, :] - image[..., :-1, :]), axis=1,
                     keepdims=True)
    wx = jnp.exp(-imgdx)
    wy = jnp.exp(-imgdy)
    return jnp.mean(didx * wx) + jnp.mean(didy * wy)


def focal_loss(pred: jax.Array, target: jax.Array, alpha: float = 0.5,
               gamma: float = 2.0, reduction: str = "none",
               weight: Optional[jax.Array] = None) -> jax.Array:
    """Multi-class focal loss on logits (B, C, ...) with int targets
    (reference: losses/focal.py:33)."""
    pred = as_float(pred)
    num_classes = pred.shape[1]
    log_p = jax.nn.log_softmax(pred, axis=1)
    p = jnp.exp(log_p)
    oh = jax.nn.one_hot(target, num_classes, axis=1, dtype=pred.dtype)
    # per-class loss map (zero off the true class) — the reference reduces
    # over ALL dims including the class axis (losses/focal.py)
    loss_map = -alpha * jnp.power(1.0 - p, gamma) * log_p * oh
    if weight is not None:
        loss_map = loss_map * weight.reshape(1, -1, *([1] * (pred.ndim - 2)))
    return _reduce(loss_map, reduction)


def binary_focal_loss_with_logits(pred: jax.Array, target: jax.Array,
                                  alpha: float = 0.25, gamma: float = 2.0,
                                  reduction: str = "none",
                                  pos_weight: Optional[jax.Array] = None
                                  ) -> jax.Array:
    """(reference: losses/focal.py:211)."""
    pred = as_float(pred)
    target = as_float(target)
    p = jax.nn.sigmoid(pred)
    log_p = jax.nn.log_sigmoid(pred)
    log_1p = jax.nn.log_sigmoid(-pred)
    pos = -alpha * jnp.power(1 - p, gamma) * log_p * target
    neg = -(1 - alpha) * jnp.power(p, gamma) * log_1p * (1 - target)
    if pos_weight is not None:
        pos = pos * pos_weight
    return _reduce(pos + neg, reduction)


def dice_loss(pred: jax.Array, target: jax.Array, average: str = "micro",
              eps: float = 1e-8) -> jax.Array:
    """Soft dice on logits (B, C, H, W) + int labels (B, H, W)
    (reference: losses/dice.py:37)."""
    pred = as_float(pred)
    num_classes = pred.shape[1]
    p = jax.nn.softmax(pred, axis=1)
    oh = jax.nn.one_hot(target, num_classes, axis=1, dtype=pred.dtype)
    if average == "micro":
        dims = (1, 2, 3)
    else:
        dims = (2, 3)
    inter = jnp.sum(p * oh, axis=dims)
    card = jnp.sum(p + oh, axis=dims)
    dice = 2.0 * inter / (card + eps)
    return jnp.mean(1.0 - dice)


def tversky_loss(pred: jax.Array, target: jax.Array, alpha: float = 0.5,
                 beta: float = 0.5, eps: float = 1e-8) -> jax.Array:
    """(reference: losses/tversky.py)."""
    pred = as_float(pred)
    num_classes = pred.shape[1]
    p = jax.nn.softmax(pred, axis=1)
    oh = jax.nn.one_hot(target, num_classes, axis=1, dtype=pred.dtype)
    dims = (1, 2, 3)
    inter = jnp.sum(p * oh, axis=dims)
    fps = jnp.sum(p * (1.0 - oh), axis=dims)
    fns = jnp.sum((1.0 - p) * oh, axis=dims)
    tversky = inter / (inter + alpha * fps + beta * fns + eps)
    return jnp.mean(1.0 - tversky)


def _lovasz_grad(gt_sorted: jax.Array) -> jax.Array:
    gts = jnp.sum(gt_sorted, axis=-1, keepdims=True)
    intersection = gts - jnp.cumsum(gt_sorted, axis=-1)
    union = gts + jnp.cumsum(1.0 - gt_sorted, axis=-1)
    jaccard = 1.0 - intersection / union
    return jnp.concatenate([jaccard[..., :1],
                            jaccard[..., 1:] - jaccard[..., :-1]], axis=-1)


def lovasz_hinge_loss(pred: jax.Array, target: jax.Array) -> jax.Array:
    """Binary Lovasz hinge on logits (B, 1, H, W) + {0,1} masks (B, H, W)
    (reference: losses/lovasz_hinge.py)."""
    pred = as_float(pred).reshape(pred.shape[0], -1)
    target = as_float(target).reshape(target.shape[0], -1)
    signs = 2.0 * target - 1.0
    errors = 1.0 - pred * signs
    errors_sorted, perm = jax.lax.top_k(errors, errors.shape[-1])
    gt_sorted = jnp.take_along_axis(target, perm, axis=-1)
    grad = _lovasz_grad(gt_sorted)
    return jnp.mean(jnp.sum(jax.nn.relu(errors_sorted) * grad, axis=-1))


def lovasz_softmax_loss(pred: jax.Array, target: jax.Array) -> jax.Array:
    """Multi-class Lovasz-softmax (reference: losses/lovasz_softmax.py)."""
    pred = as_float(pred)
    B, C = pred.shape[:2]
    p = jax.nn.softmax(pred, axis=1).reshape(B, C, -1)
    t = target.reshape(B, -1)
    losses = []
    for c in range(C):
        fg = (t == c).astype(pred.dtype)
        errors = jnp.abs(fg - p[:, c])
        errors_sorted, perm = jax.lax.top_k(errors, errors.shape[-1])
        fg_sorted = jnp.take_along_axis(fg, perm, axis=-1)
        grad = _lovasz_grad(fg_sorted)
        losses.append(jnp.sum(errors_sorted * grad, axis=-1))
    return jnp.mean(jnp.stack(losses, axis=-1))


def kl_div_loss_2d(pred: jax.Array, target: jax.Array,
                   reduction: str = "mean") -> jax.Array:
    """KL between two spatial distributions (B, C, H, W)
    (reference: losses/divergence.py)."""
    pred = as_float(pred)
    target = as_float(target)
    kl = target * (jnp.log(jnp.maximum(target, 1e-12))
                   - jnp.log(jnp.maximum(pred, 1e-12)))
    kl = jnp.sum(kl, axis=(-2, -1))
    return _reduce(kl, reduction)


def js_div_loss_2d(pred: jax.Array, target: jax.Array,
                   reduction: str = "mean") -> jax.Array:
    m = 0.5 * (as_float(pred) + as_float(target))
    return 0.5 * (kl_div_loss_2d(m, pred, reduction)
                  + kl_div_loss_2d(m, target, reduction))


def hausdorff_distance_loss(pred: jax.Array, target: jax.Array,
                            k: float = 2.0, reduction: str = "mean"
                            ) -> jax.Array:
    """Soft Hausdorff via distance-transform approximation
    (reference: losses/hausdorff.py). pred: logits (B, C, H, W),
    target: labels (B, H, W)."""
    from ..contrib.ops import distance_transform
    pred = as_float(pred)
    num_classes = pred.shape[1]
    p = jax.nn.softmax(pred, axis=1)
    oh = jax.nn.one_hot(target, num_classes, axis=1, dtype=pred.dtype)
    losses = []
    for c in range(num_classes):
        gt = oh[:, c : c + 1]
        pr = p[:, c : c + 1]
        dt_gt = distance_transform(1.0 - gt)
        dt_pr = distance_transform(1.0 - pr)
        err = (pr - gt) ** 2
        dist = dt_gt**k + dt_pr**k
        losses.append(jnp.mean(err * dist, axis=(1, 2, 3)))
    return _reduce(jnp.stack(losses, -1), reduction)


def ssim3d_loss(img1: jax.Array, img2: jax.Array, window_size: int = 11,
                max_val: float = 1.0, eps: float = 1e-12,
                reduction: str = "mean") -> jax.Array:
    """(1 - SSIM3D)/2 (reference: losses/ssim3d.py ssim3d_loss)."""
    return _reduce((1.0 - ssim3d(img1, img2, window_size, max_val, eps)) / 2.0,
                   reduction)


__all__ += ["ssim3d_loss"]
