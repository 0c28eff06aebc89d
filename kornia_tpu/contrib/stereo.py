"""Classical stereo block matching (new — complements geometry.camera's
StereoCamera; the reference ships only the Q-matrix reprojection).

Cost-volume construction is a static shift-and-accumulate (one fused XLA
graph); aggregation is a box filter; disparity = soft or hard WTA with
left-right consistency masking. Fully batched and differentiable in the
soft mode.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.dtype import as_float
from ..ops.filters import box_blur

__all__ = ["stereo_matching", "disparity_to_depth"]


def _shift_right(img: jax.Array, d: int) -> jax.Array:
    """Shift image content right by d pixels (for matching right→left)."""
    if d == 0:
        return img
    B, C, H, W = img.shape
    pad = jnp.zeros((B, C, H, d), img.dtype)
    return jnp.concatenate([pad, img[..., : W - d]], axis=-1)


def stereo_matching(
    left: jax.Array,
    right: jax.Array,
    max_disparity: int = 64,
    window_size: int = 9,
    soft: bool = True,
    temperature: float = 50.0,
    lr_check_th: Optional[float] = 1.5,
) -> Tuple[jax.Array, jax.Array]:
    """Rectified stereo pair (B, C, H, W) → (disparity (B, 1, H, W),
    valid (B, 1, H, W)).

    soft=True gives a differentiable soft-argmin disparity (GC-Net style);
    soft=False is hard WTA.
    """
    left = as_float(left)
    right = as_float(right)
    B, C, H, W = left.shape

    def cost_volume(ref, other):
        costs = []
        for d in range(max_disparity):
            shifted = _shift_right(other, d)
            sad = jnp.mean(jnp.abs(ref - shifted), axis=1, keepdims=True)
            agg = box_blur(sad, window_size)
            costs.append(agg[:, 0])
        return jnp.stack(costs, axis=1)  # (B, D, H, W)

    cv_left = cost_volume(left, right)

    def wta(cv):
        if soft:
            p = jax.nn.softmax(-temperature * cv, axis=1)
            disps = jnp.arange(max_disparity, dtype=cv.dtype)
            return jnp.sum(p * disps[None, :, None, None], axis=1,
                           keepdims=True)
        return jnp.argmin(cv, axis=1, keepdims=True).astype(cv.dtype)

    disp_left = wta(cv_left)
    if lr_check_th is None:
        return disp_left, jnp.ones_like(disp_left, dtype=bool)

    # right disparity via the mirrored problem
    def flip(x):
        return jnp.flip(x, axis=-1)

    cv_right = cost_volume(flip(right), flip(left))
    disp_right = flip(wta(cv_right))
    # left-right consistency: project left disparity into the right view
    xs = jnp.arange(W, dtype=disp_left.dtype)[None, None, None, :]
    x_right = jnp.clip(xs - disp_left, 0, W - 1)
    idx = jnp.round(x_right).astype(jnp.int32)
    dr_at = jnp.take_along_axis(disp_right, idx, axis=-1)
    valid = jnp.abs(disp_left - dr_at) < lr_check_th
    return disp_left, valid


def disparity_to_depth(disparity: jax.Array, focal: float, baseline: float,
                       eps: float = 1e-6) -> jax.Array:
    return focal * baseline / jnp.maximum(disparity, eps)
