"""Corner/blob response functions (reference: kornia/feature/responses.py,
467 LoC): Harris, Shi-Tomasi (GFTT), Hessian determinant, DoG."""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.check import check, check_shape
from ..core.dtype import as_float
from ..ops.filters import gaussian_blur2d, spatial_gradient

__all__ = [
    "harris_response",
    "gftt_response",
    "hessian_response",
    "dog_response",
    "dog_response_single",
]


def _sigma4(scores: jax.Array, sigmas: Optional[jax.Array]) -> jax.Array:
    """Scale-normalization: scores × sigma⁴ (reference semantics — the
    reference multiplies final scores, responses.py)."""
    if sigmas is None:
        return scores
    s = jnp.reshape(sigmas, (-1, 1, 1, 1))
    return scores * jnp.power(s, 4)


def _structure_tensor(input: jax.Array, grads_mode: str) -> Tuple[jax.Array, ...]:
    grads = spatial_gradient(input, grads_mode)
    dx = grads[:, :, 0]
    dy = grads[:, :, 1]
    dx2 = gaussian_blur2d(dx * dx, 7, 1.0, border_type="reflect")
    dy2 = gaussian_blur2d(dy * dy, 7, 1.0, border_type="reflect")
    dxy = gaussian_blur2d(dx * dy, 7, 1.0, border_type="reflect")
    return dx2, dy2, dxy


def harris_response(input: jax.Array, k: float = 0.04,
                    grads_mode: str = "sobel",
                    sigmas: Optional[jax.Array] = None) -> jax.Array:
    """det(M) - k tr(M)² (reference: responses.py:39)."""
    input = as_float(input)
    dx2, dy2, dxy = _structure_tensor(input, grads_mode)
    det = dx2 * dy2 - dxy * dxy
    trace = dx2 + dy2
    return _sigma4(det - k * trace * trace, sigmas)


def gftt_response(input: jax.Array, grads_mode: str = "sobel",
                  sigmas: Optional[jax.Array] = None) -> jax.Array:
    """Smallest structure-tensor eigenvalue (reference: responses.py:129 —
    signed min of the two eigenvalues)."""
    input = as_float(input)
    dx2, dy2, dxy = _structure_tensor(input, grads_mode)
    trace = dx2 + dy2
    det = dx2 * dy2 - dxy * dxy
    e2 = 0.5 * (trace - jnp.sqrt(jnp.abs(trace * trace - 4.0 * det)))
    return _sigma4(e2, sigmas)


def hessian_response(input: jax.Array, grads_mode: str = "sobel",
                     sigmas: Optional[jax.Array] = None) -> jax.Array:
    """det of the Hessian (reference: responses.py:206)."""
    input = as_float(input)
    grads = spatial_gradient(input, grads_mode, order=2)
    dxx = grads[:, :, 0]
    dxy = grads[:, :, 1]
    dyy = grads[:, :, 2]
    return _sigma4(dxx * dyy - dxy * dxy, sigmas)


def dog_response(input: jax.Array) -> jax.Array:
    """Difference of adjacent gaussian levels in a (B, L, C, H, W) stack
    (reference: responses.py:285)."""
    check(input.ndim == 5, f"expected (B,L,C,H,W), got {input.shape}")
    return input[:, 1:] - input[:, :-1]


def dog_response_single(input: jax.Array, sigma1: float = 1.0,
                        sigma2: float = 1.6) -> jax.Array:
    """DoG of one image (reference: responses.py:300)."""
    input = as_float(input)
    g1 = gaussian_blur2d(input, 2 * int(4 * sigma1) // 2 * 2 + 3, sigma1)
    g2 = gaussian_blur2d(input, 2 * int(4 * sigma2) // 2 * 2 + 3, sigma2)
    return g2 - g1
