"""Robust penalty functions (reference: kornia/losses/ charbonnier/cauchy/
geman_mcclure/welsch).

These double as the robust kernels for bundle adjustment (SURVEY.md §7):
each returns rho(x²) applied elementwise, and `weight_fn` gives the IRLS
weight rho'(r²) used by the BA backend.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.dtype import as_float

__all__ = [
    "charbonnier_loss",
    "cauchy_loss",
    "geman_mcclure_loss",
    "welsch_loss",
    "huber_weight",
    "cauchy_weight",
    "geman_mcclure_weight",
    "welsch_weight",
    "tukey_weight",
]


def _reduce(x: jax.Array, reduction: str) -> jax.Array:
    if reduction == "mean":
        return jnp.mean(x)
    if reduction == "sum":
        return jnp.sum(x)
    return x


def charbonnier_loss(img1: jax.Array, img2: jax.Array,
                     reduction: str = "none") -> jax.Array:
    """rho(x) = sqrt(1 + x²) - 1 (reference: losses/charbonnier)."""
    x2 = (as_float(img1) - as_float(img2)) ** 2
    return _reduce(jnp.sqrt(1.0 + x2) - 1.0, reduction)


def cauchy_loss(img1: jax.Array, img2: jax.Array,
                reduction: str = "none") -> jax.Array:
    """rho(x) = log(1 + x²)/2... (reference uses log1p(x²))."""
    x2 = (as_float(img1) - as_float(img2)) ** 2
    return _reduce(jnp.log1p(x2), reduction)


def geman_mcclure_loss(img1: jax.Array, img2: jax.Array,
                       reduction: str = "none") -> jax.Array:
    """rho(x) = 2 x² / (x² + 4)."""
    x2 = (as_float(img1) - as_float(img2)) ** 2
    return _reduce(2.0 * x2 / (x2 + 4.0), reduction)


def welsch_loss(img1: jax.Array, img2: jax.Array,
                reduction: str = "none") -> jax.Array:
    """rho(x) = 1 - exp(-x²/2)."""
    x2 = (as_float(img1) - as_float(img2)) ** 2
    return _reduce(1.0 - jnp.exp(-0.5 * x2), reduction)


# IRLS weights w(r) = rho'(r²) for the BA backend -----------------------------

def huber_weight(r2: jax.Array, delta: float = 1.0) -> jax.Array:
    r = jnp.sqrt(jnp.maximum(r2, 1e-12))
    return jnp.where(r <= delta, 1.0, delta / r)


def cauchy_weight(r2: jax.Array, c: float = 1.0) -> jax.Array:
    return 1.0 / (1.0 + r2 / (c * c))


def geman_mcclure_weight(r2: jax.Array, c: float = 1.0) -> jax.Array:
    return (c * c / (c * c + r2)) ** 2


def welsch_weight(r2: jax.Array, c: float = 1.0) -> jax.Array:
    return jnp.exp(-r2 / (c * c))


def tukey_weight(r2: jax.Array, c: float = 4.685) -> jax.Array:
    w = (1.0 - r2 / (c * c))
    return jnp.where(r2 <= c * c, w * w, 0.0)
