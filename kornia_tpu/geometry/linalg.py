"""Batched projective linear algebra (reference: kornia/geometry/linalg.py)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.check import check_shape
from ..ops.warp import transform_points  # canonical impl; re-exported here

__all__ = [
    "compose_transformations",
    "inverse_transformation",
    "relative_transformation",
    "transform_points",
    "point_line_distance",
    "squared_norm",
    "batched_dot_product",
    "euclidean_distance",
]


def compose_transformations(T1: jax.Array, T2: jax.Array) -> jax.Array:
    """(..., 4, 4) @ (..., 4, 4) (reference: linalg.py:38)."""
    check_shape(T1, ["*", "4", "4"], "T1")
    check_shape(T2, ["*", "4", "4"], "T2")
    return T1 @ T2


def inverse_transformation(T: jax.Array) -> jax.Array:
    """Closed-form SE(3) inverse (reference: linalg.py:91)."""
    check_shape(T, ["*", "4", "4"], "T")
    R = T[..., :3, :3]
    t = T[..., :3, 3:4]
    Rt = jnp.swapaxes(R, -1, -2)
    top = jnp.concatenate([Rt, -(Rt @ t)], axis=-1)
    bottom = jnp.zeros_like(T[..., :1, :]).at[..., 0, 3].set(1.0)
    return jnp.concatenate([top, bottom], axis=-2)


def relative_transformation(T1: jax.Array, T2: jax.Array) -> jax.Array:
    """T_12 such that T2 = T1 @ T_12 (reference: linalg.py:134)."""
    return compose_transformations(inverse_transformation(T1), T2)


def point_line_distance(point: jax.Array, line: jax.Array, eps: float = 1e-9
                        ) -> jax.Array:
    """Distance from homogeneous 2D points to lines (a, b, c)
    (reference: linalg.py:242)."""
    numerator = jnp.abs(
        line[..., 0] * point[..., 0] + line[..., 1] * point[..., 1] + line[..., 2]
    )
    denominator = jnp.sqrt(line[..., 0] ** 2 + line[..., 1] ** 2 + eps)
    return numerator / denominator


def squared_norm(x: jax.Array, keepdim: bool = False) -> jax.Array:
    return jnp.sum(x * x, axis=-1, keepdims=keepdim)


def batched_dot_product(x: jax.Array, y: jax.Array, keepdim: bool = False) -> jax.Array:
    return jnp.sum(x * y, axis=-1, keepdims=keepdim)


def euclidean_distance(x: jax.Array, y: jax.Array, keepdim: bool = False,
                       eps: float = 1e-8) -> jax.Array:
    return jnp.sqrt(jnp.sum((x - y) ** 2, axis=-1, keepdims=keepdim) + eps)


def batched_squared_norm(x: jax.Array, keepdim: bool = False) -> jax.Array:
    """Squared L2 norm over the last axis (reference: linalg.py:282)."""
    return jnp.sum(x * x, axis=-1, keepdims=keepdim)


__all__ += ["batched_squared_norm"]
