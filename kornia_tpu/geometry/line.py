"""Lines, planes, rays (reference: kornia/geometry/line.py:290,
plane.py, ray.py — 548 LoC)."""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.dtype import as_float

__all__ = ["ParametrizedLine", "fit_line", "Hyperplane", "fit_plane", "Ray"]


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class ParametrizedLine:
    """Line = origin + t * direction (reference: line.py)."""

    origin: jax.Array  # (..., D)
    direction: jax.Array  # (..., D) unit

    def tree_flatten(self):
        return (self.origin, self.direction), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @classmethod
    def through(cls, p0: jax.Array, p1: jax.Array) -> "ParametrizedLine":
        d = p1 - p0
        d = d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-9)
        return cls(as_float(p0), d)

    def point_at(self, t) -> jax.Array:
        t = jnp.asarray(t, self.origin.dtype)
        return self.origin + t[..., None] * self.direction

    def projection(self, point: jax.Array) -> jax.Array:
        d = point - self.origin
        t = jnp.sum(d * self.direction, axis=-1, keepdims=True)
        return self.origin + t * self.direction

    def distance(self, point: jax.Array) -> jax.Array:
        return jnp.linalg.norm(point - self.projection(point), axis=-1)

    def squared_distance(self, point: jax.Array) -> jax.Array:
        diff = point - self.projection(point)
        return jnp.sum(diff * diff, axis=-1)


def fit_line(points: jax.Array, weights: Optional[jax.Array] = None
             ) -> ParametrizedLine:
    """Total-least-squares line fit (B, N, D) → line through centroid along
    the principal direction (reference: line.py fit_line)."""
    points = as_float(points)
    if weights is None:
        weights = jnp.ones(points.shape[:-1], points.dtype)
    w = weights[..., None]
    mean = jnp.sum(points * w, axis=-2, keepdims=True) / jnp.maximum(
        jnp.sum(w, axis=-2, keepdims=True), 1e-9)
    centered = (points - mean) * jnp.sqrt(jnp.maximum(w, 0.0))
    cov = jnp.einsum("...ni,...nj->...ij", centered, centered)
    _, vecs = jnp.linalg.eigh(cov)
    direction = vecs[..., :, -1]  # largest eigenvalue
    return ParametrizedLine(mean[..., 0, :], direction)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class Hyperplane:
    """n·x + d = 0 (reference: plane.py)."""

    normal: jax.Array  # (..., D) unit
    offset: jax.Array  # (...,)

    def tree_flatten(self):
        return (self.normal, self.offset), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @classmethod
    def from_vector(cls, normal: jax.Array, point: jax.Array) -> "Hyperplane":
        n = normal / jnp.maximum(jnp.linalg.norm(normal, axis=-1,
                                                 keepdims=True), 1e-9)
        return cls(n, -jnp.sum(n * point, axis=-1))

    def signed_distance(self, point: jax.Array) -> jax.Array:
        return jnp.sum(self.normal * point, axis=-1) + self.offset

    def projection(self, point: jax.Array) -> jax.Array:
        return point - self.signed_distance(point)[..., None] * self.normal


def fit_plane(points: jax.Array) -> Hyperplane:
    """TLS plane fit (B, N, 3) (reference: plane.py fit_plane)."""
    points = as_float(points)
    mean = jnp.mean(points, axis=-2, keepdims=True)
    centered = points - mean
    cov = jnp.einsum("...ni,...nj->...ij", centered, centered)
    _, vecs = jnp.linalg.eigh(cov)
    normal = vecs[..., :, 0]  # smallest eigenvalue
    return Hyperplane.from_vector(normal, mean[..., 0, :])


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class Ray:
    """Ray = origin + t * direction, t >= 0 (reference: ray.py)."""

    origin: jax.Array
    direction: jax.Array

    def tree_flatten(self):
        return (self.origin, self.direction), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @classmethod
    def through(cls, p0: jax.Array, p1: jax.Array) -> "Ray":
        d = p1 - p0
        d = d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-9)
        return cls(as_float(p0), d)

    def point_at(self, t) -> jax.Array:
        return self.origin + jnp.asarray(t)[..., None] * self.direction

    def intersect_plane(self, plane: Hyperplane) -> jax.Array:
        """Intersection point (inf where parallel)."""
        denom = jnp.sum(self.direction * plane.normal, axis=-1)
        t = -(jnp.sum(self.origin * plane.normal, axis=-1) + plane.offset) / \
            jnp.where(jnp.abs(denom) > 1e-9, denom, 1e-9)
        return self.point_at(t)
