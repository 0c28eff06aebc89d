"""Typed pose with frame semantics (reference: kornia/geometry/pose.py:42
NamedPose)."""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax

from .liegroup import Se3, So3

__all__ = ["NamedPose"]


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class NamedPose:
    """Se3 pose annotated with (frame_src ← frame_dst) semantics: applying
    it maps points expressed in `frame_dst` into `frame_src`. Composition
    checks frame compatibility at trace time."""

    pose: Se3
    frame_src: str = "a"
    frame_dst: str = "b"

    def tree_flatten(self):
        return (self.pose,), (self.frame_src, self.frame_dst)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], aux[0], aux[1])

    @classmethod
    def from_rt(cls, rotation: So3, translation: jax.Array,
                frame_src: str = "a", frame_dst: str = "b") -> "NamedPose":
        return cls(Se3(rotation, translation), frame_src, frame_dst)

    @property
    def rotation(self) -> So3:
        return self.pose.r

    @property
    def translation(self) -> jax.Array:
        return self.pose.t

    def inverse(self) -> "NamedPose":
        return NamedPose(self.pose.inverse(), self.frame_dst, self.frame_src)

    def __mul__(self, other: "NamedPose") -> "NamedPose":
        if self.frame_dst != other.frame_src:
            raise ValueError(
                f"frame mismatch: {self.frame_src}<-{self.frame_dst} cannot "
                f"compose with {other.frame_src}<-{other.frame_dst}")
        return NamedPose(self.pose * other.pose, self.frame_src,
                         other.frame_dst)

    def transform(self, points: jax.Array) -> jax.Array:
        """Points in frame_dst → frame_src."""
        return self.pose.act(points)

    def matrix(self) -> jax.Array:
        return self.pose.matrix()


def check_matrix_shape(matrix, matrix_type: str = "R") -> None:
    """Verify a rotation ("R": 2x2|3x3) or rigid-transform ("RT": 3x3|4x4)
    matrix shape (reference: pose.py:28)."""
    targets = {"R": ((2, 2), (3, 3)), "RT": ((3, 3), (4, 4))}[matrix_type]
    if matrix.ndim > 3 or matrix.ndim < 2 or matrix.shape[-2:] not in targets:
        raise ValueError(
            f"{matrix_type} must have trailing shape in {targets}, "
            f"got {matrix.shape}")


__all__ += ["check_matrix_shape"]
