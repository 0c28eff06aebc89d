"""Lie groups So2/Se2/So3/Se3 and Quaternion
(reference: kornia/geometry/liegroup/, quaternion.py — 2.4k LoC).

TPU-first design: each group element is a **pytree dataclass** wrapping
plain arrays, so instances flow through jit/vmap/grad unchanged and can be
leaves of optimizer states (the BA backend optimizes on these manifolds).
All ops are batched over arbitrary leading dims.

Quaternions are wxyz. So3 is represented by a unit quaternion (like the
reference), Se3 by (So3, t).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.dtype import as_float
from .conversions import (
    angle_axis_to_quaternion,
    normalize_quaternion,
    quaternion_to_angle_axis,
    quaternion_to_rotation_matrix,
    rotation_matrix_to_quaternion,
    vector_to_skew_symmetric_matrix,
)

__all__ = ["Quaternion", "So3", "Se3", "So2", "Se2"]

_EPS = 1e-8


def _qmul(p: jax.Array, q: jax.Array) -> jax.Array:
    pw, px, py, pz = p[..., 0], p[..., 1], p[..., 2], p[..., 3]
    qw, qx, qy, qz = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack(
        [
            pw * qw - px * qx - py * qy - pz * qz,
            pw * qx + px * qw + py * qz - pz * qy,
            pw * qy - px * qz + py * qw + pz * qx,
            pw * qz + px * qy - py * qx + pz * qw,
        ],
        axis=-1,
    )


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class Quaternion:
    """Unit-capable quaternion wrapper, (..., 4) wxyz
    (reference: geometry/quaternion.py:41)."""

    data: jax.Array

    def tree_flatten(self):
        return (self.data,), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0])

    # constructors ---------------------------------------------------------
    @classmethod
    def identity(cls, batch_shape: Tuple[int, ...] = (), dtype=jnp.float32) -> "Quaternion":
        q = jnp.zeros((*batch_shape, 4), dtype=dtype).at[..., 0].set(1.0)
        return cls(q)

    @classmethod
    def from_coeffs(cls, w, x, y, z) -> "Quaternion":
        return cls(jnp.stack([jnp.asarray(w, jnp.float32),
                              jnp.asarray(x, jnp.float32),
                              jnp.asarray(y, jnp.float32),
                              jnp.asarray(z, jnp.float32)], axis=-1))

    @classmethod
    def from_axis_angle(cls, axis_angle: jax.Array) -> "Quaternion":
        return cls(angle_axis_to_quaternion(axis_angle))

    @classmethod
    def from_matrix(cls, R: jax.Array) -> "Quaternion":
        return cls(rotation_matrix_to_quaternion(R))

    @classmethod
    def random(cls, key: jax.Array, batch_shape: Tuple[int, ...] = ()) -> "Quaternion":
        """Uniform random unit quaternion (shoemake; reference :random)."""
        r1, r2, r3 = jax.random.uniform(key, (3, *batch_shape))
        s1 = jnp.sqrt(1.0 - r1)
        s2 = jnp.sqrt(r1)
        t1 = 2.0 * jnp.pi * r2
        t2 = 2.0 * jnp.pi * r3
        return cls(jnp.stack([jnp.cos(t2) * s2, jnp.sin(t1) * s1,
                              jnp.cos(t1) * s1, jnp.sin(t2) * s2], axis=-1))

    # accessors ------------------------------------------------------------
    @property
    def w(self):
        return self.data[..., 0]

    @property
    def x(self):
        return self.data[..., 1]

    @property
    def y(self):
        return self.data[..., 2]

    @property
    def z(self):
        return self.data[..., 3]

    @property
    def vec(self):
        return self.data[..., 1:]

    @property
    def real(self):
        return self.w

    @property
    def shape(self):
        return self.data.shape[:-1]

    # algebra --------------------------------------------------------------
    def __mul__(self, other: "Quaternion") -> "Quaternion":
        return Quaternion(_qmul(self.data, other.data))

    def __add__(self, other: "Quaternion") -> "Quaternion":
        return Quaternion(self.data + other.data)

    def __sub__(self, other: "Quaternion") -> "Quaternion":
        return Quaternion(self.data - other.data)

    def __neg__(self) -> "Quaternion":
        return Quaternion(-self.data)

    def conj(self) -> "Quaternion":
        return Quaternion(self.data * jnp.array([1.0, -1.0, -1.0, -1.0],
                                                dtype=self.data.dtype))

    def inv(self) -> "Quaternion":
        n2 = jnp.sum(self.data * self.data, axis=-1, keepdims=True)
        return Quaternion(self.conj().data / jnp.maximum(n2, _EPS))

    def norm(self) -> jax.Array:
        return jnp.linalg.norm(self.data, axis=-1)

    def normalize(self) -> "Quaternion":
        return Quaternion(normalize_quaternion(self.data))

    def matrix(self) -> jax.Array:
        return quaternion_to_rotation_matrix(self.data)

    def to_axis_angle(self) -> jax.Array:
        return quaternion_to_angle_axis(self.data)

    def slerp(self, other: "Quaternion", t) -> "Quaternion":
        """Spherical interpolation (reference: quaternion.py slerp)."""
        q0 = normalize_quaternion(self.data)
        q1 = normalize_quaternion(other.data)
        dot = jnp.sum(q0 * q1, axis=-1, keepdims=True)
        q1 = jnp.where(dot < 0, -q1, q1)
        dot = jnp.abs(dot)
        theta = jnp.arccos(jnp.clip(dot, -1.0, 1.0))
        sin_theta = jnp.sin(theta)
        t = jnp.asarray(t, q0.dtype)
        w0_big = jnp.sin((1.0 - t) * theta) / jnp.maximum(sin_theta, _EPS)
        w1_big = jnp.sin(t * theta) / jnp.maximum(sin_theta, _EPS)
        # nlerp fallback for nearly-parallel quaternions
        w0 = jnp.where(dot > 1.0 - 1e-6, 1.0 - t, w0_big)
        w1 = jnp.where(dot > 1.0 - 1e-6, t, w1_big)
        return Quaternion(normalize_quaternion(w0 * q0 + w1 * q1))

    @staticmethod
    def average(quats: jax.Array, weights: Optional[jax.Array] = None) -> "Quaternion":
        """Markley average via the largest eigenvector of the outer-product
        accumulator (reference: quaternion.py average_quaternions:652).
        quats: (N, 4)."""
        q = as_float(quats)
        if weights is None:
            weights = jnp.ones(q.shape[0], q.dtype) / q.shape[0]
        A = jnp.einsum("n,ni,nj->ij", weights, q, q)
        _, vecs = jnp.linalg.eigh(A)
        avg = vecs[:, -1]
        avg = jnp.where(avg[0] < 0, -avg, avg)
        return Quaternion(avg)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class So3:
    """3D rotation group represented by a unit quaternion
    (reference: liegroup/so3.py:34)."""

    q: Quaternion

    def tree_flatten(self):
        return (self.q,), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0])

    @property
    def shape(self):
        return self.q.shape

    # constructors ---------------------------------------------------------
    @classmethod
    def identity(cls, batch_shape: Tuple[int, ...] = (), dtype=jnp.float32) -> "So3":
        return cls(Quaternion.identity(batch_shape, dtype))

    @classmethod
    def from_matrix(cls, R: jax.Array) -> "So3":
        return cls(Quaternion.from_matrix(R))

    @classmethod
    def from_wxyz(cls, wxyz: jax.Array) -> "So3":
        return cls(Quaternion(normalize_quaternion(wxyz)))

    @classmethod
    def random(cls, key: jax.Array, batch_shape: Tuple[int, ...] = ()) -> "So3":
        return cls(Quaternion.random(key, batch_shape))

    @staticmethod
    def exp(v: jax.Array) -> "So3":
        """so3 tangent (..., 3) → group element (reference so3.py exp)."""
        return So3(Quaternion(angle_axis_to_quaternion(v)))

    def log(self) -> jax.Array:
        return quaternion_to_angle_axis(self.q.normalize().data)

    @staticmethod
    def hat(v: jax.Array) -> jax.Array:
        return vector_to_skew_symmetric_matrix(v)

    @staticmethod
    def vee(omega: jax.Array) -> jax.Array:
        return jnp.stack([omega[..., 2, 1], omega[..., 0, 2], omega[..., 1, 0]],
                         axis=-1)

    # group ops ------------------------------------------------------------
    def __mul__(self, other):
        if isinstance(other, So3):
            return So3(self.q * other.q)
        # act on points (..., 3) or (..., N, 3)
        return self.act(other)

    def act(self, pts: jax.Array) -> jax.Array:
        R = self.matrix()
        if pts.ndim == R.ndim - 1:  # (..., 3)
            return jnp.einsum("...ij,...j->...i", R, pts)
        return jnp.einsum("...ij,...nj->...ni", R, pts)

    def inverse(self) -> "So3":
        return So3(self.q.conj())

    def matrix(self) -> jax.Array:
        return self.q.matrix()

    def adjoint(self) -> jax.Array:
        return self.matrix()


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class Se3:
    """3D rigid transform (reference: liegroup/se3.py:35-481)."""

    r: So3
    t: jax.Array  # (..., 3)

    def tree_flatten(self):
        return (self.r, self.t), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1])

    @property
    def shape(self):
        return self.t.shape[:-1]

    @property
    def rotation(self) -> So3:
        return self.r

    @property
    def translation(self) -> jax.Array:
        return self.t

    # constructors ---------------------------------------------------------
    @classmethod
    def identity(cls, batch_shape: Tuple[int, ...] = (), dtype=jnp.float32) -> "Se3":
        return cls(So3.identity(batch_shape, dtype),
                   jnp.zeros((*batch_shape, 3), dtype))

    @classmethod
    def from_matrix(cls, M: jax.Array) -> "Se3":
        return cls(So3.from_matrix(M[..., :3, :3]), M[..., :3, 3])

    @classmethod
    def from_qt(cls, q: jax.Array, t: jax.Array) -> "Se3":
        return cls(So3.from_wxyz(q), t)

    @classmethod
    def random(cls, key: jax.Array, batch_shape: Tuple[int, ...] = ()) -> "Se3":
        k1, k2 = jax.random.split(key)
        return cls(So3.random(k1, batch_shape),
                   jax.random.normal(k2, (*batch_shape, 3)))

    @staticmethod
    def exp(v: jax.Array) -> "Se3":
        """se3 tangent (..., 6) = (rho, omega) → group element.

        Uses the closed-form V matrix with small-angle Taylor branches
        (reference se3.py exp)."""
        v = as_float(v)
        rho = v[..., :3]
        omega = v[..., 3:]
        theta2 = jnp.sum(omega * omega, axis=-1)[..., None, None]
        theta = jnp.sqrt(jnp.maximum(theta2, 1e-20))
        K = vector_to_skew_symmetric_matrix(omega)
        K2 = K @ K
        eye = jnp.broadcast_to(jnp.eye(3, dtype=v.dtype), K.shape)
        A = jnp.where(theta2 < 1e-8, 0.5 - theta2 / 24.0,
                      (1.0 - jnp.cos(theta)) / jnp.maximum(theta2, 1e-20))
        B = jnp.where(theta2 < 1e-8, 1.0 / 6.0 - theta2 / 120.0,
                      (theta - jnp.sin(theta)) / jnp.maximum(theta2 * theta, 1e-20))
        V = eye + A * K + B * K2
        t = jnp.einsum("...ij,...j->...i", V, rho)
        return Se3(So3.exp(omega), t)

    def log(self) -> jax.Array:
        """group element → (..., 6) = (rho, omega)."""
        omega = self.r.log()
        theta2 = jnp.sum(omega * omega, axis=-1)[..., None, None]
        theta = jnp.sqrt(jnp.maximum(theta2, 1e-20))
        K = vector_to_skew_symmetric_matrix(omega)
        K2 = K @ K
        eye = jnp.broadcast_to(jnp.eye(3, dtype=omega.dtype), K.shape)
        half_theta = 0.5 * theta
        # V^{-1} = I - K/2 + (1/theta² - cot(theta/2)/(2 theta)) K²
        cot_term = 1.0 / jnp.maximum(theta2, 1e-20) - jnp.cos(half_theta) / (
            2.0 * jnp.maximum(theta * jnp.sin(half_theta), 1e-20))
        coeff = jnp.where(theta2 < 1e-8, 1.0 / 12.0 + theta2 / 720.0, cot_term)
        V_inv = eye - 0.5 * K + coeff * K2
        rho = jnp.einsum("...ij,...j->...i", V_inv, self.t)
        return jnp.concatenate([rho, omega], axis=-1)

    @staticmethod
    def hat(v: jax.Array) -> jax.Array:
        """(..., 6) → (..., 4, 4)."""
        rho = v[..., :3]
        omega = v[..., 3:]
        K = vector_to_skew_symmetric_matrix(omega)
        top = jnp.concatenate([K, rho[..., :, None]], axis=-1)
        bottom = jnp.zeros((*v.shape[:-1], 1, 4), dtype=v.dtype)
        return jnp.concatenate([top, bottom], axis=-2)

    @staticmethod
    def vee(omega: jax.Array) -> jax.Array:
        rho = omega[..., :3, 3]
        w = So3.vee(omega[..., :3, :3])
        return jnp.concatenate([rho, w], axis=-1)

    # group ops ------------------------------------------------------------
    def __mul__(self, other):
        if isinstance(other, Se3):
            return Se3(self.r * other.r, self.r.act(other.t) + self.t)
        return self.act(other)

    def act(self, pts: jax.Array) -> jax.Array:
        out = self.r.act(pts)
        if pts.ndim == self.t.ndim:  # (..., 3)
            return out + self.t
        return out + self.t[..., None, :]

    def inverse(self) -> "Se3":
        rinv = self.r.inverse()
        return Se3(rinv, -rinv.act(self.t))

    def matrix(self) -> jax.Array:
        R = self.r.matrix()
        top = jnp.concatenate([R, self.t[..., :, None]], axis=-1)
        bottom = jnp.zeros((*self.shape, 1, 4), dtype=self.t.dtype)
        bottom = bottom.at[..., 0, 3].set(1.0)
        return jnp.concatenate([top, bottom], axis=-2)

    def adjoint(self) -> jax.Array:
        R = self.r.matrix()
        tK = vector_to_skew_symmetric_matrix(self.t)
        top = jnp.concatenate([R, tK @ R], axis=-1)
        bottom = jnp.concatenate([jnp.zeros_like(R), R], axis=-1)
        return jnp.concatenate([top, bottom], axis=-2)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class So2:
    """2D rotation as a unit complex number (..., ) stored as (..., 2)=(re, im)
    (reference: liegroup/so2.py)."""

    z: jax.Array

    def tree_flatten(self):
        return (self.z,), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0])

    @property
    def shape(self):
        return self.z.shape[:-1]

    @classmethod
    def identity(cls, batch_shape=(), dtype=jnp.float32) -> "So2":
        z = jnp.zeros((*batch_shape, 2), dtype).at[..., 0].set(1.0)
        return cls(z)

    @staticmethod
    def exp(theta: jax.Array) -> "So2":
        return So2(jnp.stack([jnp.cos(theta), jnp.sin(theta)], axis=-1))

    def log(self) -> jax.Array:
        return jnp.arctan2(self.z[..., 1], self.z[..., 0])

    @staticmethod
    def hat(theta: jax.Array) -> jax.Array:
        zeros = jnp.zeros_like(theta)
        return jnp.stack(
            [jnp.stack([zeros, -theta], -1), jnp.stack([theta, zeros], -1)], axis=-2
        )

    @staticmethod
    def vee(omega: jax.Array) -> jax.Array:
        return omega[..., 1, 0]

    def matrix(self) -> jax.Array:
        c, s = self.z[..., 0], self.z[..., 1]
        return jnp.stack(
            [jnp.stack([c, -s], -1), jnp.stack([s, c], -1)], axis=-2
        )

    def __mul__(self, other):
        if isinstance(other, So2):
            a, b = self.z[..., 0], self.z[..., 1]
            c, d = other.z[..., 0], other.z[..., 1]
            return So2(jnp.stack([a * c - b * d, a * d + b * c], axis=-1))
        return self.act(other)

    def act(self, pts: jax.Array) -> jax.Array:
        R = self.matrix()
        if pts.shape[-1] == 2 and pts.ndim == R.ndim - 1:
            return jnp.einsum("...ij,...j->...i", R, pts)
        return jnp.einsum("...ij,...nj->...ni", R, pts)

    def inverse(self) -> "So2":
        return So2(self.z * jnp.array([1.0, -1.0], dtype=self.z.dtype))


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class Se2:
    """2D rigid transform (reference: liegroup/se2.py)."""

    r: So2
    t: jax.Array  # (..., 2)

    def tree_flatten(self):
        return (self.r, self.t), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1])

    @property
    def shape(self):
        return self.t.shape[:-1]

    @classmethod
    def identity(cls, batch_shape=(), dtype=jnp.float32) -> "Se2":
        return cls(So2.identity(batch_shape, dtype), jnp.zeros((*batch_shape, 2), dtype))

    @staticmethod
    def exp(v: jax.Array) -> "Se2":
        """(..., 3) = (tx, ty, theta)."""
        rho = v[..., :2]
        theta = v[..., 2]
        s = jnp.sin(theta)
        c = jnp.cos(theta)
        small = jnp.abs(theta) < 1e-6
        theta_safe = jnp.where(small, 1.0, theta)
        a = jnp.where(small, 1.0 - theta**2 / 6.0, s / theta_safe)
        b = jnp.where(small, theta / 2.0, (1.0 - c) / theta_safe)
        V = jnp.stack(
            [jnp.stack([a, -b], -1), jnp.stack([b, a], -1)], axis=-2
        )
        t = jnp.einsum("...ij,...j->...i", V, rho)
        return Se2(So2.exp(theta), t)

    def log(self) -> jax.Array:
        theta = self.r.log()
        s = jnp.sin(theta)
        c = jnp.cos(theta)
        small = jnp.abs(theta) < 1e-6
        theta_safe = jnp.where(small, 1.0, theta)
        a = jnp.where(small, 1.0 - theta**2 / 6.0, s / theta_safe)
        b = jnp.where(small, theta / 2.0, (1.0 - c) / theta_safe)
        det = a * a + b * b
        Vinv = jnp.stack(
            [jnp.stack([a, b], -1), jnp.stack([-b, a], -1)], axis=-2
        ) / jnp.maximum(det, _EPS)[..., None, None]
        rho = jnp.einsum("...ij,...j->...i", Vinv, self.t)
        return jnp.concatenate([rho, theta[..., None]], axis=-1)

    def __mul__(self, other):
        if isinstance(other, Se2):
            return Se2(self.r * other.r, self.r.act(other.t) + self.t)
        return self.act(other)

    def act(self, pts: jax.Array) -> jax.Array:
        out = self.r.act(pts)
        if pts.ndim == self.t.ndim:
            return out + self.t
        return out + self.t[..., None, :]

    def inverse(self) -> "Se2":
        rinv = self.r.inverse()
        return Se2(rinv, -rinv.act(self.t))

    def matrix(self) -> jax.Array:
        R = self.r.matrix()
        top = jnp.concatenate([R, self.t[..., :, None]], axis=-1)
        bottom = jnp.zeros((*self.shape, 1, 3), dtype=self.t.dtype)
        bottom = bottom.at[..., 0, 2].set(1.0)
        return jnp.concatenate([top, bottom], axis=-2)
