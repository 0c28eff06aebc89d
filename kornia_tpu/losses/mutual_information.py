"""Differentiable (normalized) mutual-information losses via kernel density
estimation (reference: kornia/losses/mutual_information.py).

TPU formulation: the reference boolean-mask-indexes its signals
(``signal[..., mask]``), which is a data-dependent shape. Here masks are
kept as multiplicative weights on the kernel responses instead — each
masked-out sample contributes a zero rank-1 term to the joint histogram, so
the result is identical while every shape stays static and the whole loss
jits. The joint histogram itself is one ``einsum`` over (bins, N) kernel
response matrices — a single MXU matmul per signal pair.
"""

from __future__ import annotations

import enum
import functools
from typing import Optional

import jax
import jax.numpy as jnp

from ..core.dtype import as_float

__all__ = [
    "MIKernel", "xu_kernel", "rectangular_kernel",
    "truncated_gaussian_kernel",
    "mutual_information_loss", "mutual_information_loss_2d",
    "mutual_information_loss_3d",
    "normalized_mutual_information_loss",
    "normalized_mutual_information_loss_2d",
    "normalized_mutual_information_loss_3d",
    "MILossFromRef", "MILossFromRef2D", "MILossFromRef3D",
    "NMILossFromRef", "NMILossFromRef2D", "NMILossFromRef3D",
]


def xu_kernel(x: jax.Array, window_radius: float = 1.0) -> jax.Array:
    """2nd-order polynomial Parzen kernel, support [-wr, wr]
    (reference: mutual_information.py:xu_kernel, Xu et al. 2008 Eq. 22)."""
    xa = jnp.abs(x) * (1.0 / window_radius)
    poly1 = xa * (-1.8 * xa - 0.1) + 1.0
    poly2 = xa * (1.8 * xa - 3.7) + 1.9
    return jnp.where(xa < 0.5, poly1,
                     jnp.where(xa <= 1.0, poly2, jnp.zeros_like(xa)))


def rectangular_kernel(x: jax.Array, window_radius: float = 1.0) -> jax.Array:
    """Box kernel, support [-wr, wr] (reference: rectangular_kernel)."""
    return jnp.where(jnp.abs(x) <= window_radius, 1.0, 0.0).astype(x.dtype)


def truncated_gaussian_kernel(x: jax.Array,
                              window_radius: float = 1.0) -> jax.Array:
    """Gaussian (sigma = wr) truncated to [-wr, wr]
    (reference: truncated_gaussian_kernel)."""
    sigma = window_radius
    g = jnp.exp(-0.5 * (x / sigma) ** 2) / (sigma * (2 * jnp.pi) ** 0.5)
    return jnp.where(jnp.abs(x) <= window_radius, g, jnp.zeros_like(g))


class MIKernel(enum.Enum):
    """Available KDE kernels (reference: MIKernel). Values are callables;
    ``functools.partial`` keeps them from becoming bound methods."""

    xu = functools.partial(xu_kernel)
    rectangular = functools.partial(rectangular_kernel)
    truncated_gaussian = functools.partial(truncated_gaussian_kernel)


def _prep_mask(mask, n: int, dtype) -> jax.Array:
    """Masks are COMMON across the batch (reference constraint: ndim <= 1)."""
    if mask is None:
        return jnp.ones((n,), dtype)
    mask = jnp.asarray(mask)
    if mask.ndim > 1:
        raise ValueError("mask must be a common (non-batched) mask")
    return jnp.broadcast_to(mask, (n,)).astype(dtype)


def _normalize_signal(data: jax.Array, w: jax.Array, num_bins: int,
                      eps: float) -> jax.Array:
    """Min-max rescale the masked samples to [0, num_bins]
    (reference: _normalize_signal, with the mask as weights)."""
    big = jnp.asarray(jnp.finfo(data.dtype).max, data.dtype)
    valid = w > 0
    mn = jnp.min(jnp.where(valid, data, big), axis=-1, keepdims=True)
    mx = jnp.max(jnp.where(valid, data, -big), axis=-1, keepdims=True)
    diff = mx - mn
    return jnp.where(diff > eps, (data - mn) / diff * num_bins, 0.0)


def _entropies(joint: jax.Array, eps: float):
    """(reference: _joint_histogram_to_entropies)."""
    p = jnp.clip(joint, eps, None)
    p = p / jnp.sum(p, axis=(-1, -2), keepdims=True)
    px = jnp.sum(p, axis=-2)
    py = jnp.sum(p, axis=-1)
    h_xy = jnp.sum(-p * jnp.log(p), axis=(-1, -2))
    h_x = jnp.sum(-px * jnp.log(px), axis=-1)
    h_y = jnp.sum(-py * jnp.log(py), axis=-1)
    return h_x, h_y, h_xy


def _mi_entropies(input: jax.Array, target: jax.Array,
                  input_mask, target_mask,
                  kernel_function: MIKernel, num_bins: int,
                  window_radius: float):
    x = as_float(input)
    y = as_float(target).astype(x.dtype)
    if x.shape != y.shape:
        raise ValueError(
            f"signals have incompatible shapes: {x.shape} vs {y.shape}")
    n = x.shape[-1]
    wx = _prep_mask(input_mask, n, x.dtype)
    wy = _prep_mask(target_mask, n, x.dtype)
    common = wx * wy
    eps = float(jnp.finfo(x.dtype).eps)
    xs = _normalize_signal(x, wx, num_bins, eps)
    ys = _normalize_signal(y, wy, num_bins, eps)
    if kernel_function not in MIKernel:
        raise ValueError(f"kernel_function must be a MIKernel, got "
                         f"{kernel_function}")
    kern = functools.partial(kernel_function.value,
                             window_radius=window_radius)
    bins = jnp.arange(num_bins, dtype=x.dtype)
    # (..., bins, N) kernel responses; masked samples weighted to zero
    vx = kern(bins[:, None] - xs[..., None, :]) * common
    vy = kern(bins[:, None] - ys[..., None, :])
    joint = jnp.einsum("...in,...jn->...ij", vx, vy)
    return _entropies(joint, eps)


def mutual_information_loss(input: jax.Array, target: jax.Array,
                            input_mask=None, target_mask=None,
                            kernel_function: MIKernel = MIKernel.xu,
                            num_bins: int = 64,
                            window_radius: float = 1.0) -> jax.Array:
    """-MI(X, Y) for flat (..., N) signals (reference:
    mutual_information.py:645)."""
    h_x, h_y, h_xy = _mi_entropies(input, target, input_mask, target_mask,
                                   kernel_function, num_bins, window_radius)
    return -(h_x + h_y - h_xy)


def normalized_mutual_information_loss(
        input: jax.Array, target: jax.Array, input_mask=None,
        target_mask=None, kernel_function: MIKernel = MIKernel.xu,
        num_bins: int = 64, window_radius: float = 1.0) -> jax.Array:
    """-(H(X)+H(Y))/H(X,Y) (reference: mutual_information.py:769)."""
    h_x, h_y, h_xy = _mi_entropies(input, target, input_mask, target_mask,
                                   kernel_function, num_bins, window_radius)
    return -(h_x + h_y) / h_xy


def _flat2(x):
    return None if x is None else jnp.asarray(x).reshape(-1)


def mutual_information_loss_2d(input, target, input_mask=None,
                               target_mask=None,
                               kernel_function: MIKernel = MIKernel.xu,
                               num_bins: int = 64,
                               window_radius: float = 1.0) -> jax.Array:
    """-MI for (..., H, W) images (reference: mutual_information.py:688)."""
    x = jnp.asarray(input)
    y = jnp.asarray(target)
    return mutual_information_loss(
        x.reshape(*x.shape[:-2], -1), y.reshape(*y.shape[:-2], -1),
        _flat2(input_mask), _flat2(target_mask),
        kernel_function, num_bins, window_radius)


def mutual_information_loss_3d(input, target, input_mask=None,
                               target_mask=None,
                               kernel_function: MIKernel = MIKernel.xu,
                               num_bins: int = 64,
                               window_radius: float = 1.0) -> jax.Array:
    """-MI for (..., D, H, W) volumes (reference: mutual_information.py:732)."""
    x = jnp.asarray(input)
    y = jnp.asarray(target)
    return mutual_information_loss(
        x.reshape(*x.shape[:-3], -1), y.reshape(*y.shape[:-3], -1),
        _flat2(input_mask), _flat2(target_mask),
        kernel_function, num_bins, window_radius)


def normalized_mutual_information_loss_2d(
        input, target, input_mask=None, target_mask=None,
        kernel_function: MIKernel = MIKernel.xu, num_bins: int = 64,
        window_radius: float = 1.0) -> jax.Array:
    x = jnp.asarray(input)
    y = jnp.asarray(target)
    return normalized_mutual_information_loss(
        x.reshape(*x.shape[:-2], -1), y.reshape(*y.shape[:-2], -1),
        _flat2(input_mask), _flat2(target_mask),
        kernel_function, num_bins, window_radius)


def normalized_mutual_information_loss_3d(
        input, target, input_mask=None, target_mask=None,
        kernel_function: MIKernel = MIKernel.xu, num_bins: int = 64,
        window_radius: float = 1.0) -> jax.Array:
    x = jnp.asarray(input)
    y = jnp.asarray(target)
    return normalized_mutual_information_loss(
        x.reshape(*x.shape[:-3], -1), y.reshape(*y.shape[:-3], -1),
        _flat2(input_mask), _flat2(target_mask),
        kernel_function, num_bins, window_radius)


class _FromRefBase:
    """Stores a reference signal; forward compares another signal to it
    (reference: EntropyBasedLossBase)."""

    _loss = staticmethod(mutual_information_loss)
    _ndim_flatten = 0  # trailing dims flattened on the way in

    def __init__(self, reference_signal, mask=None,
                 kernel_function: MIKernel = MIKernel.xu,
                 num_bins: int = 64, window_radius: float = 1.0):
        ref = jnp.asarray(reference_signal)
        if self._ndim_flatten:
            ref = ref.reshape(*ref.shape[:-self._ndim_flatten], -1)
            mask = _flat2(mask)
        self.reference = ref
        self.mask = mask
        self.kernel_function = kernel_function
        self.num_bins = num_bins
        self.window_radius = window_radius

    def __call__(self, other_signal, other_mask=None):
        other = jnp.asarray(other_signal)
        if self._ndim_flatten:
            other = other.reshape(*other.shape[:-self._ndim_flatten], -1)
            other_mask = _flat2(other_mask)
        return type(self)._loss(
            other, self.reference, other_mask, self.mask,
            self.kernel_function, self.num_bins, self.window_radius)

    forward = __call__


class MILossFromRef(_FromRefBase):
    """-MI against a stored flat reference (reference: MILossFromRef)."""


class NMILossFromRef(_FromRefBase):
    """-NMI against a stored flat reference (reference: NMILossFromRef)."""

    _loss = staticmethod(normalized_mutual_information_loss)


class MILossFromRef2D(MILossFromRef):
    _ndim_flatten = 2


class MILossFromRef3D(MILossFromRef):
    _ndim_flatten = 3


class NMILossFromRef2D(NMILossFromRef):
    _ndim_flatten = 2


class NMILossFromRef3D(NMILossFromRef):
    _ndim_flatten = 3
