"""Auto-augmentation policies: AutoAugment, RandAugment, TrivialAugment
(reference: kornia/augmentation/auto/, ~2.2k LoC).

TPU-first: each policy step evaluates the (cheap, elementwise) candidate
ops and selects per-sample with one-hot masks — fully batched, jit-safe,
no per-sample Python dispatch. Magnitudes are differentiable like the
reference's OperationBase (auto/operations/base.py:30).
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..core.dtype import as_float
from ..ops import enhance as E
from ..ops import warp as W

__all__ = ["RandAugment", "TrivialAugment", "AutoAugment", "Operation",
           "IMAGENET_POLICY", "CIFAR10_POLICY", "SVHN_POLICY"]


def _shear_x(x, mag):
    B = x.shape[0]
    M = jnp.broadcast_to(jnp.eye(3), (B, 3, 3)).at[:, 0, 1].set(mag)
    H_, W_ = x.shape[-2:]
    return W.warp_perspective(x, M, (H_, W_), align_corners=True)


def _shear_y(x, mag):
    B = x.shape[0]
    M = jnp.broadcast_to(jnp.eye(3), (B, 3, 3)).at[:, 1, 0].set(mag)
    H_, W_ = x.shape[-2:]
    return W.warp_perspective(x, M, (H_, W_), align_corners=True)


def _translate_x(x, mag):
    return W.translate(x, jnp.stack([mag * x.shape[-1], jnp.zeros_like(mag)], -1))


def _translate_y(x, mag):
    return W.translate(x, jnp.stack([jnp.zeros_like(mag), mag * x.shape[-2]], -1))


def _rotate(x, mag):
    return W.rotate(x, mag)


# op table: name → (fn(x, magnitude_array), magnitude range, signed)
_OPS: List[Tuple[str, Callable, Tuple[float, float], bool]] = [
    ("identity", lambda x, m: x, (0.0, 0.0), False),
    ("auto_contrast", lambda x, m: E.normalize_min_max(x), (0.0, 0.0), False),
    ("equalize", lambda x, m: E.equalize(x), (0.0, 0.0), False),
    ("invert", lambda x, m: E.invert(x), (0.0, 0.0), False),
    ("brightness", lambda x, m: E.adjust_brightness(x, 1.0 + m), (0.0, 0.9), True),
    ("contrast", lambda x, m: E.adjust_contrast_with_mean_subtraction(
        x, 1.0 + m), (0.0, 0.9), True),
    ("saturation", lambda x, m: E.adjust_saturation(x, 1.0 + m), (0.0, 0.9), True),
    ("sharpness", lambda x, m: E.sharpness(x, jnp.abs(m)), (0.0, 0.9), True),
    ("posterize", lambda x, m: E.posterize(
        x, jnp.clip(8.0 - m, 1, 8).astype(jnp.int32)), (0.0, 4.0), False),
    ("solarize", lambda x, m: E.solarize(x, 1.0 - m), (0.0, 1.0), False),
    ("rotate", _rotate, (0.0, 30.0), True),
    ("shear_x", _shear_x, (0.0, 0.3), True),
    ("shear_y", _shear_y, (0.0, 0.3), True),
    ("translate_x", _translate_x, (0.0, 0.3), True),
    ("translate_y", _translate_y, (0.0, 0.3), True),
]


def _apply_indexed(x: jax.Array, op_idx: jax.Array, mag01: jax.Array,
                   signs: jax.Array, ops=None) -> jax.Array:
    """Evaluate every candidate op and select per sample by op_idx.

    mag01 in [0, 1] is mapped to each op's own magnitude range."""
    ops = ops if ops is not None else _OPS
    outs = []
    for i, (name, fn, (lo, hi), signed) in enumerate(ops):
        mag = lo + mag01 * (hi - lo)
        if signed:
            mag = mag * signs
        outs.append(fn(x, mag))
    stack = jnp.stack(outs)  # (n_ops, B, C, H, W)
    sel = op_idx[None, :, None, None, None]
    return jnp.take_along_axis(
        stack, jnp.broadcast_to(sel, (1, *x.shape)), axis=0)[0]


class RandAugment:
    """(reference: auto/rand_augment/rand_augment.py). n ops at shared
    magnitude m (of 30)."""

    def __init__(self, n: int = 2, m: int = 10):
        self.n = n
        self.m = m

    def __call__(self, x: jax.Array, key: Optional[jax.Array] = None
                 ) -> jax.Array:
        x = as_float(x)
        if key is None:
            key = jax.random.PRNGKey(0)
        B = x.shape[0]
        for _ in range(self.n):
            key, k1, k2 = jax.random.split(key, 3)
            op_idx = jax.random.randint(k1, (B,), 0, len(_OPS))
            signs = jnp.where(jax.random.bernoulli(k2, 0.5, (B,)), 1.0, -1.0)
            mag01 = jnp.full((B,), self.m / 30.0)
            x = _apply_indexed(x, op_idx, mag01, signs)
        return x


class TrivialAugment:
    """(reference: auto/trivial_augment/). One random op, random magnitude."""

    def __call__(self, x: jax.Array, key: Optional[jax.Array] = None
                 ) -> jax.Array:
        x = as_float(x)
        if key is None:
            key = jax.random.PRNGKey(0)
        B = x.shape[0]
        k1, k2, k3 = jax.random.split(key, 3)
        op_idx = jax.random.randint(k1, (B,), 0, len(_OPS))
        mag01 = jax.random.uniform(k2, (B,))
        signs = jnp.where(jax.random.bernoulli(k3, 0.5, (B,)), 1.0, -1.0)
        return _apply_indexed(x, op_idx, mag01, signs)


# -----------------------------------------------------------------------------
# Differentiable-magnitude operation wrapper
# (reference: auto/operations/base.py:30 OperationBase + operations/ops.py)
# -----------------------------------------------------------------------------


class Operation:
    """An auto-augmentation op with an explicit, DIFFERENTIABLE magnitude.

    Reference OperationBase holds the magnitude as a trainable tensor and
    gates application with a (relaxed-)bernoulli; here the magnitude is a
    plain traced argument — `jax.grad` flows through it because every op
    in the table is a jax-differentiable function — and the probability
    gate is straight-through: out = x + gate * (op(x) - x).
    """

    def __init__(self, name: str, fn: Callable, probability: float = 0.5,
                 magnitude_range: Optional[Tuple[float, float]] = None):
        self.name = name
        self.fn = fn
        self.probability = probability
        self.magnitude_range = magnitude_range

    def __call__(self, x: jax.Array, key: jax.Array,
                 magnitude: Optional[jax.Array] = None,
                 probability: Optional[jax.Array] = None) -> jax.Array:
        B = x.shape[0]
        k_m, k_p = jax.random.split(key)
        if magnitude is None and self.magnitude_range is not None:
            lo, hi = self.magnitude_range
            magnitude = jax.random.uniform(k_m, (B,), minval=lo, maxval=hi)
        p = self.probability if probability is None else probability
        gate = jax.random.bernoulli(k_p, p, (B,)).astype(x.dtype)
        mag = (jnp.zeros((B,), x.dtype) if magnitude is None
               else jnp.broadcast_to(jnp.asarray(magnitude, x.dtype), (B,)))
        out = self.fn(x, mag)
        return x + gate[:, None, None, None] * (out - x)


# -----------------------------------------------------------------------------
# AutoAugment: exact policy tables
# (reference: auto/autoaugment/autoaugment.py:30-114, level→magnitude
# bins from auto/autoaugment/ops.py: each (op, p, level) samples its
# magnitude uniformly in [linspace[level], linspace[level+1]])
# -----------------------------------------------------------------------------

import math as _math


def _deg2shear(x, deg, axis):
    coef = jnp.tan(jnp.deg2rad(deg))
    B = x.shape[0]
    M = jnp.broadcast_to(jnp.eye(3), (B, 3, 3))
    M = M.at[:, 0, 1].set(coef) if axis == "x" else M.at[:, 1, 0].set(coef)
    H_, W_ = x.shape[-2:]
    return W.warp_perspective(x, M, (H_, W_), align_corners=True)


# native-unit op table for AutoAugment policies: name → fn(x, magnitude)
_AA_FNS: Dict[str, Callable] = {
    "shear_x": lambda x, m: _deg2shear(x, m, "x"),
    "shear_y": lambda x, m: _deg2shear(x, m, "y"),
    "translate_x": _translate_x,
    "translate_y": _translate_y,
    "rotate": _rotate,
    "auto_contrast": lambda x, m: E.normalize_min_max(x),
    "invert": lambda x, m: E.invert(x),
    "equalize": lambda x, m: E.equalize(x),
    "solarize": lambda x, m: E.solarize(x, m),
    "posterize": lambda x, m: E.posterize(
        x, jnp.clip(jnp.round(m), 1, 8).astype(jnp.int32)),
    "contrast": lambda x, m: E.adjust_contrast_with_mean_subtraction(x, m),
    "brightness": lambda x, m: E.adjust_brightness(x, m - 1.0),
    "sharpness": lambda x, m: E.sharpness(x, m),
    "color": lambda x, m: E.adjust_saturation(x, m),
}

# level→magnitude bin edges (11 edges → 10 bins), reference ops.py
_AA_BINS: Dict[str, Optional[Tuple[float, float]]] = {
    "shear_x": (-0.3 * 180.0, 0.3 * 180.0),
    "shear_y": (-0.3 * 180.0, 0.3 * 180.0),
    "translate_x": (-0.5, 0.5),
    "translate_y": (-0.5, 0.5),
    "rotate": (-30.0, 30.0),
    "solarize": (0.0, 1.0),
    "posterize": (4.0, 8.0),
    "contrast": (0.1, 1.9),
    "brightness": (0.1, 1.9),
    "sharpness": (0.1, 1.9),
    "color": (0.1, 1.9),
    "auto_contrast": None,
    "invert": None,
    "equalize": None,
}


def _bin_edges(name: str, level) -> Tuple[float, float]:
    rng = _AA_BINS[name]
    if rng is None or level is None:
        return (0.0, 0.0)
    lo, hi = rng
    step = (hi - lo) / 10.0
    return (lo + step * level, lo + step * (level + 1))


# exact tables: (op, probability, level 0-10 or None)
# (reference: autoaugment.py:30-56 imagenet, :59-85 cifar10, :88-114 svhn)
IMAGENET_POLICY = [
    [("posterize", 0.4, 8), ("rotate", 0.6, 9)],
    [("solarize", 0.6, 5), ("auto_contrast", 0.6, None)],
    [("equalize", 0.8, None), ("equalize", 0.6, None)],
    [("posterize", 0.6, 7), ("posterize", 0.6, 6)],
    [("equalize", 0.4, None), ("solarize", 0.2, 4)],
    [("equalize", 0.4, None), ("rotate", 0.8, 8)],
    [("solarize", 0.6, 3), ("equalize", 0.6, None)],
    [("posterize", 0.8, 5), ("equalize", 1.0, None)],
    [("rotate", 0.2, 3), ("solarize", 0.6, 8)],
    [("equalize", 0.6, None), ("posterize", 0.4, 6)],
    [("rotate", 0.8, 8), ("color", 0.4, 0)],
    [("rotate", 0.4, 9), ("equalize", 0.6, None)],
    [("equalize", 0.0, None), ("equalize", 0.8, None)],
    [("invert", 0.6, None), ("equalize", 1.0, None)],
    [("color", 0.6, 4), ("contrast", 1.0, 8)],
    [("rotate", 0.8, 8), ("color", 1.0, 2)],
    [("color", 0.8, 8), ("solarize", 0.8, 7)],
    [("sharpness", 0.4, 7), ("invert", 0.6, None)],
    [("shear_x", 0.6, 5), ("equalize", 1.0, None)],
    [("color", 0.4, 0), ("equalize", 0.6, None)],
    [("equalize", 0.4, None), ("solarize", 0.2, 4)],
    [("solarize", 0.6, 5), ("auto_contrast", 0.6, None)],
    [("invert", 0.6, None), ("equalize", 1.0, None)],
    [("color", 0.6, 4), ("contrast", 1.0, 8)],
    [("equalize", 0.8, None), ("equalize", 0.6, None)],
]

CIFAR10_POLICY = [
    [("invert", 0.1, None), ("contrast", 0.2, 6)],
    [("rotate", 0.7, 2), ("translate_x", 0.3, 9)],
    [("sharpness", 0.8, 1), ("sharpness", 0.9, 3)],
    [("shear_y", 0.5, 8), ("translate_y", 0.7, 9)],
    [("auto_contrast", 0.5, None), ("equalize", 0.9, None)],
    [("shear_y", 0.2, 7), ("posterize", 0.3, 7)],
    [("color", 0.4, 3), ("brightness", 0.6, 7)],
    [("sharpness", 0.3, 9), ("brightness", 0.7, 9)],
    [("equalize", 0.6, None), ("equalize", 0.5, None)],
    [("contrast", 0.6, 7), ("sharpness", 0.6, 5)],
    [("color", 0.7, 7), ("translate_x", 0.5, 8)],
    [("equalize", 0.3, None), ("auto_contrast", 0.4, None)],
    [("translate_y", 0.4, 3), ("sharpness", 0.2, 6)],
    [("brightness", 0.9, 6), ("color", 0.2, 8)],
    [("solarize", 0.5, 2), ("invert", 0.0, None)],
    [("equalize", 0.2, None), ("auto_contrast", 0.6, None)],
    [("equalize", 0.2, None), ("equalize", 0.6, None)],
    [("color", 0.9, 9), ("equalize", 0.6, None)],
    [("auto_contrast", 0.8, None), ("solarize", 0.2, 8)],
    [("brightness", 0.1, 3), ("color", 0.7, 0)],
    [("solarize", 0.4, 5), ("auto_contrast", 0.9, None)],
    [("translate_y", 0.9, 9), ("translate_y", 0.7, 9)],
    [("auto_contrast", 0.9, None), ("solarize", 0.8, 3)],
    [("equalize", 0.8, None), ("invert", 0.1, None)],
    [("translate_y", 0.7, 9), ("auto_contrast", 0.9, None)],
]

SVHN_POLICY = [
    [("shear_x", 0.9, 4), ("invert", 0.2, None)],
    [("shear_y", 0.9, 8), ("invert", 0.7, None)],
    [("equalize", 0.6, None), ("solarize", 0.6, 6)],
    [("invert", 0.9, None), ("equalize", 0.6, None)],
    [("equalize", 0.6, None), ("rotate", 0.9, 3)],
    [("shear_x", 0.9, 4), ("auto_contrast", 0.8, None)],
    [("shear_y", 0.9, 8), ("invert", 0.4, None)],
    [("shear_y", 0.9, 5), ("solarize", 0.2, 6)],
    [("invert", 0.9, None), ("auto_contrast", 0.8, None)],
    [("equalize", 0.6, None), ("rotate", 0.9, 3)],
    [("shear_x", 0.9, 4), ("solarize", 0.3, 3)],
    [("shear_y", 0.8, 8), ("invert", 0.7, None)],
    [("equalize", 0.9, None), ("translate_y", 0.6, 6)],
    [("invert", 0.9, None), ("equalize", 0.6, None)],
    [("contrast", 0.3, 3), ("rotate", 0.8, 4)],
    [("invert", 0.8, None), ("translate_y", 0.0, 2)],
    [("shear_y", 0.7, 6), ("solarize", 0.4, 8)],
    [("invert", 0.6, None), ("rotate", 0.8, 4)],
    [("shear_y", 0.3, 7), ("translate_x", 0.9, 3)],
    [("shear_x", 0.1, 6), ("invert", 0.6, None)],
    [("solarize", 0.7, 2), ("translate_y", 0.6, 7)],
    [("shear_y", 0.8, 4), ("invert", 0.8, None)],
    [("shear_x", 0.7, 9), ("translate_y", 0.8, 3)],
    [("shear_y", 0.8, 5), ("auto_contrast", 0.7, None)],
    [("shear_x", 0.7, 2), ("invert", 0.1, None)],
]

_POLICIES = {"imagenet": IMAGENET_POLICY, "cifar10": CIFAR10_POLICY,
             "svhn": SVHN_POLICY}
_AA_NAMES = list(_AA_FNS)
_AA_INDEX = {n: i for i, n in enumerate(_AA_NAMES)}


def _apply_aa_indexed(x: jax.Array, op_idx: jax.Array, mag: jax.Array
                      ) -> jax.Array:
    """Evaluate every policy op at its native-unit magnitude and select
    per sample by op_idx (elementwise candidates + one-hot select: jit-
    safe, no per-sample dispatch)."""
    outs = [fn(x, mag) for fn in _AA_FNS.values()]
    stack = jnp.stack(outs)  # (n_ops, B, C, H, W)
    sel = op_idx[None, :, None, None, None]
    return jnp.take_along_axis(
        stack, jnp.broadcast_to(sel, (1, *x.shape)), axis=0)[0]


class AutoAugment:
    """AutoAugment searched policies (reference:
    auto/autoaugment/autoaugment.py; tables entry-for-entry, level bins
    from autoaugment/ops.py).

    policy: 'imagenet' | 'cifar10' | 'svhn' | a custom list of
    subpolicies [(op_name, probability, level|None), ...].
    """

    def __init__(self, policy="imagenet"):
        table = _POLICIES[policy] if isinstance(policy, str) else policy
        self.policy = table
        self.n_steps = max(len(sp) for sp in table)
        # static per-step tables: op index, probability, magnitude bin
        self._tables = []
        for step in range(self.n_steps):
            op_i, prob, lo, hi = [], [], [], []
            for sp in table:
                name, p, level = (sp[step] if step < len(sp)
                                  else ("equalize", 0.0, None))
                op_i.append(_AA_INDEX[name])
                prob.append(p)
                e = _bin_edges(name, level)
                lo.append(e[0])
                hi.append(e[1])
            self._tables.append((jnp.asarray(op_i), jnp.asarray(prob),
                                 jnp.asarray(lo), jnp.asarray(hi)))

    def __call__(self, x: jax.Array, key: Optional[jax.Array] = None
                 ) -> jax.Array:
        x = as_float(x)
        if key is None:
            key = jax.random.PRNGKey(0)
        B = x.shape[0]
        key, ksel = jax.random.split(key)
        sub_idx = jax.random.randint(ksel, (B,), 0, len(self.policy))
        for op_t, prob_t, lo_t, hi_t in self._tables:
            key, kp, km = jax.random.split(key, 3)
            op_idx = op_t[sub_idx]
            prob = prob_t[sub_idx]
            u = jax.random.uniform(km, (B,))
            mag = lo_t[sub_idx] + u * (hi_t[sub_idx] - lo_t[sub_idx])
            applied = _apply_aa_indexed(x, op_idx, mag)
            gate = jax.random.uniform(kp, (B,)) < prob
            x = jnp.where(gate[:, None, None, None], applied, x)
        return x
