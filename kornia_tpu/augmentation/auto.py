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

__all__ = ["RandAugment", "TrivialAugment", "AutoAugment"]


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


# AutoAugment ImageNet policy: (op_name, probability, magnitude/30)
_IMAGENET_POLICY = [
    [("posterize", 0.4, 8 / 30), ("rotate", 0.6, 9 / 30)],
    [("solarize", 0.6, 5 / 30), ("auto_contrast", 0.6, 0.0)],
    [("equalize", 0.8, 0.0), ("equalize", 0.6, 0.0)],
    [("posterize", 0.6, 7 / 30), ("posterize", 0.6, 6 / 30)],
    [("equalize", 0.4, 0.0), ("solarize", 0.2, 4 / 30)],
    [("equalize", 0.4, 0.0), ("rotate", 0.8, 8 / 30)],
    [("solarize", 0.6, 3 / 30), ("equalize", 0.6, 0.0)],
    [("posterize", 0.8, 5 / 30), ("equalize", 1.0, 0.0)],
    [("rotate", 0.2, 3 / 30), ("solarize", 0.6, 8 / 30)],
    [("equalize", 0.6, 0.0), ("posterize", 0.4, 6 / 30)],
    [("rotate", 0.8, 8 / 30), ("contrast", 0.4, 0.3)],
    [("rotate", 1.0, 9 / 30), ("equalize", 0.6, 0.0)],
    [("equalize", 0.0, 0.0), ("equalize", 0.8, 0.0)],
    [("invert", 0.6, 0.0), ("equalize", 1.0, 0.0)],
    [("contrast", 0.6, 0.13), ("sharpness", 0.6, 0.16)],
]

_OP_INDEX = {name: i for i, (name, _, _, _) in enumerate(_OPS)}


class AutoAugment:
    """(reference: auto/autoaugment/autoaugment.py). ImageNet policy."""

    def __init__(self, policy: str = "imagenet"):
        assert policy == "imagenet", "only the imagenet policy ships in-round"
        self.policy = _IMAGENET_POLICY

    def __call__(self, x: jax.Array, key: Optional[jax.Array] = None
                 ) -> jax.Array:
        x = as_float(x)
        if key is None:
            key = jax.random.PRNGKey(0)
        B = x.shape[0]
        key, ksel = jax.random.split(key)
        sub_idx = jax.random.randint(ksel, (B,), 0, len(self.policy))
        for step in range(2):  # each subpolicy has 2 steps
            key, kp, ks = jax.random.split(key, 3)
            op_idx_table = jnp.array(
                [_OP_INDEX[sp[step][0]] for sp in self.policy])
            prob_table = jnp.array([sp[step][1] for sp in self.policy])
            mag_table = jnp.array([sp[step][2] for sp in self.policy])
            op_idx = op_idx_table[sub_idx]
            prob = prob_table[sub_idx]
            mag01 = mag_table[sub_idx]
            signs = jnp.where(jax.random.bernoulli(ks, 0.5, (B,)), 1.0, -1.0)
            applied = _apply_indexed(x, op_idx, mag01, signs)
            gate = jax.random.uniform(kp, (B,)) < prob
            x = jnp.where(gate[:, None, None, None], applied, x)
        return x
