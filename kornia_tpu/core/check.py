"""Static shape/type checking DSL.

TPU-native analogue of the reference's runtime check DSL
(kornia/core/check.py:63-786). Because every array in JAX has a static
shape at trace time, all checks here run *at trace time* (zero runtime
cost under jit) and raise standard Python exceptions.

The DSL mirrors the reference's spelling: ``check_shape(x, ["B", "C", "H", "W"])``
where an uppercase letter is a named wildcard (consistent within one call),
``"*"`` matches any run of leading dims, and an integer string pins a size.
"""

from __future__ import annotations

import os
from typing import Any, Sequence

import jax.numpy as jnp

__all__ = [
    "check",
    "check_shape",
    "check_same_shape",
    "check_same_dtype",
    "check_is_image",
    "check_is_gray",
    "check_is_color",
    "check_laf",
    "checks_enabled",
    "enable_checks",
    "disable_checks",
]

def checks_enabled() -> bool:
    from ..config import kornia_tpu_config
    return kornia_tpu_config.checks_enabled


def enable_checks() -> None:
    from ..config import kornia_tpu_config
    kornia_tpu_config.checks_enabled = True


def disable_checks() -> None:
    from ..config import kornia_tpu_config
    kornia_tpu_config.checks_enabled = False


def check(condition: bool, msg: str = "condition failed") -> None:
    """Trace-time assertion. ``condition`` must be a static Python bool."""
    if not condition and checks_enabled():
        raise ValueError(msg)


def _shape_of(x: Any) -> tuple:
    return tuple(x.shape) if hasattr(x, "shape") else tuple(x)


def check_shape(x: Any, pattern: Sequence[str], name: str = "tensor") -> None:
    """Check an array shape against a symbolic pattern.

    Pattern elements: ``"*"`` (any run of dims, only first position), an
    integer literal like ``"3"``, or a symbol like ``"B"`` that must bind
    consistently within this call.
    """
    if not checks_enabled():
        return
    shape = _shape_of(x)
    pat = list(pattern)
    if pat and pat[0] == "*":
        tail = pat[1:]
        if len(shape) < len(tail):
            raise ValueError(
                f"{name}: shape {shape} does not match pattern {list(pattern)}"
            )
        shape = shape[len(shape) - len(tail):]
        pat = tail
    if len(shape) != len(pat):
        raise ValueError(f"{name}: shape {shape} does not match pattern {list(pattern)}")
    bindings: dict = {}
    for dim, sym in zip(shape, pat):
        if sym.isdigit():
            if dim != int(sym):
                raise ValueError(
                    f"{name}: shape {shape} does not match pattern {list(pattern)}"
                )
        else:
            if sym in bindings and bindings[sym] != dim:
                raise ValueError(
                    f"{name}: shape {shape} does not match pattern {list(pattern)}: "
                    f"symbol {sym} bound to both {bindings[sym]} and {dim}"
                )
            bindings[sym] = dim


def check_same_shape(a: Any, b: Any, msg: str = "") -> None:
    if checks_enabled() and tuple(a.shape) != tuple(b.shape):
        raise ValueError(msg or f"shape mismatch: {tuple(a.shape)} vs {tuple(b.shape)}")


def check_same_dtype(a: Any, b: Any, msg: str = "") -> None:
    if checks_enabled() and a.dtype != b.dtype:
        raise ValueError(msg or f"dtype mismatch: {a.dtype} vs {b.dtype}")


def check_is_image(x: Any, name: str = "image") -> None:
    """(..., C, H, W) with float dtype."""
    if not checks_enabled():
        return
    if x.ndim < 3:
        raise ValueError(f"{name}: expected at least 3 dims (..., C, H, W), got {x.shape}")
    if not jnp.issubdtype(x.dtype, jnp.floating):
        raise TypeError(f"{name}: expected float dtype, got {x.dtype}")


def check_is_gray(x: Any, name: str = "image") -> None:
    check_is_image(x, name)
    if checks_enabled() and x.shape[-3] != 1:
        raise ValueError(f"{name}: expected 1 channel, got {x.shape[-3]}")


def check_is_color(x: Any, name: str = "image") -> None:
    check_is_image(x, name)
    if checks_enabled() and x.shape[-3] != 3:
        raise ValueError(f"{name}: expected 3 channels, got {x.shape[-3]}")


def check_laf(laf: Any, name: str = "laf") -> None:
    """Local affine frame stack (B, N, 2, 3)."""
    check_shape(laf, ["B", "N", "2", "3"], name)
