"""Tracing / numerical-safety utilities (SURVEY.md §5).

The reference has no in-library profiling or sanitizers (its benchmarks
double as the profiling harness, and CUDA device asserts are isolated by
subprocess machinery in its conftest). The TPU-native equivalents:

- `trace(logdir)`: context manager around `jax.profiler` — captures an
  on-device trace viewable in TensorBoard/XProf (kernel timeline, HBM
  traffic, fusion boundaries).
- `checked(fn)`: `jax.experimental.checkify` wrapper that turns NaN/Inf
  production and out-of-bounds gathers inside a jitted function into
  reported errors instead of silent garbage — the TPU analogue of a
  device-side sanitizer.
- `assert_finite(tree)`: trace-time-free runtime finiteness probe via
  `jax.debug` (no recompile, works under jit).
"""

from __future__ import annotations

import contextlib
from typing import Any, Callable, Tuple

import jax
import jax.numpy as jnp

__all__ = ["trace", "checked", "assert_finite"]


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a device profile: `with trace("/tmp/prof"): fn(x)`."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def checked(fn: Callable, *, float_checks: bool = True,
            index_checks: bool = True) -> Callable:
    """Wrap `fn` with checkify: returns (error, out); raise with
    `error.throw()`. Composable with jit/vmap/grad.

    Example:
        err, out = jax.jit(checked(my_op))(x)
        err.throw()  # raises with the first NaN/OOB location
    """
    from jax.experimental import checkify
    checks = set()
    if float_checks:
        checks |= checkify.float_checks
    if index_checks:
        checks |= checkify.index_checks
    return checkify.checkify(fn, errors=checks)


def assert_finite(tree: Any, name: str = "value") -> None:
    """Runtime finiteness probe usable inside jitted code (jax.debug)."""
    leaves = jax.tree_util.tree_leaves(tree)
    ok = jnp.array(True)
    for leaf in leaves:
        if jnp.issubdtype(jnp.asarray(leaf).dtype, jnp.floating):
            ok = ok & jnp.isfinite(leaf).all()

    def _report(ok_val):
        if not bool(ok_val):
            raise FloatingPointError(f"non-finite values in {name}")

    jax.debug.callback(_report, ok)
