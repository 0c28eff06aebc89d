"""kornia-layout: ``kornia_tpu.transpiler`` mirrors ``kornia.transpiler``
(reference: transpiler/transpiler.py:26-80 — ivy-based torch→jax/numpy/tf
transpilation). This build is native JAX, so to_jax is the identity and
the others are thin converters."""

from . import to_jax, to_numpy, to_tensorflow  # noqa: F401

__all__ = ["to_jax", "to_numpy", "to_tensorflow"]
