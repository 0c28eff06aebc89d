"""Dtype policy for TPU.

TPUs have no float64 in the MXU path; the reference's strategy of promoting
to f64 around ill-conditioned linalg (kornia/core/utils.py:232,273) is
replaced by: (a) f32 compute with algorithmic conditioning (Hartley
normalization, iterative refinement), (b) optional x64 on CPU for
conformance tests. These helpers centralize the policy.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

__all__ = [
    "compute_dtype",
    "as_float",
    "solve_dtype",
    "bf16_storage",
]

#: dtype used for general image compute
compute_dtype = jnp.float32


def as_float(x: Any, dtype=None) -> jax.Array:
    """Promote integral arrays to the compute dtype; pass floats through."""
    x = jnp.asarray(x)
    if jnp.issubdtype(x.dtype, jnp.floating):
        return x if dtype is None else x.astype(dtype)
    return x.astype(dtype or compute_dtype)


def solve_dtype() -> Any:
    """Dtype for linear solves: f64 if x64 is enabled (CPU tests), else f32."""
    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32


def bf16_storage(x: jax.Array) -> jax.Array:
    """Cast to bfloat16 for HBM-resident storage."""
    return x.astype(jnp.bfloat16)
