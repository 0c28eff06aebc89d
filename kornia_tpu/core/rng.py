"""RNG utilities.

The reference samples augmentation parameters on CPU to keep RNG
device-stable (kornia/augmentation/random_generator/base.py:54). JAX keys
are deterministic on every backend by construction, so the TPU build just
threads `jax.random.PRNGKey`s; `same_on_batch` becomes key broadcasting.
"""

from __future__ import annotations

from typing import Iterator, Sequence

import jax

__all__ = ["split_key", "key_iter", "batch_keys"]


def split_key(key: jax.Array, n: int = 2):
    return jax.random.split(key, n)


def key_iter(key: jax.Array) -> Iterator[jax.Array]:
    """Infinite stream of fresh subkeys."""
    while True:
        key, sub = jax.random.split(key)
        yield sub


def batch_keys(key: jax.Array, batch: int, same_on_batch: bool = False) -> jax.Array:
    """(B,) keys; identical keys when same_on_batch (reference semantics)."""
    if same_on_batch:
        return jax.numpy.broadcast_to(key, (batch, *key.shape))
    return jax.random.split(key, batch)
