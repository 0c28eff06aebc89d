"""Descriptor matching (reference: kornia/feature/matching.py, 589 LoC).

TPU-first: all matchers operate on FIXED-SIZE descriptor sets with
validity masks (padded-K pipelines). The distance matrix is one
(N, D)x(D, M) matmul on the MXU. Matchers return (distances (N,),
idx (N, 2), valid (N,)) with static shapes — the reference returns
variable-length match lists, which cannot exist under jit.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.dtype import as_float

__all__ = [
    "distance_matrix",
    "match_nn",
    "match_mnn",
    "match_snn",
    "match_smnn",
    "match_fginn",
    "DescriptorMatcher",
]

_BIG = 1e9


def distance_matrix(desc1: jax.Array, desc2: jax.Array,
                    mask1: Optional[jax.Array] = None,
                    mask2: Optional[jax.Array] = None) -> jax.Array:
    """Squared L2 distance matrix (N, M) via the matmul identity
    (reference: matching.py:_cdist:32). Padded entries get _BIG."""
    desc1 = as_float(desc1)
    desc2 = as_float(desc2)
    n1 = jnp.sum(desc1 * desc1, axis=-1, keepdims=True)
    n2 = jnp.sum(desc2 * desc2, axis=-1, keepdims=True)
    dm = n1 + jnp.swapaxes(n2, -1, -2) - 2.0 * (desc1 @ jnp.swapaxes(desc2, -1, -2))
    dm = jnp.maximum(dm, 0.0)
    if mask1 is not None:
        dm = jnp.where(mask1[..., :, None], dm, _BIG)
    if mask2 is not None:
        dm = jnp.where(mask2[..., None, :], dm, _BIG)
    return dm


def _pack(dists: jax.Array, idx2: jax.Array, valid: jax.Array
          ) -> Tuple[jax.Array, jax.Array]:
    """Return kornia-style (dists (N, 1), idx (N, 2)) with invalid rows
    marked by distance _BIG (callers filter by `valid`)."""
    n = dists.shape[-1]
    idx1 = jnp.arange(n)
    matches = jnp.stack([idx1, idx2], axis=-1)
    return dists[..., None], matches, valid


def match_nn(desc1: jax.Array, desc2: jax.Array,
             mask1: Optional[jax.Array] = None,
             mask2: Optional[jax.Array] = None):
    """Nearest neighbor (reference: matching.py:88)."""
    dm = distance_matrix(desc1, desc2, mask1, mask2)
    idx2 = jnp.argmin(dm, axis=-1)
    dists = jnp.min(dm, axis=-1)
    valid = dists < _BIG / 2
    if mask1 is not None:
        valid = valid & mask1
    return _pack(dists, idx2, valid)


def match_mnn(desc1: jax.Array, desc2: jax.Array,
              mask1: Optional[jax.Array] = None,
              mask2: Optional[jax.Array] = None):
    """Mutual nearest neighbor (reference: matching.py:117)."""
    dm = distance_matrix(desc1, desc2, mask1, mask2)
    idx12 = jnp.argmin(dm, axis=-1)  # (N,)
    idx21 = jnp.argmin(dm, axis=-2)  # (M,)
    mutual = idx21[idx12] == jnp.arange(dm.shape[-2])
    dists = jnp.min(dm, axis=-1)
    valid = mutual & (dists < _BIG / 2)
    if mask1 is not None:
        valid = valid & mask1
    return _pack(dists, idx12, valid)


def match_snn(desc1: jax.Array, desc2: jax.Array, th: float = 0.8,
              mask1: Optional[jax.Array] = None,
              mask2: Optional[jax.Array] = None):
    """Lowe ratio test (reference: matching.py:157)."""
    dm = distance_matrix(desc1, desc2, mask1, mask2)
    neg = -dm
    top2, idx = jax.lax.top_k(neg, 2)
    d1 = -top2[..., 0]
    d2 = -top2[..., 1]
    ratio = jnp.sqrt(jnp.maximum(d1, 0.0) / jnp.maximum(d2, 1e-12))
    valid = (ratio <= th) & (d1 < _BIG / 2)
    if mask1 is not None:
        valid = valid & mask1
    return _pack(ratio, idx[..., 0], valid)


def match_smnn(desc1: jax.Array, desc2: jax.Array, th: float = 0.95,
               mask1: Optional[jax.Array] = None,
               mask2: Optional[jax.Array] = None):
    """Symmetric ratio test + mutual NN (reference: matching.py:197)."""
    dm = distance_matrix(desc1, desc2, mask1, mask2)
    # forward ratio
    top2_f, idx_f = jax.lax.top_k(-dm, 2)
    ratio_f = jnp.sqrt(jnp.maximum(-top2_f[..., 0], 0.0)
                       / jnp.maximum(-top2_f[..., 1], 1e-12))
    # backward ratio
    dmT = jnp.swapaxes(dm, -1, -2)
    top2_b, idx_b = jax.lax.top_k(-dmT, 2)
    ratio_b = jnp.sqrt(jnp.maximum(-top2_b[..., 0], 0.0)
                       / jnp.maximum(-top2_b[..., 1], 1e-12))
    idx12 = idx_f[..., 0]
    mutual = idx_b[..., 0][idx12] == jnp.arange(dm.shape[-2])
    ratio_max = jnp.maximum(ratio_f, ratio_b[idx12])
    valid = mutual & (ratio_f <= th) & (ratio_b[idx12] <= th) & \
        (-top2_f[..., 0] < _BIG / 2)
    if mask1 is not None:
        valid = valid & mask1
    return _pack(ratio_max, idx12, valid)


def match_fginn(desc1: jax.Array, desc2: jax.Array,
                lafs1: jax.Array, lafs2: jax.Array,
                th: float = 0.8, spatial_th: float = 10.0,
                mutual: bool = False,
                mask1: Optional[jax.Array] = None,
                mask2: Optional[jax.Array] = None):
    """First geometrically inconsistent NN ratio (reference:
    matching.py:254): the second neighbor used in the ratio is the best
    match at least `spatial_th` pixels away from the first."""
    from .laf import get_laf_center
    dm = distance_matrix(desc1, desc2, mask1, mask2)
    idx1_best = jnp.argmin(dm, axis=-1)
    d_best = jnp.min(dm, axis=-1)
    xy2 = get_laf_center(lafs2)
    if xy2.ndim == 3:
        xy2 = xy2[0]
    best_xy = xy2[idx1_best]  # (N, 2)
    spatial_d = jnp.linalg.norm(xy2[None, :, :] - best_xy[:, None, :], axis=-1)
    dm_far = jnp.where(spatial_d >= spatial_th, dm, _BIG)
    d_second = jnp.min(dm_far, axis=-1)
    ratio = jnp.sqrt(jnp.maximum(d_best, 0.0) / jnp.maximum(d_second, 1e-12))
    valid = (ratio <= th) & (d_best < _BIG / 2)
    if mutual:
        idx21 = jnp.argmin(dm, axis=-2)
        valid = valid & (idx21[idx1_best] == jnp.arange(dm.shape[-2]))
    if mask1 is not None:
        valid = valid & mask1
    return _pack(ratio, idx1_best, valid)


class DescriptorMatcher:
    """(reference: matching.py:331).

    With ``use_pallas=True`` (and mode smnn/nn), matching runs through the
    streaming Pallas kernel (ops/pallas_kernels.py) — no (N, M) distance
    matrix in HBM; preferable for N ≥ ~4k descriptors on TPU."""

    def __init__(self, match_mode: str = "snn", th: float = 0.8,
                 use_pallas: bool = False):
        self.match_mode = match_mode
        self.th = th
        self.use_pallas = use_pallas

    def __call__(self, desc1: jax.Array, desc2: jax.Array,
                 mask1: Optional[jax.Array] = None,
                 mask2: Optional[jax.Array] = None):
        if self.use_pallas and self.match_mode == "smnn" and mask1 is None \
                and mask2 is None:
            from ..ops.pallas_kernels import match_smnn_pallas
            return match_smnn_pallas(desc1, desc2, self.th)
        if self.match_mode == "nn":
            return match_nn(desc1, desc2, mask1, mask2)
        if self.match_mode == "mnn":
            return match_mnn(desc1, desc2, mask1, mask2)
        if self.match_mode == "snn":
            return match_snn(desc1, desc2, self.th, mask1, mask2)
        if self.match_mode == "smnn":
            return match_smnn(desc1, desc2, self.th, mask1, mask2)
        raise ValueError(f"unknown match mode {self.match_mode}")
