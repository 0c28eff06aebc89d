"""AdaLAM-style geometric match filtering
(reference: kornia/feature/adalam/ — adaptive locally-affine matching,
core.py:427).

TPU-first reformulation: instead of the reference's per-seed variable-size
neighborhoods, a FIXED number of seed anchors vote over all matches with
soft spatial-affinity weights; each match keeps the best seed's local
affine-consistency score. Fully batched, static shapes, no ragged sets.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.dtype import as_float

__all__ = ["adalam_filter"]


def adalam_filter(
    kp0: jax.Array,
    kp1: jax.Array,
    valid: Optional[jax.Array] = None,
    num_seeds: int = 64,
    neighborhood: float = 40.0,
    inlier_th: float = 10.0,
    min_support: int = 4,
) -> jax.Array:
    """Filter putative matches by local affine consistency.

    kp0/kp1: (N, 2) matched coordinates (row i ↔ row i).
    Returns a refined validity mask (N,).
    """
    kp0 = as_float(kp0)
    kp1 = as_float(kp1)
    N = kp0.shape[0]
    if valid is None:
        valid = jnp.ones(N, bool)
    vf = valid.astype(kp0.dtype)

    # seeds: farthest-point-ish via strided selection over valid matches
    order = jnp.argsort(-vf)  # valid first (stable)
    stride = max(N // num_seeds, 1)
    seed_idx = order[:: stride][:num_seeds]
    s0 = kp0[seed_idx]  # (S, 2)
    s1 = kp1[seed_idx]

    # spatial affinity of every match to every seed (in image 0)
    d0 = jnp.linalg.norm(kp0[None, :, :] - s0[:, None, :], axis=-1)  # (S, N)
    w = jnp.exp(-0.5 * (d0 / neighborhood) ** 2) * vf[None, :]

    # per-seed IRLS affine kp0 → kp1: robust reweighting downweights the
    # outliers that would otherwise pollute the local fits
    ones = jnp.ones((N, 1), kp0.dtype)
    X = jnp.concatenate([kp0, ones], -1)  # (N, 3)
    w_robust = w

    for _ in range(3):
        XtW = X[None, :, :] * w_robust[:, :, None]  # (S, N, 3)
        G = jnp.einsum("sni,nj->sij", XtW, X)  # (S, 3, 3)
        rhs = jnp.einsum("sni,nk->sik", XtW, kp1)  # (S, 3, 2)
        G = G + 1e-3 * jnp.eye(3)[None]
        theta = jnp.linalg.solve(G, rhs)  # (S, 3, 2)
        pred = jnp.einsum("ni,sik->snk", X, theta)  # (S, N, 2)
        err = jnp.linalg.norm(pred - kp1[None], axis=-1)  # (S, N)
        w_robust = w / (1.0 + (err / inlier_th) ** 2)  # cauchy reweight

    consistent = (err < inlier_th) & valid[None, :]

    # seed support: weighted count of consistent matches nearby
    support = jnp.sum(consistent * w, axis=1)  # (S,)
    good_seed = support >= min_support

    # a match survives if some good seed (to which it's spatially close)
    # finds it affine-consistent
    near = w > 0.05
    keep = jnp.any(consistent & near & good_seed[:, None], axis=0)
    return keep & valid
