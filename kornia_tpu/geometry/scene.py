"""Synthetic epipolar scene generation
(reference: kornia/geometry/epipolar/scene.py:64 generate_scene) — the
shared fixture generator for two-view geometry tests and benchmarks.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from .conversions import axis_angle_to_rotation_matrix
from .epipolar import essential_from_Rt, fundamental_from_essential, projection_from_KRt

__all__ = ["generate_scene"]


def generate_scene(key: jax.Array, num_views: int = 2, num_points: int = 30,
                   image_size=(120.0, 160.0), rotation_scale: float = 0.2,
                   translation_scale: float = 0.5) -> Dict[str, jax.Array]:
    """Random camera ring looking at a 3D point cloud.

    Returns dict with K (V, 3, 3), R (V, 3, 3), t (V, 3, 1), P (V, 3, 4),
    points3d (N, 3), points2d (V, N, 2), F_01 / E_01 between views 0 and 1.
    """
    ks = jax.random.split(key, 4)
    V, N = num_views, num_points
    h, w = image_size
    f = 0.8 * max(h, w)
    K = jnp.broadcast_to(
        jnp.array([[f, 0.0, w / 2], [0.0, f, h / 2], [0.0, 0.0, 1.0]]),
        (V, 3, 3))
    aa = jax.random.normal(ks[0], (V, 3)) * rotation_scale
    R = axis_angle_to_rotation_matrix(aa)
    t = jax.random.normal(ks[1], (V, 3, 1)) * translation_scale
    t = t.at[0].set(0.0)
    R = R.at[0].set(jnp.eye(3))
    X = jax.random.normal(ks[2], (N, 3)) * 1.5 + jnp.array([0.0, 0.0, 6.0])
    P = projection_from_KRt(K, R, t)
    Xh = jnp.concatenate([X, jnp.ones((N, 1))], -1)
    x_h = jnp.einsum("vij,nj->vni", P, Xh)
    x2d = x_h[..., :2] / x_h[..., 2:]
    E01 = essential_from_Rt(R[0], t[0], R[1], t[1])
    F01 = fundamental_from_essential(E01, K[0], K[1])
    return {"K": K, "R": R, "t": t, "P": P, "points3d": X,
            "points2d": x2d, "E_01": E01, "F_01": F01}
