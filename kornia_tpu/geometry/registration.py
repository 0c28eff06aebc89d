"""Gradient-descent direct image registration
(reference: kornia/geometry/transform/image_registrator.py:154-321).

Demonstrates the library's core promise — optimization THROUGH image
warps: `jax.grad` through homography_warp + optax Adam on the warp
parameters, coarse-to-fine over a gaussian pyramid. This is also the
template for direct photometric refinement in the VO pipeline.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..core.dtype import as_float
from ..ops.pyramid import build_pyramid
from ..ops.warp import warp_perspective

__all__ = ["Homography", "Similarity", "ImageRegistrator"]


class Homography:
    """8-DoF warp model parameterized as I + dH (reference:
    image_registrator.py:62)."""

    n_params = 8

    @staticmethod
    def init_params() -> jax.Array:
        return jnp.zeros(8)

    @staticmethod
    def matrix(params: jax.Array) -> jax.Array:
        dH = jnp.concatenate([params, jnp.zeros(1)]).reshape(3, 3)
        return jnp.eye(3) + dH


class Similarity:
    """4-DoF (angle, scale, tx, ty) (reference: image_registrator.py:96)."""

    n_params = 4

    @staticmethod
    def init_params() -> jax.Array:
        return jnp.zeros(4)

    @staticmethod
    def matrix(params: jax.Array) -> jax.Array:
        angle, log_scale, tx, ty = params
        s = jnp.exp(log_scale)
        c = jnp.cos(angle) * s
        sn = jnp.sin(angle) * s
        return jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]]
                         ).at[0, 0].set(c).at[0, 1].set(-sn).at[0, 2].set(tx) \
            .at[1, 0].set(sn).at[1, 1].set(c).at[1, 2].set(ty)


class ImageRegistrator:
    """Coarse-to-fine photometric alignment (reference:
    image_registrator.py:246 register)."""

    def __init__(self, model_type: str = "homography",
                 num_iterations: int = 100, learning_rate: float = 1e-3,
                 pyramid_levels: int = 3, tolerance: float = 1e-4):
        self.model = Homography if model_type == "homography" else Similarity
        self.num_iterations = num_iterations
        self.learning_rate = learning_rate
        self.pyramid_levels = pyramid_levels

    def register(self, src: jax.Array, dst: jax.Array,
                 verbose: bool = False) -> jax.Array:
        """Find M (3x3, pixel coords): warp_perspective(src, M) ≈ dst.
        Returns (1, 3, 3).

        The optimization runs on the NDC-space ([-1, 1]) homography like
        the reference — normalized coordinates equalize the magnitudes of
        translation vs perspective parameters so one Adam LR works for
        all (the pixel-space parameterization needs per-param LRs)."""
        from ..ops.warp import denormalize_homography, homography_warp
        src = as_float(src)
        dst = as_float(dst)
        params = self.model.init_params()
        pyr_src = build_pyramid(src, self.pyramid_levels)
        pyr_dst = build_pyramid(dst, self.pyramid_levels)

        def loss_fn(params, s, d):
            # NDC homography is pyramid-level invariant
            M = self.model.matrix(params)
            H_, W_ = d.shape[-2:]
            warped = homography_warp(s, M[None], (H_, W_), padding_mode="zeros")
            mask = homography_warp(jnp.ones_like(s), M[None], (H_, W_))
            keep = mask > 0.999
            diff = (warped - d) * keep
            return jnp.sum(jnp.abs(diff)) / jnp.maximum(jnp.sum(keep), 1.0)

        opt = optax.adam(self.learning_rate)

        @jax.jit
        def run_level(params, s, d):
            opt_state = opt.init(params)

            def body(carry, _):
                params, opt_state = carry
                g = jax.grad(loss_fn)(params, s, d)
                updates, opt_state = opt.update(g, opt_state, params)
                return (optax.apply_updates(params, updates), opt_state), None

            (params, _), _ = jax.lax.scan(
                body, (params, opt_state), None, length=self.num_iterations)
            return params

        for lvl in range(self.pyramid_levels - 1, -1, -1):
            params = run_level(params, pyr_src[lvl], pyr_dst[lvl])
        H, W = dst.shape[-2:]
        h_src, w_src = src.shape[-2:]
        M_ndc = self.model.matrix(params)[None]
        # homography_warp's H_norm is the NDC version of warp_perspective's
        # pixel M (same src→dst direction), so denormalization suffices
        return denormalize_homography(M_ndc, (h_src, w_src), (H, W))


class BaseModel:
    """Base for parametric warp models (reference: image_registrator.py:33).
    Subclasses expose n_params / init_params() / matrix(params)."""

    n_params = 0

    @staticmethod
    def init_params() -> jax.Array:
        raise NotImplementedError

    @staticmethod
    def matrix(params: jax.Array) -> jax.Array:
        raise NotImplementedError


__all__ += ["BaseModel"]
