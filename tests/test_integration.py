"""End-to-end optimization tests (reference: kornia tests/integration —
recover parameters by gradient descent THROUGH the ops)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest


class TestOptimizeThroughWarp:
    def test_recover_translation_by_sgd(self, key):
        """Gradient descent through homography_warp recovers a known shift
        (reference: tests/integration/test_warp.py:31-50)."""
        from kornia_tpu.ops.filters import gaussian_blur2d
        from kornia_tpu.ops.warp import homography_warp
        img = gaussian_blur2d(jax.random.uniform(key, (1, 1, 32, 32)), 5, 2.0)
        H_true = jnp.eye(3).at[0, 2].set(0.2)  # NDC-space shift
        target = homography_warp(img, H_true[None], (32, 32))

        params = jnp.zeros(2)
        opt = optax.adam(5e-3)
        state = opt.init(params)

        @jax.jit
        def step(params, state):
            def loss(p):
                H = jnp.eye(3).at[0, 2].set(p[0]).at[1, 2].set(p[1])
                warped = homography_warp(img, H[None], (32, 32))
                return jnp.mean((warped - target) ** 2)

            g = jax.grad(loss)(params)
            upd, state = opt.update(g, state)
            return optax.apply_updates(params, upd), state

        for _ in range(200):
            params, state = step(params, state)
        np.testing.assert_allclose(params, [0.2, 0.0], atol=0.02)

    def test_soft_argmax_regression(self, key):
        """Train a heatmap to localize a target point through DSNT
        (reference: tests/integration soft-argmax regression)."""
        from kornia_tpu.geometry.subpix import (spatial_expectation2d,
                                                spatial_softmax2d)
        target = jnp.array([[0.3, -0.4]])
        heat = jnp.zeros((1, 1, 17, 17))
        opt = optax.adam(1e-1)
        state = opt.init(heat)

        @jax.jit
        def step(heat, state):
            def loss(h):
                p = spatial_softmax2d(h, temperature=1.0)
                xy = spatial_expectation2d(p, True)[:, 0]
                return jnp.sum((xy - target) ** 2)

            g = jax.grad(loss)(heat)
            upd, state = opt.update(g, state)
            return optax.apply_updates(heat, upd), state

        for _ in range(100):
            heat, state = step(heat, state)
        from kornia_tpu.geometry.subpix import spatial_soft_argmax2d
        got = spatial_soft_argmax2d(heat, 1.0)[0, 0]
        np.testing.assert_allclose(got, target[0], atol=0.05)

    def test_focal_training_loop(self, key):
        """A linear classifier trains to zero focal loss on separable data
        (reference: tests/integration focal loss training)."""
        from kornia_tpu.losses import focal_loss
        k1, k2 = jax.random.split(key)
        X = jax.random.normal(k1, (64, 2))
        y = (X[:, 0] + X[:, 1] > 0).astype(jnp.int32)
        W = jnp.zeros((2, 2))
        opt = optax.adam(1e-1)
        state = opt.init(W)

        @jax.jit
        def step(W, state):
            def loss(w):
                logits = (X @ w)[:, :, None, None]  # (B, C, 1, 1)
                return focal_loss(logits, y[:, None, None], alpha=0.5,
                                  gamma=2.0, reduction="mean")

            l, g = jax.value_and_grad(loss)(W)
            upd, state = opt.update(g, state)
            return optax.apply_updates(W, upd), state, l

        losses = []
        for _ in range(100):
            W, state, l = step(W, state)
            losses.append(float(l))
        assert losses[-1] < 0.1 * losses[0]
        pred = jnp.argmax(X @ W, -1)
        assert float((pred == y).mean()) > 0.95
