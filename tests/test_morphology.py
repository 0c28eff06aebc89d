import jax
import jax.numpy as jnp
import numpy as np
import pytest

import kornia_tpu.ops.morphology as M


@pytest.fixture
def cross():
    return jnp.array([[0.0, 1.0, 0.0], [1.0, 1.0, 1.0], [0.0, 1.0, 0.0]])


@pytest.fixture
def square():
    return jnp.ones((3, 3))


class TestMorphology:
    def test_dilation_spike(self, square):
        x = jnp.zeros((1, 1, 5, 5)).at[0, 0, 2, 2].set(1.0)
        out = M.dilation(x, square)
        np.testing.assert_allclose(out[0, 0, 1:4, 1:4], 1.0)
        assert float(out[0, 0, 0, 0]) == 0.0

    def test_erosion_spike(self, square):
        x = jnp.zeros((1, 1, 5, 5)).at[0, 0, 2, 2].set(1.0)
        out = M.erosion(x, square)
        np.testing.assert_allclose(out, 0.0)

    def test_erosion_block(self, square):
        x = jnp.zeros((1, 1, 7, 7)).at[0, 0, 2:5, 2:5].set(1.0)
        out = M.erosion(x, square)
        assert float(out[0, 0, 3, 3]) == 1.0
        assert float(out[0, 0, 2, 2]) == 0.0

    def test_opening_removes_spike(self, square):
        x = jnp.zeros((1, 1, 7, 7)).at[0, 0, 3, 3].set(1.0)
        out = M.opening(x, square)
        np.testing.assert_allclose(out, 0.0)

    def test_closing_fills_hole(self, square):
        x = jnp.ones((1, 1, 7, 7)).at[0, 0, 3, 3].set(0.0)
        out = M.closing(x, square)
        np.testing.assert_allclose(out[0, 0, 3, 3], 1.0)

    def test_gradient_edge(self, square):
        x = jnp.zeros((1, 1, 7, 7)).at[0, 0, 2:5, 2:5].set(1.0)
        out = M.gradient(x, square)
        assert float(out[0, 0, 1, 1]) == 1.0  # boundary
        assert float(out[0, 0, 3, 3]) == 0.0  # interior

    def test_top_hat(self, square):
        x = jnp.zeros((1, 1, 7, 7)).at[0, 0, 3, 3].set(1.0)
        out = M.top_hat(x, square)
        np.testing.assert_allclose(out[0, 0, 3, 3], 1.0)

    def test_bottom_hat(self, square):
        x = jnp.ones((1, 1, 7, 7)).at[0, 0, 3, 3].set(0.0)
        out = M.bottom_hat(x, square)
        np.testing.assert_allclose(out[0, 0, 3, 3], 1.0)

    def test_cross_kernel(self, cross):
        x = jnp.zeros((1, 1, 5, 5)).at[0, 0, 2, 2].set(1.0)
        out = M.dilation(x, cross)
        assert float(out[0, 0, 2, 1]) == 1.0
        assert float(out[0, 0, 1, 1]) == 0.0  # corner not in cross

    def test_nonflat_se(self, square):
        x = jnp.zeros((1, 1, 5, 5)).at[0, 0, 2, 2].set(1.0)
        se = jnp.full((3, 3), 0.1)
        out = M.dilation(x, square, structuring_element=se)
        np.testing.assert_allclose(out[0, 0, 2, 2], 1.1, atol=1e-6)

    def test_grad(self, square, key):
        x = jax.random.uniform(key, (1, 1, 6, 6))
        g = jax.grad(lambda t: jnp.sum(M.dilation(t, square)))(x)
        assert bool(jnp.all(jnp.isfinite(g)))

    def test_jit(self, square, key):
        x = jax.random.uniform(key, (1, 1, 6, 6))
        f = jax.jit(lambda t: M.closing(t, square))
        np.testing.assert_allclose(f(x), M.closing(x, square), atol=1e-6)
