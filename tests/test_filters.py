import jax
import jax.numpy as jnp
import numpy as np
import pytest

import kornia_tpu.ops.filters as F


class TestKernels:
    def test_gaussian1d_normalized(self):
        k = F.get_gaussian_kernel1d(5, 1.5)
        assert k.shape == (1, 5)
        np.testing.assert_allclose(np.sum(k), 1.0, rtol=1e-5)
        # symmetric
        np.testing.assert_allclose(k[0, 0], k[0, 4], rtol=1e-5)

    def test_gaussian2d(self):
        k = F.get_gaussian_kernel2d((3, 5), (1.5, 1.5))
        assert k.shape == (1, 3, 5)
        np.testing.assert_allclose(np.sum(k), 1.0, rtol=1e-5)

    def test_gaussian_erf(self):
        k = F.get_gaussian_erf_kernel1d(5, 1.5)
        np.testing.assert_allclose(np.sum(k), 1.0, rtol=1e-5)

    def test_gaussian_discrete(self):
        k = F.get_gaussian_discrete_kernel1d(5, 1.5)
        np.testing.assert_allclose(np.sum(k), 1.0, rtol=1e-5)

    def test_laplacian(self):
        k = F.get_laplacian_kernel2d(3)
        np.testing.assert_allclose(np.sum(k), 0.0, atol=1e-6)
        assert k[0, 1, 1] == -8.0

    def test_sobel(self):
        k = F.get_sobel_kernel2d()
        assert k.shape == (2, 3, 3)

    def test_motion_kernel(self):
        k = F.get_motion_kernel2d(5, 0.0)
        assert k.shape == (1, 5, 5)
        np.testing.assert_allclose(np.sum(k), 1.0, rtol=1e-5)
        # angle 0 → horizontal line
        assert float(k[0, 2, :].sum()) > 0.99

    def test_pascal(self):
        k = F.get_pascal_kernel_1d(3)
        np.testing.assert_allclose(k, [1, 2, 1])


class TestFilter2d:
    def test_identity(self, key):
        x = jax.random.uniform(key, (2, 3, 8, 8))
        k = jnp.zeros((1, 3, 3)).at[0, 1, 1].set(1.0)
        out = F.filter2d(x, k)
        np.testing.assert_allclose(out, x, atol=1e-6)

    def test_mean_filter_matches_numpy(self, key):
        x = jax.random.uniform(key, (1, 1, 6, 6))
        k = jnp.ones((1, 3, 3)) / 9.0
        out = F.filter2d(x, k, border_type="constant")
        # interior pixel check
        xn = np.asarray(x)[0, 0]
        expected = xn[1:4, 1:4].mean()
        np.testing.assert_allclose(out[0, 0, 2, 2], expected, rtol=1e-5)

    def test_batched_kernels(self, key):
        x = jax.random.uniform(key, (2, 3, 8, 8))
        k = jnp.stack([jnp.zeros((3, 3)).at[1, 1].set(1.0),
                       jnp.ones((3, 3)) / 9.0])
        out = F.filter2d(x, k)
        np.testing.assert_allclose(out[0], x[0], atol=1e-6)

    def test_separable_equals_full(self, key):
        x = jax.random.uniform(key, (2, 3, 16, 16))
        out_full = F.gaussian_blur2d(x, 5, 1.2, separable=False)
        out_sep = F.gaussian_blur2d(x, 5, 1.2, separable=True)
        np.testing.assert_allclose(out_full, out_sep, atol=1e-5)

    def test_grad(self, key):
        x = jax.random.uniform(key, (1, 1, 8, 8))
        g = jax.grad(lambda t: jnp.sum(F.gaussian_blur2d(t, 3, 1.0)))(x)
        assert g.shape == x.shape
        assert bool(jnp.all(jnp.isfinite(g)))

    def test_jit(self, key):
        x = jax.random.uniform(key, (1, 1, 8, 8))
        out1 = F.box_blur(x, 3)
        out2 = jax.jit(lambda t: F.box_blur(t, 3))(x)
        np.testing.assert_allclose(out1, out2, atol=1e-6)

    def test_filter3d(self, key):
        x = jax.random.uniform(key, (1, 1, 4, 6, 6))
        k = jnp.zeros((1, 3, 3, 3)).at[0, 1, 1, 1].set(1.0)
        out = F.filter3d(x, k)
        np.testing.assert_allclose(out, x, atol=1e-6)


class TestBlurs:
    def test_median_blur(self):
        x = jnp.zeros((1, 1, 5, 5)).at[0, 0, 2, 2].set(1.0)
        out = F.median_blur(x, 3)
        # single spike removed by median
        assert float(out[0, 0, 2, 2]) == 0.0

    def test_median_blur_constant(self, key):
        x = jnp.full((1, 1, 6, 6), 0.5)
        out = F.median_blur(x, 3)
        # zero padding (reference semantics) affects only the border ring
        np.testing.assert_allclose(out[:, :, 1:-1, 1:-1], 0.5, atol=1e-6)

    def test_bilateral_smoke(self, key):
        x = jax.random.uniform(key, (1, 3, 8, 8))
        out = F.bilateral_blur(x, 5, 0.1, 1.5)
        assert out.shape == x.shape
        assert bool(jnp.all(jnp.isfinite(out)))

    def test_guided_blur(self, key):
        x = jax.random.uniform(key, (1, 1, 8, 8))
        out = F.guided_blur(x, x, 3, 0.01)
        assert out.shape == x.shape

    def test_unsharp(self, key):
        x = jax.random.uniform(key, (1, 1, 8, 8))
        out = F.unsharp_mask(x, 3, 1.0)
        assert out.shape == x.shape

    def test_blur_pool(self, key):
        x = jax.random.uniform(key, (2, 3, 8, 8))
        out = F.blur_pool2d(x, 3, 2)
        assert out.shape == (2, 3, 4, 4)

    def test_max_blur_pool(self, key):
        x = jax.random.uniform(key, (2, 3, 8, 8))
        out = F.max_blur_pool2d(x, 3, 2)
        assert out.shape == (2, 3, 4, 4)

    def test_motion_blur(self, key):
        x = jax.random.uniform(key, (2, 3, 8, 8))
        out = F.motion_blur(x, 5, jnp.array([0.0, 45.0]))
        assert out.shape == x.shape


class TestGradients:
    def test_spatial_gradient_shape(self, key):
        x = jax.random.uniform(key, (2, 3, 8, 8))
        g = F.spatial_gradient(x)
        assert g.shape == (2, 3, 2, 8, 8)

    def test_spatial_gradient_ramp(self):
        # x-ramp: gx constant, gy zero
        x = jnp.broadcast_to(jnp.arange(8.0), (1, 1, 8, 8))
        g = F.spatial_gradient(x, normalized=False)
        inner = g[0, 0, :, 2:-2, 2:-2]
        np.testing.assert_allclose(inner[0], 8.0, atol=1e-4)  # sobel sums to 8
        np.testing.assert_allclose(inner[1], 0.0, atol=1e-4)

    def test_second_order(self, key):
        x = jax.random.uniform(key, (1, 1, 8, 8))
        g = F.spatial_gradient(x, order=2)
        assert g.shape == (1, 1, 3, 8, 8)

    def test_spatial_gradient3d(self, key):
        x = jax.random.uniform(key, (1, 1, 4, 6, 6))
        g = F.spatial_gradient3d(x)
        assert g.shape == (1, 1, 3, 4, 6, 6)

    def test_sobel_edge(self):
        x = jnp.zeros((1, 1, 8, 8)).at[:, :, :, 4:].set(1.0)
        e = F.sobel(x)
        assert float(e[0, 0, 4, 4]) > 0.1
        assert float(e[0, 0, 4, 1]) < 1e-2

    def test_laplacian(self, key):
        x = jnp.full((1, 1, 8, 8), 0.7)
        out = F.laplacian(x, 3)
        np.testing.assert_allclose(out, 0.0, atol=1e-5)

    def test_canny(self, key):
        x = jnp.zeros((1, 1, 16, 16)).at[:, :, :, 8:].set(1.0)
        mag, edges = F.canny(x)
        assert mag.shape == (1, 1, 16, 16)
        assert edges.shape == (1, 1, 16, 16)
        assert float(edges.sum()) > 0
