import jax
import jax.numpy as jnp
import numpy as np
import pytest

import kornia_tpu.ops.enhance as E


@pytest.fixture
def img(key):
    return jax.random.uniform(key, (2, 3, 8, 8))


class TestAdjust:
    def test_brightness(self, img):
        # additive semantics (reference convention)
        out = E.adjust_brightness(img, 0.0)
        np.testing.assert_allclose(out, img, atol=1e-6)

    def test_brightness_batched(self, img):
        out = E.adjust_brightness(img, jnp.array([0.0, 0.2]))
        np.testing.assert_allclose(out[0], img[0], atol=1e-6)
        np.testing.assert_allclose(out[1], jnp.clip(img[1] + 0.2, 0, 1),
                                   atol=1e-6)
        out_m = E.adjust_brightness_accumulative(img, jnp.array([1.0, 0.5]))
        np.testing.assert_allclose(out_m[1], img[1] * 0.5, atol=1e-6)

    def test_contrast(self, img):
        out = E.adjust_contrast(img, 0.5)
        np.testing.assert_allclose(out, img * 0.5, atol=1e-6)

    def test_saturation_gray(self, img):
        out = E.adjust_saturation(img, 0.0)
        # zero saturation → all channels equal
        np.testing.assert_allclose(out[:, 0], out[:, 1], atol=1e-5)

    def test_hue_identity(self, img):
        out = E.adjust_hue(img, 0.0)
        np.testing.assert_allclose(out, img, atol=1e-4)

    def test_gamma_one(self, img):
        np.testing.assert_allclose(E.adjust_gamma(img, 1.0), img, atol=1e-5)

    def test_invert(self, img):
        np.testing.assert_allclose(E.invert(E.invert(img)), img, atol=1e-6)

    def test_solarize(self):
        x = jnp.array([[[[0.2, 0.8]]]])
        out = E.solarize(x, 0.5)
        np.testing.assert_allclose(out, [[[[0.2, 0.2]]]], atol=1e-5)

    def test_posterize(self):
        x = jnp.array([[[[0.5]]]])
        out = E.posterize(x, 1)
        assert float(out.reshape(())) in (0.0, 0.5, 128 / 255.0)

    def test_posterize_8bits_identity(self, img):
        # bits=8 is EXACT identity (reference adjust.py posterize doctest
        # asserts torch.testing.assert_close(x, out) — no uint8 round trip)
        out = E.posterize(img, 8)
        np.testing.assert_allclose(out, img, atol=0.0)

    def test_posterize_7bits_quantizes(self, img):
        out = E.posterize(img, 7)
        q = jnp.floor(img * 255.0).astype(jnp.int32)
        q = ((q >> 1) << 1).astype(jnp.float32) / 255.0
        np.testing.assert_allclose(out, q, atol=1e-6)

    def test_sharpness(self, img):
        # factor 1 = original image (reference convention: 0 = blurred)
        out = E.sharpness(img, 1.0)
        np.testing.assert_allclose(out, img, atol=1e-5)

    def test_sigmoid_log(self, img):
        assert E.adjust_sigmoid(img).shape == img.shape
        assert E.adjust_log(img).shape == img.shape


class TestEqualize:
    def test_equalize_uniform_stays(self, key):
        x = jax.random.uniform(key, (1, 1, 32, 32))
        out = E.equalize(x)
        assert out.shape == x.shape
        assert 0.0 <= float(out.min()) and float(out.max()) <= 1.0

    def test_clahe_shape(self, key):
        x = jax.random.uniform(key, (2, 3, 32, 32))
        out = E.equalize_clahe(x, 40.0, (4, 4))
        assert out.shape == x.shape
        assert bool(jnp.all(jnp.isfinite(out)))

    def test_clahe_improves_contrast(self, key):
        x = jax.random.uniform(key, (1, 1, 32, 32)) * 0.1 + 0.45
        out = E.equalize_clahe(x, 40.0, (2, 2))
        assert float(out.std()) > float(x.std())


class TestNormalize:
    def test_roundtrip(self, img):
        mean = [0.5, 0.4, 0.3]
        std = [0.2, 0.25, 0.3]
        out = E.denormalize(E.normalize(img, mean, std), mean, std)
        np.testing.assert_allclose(out, img, atol=1e-5)

    def test_min_max(self, img):
        out = E.normalize_min_max(img, 0.0, 1.0)
        np.testing.assert_allclose(out.min(axis=(1, 2, 3)), 0.0, atol=1e-5)
        np.testing.assert_allclose(out.max(axis=(1, 2, 3)), 1.0, atol=1e-5)


class TestHistogram:
    def test_soft_histogram_sums_to_one(self, key):
        x = jax.random.uniform(key, (2, 64))
        bins = jnp.linspace(0, 1, 16)
        h = E.histogram(x, bins, jnp.array(0.05))
        np.testing.assert_allclose(h.sum(axis=-1), 1.0, rtol=1e-4)

    def test_histogram_differentiable(self, key):
        x = jax.random.uniform(key, (1, 32))
        bins = jnp.linspace(0, 1, 8)
        g = jax.grad(lambda t: E.histogram(t, bins, jnp.array(0.1))[0, 0])(x)
        assert bool(jnp.all(jnp.isfinite(g)))

    def test_histogram2d(self, key):
        k1, k2 = jax.random.split(key)
        x1 = jax.random.uniform(k1, (2, 64))
        x2 = jax.random.uniform(k2, (2, 64))
        bins = jnp.linspace(0, 1, 8)
        h = E.histogram2d(x1, x2, bins, jnp.array(0.1))
        assert h.shape == (2, 8, 8)
        np.testing.assert_allclose(h.sum(axis=(-2, -1)), 1.0, rtol=1e-4)


class TestIntegral:
    def test_integral(self):
        x = jnp.ones((1, 1, 4, 4))
        out = E.integral_tensor(x)
        assert float(out[0, 0, -1, -1]) == 16.0

    def test_zca(self, key):
        x = jax.random.normal(key, (64, 8))
        out = E.zca_whiten(x)
        cov = np.cov(np.asarray(out).T)
        np.testing.assert_allclose(cov, np.eye(8), atol=0.35)


class TestThreshold:
    def test_binary(self):
        x = jnp.array([[[[0.2, 0.8]]]])
        out = E.threshold_binary(x, 0.5)
        np.testing.assert_allclose(out, [[[[0.0, 1.0]]]])

    def test_otsu_bimodal(self, key):
        k1, k2 = jax.random.split(key)
        lo = jax.random.uniform(k1, (1, 1, 8, 8)) * 0.2
        hi = jax.random.uniform(k2, (1, 1, 8, 8)) * 0.2 + 0.8
        x = jnp.concatenate([lo, hi], axis=-1)
        th = E.otsu_threshold(x)
        # any threshold separating the two clusters is a valid Otsu output
        assert 0.15 < float(th[0, 0]) < 0.85

    def test_add_weighted(self, img):
        out = E.add_weighted(img, 0.5, img, 0.5, 0.0)
        np.testing.assert_allclose(out, img, atol=1e-6)

    def test_shift_rgb(self, img):
        out = E.shift_rgb(img, 0.0, 0.0, 0.0)
        np.testing.assert_allclose(out, img, atol=1e-6)
