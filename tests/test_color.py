import jax
import jax.numpy as jnp
import numpy as np
import pytest

import kornia_tpu.ops.color as C


@pytest.fixture
def img(key):
    return jax.random.uniform(key, (2, 3, 8, 8))


class TestGray:
    def test_weights(self):
        r = jnp.zeros((1, 3, 2, 2)).at[:, 0].set(1.0)
        np.testing.assert_allclose(C.rgb_to_grayscale(r), 0.299, rtol=1e-5)

    def test_shape(self, img):
        assert C.rgb_to_grayscale(img).shape == (2, 1, 8, 8)

    def test_gray_to_rgb(self, img):
        g = C.rgb_to_grayscale(img)
        rgb = C.grayscale_to_rgb(g)
        assert rgb.shape == img.shape
        np.testing.assert_allclose(rgb[:, 0], rgb[:, 1])


class TestBgr:
    def test_roundtrip(self, img):
        np.testing.assert_allclose(C.bgr_to_rgb(C.rgb_to_bgr(img)), img)

    def test_rgba(self, img):
        rgba = C.rgb_to_rgba(img, 0.5)
        assert rgba.shape == (2, 4, 8, 8)
        np.testing.assert_allclose(C.rgba_to_rgb(rgba), img)


class TestHsv:
    def test_roundtrip(self, img):
        out = C.hsv_to_rgb(C.rgb_to_hsv(img))
        np.testing.assert_allclose(out, img, atol=1e-4)

    def test_red(self):
        r = jnp.zeros((1, 3, 1, 1)).at[:, 0].set(1.0)
        hsv = C.rgb_to_hsv(r)
        np.testing.assert_allclose(hsv[0, :, 0, 0], [0.0, 1.0, 1.0], atol=1e-5)

    def test_grad_finite(self, img):
        g = jax.grad(lambda t: jnp.sum(C.rgb_to_hsv(t)))(img)
        assert bool(jnp.all(jnp.isfinite(g)))


class TestHls:
    def test_roundtrip(self, img):
        out = C.hls_to_rgb(C.rgb_to_hls(img))
        np.testing.assert_allclose(out, img, atol=1e-4)


class TestLab:
    def test_roundtrip(self, img):
        out = C.lab_to_rgb(C.rgb_to_lab(img))
        np.testing.assert_allclose(out, img, atol=1e-3)

    def test_white(self):
        w = jnp.ones((1, 3, 1, 1))
        lab = C.rgb_to_lab(w)
        np.testing.assert_allclose(lab[0, 0, 0, 0], 100.0, atol=0.1)
        np.testing.assert_allclose(lab[0, 1:, 0, 0], 0.0, atol=0.5)


class TestLuv:
    def test_roundtrip(self, img):
        out = C.luv_to_rgb(C.rgb_to_luv(img))
        np.testing.assert_allclose(out, img, atol=1e-3)


class TestYcbcr:
    def test_roundtrip(self, img):
        out = C.ycbcr_to_rgb(C.rgb_to_ycbcr(img))
        np.testing.assert_allclose(out, img, atol=1e-2)


class TestYuv:
    def test_roundtrip(self, img):
        out = C.yuv_to_rgb(C.rgb_to_yuv(img))
        np.testing.assert_allclose(out, img, atol=1e-2)

    def test_yuv420(self, img):
        y, uv = C.rgb_to_yuv420(img)
        assert y.shape == (2, 1, 8, 8)
        assert uv.shape == (2, 2, 4, 4)
        rgb = C.yuv420_to_rgb(y, uv)
        assert rgb.shape == img.shape

    def test_yuv422(self, img):
        y, uv = C.rgb_to_yuv422(img)
        assert uv.shape == (2, 2, 8, 4)
        assert C.yuv422_to_rgb(y, uv).shape == img.shape


class TestXyz:
    def test_roundtrip(self, img):
        out = C.xyz_to_rgb(C.rgb_to_xyz(img))
        np.testing.assert_allclose(out, img, atol=1e-4)


class TestRaw:
    def test_mosaic_shape(self, img):
        raw = C.rgb_to_raw(img)
        assert raw.shape == (2, 1, 8, 8)

    def test_demosaic_constant(self):
        x = jnp.full((1, 3, 8, 8), 0.5)
        raw = C.rgb_to_raw(x)
        rgb = C.raw_to_rgb(raw)
        np.testing.assert_allclose(rgb, 0.5, atol=1e-5)


class TestMisc:
    def test_sepia(self, img):
        out = C.sepia(img)
        assert out.shape == img.shape
        assert float(out.max()) <= 1.0 + 1e-5

    def test_linear_rgb_roundtrip(self, img):
        out = C.linear_rgb_to_rgb(C.rgb_to_linear_rgb(img))
        np.testing.assert_allclose(out, img, atol=1e-4)

    def test_colormap(self):
        cmap = jnp.stack([jnp.linspace(0, 1, 16)] * 3, axis=-1)
        g = jnp.full((1, 1, 4, 4), 0.5)
        out = C.apply_colormap(g, cmap)
        assert out.shape == (1, 3, 4, 4)
        np.testing.assert_allclose(out, 0.5, atol=0.05)

    def test_jit_chain(self, img):
        f = jax.jit(lambda t: C.hsv_to_rgb(C.rgb_to_hsv(t)))
        np.testing.assert_allclose(f(img), img, atol=1e-4)
