"""bfloat16 safety for the core compute path — bf16 is the TPU-native
storage dtype (the reference documents an fp16/bf16 half-precision support
table in its README; on TPU bf16 matters most)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.fixture
def img16(key):
    return jax.random.uniform(key, (2, 3, 16, 16), dtype=jnp.bfloat16)


def _finite(x):
    return bool(jnp.all(jnp.isfinite(x.astype(jnp.float32))))


class TestBf16Ops:
    def test_filters(self, img16):
        from kornia_tpu.ops.filters import (box_blur, gaussian_blur2d,
                                            median_blur, sobel)
        for fn in [lambda x: gaussian_blur2d(x, 5, 1.5),
                   lambda x: box_blur(x, 3),
                   lambda x: median_blur(x, 3),
                   sobel]:
            out = fn(img16)
            assert out.dtype == jnp.bfloat16
            assert _finite(out)

    def test_color(self, img16):
        from kornia_tpu.ops.color import (hsv_to_rgb, rgb_to_grayscale,
                                          rgb_to_hsv, rgb_to_lab)
        assert rgb_to_grayscale(img16).dtype == jnp.bfloat16
        rt = hsv_to_rgb(rgb_to_hsv(img16))
        assert _finite(rt)
        # bf16 has ~3 decimal digits; roundtrip within 2%
        err = jnp.abs(rt.astype(jnp.float32) - img16.astype(jnp.float32))
        assert float(err.mean()) < 0.03
        assert _finite(rgb_to_lab(img16))

    def test_warp(self, img16):
        from kornia_tpu.ops.warp import warp_perspective
        M = jnp.broadcast_to(jnp.eye(3, dtype=jnp.bfloat16), (2, 3, 3))
        out = warp_perspective(img16, M, (16, 16))
        assert _finite(out)
        err = jnp.abs(out.astype(jnp.float32) - img16.astype(jnp.float32))
        assert float(err.mean()) < 0.02

    def test_enhance(self, img16):
        from kornia_tpu.ops.enhance import (adjust_brightness,
                                            adjust_contrast, normalize)
        assert _finite(adjust_brightness(img16, 0.1))
        assert _finite(adjust_contrast(img16, 1.2))
        assert _finite(normalize(img16, [0.5] * 3, [0.2] * 3))

    def test_morphology(self, img16):
        from kornia_tpu.ops.morphology import closing, dilation
        k = jnp.ones((3, 3))
        assert _finite(dilation(img16, k))
        assert _finite(closing(img16, k))

    def test_matmul_paths_stay_f32(self, key):
        # geometry solvers must NOT silently run in bf16 — they promote
        from kornia_tpu.geometry.homography import find_homography_dlt
        p1 = jax.random.uniform(key, (1, 8, 2), dtype=jnp.bfloat16) * 100
        H = find_homography_dlt(p1.astype(jnp.float32),
                                p1.astype(jnp.float32))
        assert H.dtype == jnp.float32
