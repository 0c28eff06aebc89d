import jax
import jax.numpy as jnp
import numpy as np
import pytest


class TestXFeat:
    def test_detect_and_match(self, key):
        from kornia_tpu.feature.xfeat import XFeat
        img = jax.random.uniform(key, (1, 1, 64, 64))
        xf = XFeat(top_k=64)
        f = xf.detectAndCompute(img)
        assert f["keypoints"].shape == (1, 64, 2)
        assert f["descriptors"].shape == (1, 64, 64)
        n = jnp.linalg.norm(f["descriptors"], axis=-1)
        np.testing.assert_allclose(n, 1.0, atol=1e-3)
        mk0, mk1, v = xf.match_xfeat(img, img)
        same = jnp.abs(mk0 - mk1).max(-1) < 1e-6
        assert float(same[v].mean()) == 1.0


class TestNewAugs:
    def test_resize_ops(self, key):
        import kornia_tpu.augmentation as A
        x = jax.random.uniform(key, (2, 3, 16, 24))
        assert A.Resize((8, 8))(x).shape == (2, 3, 8, 8)
        assert A.LongestMaxSize(12)(x).shape == (2, 3, 8, 12)
        assert A.SmallestMaxSize(8)(x).shape == (2, 3, 8, 12)

    def test_transplantation(self, key):
        from kornia_tpu.augmentation.mix import RandomTransplantation
        x = jax.random.uniform(key, (2, 3, 16, 16))
        masks = jax.random.randint(key, (2, 16, 16), 0, 3)
        oi, om = RandomTransplantation(p=1.0)(x, masks, key=key)
        assert oi.shape == x.shape
        assert om.shape == masks.shape

    def test_edge_aware_blur(self, key):
        from kornia_tpu.ops.filters import edge_aware_blur_pool2d
        x = jax.random.uniform(key, (1, 1, 16, 16))
        out = edge_aware_blur_pool2d(x)
        assert out.shape == x.shape
        assert bool(jnp.all(jnp.isfinite(out)))


class TestHomographyWarperClass:
    def test_cached_grid(self, key):
        from kornia_tpu.ops.warp import HomographyWarper, warp_perspective
        x = jax.random.uniform(key, (2, 1, 16, 16))
        hw = HomographyWarper(16, 16)
        H = jnp.broadcast_to(jnp.eye(3).at[0, 2].set(0.1), (2, 3, 3))
        out1 = hw(x, H)
        hw.precompute_warp_grid(H)
        out2 = hw(x)
        np.testing.assert_allclose(out1, out2, atol=1e-6)


class TestProsac:
    def test_scores_accepted(self, key):
        from kornia_tpu.geometry.ransac import ransac
        k1, k3 = jax.random.split(key)
        p1 = jax.random.uniform(k1, (64, 2)) * 100
        scores = jax.random.uniform(k3, (64,))
        res = ransac(p1, p1, k3, "homography", 2.0, 128, 4, scores=scores)
        assert int(res.inlier_count) >= 60
        np.testing.assert_allclose(res.model / res.model[2, 2], jnp.eye(3),
                                   atol=1e-3)


def test_enable_compilation_cache(tmp_path):
    from kornia_tpu.utils import enable_compilation_cache
    import kornia_tpu.utils.compile_cache as cc
    prev = cc._enabled
    cc._enabled = False
    try:
        assert enable_compilation_cache(str(tmp_path / "xla"))
        assert (tmp_path / "xla").is_dir()
        assert enable_compilation_cache()  # idempotent
    finally:
        cc._enabled = prev
