import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kornia_tpu.contrib.stereo import disparity_to_depth, stereo_matching
from kornia_tpu.geometry.liegroup import Se3
from kornia_tpu.geometry.pose import NamedPose
from kornia_tpu.ops.filters import gaussian_blur2d


class TestStereoMatching:
    def test_constant_shift_hard(self, key):
        left = gaussian_blur2d(jax.random.uniform(key, (1, 1, 32, 64)), 3, 1.0)
        d_true = 6
        right = jnp.roll(left, -d_true, axis=-1)
        disp, valid = stereo_matching(left, right, 16, 7, soft=False)
        inner = disp[0, 0, 4:-4, 20:-8]
        assert abs(float(jnp.median(inner)) - d_true) < 1.0

    def test_soft_differentiable(self, key):
        left = gaussian_blur2d(jax.random.uniform(key, (1, 1, 16, 32)), 3, 1.0)
        right = jnp.roll(left, -3, axis=-1)
        g = jax.grad(lambda l: stereo_matching(l, right, 8, 5,
                                               lr_check_th=None)[0].sum())(left)
        assert bool(jnp.all(jnp.isfinite(g)))

    def test_disparity_to_depth(self):
        d = jnp.full((1, 1, 4, 4), 10.0)
        z = disparity_to_depth(d, focal=100.0, baseline=0.5)
        np.testing.assert_allclose(z, 5.0)


class TestNamedPose:
    def test_compose_and_frames(self, key):
        p_ab = NamedPose(Se3.random(key), "world", "cam0")
        p_bc = NamedPose(Se3.random(jax.random.fold_in(key, 1)), "cam0",
                         "cam1")
        p_ac = p_ab * p_bc
        assert p_ac.frame_src == "world" and p_ac.frame_dst == "cam1"
        with pytest.raises(ValueError):
            p_bc * p_ab

    def test_inverse_roundtrip(self, key):
        p = NamedPose(Se3.random(key), "a", "b")
        pts = jax.random.normal(key, (5, 3))
        back = p.inverse().transform(p.transform(pts))
        np.testing.assert_allclose(back, pts, atol=1e-5)
        assert p.inverse().frame_src == "b"


class TestRandomJPEG:
    def test_degrades_at_low_quality(self, key):
        import kornia_tpu.augmentation as A
        img = gaussian_blur2d(jax.random.uniform(key, (1, 3, 32, 32)), 3, 1.0)
        lo = A.RandomJPEG((5.0, 5.0), p=1.0)(img, key)
        hi = A.RandomJPEG((95.0, 95.0), p=1.0)(img, key)
        assert float(jnp.abs(lo - img).mean()) > float(jnp.abs(hi - img).mean())
