import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kornia_tpu.feature.descriptors import (
    DiscreteSteerer,
    HyNet,
    KeyNet,
    LAFAffineShapeEstimator,
    MKDGradientDescriptor,
    PatchAffineShapeEstimator,
    SOSNet,
    TFeat,
)


@pytest.fixture
def patches(key):
    return jax.random.uniform(key, (4, 1, 32, 32))


class TestDescriptors:
    @pytest.mark.parametrize("cls", [SOSNet, HyNet, MKDGradientDescriptor])
    def test_shape_and_norm(self, patches, cls):
        d = cls()(patches)
        assert d.shape == (4, 128)
        np.testing.assert_allclose(jnp.linalg.norm(d, axis=-1), 1.0, atol=1e-3)

    def test_tfeat_shape_and_range(self, patches):
        d = TFeat()(patches)
        assert d.shape == (4, 128)
        assert float(jnp.abs(d).max()) <= 1.0  # tanh output, not L2-normed

    def test_distinct_patches_distinct_descs(self, patches):
        d = SOSNet()(patches)
        dm = jnp.sum((d[:, None] - d[None]) ** 2, -1)
        off_diag = dm + jnp.eye(4) * 10
        assert float(off_diag.min()) > 1e-3

    def test_mkd_brightness_invariance(self, patches):
        mkd = MKDGradientDescriptor()
        d1 = mkd(patches)
        d2 = mkd(patches * 0.7 + 0.1)
        # gradient-based → scale of gradients cancels after normalization
        np.testing.assert_allclose(d1, d2, atol=1e-2)


class TestAffineShape:
    def test_patch_estimator_isotropy(self, key):
        # isotropic noise → a ≈ c, b ≈ 0
        p = jax.random.uniform(key, (2, 1, 19, 19))
        abc = PatchAffineShapeEstimator(19)(p)
        a, b, c = abc[:, 0], abc[:, 1], abc[:, 2]
        assert float(jnp.abs(b).max()) < 0.5 * float(jnp.minimum(a, c).min())

    def test_laf_estimator_preserves_center(self, key):
        from kornia_tpu.feature.laf import get_laf_center, laf_from_center_scale_ori
        img = jax.random.uniform(key, (1, 1, 64, 64))
        laf = laf_from_center_scale_ori(
            jnp.array([[[32.0, 32.0]]]), jnp.full((1, 1, 1, 1), 8.0))
        out = LAFAffineShapeEstimator()(laf, img)
        np.testing.assert_allclose(get_laf_center(out), get_laf_center(laf),
                                   atol=1e-4)


class TestKeyNet:
    def test_response(self, key):
        img = jax.random.uniform(key, (1, 1, 32, 32))
        r = KeyNet()(img)
        assert r.shape == (1, 1, 32, 32)
        assert float(r.min()) >= 0.0  # relu output

    def test_works_in_detector(self, key):
        from kornia_tpu.feature.detector import ScaleSpaceDetector
        from kornia_tpu.ops.filters import gaussian_blur2d
        img = gaussian_blur2d(jax.random.uniform(key, (1, 1, 64, 64)), 3, 1.0)
        kn = KeyNet()
        det = ScaleSpaceDetector(num_features=32, resp=kn)
        lafs, resp, valid = det(img)
        assert lafs.shape == (1, 32, 2, 3)


class TestSteerer:
    def test_rotation_generator(self):
        # block-diagonal 2x2 rotation generator on a 4-dim descriptor
        th = jnp.pi / 2
        R = jnp.array([[jnp.cos(th), -jnp.sin(th)], [jnp.sin(th), jnp.cos(th)]])
        G = jnp.block([[R, jnp.zeros((2, 2))], [jnp.zeros((2, 2)), R]])
        st = DiscreteSteerer(G)
        d = jnp.array([[1.0, 0.0, 0.0, 1.0]])
        out = st.steer_descriptions(d, 4)  # 4 quarter turns = identity
        np.testing.assert_allclose(out, d, atol=1e-5)
