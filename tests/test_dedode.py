"""DeDoDe-style detector/descriptor tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kornia_tpu.feature.dedode import DeDoDe, sample_keypoints

pytestmark = pytest.mark.slow  # heavy leg: run with --runslow


class TestSampleKeypoints:
    def test_finds_planted_peaks(self):
        sm = np.full((1, 32, 32), 1e-5, np.float32)
        sm[0, 5, 7] = 0.4
        sm[0, 20, 25] = 0.5
        kps, sc = sample_keypoints(jnp.asarray(sm), num_samples=2,
                                   increase_coverage=False)
        px = (np.asarray(kps)[0] + 1) / 2 * 32 - 0.5
        got = {tuple(map(round, p)) for p in px}
        assert got == {(7, 5), (25, 20)}
        # scores come from the raw scoremap, highest first
        np.testing.assert_allclose(np.asarray(sc)[0], [0.5, 0.4], atol=1e-6)

    def test_coverage_reweighting_spreads_selection(self):
        # a dense cluster plus one isolated slightly-weaker peak: with
        # coverage reweighting the isolated peak must make the top-3
        sm = np.full((1, 64, 64), 1e-6, np.float32)
        sm[0, 10:13, 10:13] = 0.5      # 9-pixel crowded blob
        sm[0, 50, 50] = 0.4            # isolated
        kps, _ = sample_keypoints(jnp.asarray(sm), num_samples=3,
                                  increase_coverage=True)
        px = (np.asarray(kps)[0] + 1) / 2 * 64 - 0.5
        assert any(np.allclose(p, (50, 50), atol=0.5) for p in px)

    def test_keypoints_normalized_range(self):
        sm = jax.random.uniform(jax.random.PRNGKey(0), (2, 16, 16))
        kps, sc = sample_keypoints(sm, num_samples=8)
        assert kps.shape == (2, 8, 2) and sc.shape == (2, 8)
        assert float(jnp.abs(kps).max()) <= 1.0


class TestDeDoDe:
    @pytest.fixture(scope="class")
    def model(self):
        return DeDoDe(num_keypoints=32)

    def test_forward_shapes(self, model):
        img = jax.random.uniform(jax.random.PRNGKey(1), (2, 3, 64, 64))
        kps, scores, descs = model(img)
        assert kps.shape == (2, 32, 2)
        assert scores.shape == (2, 32)
        assert descs.shape == (2, 32, 256)
        assert bool(jnp.isfinite(descs).all())
        # pixel coords inside the image
        assert float(kps.min()) >= 0.0
        assert float(kps[..., 0].max()) <= 64.0

    def test_decoupled_detect_describe(self, model):
        img = jax.random.uniform(jax.random.PRNGKey(2), (1, 3, 64, 64))
        kps, sc = model.detect(img, n=16)
        assert kps.shape == (1, 16, 2)
        descs = model.describe(img, kps)
        assert descs.shape == (1, 16, 256)
        dense = model.describe(img)
        assert dense.shape == (1, 256, 64, 64)

    def test_scores_are_softmax_probabilities(self, model):
        # selection ranks by the coverage-reweighted score but the returned
        # scores are the raw softmax values (reference semantics), so they
        # are probabilities, not necessarily monotonically decreasing
        img = jax.random.uniform(jax.random.PRNGKey(3), (1, 3, 64, 64))
        _, sc = model.detect(img, n=16)
        s = np.asarray(sc)[0]
        assert (s >= 0).all() and (s <= 1).all() and np.isfinite(s).all()

    def test_input_validation(self, model):
        with pytest.raises(Exception):
            model(jnp.zeros((1, 1, 64, 64)))     # not RGB
        with pytest.raises(Exception):
            model(jnp.zeros((1, 3, 60, 60)))     # not divisible by 8
