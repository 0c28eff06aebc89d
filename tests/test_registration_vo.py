import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kornia_tpu.geometry.conversions import convert_affinematrix_to_homography
from kornia_tpu.geometry.registration import ImageRegistrator, Similarity
from kornia_tpu.ops.filters import gaussian_blur2d
from kornia_tpu.ops.warp import get_rotation_matrix2d, warp_perspective

pytestmark = pytest.mark.slow  # heavy leg: run with --runslow


class TestImageRegistrator:
    def test_recovers_known_homography(self, key):
        img = gaussian_blur2d(jax.random.uniform(key, (1, 1, 64, 64)), 5, 2.0)
        M_true = convert_affinematrix_to_homography(
            get_rotation_matrix2d(jnp.array([[31.5, 31.5]]),
                                  jnp.array([5.0]), jnp.ones((1, 2))))
        M_true = M_true.at[:, 0, 2].add(2.0)
        dst = warp_perspective(img, M_true, (64, 64))
        reg = ImageRegistrator("homography", num_iterations=300,
                               learning_rate=1e-2, pyramid_levels=3)
        M_est = reg.register(img, dst)
        warped = warp_perspective(img, M_est, (64, 64))
        mask = warp_perspective(jnp.ones_like(img), M_est, (64, 64)) > 0.99
        err = float((jnp.abs(warped - dst) * mask).sum() / mask.sum())
        err0 = float(jnp.abs(img - dst).mean())
        assert err < 0.35 * err0  # photometric error reduced > 65%

    def test_similarity_model(self):
        p = jnp.array([0.1, 0.0, 0.2, -0.3])
        M = Similarity.matrix(p)
        assert M.shape == (3, 3)
        np.testing.assert_allclose(float(jnp.linalg.det(M[:2, :2])), 1.0,
                                   atol=1e-5)


class TestVisualOdometry:
    @pytest.mark.slow
    def test_translating_sequence(self, key):
        from kornia_tpu.slam.vo import VisualOdometry
        base = gaussian_blur2d(jax.random.uniform(key, (1, 1, 128, 128)), 3, 1.0)
        frames = []
        for i in range(3):
            M = jnp.eye(3).at[0, 2].set(-3.0 * i)[None]
            frames.append(warp_perspective(base, M, (128, 128)))
        K = jnp.array([[100.0, 0, 64], [0, 100, 64], [0, 0, 1]])
        vo = VisualOdometry(K, num_features=256)
        res = vo.run(frames)
        centers = np.stack([-p[:3, :3].T @ p[:3, 3] for p in res.poses])
        dirs = np.diff(centers, axis=0)
        dirs = dirs / np.linalg.norm(dirs, axis=-1, keepdims=True)
        # consistent +x motion
        assert np.all(dirs[:, 0] > 0.95)
