import jax
import jax.numpy as jnp
import numpy as np
import pytest

import kornia_tpu.feature as F
from kornia_tpu.ops.filters import gaussian_blur2d
from kornia_tpu.ops.warp import warp_perspective


@pytest.fixture(scope="module")
def img():
    key = jax.random.PRNGKey(0)
    return gaussian_blur2d(jax.random.uniform(key, (1, 1, 96, 96)), 5, 1.2)


class TestResponses:
    def test_harris_corner(self):
        # a white square on black: corners respond
        x = jnp.zeros((1, 1, 16, 16)).at[:, :, 4:12, 4:12].set(1.0)
        r = F.harris_response(x)
        assert r.shape == x.shape
        # corner response > edge response
        assert float(r[0, 0, 4, 4]) > float(r[0, 0, 4, 8])

    def test_gftt(self):
        x = jnp.zeros((1, 1, 16, 16)).at[:, :, 4:12, 4:12].set(1.0)
        r = F.gftt_response(x)
        assert float(r[0, 0, 4, 4]) > float(r[0, 0, 4, 8])

    def test_hessian(self):
        x = jnp.zeros((1, 1, 16, 16)).at[:, :, 8, 8].set(1.0)
        x = gaussian_blur2d(x, 5, 1.5)
        r = F.hessian_response(x)
        assert float(jnp.argmax(r[0, 0])) == 8 * 16 + 8

    def test_dog(self, img):
        stack = jnp.stack([img, gaussian_blur2d(img, 5, 1.0)], axis=1)
        d = F.dog_response(stack)
        assert d.shape == (1, 1, 1, 96, 96)

    def test_dog_single(self, img):
        assert F.dog_response_single(img).shape == img.shape


class TestLaf:
    def test_from_center_scale_ori(self):
        xy = jnp.array([[[10.0, 20.0]]])
        laf = F.laf_from_center_scale_ori(xy, jnp.full((1, 1, 1, 1), 2.0),
                                          jnp.zeros((1, 1, 1)))
        assert laf.shape == (1, 1, 2, 3)
        np.testing.assert_allclose(F.get_laf_center(laf), xy, atol=1e-6)
        np.testing.assert_allclose(F.get_laf_scale(laf)[..., 0, 0],
                                   [[2.0]], atol=1e-5)

    def test_orientation_roundtrip(self):
        xy = jnp.array([[[10.0, 20.0]]])
        laf = F.laf_from_center_scale_ori(xy, jnp.ones((1, 1, 1, 1)),
                                          jnp.full((1, 1, 1), 30.0))
        np.testing.assert_allclose(F.get_laf_orientation(laf),
                                   [[[30.0]]], atol=1e-4)
        laf2 = F.set_laf_orientation(laf, jnp.full((1, 1, 1), 75.0))
        np.testing.assert_allclose(F.get_laf_orientation(laf2),
                                   [[[75.0]]], atol=1e-3)

    def test_scale_set(self):
        laf = F.laf_from_center_scale_ori(jnp.zeros((1, 1, 2)))
        laf2 = F.set_laf_scale(laf, jnp.full((1, 1, 1, 1), 3.0))
        np.testing.assert_allclose(F.get_laf_scale(laf2)[..., 0, 0],
                                   [[3.0]], atol=1e-5)

    def test_make_upright_preserves_scale(self, key):
        laf = jax.random.normal(key, (2, 5, 2, 3))
        up = F.make_upright(laf)
        np.testing.assert_allclose(F.get_laf_scale(up), F.get_laf_scale(laf),
                                   rtol=1e-3)
        # upper-right of A must be 0
        np.testing.assert_allclose(up[..., 0, 1], 0.0, atol=1e-5)

    def test_normalize_denormalize(self, key):
        laf = jax.random.normal(key, (1, 4, 2, 3)) * 10
        img = jnp.zeros((1, 1, 32, 64))
        back = F.denormalize_laf(F.normalize_laf(laf, img), img)
        np.testing.assert_allclose(back, laf, atol=1e-4)

    def test_is_inside(self):
        img = jnp.zeros((1, 1, 32, 32))
        laf_in = F.laf_from_center_scale_ori(
            jnp.array([[[16.0, 16.0]]]), jnp.full((1, 1, 1, 1), 2.0))
        laf_out = F.laf_from_center_scale_ori(
            jnp.array([[[30.0, 30.0]]]), jnp.full((1, 1, 1, 1), 8.0))
        assert bool(F.laf_is_inside_image(laf_in, img)[0, 0])
        assert not bool(F.laf_is_inside_image(laf_out, img)[0, 0])

    def test_extract_patches(self, img):
        laf = F.laf_from_center_scale_ori(
            jnp.array([[[48.0, 48.0], [20.0, 30.0]]]),
            jnp.full((1, 2, 1, 1), 8.0))
        patches = F.extract_patches_from_pyramid(img, laf, 16)
        assert patches.shape == (1, 2, 1, 16, 16)
        assert bool(jnp.all(jnp.isfinite(patches)))

    def test_three_points_roundtrip(self, key):
        laf = jax.random.normal(key, (1, 3, 2, 3))
        back = F.laf_from_three_points(F.laf_to_three_points(laf))
        np.testing.assert_allclose(back, laf, atol=1e-5)

    def test_perspective_transform_lafs(self, key):
        laf = F.laf_from_center_scale_ori(
            jax.random.uniform(key, (1, 5, 2)) * 50,
            jnp.full((1, 5, 1, 1), 3.0))
        H = jnp.eye(3).at[0, 2].set(7.0)[None]
        out = F.perspective_transform_lafs(H, laf)
        np.testing.assert_allclose(
            F.get_laf_center(out), F.get_laf_center(laf) + jnp.array([7.0, 0]),
            atol=1e-4)


class TestSift:
    def test_shape_and_norm(self, key):
        patches = jax.random.uniform(key, (4, 1, 41, 41))
        desc = F.SIFTDescriptor(41)(patches)
        assert desc.shape == (4, 128)
        np.testing.assert_allclose(jnp.linalg.norm(desc, axis=-1), 1.0,
                                   atol=0.05)

    def test_invariance_to_brightness(self, key):
        patches = jax.random.uniform(key, (2, 1, 41, 41))
        d1 = F.SIFTDescriptor(41)(patches)
        d2 = F.SIFTDescriptor(41)(patches * 0.5 + 0.2)
        np.testing.assert_allclose(d1, d2, atol=1e-2)

    def test_dense_sift(self, key):
        x = jax.random.uniform(key, (1, 1, 16, 16))
        d = F.DenseSIFTDescriptor()(x)
        assert d.shape == (1, 128, 16, 16)


class TestHardNet:
    def test_shapes(self, key):
        patches = jax.random.uniform(key, (4, 1, 32, 32))
        desc = F.HardNet()(patches)
        assert desc.shape == (4, 128)
        np.testing.assert_allclose(jnp.linalg.norm(desc, axis=-1), 1.0,
                                   atol=1e-4)


class TestMatching:
    def test_nn_identity(self, key):
        d = jax.random.normal(key, (10, 8))
        dists, idx, valid = F.match_nn(d, d)
        np.testing.assert_array_equal(idx[:, 1], jnp.arange(10))
        assert bool(valid.all())

    def test_mnn(self, key):
        d1 = jax.random.normal(key, (10, 8))
        d2 = jnp.concatenate([d1, jax.random.normal(jax.random.fold_in(key, 1),
                                                    (5, 8))])
        dists, idx, valid = F.match_mnn(d1, d2)
        np.testing.assert_array_equal(idx[valid][:, 1], jnp.arange(10))

    def test_snn_ratio(self, key):
        d1 = jax.random.normal(key, (6, 8))
        d2 = jnp.concatenate([d1 + 0.01 * jax.random.normal(key, (6, 8)),
                              jax.random.normal(jax.random.fold_in(key, 2), (6, 8))])
        dists, idx, valid = F.match_snn(d1, d2, 0.8)
        assert bool(valid.all())
        np.testing.assert_array_equal(idx[:, 1], jnp.arange(6))

    def test_smnn_with_mask(self, key):
        d1 = jax.random.normal(key, (8, 8))
        d2 = d1
        mask1 = jnp.arange(8) < 6
        dists, idx, valid = F.match_smnn(d1, d2, 0.95, mask1, mask1)
        assert int(valid.sum()) == 6

    def test_fginn(self, key):
        d1 = jax.random.normal(key, (6, 8))
        lafs = F.laf_from_center_scale_ori(
            jax.random.uniform(key, (1, 6, 2)) * 100)
        dists, idx, valid = F.match_fginn(d1, d1, lafs, lafs)
        np.testing.assert_array_equal(idx[valid][:, 1],
                                      jnp.arange(6)[valid])


class TestDetector:
    def test_single_scale(self):
        x = jnp.zeros((1, 1, 32, 32)).at[:, :, 8:24, 8:24].set(1.0)
        resp = F.harris_response(x)
        xy, vals, valid = F.detect_features_single_scale(resp, 16)
        assert xy.shape == (1, 16, 2)
        # corners detected among valid points
        got = np.asarray(xy[0][np.asarray(valid[0])])
        corners = np.array([[8, 8], [23, 8], [8, 23], [23, 23]])
        for c in corners:
            assert np.min(np.abs(got - c).sum(-1)) <= 2

    def test_scale_space_detector(self, img):
        det = F.ScaleSpaceDetector(num_features=64)
        lafs, resps, valid = det(img)
        assert lafs.shape == (1, 64, 2, 3)
        assert int(valid.sum()) > 10
        xy = F.get_laf_center(lafs)
        assert float(xy[valid].min()) >= 0
        assert float(xy[valid].max()) <= 95

    def test_detector_repeatability_under_shift(self, img):
        det = F.ScaleSpaceDetector(num_features=64)
        lafs1, _, v1 = det(img)
        img2 = warp_perspective(img, jnp.eye(3).at[0, 2].set(3.0)[None], (96, 96))
        lafs2, _, v2 = det(img2)
        xy1 = np.asarray(F.get_laf_center(lafs1)[0][np.asarray(v1[0])])
        xy2 = np.asarray(F.get_laf_center(lafs2)[0][np.asarray(v2[0])])
        # most points should have a correspondence at +3 px in x
        hits = 0
        for p in xy1:
            if p[0] > 85:  # shifted out
                continue
            d = np.abs(xy2 - (p + np.array([3.0, 0]))).sum(-1).min()
            hits += d < 1.5
        assert hits >= 0.5 * len(xy1)


class TestIntegrated:
    def test_sift_feature_and_matcher(self, img):
        sift = F.SIFTFeature(num_features=128)
        matcher = F.LocalFeatureMatcher(sift, F.DescriptorMatcher("smnn", 0.95))
        img2 = warp_perspective(img, jnp.eye(3).at[0, 2].set(5.0)[None], (96, 96))
        out = matcher({"image0": img, "image1": img2})
        vm = out["valid"][0]
        # true DoG finds modest blob counts on blurred noise (the
        # Laplacian approximation found ~3x more but less selectively)
        assert int(vm.sum()) >= 8
        kp0 = out["keypoints0"][0][vm]
        kp1 = out["keypoints1"][0][vm]
        good = jnp.abs(kp1 - kp0 - jnp.array([5.0, 0.0])).max(-1) < 2.0
        assert float(good.mean()) > 0.7
