import jax
import jax.numpy as jnp
import numpy as np
import pytest

import kornia_tpu.augmentation as A


@pytest.fixture
def img(key):
    return jax.random.uniform(key, (4, 3, 16, 16))


class TestIntensityOps:
    @pytest.mark.parametrize("aug", [
        A.RandomBrightness(p=1.0), A.RandomContrast(p=1.0),
        A.RandomSaturation(p=1.0), A.RandomHue(p=1.0), A.RandomGamma(p=1.0),
        A.ColorJiggle(p=1.0), A.RandomGrayscale(p=1.0),
        A.RandomGaussianBlur(p=1.0), A.RandomGaussianNoise(p=1.0, std=0.05),
        A.RandomMotionBlur(p=1.0), A.RandomBoxBlur(p=1.0),
        A.RandomMedianBlur(p=1.0), A.RandomSolarize(p=1.0),
        A.RandomPosterize(p=1.0), A.RandomSharpness(p=1.0),
        A.RandomEqualize(p=1.0), A.RandomCLAHE(p=1.0),
        A.RandomAutoContrast(p=1.0), A.RandomInvert(p=1.0),
        A.RandomChannelShuffle(p=1.0), A.RandomChannelDropout(p=1.0),
        A.RandomErasing(p=1.0), A.RandomSaltAndPepper(p=1.0),
        A.RandomRGBShift(p=1.0), A.RandomPlanckianJitter(p=1.0),
        A.RandomLinearIllumination(p=1.0), A.RandomPlasmaBrightness(p=1.0),
        A.RandomPlasmaShadow(p=1.0),
    ], ids=lambda a: type(a).__name__)
    def test_smoke(self, img, key, aug):
        out = aug(img, key)
        assert out.shape == img.shape
        assert bool(jnp.all(jnp.isfinite(out)))

    def test_p_zero_identity(self, img, key):
        out = A.RandomBrightness(brightness=(0.2, 0.4), p=0.0)(img, key)
        np.testing.assert_allclose(out, img, atol=1e-6)

    def test_p_half_partial(self, img, key):
        big = jnp.broadcast_to(img[:1], (64, *img.shape[1:]))
        out = A.RandomInvert(p=0.5)(big, key)
        changed = jnp.any(jnp.abs(out - big) > 1e-6, axis=(1, 2, 3))
        assert 10 < int(changed.sum()) < 54

    def test_same_on_batch(self, img, key):
        aug = A.RandomBrightness(p=1.0, same_on_batch=True)
        params = aug.generate_parameters(key, img.shape)
        f = params["factor"]
        np.testing.assert_allclose(f, f[0], atol=1e-6)

    def test_deterministic_replay(self, img, key):
        aug = A.ColorJiggle(p=1.0)
        params = aug.generate_parameters(key, img.shape)
        out1 = aug(img, params=params)
        out2 = aug(img, params=params)
        np.testing.assert_allclose(out1, out2)

    def test_normalize(self, img):
        out = A.Normalize([0.5, 0.5, 0.5], [0.5, 0.5, 0.5])(img)
        np.testing.assert_allclose(out, (img - 0.5) / 0.5, atol=1e-5)


class TestGeometricOps:
    def test_hflip(self, img, key):
        out = A.RandomHorizontalFlip(p=1.0)(img, key)
        np.testing.assert_allclose(out, jnp.flip(img, -1), atol=1e-6)

    def test_hflip_matrix_consistency(self, img, key):
        aug = A.RandomHorizontalFlip(p=1.0)
        params = aug.generate_parameters(key, img.shape)
        M = aug.transform_matrix(img, params)
        # matrix should map x=0 to x=W-1
        from kornia_tpu.geometry.linalg import transform_points
        pt = jnp.zeros((4, 1, 2))
        out = transform_points(M, pt)
        np.testing.assert_allclose(out[..., 0], 15.0, atol=1e-5)

    def test_vflip(self, img, key):
        out = A.RandomVerticalFlip(p=1.0)(img, key)
        np.testing.assert_allclose(out, jnp.flip(img, -2), atol=1e-6)

    def test_rotation_small(self, img, key):
        out = A.RandomRotation(degrees=(10.0, 10.0), p=1.0)(img, key)
        assert out.shape == img.shape
        assert float(jnp.abs(out - img).mean()) > 1e-4

    def test_rotation90_square(self, img, key):
        aug = A.RandomRotation90(times=(1, 1), p=1.0)
        out = aug(img, key)
        np.testing.assert_allclose(out, jnp.rot90(img, 1, (-2, -1)), atol=1e-5)

    def test_affine(self, img, key):
        out = A.RandomAffine(degrees=10.0, translate=(0.1, 0.1),
                             scale=(0.9, 1.1), p=1.0)(img, key)
        assert out.shape == img.shape

    def test_perspective(self, img, key):
        out = A.RandomPerspective(0.3, p=1.0)(img, key)
        assert out.shape == img.shape

    def test_crop_shape(self, img, key):
        out = A.RandomCrop((8, 8))(img, key)
        assert out.shape == (4, 3, 8, 8)

    def test_resized_crop(self, img, key):
        out = A.RandomResizedCrop((12, 12))(img, key)
        assert out.shape == (4, 3, 12, 12)

    def test_center_crop(self, img):
        out = A.CenterCrop((8, 8))(img)
        np.testing.assert_allclose(out, img[:, :, 4:12, 4:12], atol=1e-6)

    def test_elastic(self, img, key):
        out = A.RandomElasticTransform(kernel_size=(7, 7), sigma=(2.0, 2.0),
                                       alpha=(0.1, 0.1), p=1.0)(img, key)
        assert out.shape == img.shape

    def test_tps(self, img, key):
        out = A.RandomThinPlateSpline(scale=0.05, p=1.0)(img, key)
        assert out.shape == img.shape

    def test_fisheye(self, img, key):
        out = A.RandomFisheye(p=1.0)(img, key)
        assert out.shape == img.shape


class TestMixOps:
    def test_mixup(self, img, key):
        labels = jnp.arange(4)
        out, mixed = A.RandomMixUpV2(p=1.0)(img, labels, key=key)
        assert out.shape == img.shape
        assert mixed.shape == (4, 3)

    def test_cutmix(self, img, key):
        labels = jnp.arange(4)
        out, mixed = A.RandomCutMixV2(p=1.0)(img, labels, key=key)
        assert out.shape == img.shape
        assert mixed.shape == (4, 3)
        lam = mixed[:, 2]
        assert bool(jnp.all((lam >= 0) & (lam <= 1)))

    def test_mosaic(self, img, key):
        out = A.RandomMosaic(p=1.0)(img, key=key)
        assert out.shape == img.shape

    def test_jigsaw(self, img, key):
        out = A.RandomJigsaw(grid=(4, 4), p=1.0)(img, key=key)
        assert out.shape == img.shape
        # content preserved (permutation only)
        np.testing.assert_allclose(jnp.sort(out.reshape(4, -1), -1),
                                   jnp.sort(img.reshape(4, -1), -1), atol=1e-6)


class TestContainers:
    def test_image_sequential(self, img, key):
        seq = A.ImageSequential(A.RandomBrightness(p=1.0),
                                A.RandomHorizontalFlip(p=1.0))
        out = seq(img, key)
        assert out.shape == img.shape

    def test_sequential_jits(self, img, key):
        seq = A.ImageSequential(A.ColorJiggle(p=1.0),
                                A.RandomGaussianBlur(p=1.0))
        f = jax.jit(lambda x, k: seq(x, k))
        out = f(img, key)
        np.testing.assert_allclose(out, seq(img, key), atol=1e-4)

    def test_augmentation_sequential_keypoints(self, img, key):
        seq = A.AugmentationSequential(
            A.RandomHorizontalFlip(p=1.0),
            data_keys=["input", "keypoints"])
        kp = jnp.array([[[2.0, 3.0]]] * 4)
        out_img, out_kp = seq(img, kp, key=key)
        np.testing.assert_allclose(out_kp, [[[13.0, 3.0]]] * 4, atol=1e-4)

    def test_augmentation_sequential_bbox(self, img, key):
        seq = A.AugmentationSequential(
            A.RandomHorizontalFlip(p=1.0),
            data_keys=["input", "bbox_xyxy"])
        bbox = jnp.array([[[2.0, 3.0, 5.0, 6.0]]] * 4)
        _, out_bbox = seq(img, bbox, key=key)
        np.testing.assert_allclose(out_bbox, [[[10.0, 3.0, 13.0, 6.0]]] * 4,
                                   atol=1e-4)

    def test_augmentation_sequential_mask(self, img, key):
        seq = A.AugmentationSequential(
            A.RandomVerticalFlip(p=1.0), data_keys=["input", "mask"])
        mask = jnp.zeros((4, 1, 16, 16)).at[:, :, :8].set(1.0)
        _, out_mask = seq(img, mask, key=key)
        np.testing.assert_allclose(out_mask[:, :, 8:], 1.0, atol=1e-5)

    def test_inverse_roundtrip(self, img, key):
        from kornia_tpu.ops.filters import gaussian_blur2d
        smooth = gaussian_blur2d(img, 5, 1.5)  # band-limit: double
        # resampling of white noise would dominate the comparison
        seq = A.AugmentationSequential(
            A.RandomRotation(degrees=(20.0, 20.0), p=1.0),
            data_keys=["input", "keypoints"])
        kp = jnp.array([[[8.0, 8.0], [4.0, 4.0]]] * 4)
        out_img, out_kp = seq(smooth, kp, key=key)
        back_img, back_kp = seq.inverse(out_img, out_kp)
        np.testing.assert_allclose(back_kp, kp, atol=1e-3)
        # interior pixels roundtrip approximately
        np.testing.assert_allclose(back_img[:, :, 6:10, 6:10],
                                   smooth[:, :, 6:10, 6:10], atol=0.1)

    def test_intensity_does_not_move_keypoints(self, img, key):
        seq = A.AugmentationSequential(
            A.ColorJiggle(p=1.0), data_keys=["input", "keypoints"])
        kp = jnp.array([[[2.0, 3.0]]] * 4)
        _, out_kp = seq(img, kp, key=key)
        np.testing.assert_allclose(out_kp, kp, atol=1e-5)
