"""Parity/behavior tests for the new augmentations (snow, rain,
illumination, plasma contrast, PadTo, 3D perspective/motion-blur,
transplantation 3D). Where the reference op is deterministic given params,
we compare apply() outputs directly."""

import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/reference")
sys.modules.setdefault("kornia_rs", types.ModuleType("kornia_rs"))

torch = pytest.importorskip("torch")

import kornia.augmentation as RA  # noqa: E402

import kornia_tpu.augmentation as A  # noqa: E402


def _rand(*shape, seed=0):
    return np.random.default_rng(seed).random(shape).astype("float32")


class TestRandomSnowParity:
    def test_apply_matches_reference_at_fixed_params(self):
        x = _rand(2, 3, 8, 8)
        snow = np.array([0.45, 0.55], "float32")
        bright = np.array([2.0, 3.0], "float32")

        ref = RA.RandomSnow(p=1.0)
        ref_out = ref.apply_transform(
            torch.from_numpy(x),
            {"snow_coefficient": torch.from_numpy(snow),
             "brightness": torch.from_numpy(bright)}, {})

        mine = A.RandomSnow(p=1.0)
        out = mine.apply(jnp.asarray(x),
                         {"snow_coefficient": jnp.asarray(snow),
                          "brightness": jnp.asarray(bright)})
        np.testing.assert_allclose(np.asarray(out), ref_out.numpy(),
                                   atol=1e-4)


class TestRandomRain:
    def test_streaks_drawn_and_bounded(self):
        x = jnp.zeros((2, 3, 32, 32))
        aug = A.RandomRain(number_of_drops=(5, 10), drop_height=(3, 6),
                           drop_width=(-3, 3), p=1.0)
        out = aug(x, key=jax.random.PRNGKey(0))
        vals = np.unique(np.asarray(out))
        assert set(np.round(vals, 4)) <= {0.0, np.float32(np.round(200 / 255, 4))}
        assert (np.asarray(out) > 0).sum() > 0

    def test_negative_width(self):
        x = jnp.zeros((1, 1, 16, 16))
        out = A.RandomRain(number_of_drops=(3, 3), drop_height=(2, 4),
                           drop_width=(-4, -2), p=1.0)(
            x, key=jax.random.PRNGKey(1))
        assert (np.asarray(out) > 0).sum() > 0


class TestIlluminations:
    @pytest.mark.parametrize("cls", ["RandomGaussianIllumination",
                                     "RandomLinearCornerIllumination"])
    def test_bounded_additive(self, cls):
        x = jnp.full((3, 3, 16, 16), 0.5)
        aug = getattr(A, cls)(p=1.0)
        out = aug(x, key=jax.random.PRNGKey(0))
        d = np.asarray(out) - 0.5
        assert np.abs(d).max() <= 0.21  # |gain| bound
        assert np.abs(d).max() > 0.0
        assert (np.asarray(out) >= 0).all() and (np.asarray(out) <= 1).all()


class TestPlasmaContrast:
    def test_formula(self):
        x = jnp.asarray(_rand(2, 1, 16, 16))
        aug = A.RandomPlasmaContrast(p=1.0)
        params = aug.generate_parameters(jax.random.PRNGKey(0), x.shape)
        out = aug.apply(x, params)
        expect = jnp.clip((x - 0.5) * 4.0 * params["field"] + 0.5, 0, 1)
        np.testing.assert_allclose(np.asarray(out), np.asarray(expect),
                                   atol=1e-6)


class TestPadTo:
    def test_matches_reference(self):
        x = _rand(1, 1, 3, 3)
        ref_out = RA.PadTo((4, 5), pad_value=1.0)(torch.from_numpy(x))
        out = A.PadTo((4, 5), pad_value=1.0)(jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(out), ref_out.numpy(),
                                   atol=1e-6)

    def test_inverse_roundtrip(self):
        x = jnp.asarray(_rand(2, 3, 5, 7))
        aug = A.PadTo((8, 9))
        assert np.allclose(np.asarray(aug.inverse(aug(x))), np.asarray(x))


class Test3DOps:
    def test_perspective3d_distorts_and_keeps_shape(self):
        vol = jnp.asarray(_rand(2, 1, 5, 9, 9))
        out = A.RandomPerspective3D(0.5, p=1.0)(vol,
                                                key=jax.random.PRNGKey(0))
        assert out.shape == vol.shape
        assert float(jnp.abs(out - vol).max()) > 0.01

    def test_motion_blur3d_preserves_mean_roughly(self):
        vol = jnp.asarray(_rand(1, 1, 4, 12, 12))
        out = A.RandomMotionBlur3D(3, 35.0, 0.5, p=1.0)(
            vol, key=jax.random.PRNGKey(0))
        assert out.shape == vol.shape
        assert abs(float(jnp.mean(out)) - float(jnp.mean(vol))) < 0.05

    def test_transplantation3d(self):
        imgs = jnp.asarray(_rand(4, 3, 4, 8, 8))
        masks = jnp.asarray(
            (np.random.default_rng(1).random((4, 4, 8, 8)) * 3).astype("int32"))
        oi, om = A.RandomTransplantation3D(p=1.0)(
            imgs, masks, key=jax.random.PRNGKey(2))
        assert oi.shape == imgs.shape and om.shape == masks.shape


class TestAliases:
    def test_reference_spellings(self):
        assert A.RandomClahe is A.RandomCLAHE
        assert A.RandomSaltAndPepperNoise is A.RandomSaltAndPepper
        assert A.PatchMix is A.RandomPatchMix
        assert issubclass(A.RandomTransplantation3D, A.RandomTransplantation)


class Test3DMatrices:
    """matrix4 tracking + per-sample crop origins (reference
    _3d/geometric bases compute_transformation)."""

    def test_flip_matrix_roundtrips_points(self):
        import jax.numpy as jnp
        vol_shape = (2, 1, 4, 6, 8)
        for cls, axis in [(A.RandomHorizontalFlip3D, -1),
                          (A.RandomVerticalFlip3D, -2),
                          (A.RandomDepthicalFlip3D, -3)]:
            aug = cls(p=1.0)
            M = aug.matrix4({}, vol_shape)
            assert M.shape == (2, 4, 4)
            # applying the matrix twice is the identity
            np.testing.assert_allclose(np.asarray(M @ M),
                                       np.broadcast_to(np.eye(4), (2, 4, 4)),
                                       atol=1e-6)
            # corner (0,0,0) maps to the far corner along the flip axis
            p = np.asarray(M @ jnp.asarray([0.0, 0, 0, 1.0]))
            size = vol_shape[2:][{-1: 2, -2: 1, -3: 0}[axis]]
            assert abs(p[0, {-1: 0, -2: 1, -3: 2}[axis]] - (size - 1)) < 1e-6

    def test_rotation_affine_matrix_matches_warp(self):
        import jax
        import jax.numpy as jnp
        from kornia_tpu.ops.warp3d import warp_affine3d
        vol = jax.random.uniform(jax.random.PRNGKey(0), (2, 1, 6, 8, 8))
        for aug in [A.RandomRotation3D(20.0, p=1.0),
                    A.RandomAffine3D(15.0, translate=(0.1, 0.1, 0.1),
                                     scale=(0.9, 1.1), p=1.0)]:
            params = aug.generate_parameters(jax.random.PRNGKey(1), vol.shape)
            out = aug.apply(vol, params)
            M = aug.matrix4(params, vol.shape)
            np.testing.assert_allclose(np.asarray(M[:, 3]),
                                       np.broadcast_to([0, 0, 0, 1.0], (2, 4)))
            # 3D geometric augs warp with the reference's default
            # align_corners=False (see volumetric.py apply)
            out2 = warp_affine3d(vol, M[:, :3], vol.shape[-3:],
                                 align_corners=False)
            np.testing.assert_allclose(np.asarray(out), np.asarray(out2),
                                       atol=1e-5)

    def test_random_crop3d_per_sample(self):
        import jax
        vol = jax.random.uniform(jax.random.PRNGKey(0), (4, 1, 6, 8, 8))
        aug = A.RandomCrop3D((4, 5, 5))
        params = aug.generate_parameters(jax.random.PRNGKey(2), vol.shape)
        out = aug(vol, params=params)
        assert out.shape == (4, 1, 4, 5, 5)
        z0, y0, x0 = (np.asarray(params[k]) for k in ("z0", "y0", "x0"))
        # origins differ across the batch (per-sample sampling)
        assert len({(a, b, c) for a, b, c in zip(z0, y0, x0)}) > 1
        for i in range(4):
            np.testing.assert_allclose(
                np.asarray(out[i]),
                np.asarray(vol[i, :, z0[i]:z0[i] + 4, y0[i]:y0[i] + 5,
                               x0[i]:x0[i] + 5]))
