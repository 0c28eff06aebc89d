import jax
import jax.numpy as jnp
import numpy as np
import pytest

import kornia_tpu.augmentation as A


class TestVideoSequential:
    def test_temporal_consistency(self, key):
        clip = jax.random.uniform(key, (2, 4, 3, 16, 16))
        seq = A.VideoSequential(A.RandomHorizontalFlip(p=0.5))
        out = seq(clip, key)
        # whichever clips flipped, ALL their frames must agree
        flipped = jnp.abs(out - clip).max(axis=(2, 3, 4)) > 1e-6
        for b in range(2):
            assert len(set(np.asarray(flipped[b]).tolist())) == 1

    def test_bcthw(self, key):
        clip = jax.random.uniform(key, (1, 3, 4, 16, 16))
        seq = A.VideoSequential(A.RandomBrightness(p=1.0),
                                data_format="BCTHW")
        out = seq(clip, key)
        assert out.shape == clip.shape

    def test_intensity_same_per_clip(self, key):
        clip = jnp.broadcast_to(
            jax.random.uniform(key, (1, 1, 3, 16, 16)), (1, 4, 3, 16, 16))
        seq = A.VideoSequential(A.RandomBrightness((0.5, 1.5), p=1.0))
        out = seq(clip, key)
        # identical input frames + shared params → identical output frames
        np.testing.assert_allclose(out[0, 0], out[0, 3], atol=1e-6)


class TestPatchSequential:
    def test_shape(self, key):
        x = jax.random.uniform(key, (2, 3, 16, 16))
        seq = A.PatchSequential(A.RandomBrightness(p=1.0), grid_size=4)
        out = seq(x, key)
        assert out.shape == x.shape

    def test_patchwise_params_differ(self, key):
        x = jnp.full((1, 1, 16, 16), 0.5)
        seq = A.PatchSequential(A.RandomBrightness((0.2, 1.8), p=1.0),
                                grid_size=4)
        out = seq(x, key)
        # different patches got different brightness factors
        patches = out.reshape(1, 1, 4, 4, 4, 4)
        vals = patches[0, 0, :, 0, :, 0].reshape(-1)
        assert len(np.unique(np.asarray(vals).round(4))) > 4


class TestADA:
    def test_p_adaptation(self, key):
        ada = A.AdaptiveDiscriminatorAugmentation(adjustment_speed=0.1)
        x = jax.random.uniform(key, (2, 3, 16, 16))
        # p=0 → identity
        np.testing.assert_allclose(ada(x, key), x, atol=1e-6)
        # overfit signal (all real classified positive) → p grows
        ada.update(jnp.ones(8))
        assert ada.p > 0
        out = ada(x, key)
        assert out.shape == x.shape
        # underfit signal → p shrinks back
        ada.update(-jnp.ones(8))
        ada.update(-jnp.ones(8))
        assert ada.p == 0.0
