"""StableDiffusionDissolving / DDIM schedule / RandomDissolving contracts."""

import jax
import jax.numpy as jnp
import numpy as np

from kornia_tpu.augmentation import RandomDissolving
from kornia_tpu.models.diffusion import (DDIMSchedule, DiffusionConfig,
                                         StableDiffusionDissolving)
import pytest

pytestmark = pytest.mark.slow  # heavy leg: run with --runslow

rng = np.random.default_rng(4)


def test_ddim_schedule_matches_scaled_linear():
    s = DDIMSchedule()
    betas = np.linspace(0.00085 ** 0.5, 0.012 ** 0.5, 1000) ** 2
    np.testing.assert_allclose(np.asarray(s.alphas_cumprod),
                               np.cumprod(1 - betas), rtol=1e-5)
    ts = np.asarray(s.timesteps)
    assert ts[0] == 981 and ts[-1] == 1  # descending, steps_offset=1
    # x0 prediction identity: if noise_pred == 0, x0 = latent / sqrt(a)
    z = jnp.ones((2, 4))
    x0 = s.predict_start_from_noise(jnp.zeros_like(z), jnp.asarray(100), z)
    np.testing.assert_allclose(
        np.asarray(x0), 1.0 / np.sqrt(np.asarray(s.alphas_cumprod[100])),
        rtol=1e-5)


def test_dissolve_shapes_range_and_step_conditioning():
    m = StableDiffusionDissolving()
    x = jnp.asarray(rng.random((2, 3, 32, 32)), dtype=jnp.float32)
    y1 = m.dissolve(x, 10)
    y2 = m.dissolve(x, 40)
    assert y1.shape == x.shape
    assert float(y1.min()) >= 0.0 and float(y1.max()) <= 1.0
    assert not np.allclose(np.asarray(y1), np.asarray(y2))
    jit_y = jax.jit(lambda im: m.dissolve(im, 10))(x)
    np.testing.assert_allclose(np.asarray(jit_y), np.asarray(y1), atol=1e-5)


def test_random_dissolving_aug():
    x = jnp.asarray(rng.random((2, 3, 32, 32)), dtype=jnp.float32)
    aug = RandomDissolving(p=1.0)
    out = aug(x, key=jax.random.PRNGKey(0))
    assert out.shape == x.shape
    assert bool(jnp.isfinite(out).all())
    aug0 = RandomDissolving(p=0.0)
    out0 = aug0(x, key=jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(out0), np.asarray(x), atol=1e-6)
