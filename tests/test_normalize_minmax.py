"""Fast-tier unit tests for the round-5 normalize_min_max fix: the
reduction is PER-CHANNEL (reference enhance/normalize.py:305), not
per-image — the difference is invisible on single-channel inputs, so
these legs pin the multi-channel semantics directly."""

import jax
import jax.numpy as jnp
import numpy as np

from kornia_tpu.ops.enhance import normalize_min_max
from kornia_tpu.augmentation import RandomAutoContrast


def test_per_channel_ranges():
    rng = np.random.default_rng(0)
    # channels with wildly different ranges: each must map to [0, 1]
    x = np.stack([rng.uniform(0.4, 0.6, (8, 8)),
                  rng.uniform(0.0, 0.05, (8, 8)),
                  rng.uniform(-3.0, 7.0, (8, 8))]).astype(np.float32)[None]
    out = np.asarray(normalize_min_max(jnp.asarray(x)))
    for c in range(3):
        assert abs(out[0, c].min() - 0.0) < 1e-4, c
        assert abs(out[0, c].max() - 1.0) < 1e-4, c


def test_custom_range_and_batch_independence():
    rng = np.random.default_rng(1)
    x = rng.uniform(0, 1, (2, 3, 6, 6)).astype(np.float32)
    out = np.asarray(normalize_min_max(jnp.asarray(x), min_val=-1.0,
                                       max_val=1.0))
    assert abs(out.min() + 1.0) < 1e-4 and abs(out.max() - 1.0) < 1e-4
    # batch items are normalized independently
    np.testing.assert_allclose(
        np.asarray(normalize_min_max(jnp.asarray(x[:1]))),
        np.asarray(normalize_min_max(jnp.asarray(x)))[:1], atol=1e-6)


def test_autocontrast_clip_flag():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.uniform(0, 1, (2, 3, 8, 8)).astype(np.float32))
    clipped = np.asarray(RandomAutoContrast(p=1.0)(
        x, params={"apply_mask": jnp.ones(2, bool)}))
    assert clipped.min() >= 0.0 and clipped.max() <= 1.0
    raw = np.asarray(RandomAutoContrast(p=1.0, clip_output=False)(
        x, params={"apply_mask": jnp.ones(2, bool)}))
    # eps in the denominator pushes the un-clipped max fractionally
    # below 1; both paths agree inside [0, 1]
    np.testing.assert_allclose(np.clip(raw, 0, 1), clipped, atol=1e-6)


def test_grad_flows():
    x = jnp.linspace(0, 1, 3 * 16).reshape(1, 3, 4, 4) ** 2
    g = jax.grad(lambda t: jnp.sum(normalize_min_max(t) ** 2))(x)
    assert bool(jnp.all(jnp.isfinite(g)))
