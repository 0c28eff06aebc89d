"""Multi-level (whole-octave) fused blur: the sequential blur chain as
cumulative banded-operator products must match applying the blurs one by
one EXACTLY (operator composition folds each step's border rule) — see
`ops/pallas_kernels.py multi_level_blur` and the ScalePyramid TPU path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kornia_tpu.ops.filters import filter2d_separable, get_gaussian_kernel1d
from kornia_tpu.ops.pallas_kernels import multi_level_blur


def _sequential(x, kernels, border):
    out, cur = [], x
    for k in kernels:
        cur = filter2d_separable(cur, k, k, border_type=border)
        out.append(cur)
    return jnp.stack(out)


@pytest.mark.parametrize("variant", ["xla", "pallas"])
@pytest.mark.parametrize("border", ["replicate", "reflect"])
def test_matches_sequential(variant, border):
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, 1, 48, 64))
    sigmas = [0.8, 1.1, 1.4, 1.8, 2.3]
    kers = [get_gaussian_kernel1d(2 * int(np.ceil(4 * s)) + 1, s)
            for s in sigmas]
    ref = _sequential(x, kers, border)
    out = multi_level_blur(x, kers, kers, border_type=border,
                           interpret=(variant == "pallas"), variant=variant)
    assert out.shape == (5, 2, 1, 48, 64)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-6)


def test_batched_channels():
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 3, 32, 40))
    kers = [get_gaussian_kernel1d(5, 1.0), get_gaussian_kernel1d(7, 1.5)]
    ref = _sequential(x, kers, "replicate")
    out = multi_level_blur(x, kers, kers, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-6)


def test_gradient_matches_sequential():
    x = jax.random.uniform(jax.random.PRNGKey(2), (1, 1, 32, 32))
    kers = [get_gaussian_kernel1d(5, 0.9), get_gaussian_kernel1d(7, 1.3),
            get_gaussian_kernel1d(9, 1.7)]

    def ml_loss(xx):
        out = multi_level_blur(xx, kers, kers, interpret=True)
        return jnp.sum(out * out)

    def seq_loss(xx):
        return jnp.sum(_sequential(xx, kers, "replicate") ** 2)

    g = jax.grad(ml_loss)(x)
    gs = jax.grad(seq_loss)(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(gs), atol=1e-4)


def test_scale_pyramid_levels_consistent():
    """ScalePyramid's CPU (sequential) output is the ground truth the TPU
    multi-level path must reproduce; check the level-kernel factorization
    reproduces the old in-loop computation."""
    from kornia_tpu.ops.pyramid import ScalePyramid

    sp = ScalePyramid(3, 1.6, 15)
    x = jax.random.uniform(jax.random.PRNGKey(3), (1, 1, 64, 64))
    octs, sigs, dists = sp(x)
    # six levels, first octave at input res
    assert octs[0].shape[1] == 6 and octs[0].shape[-2:] == (64, 64)
    # level sigmas follow the geometric ladder
    s = np.asarray(sigs[0][0])
    np.testing.assert_allclose(s[1:] / s[:-1], 2 ** (1 / 3), rtol=1e-5)
    # the batched kernel list reproduces the sequential levels
    kers, _ = sp._level_kernels(1.6)
    base = octs[0][:, 0]
    ml = multi_level_blur(base, kers, kers, border_type="replicate",
                          variant="xla")
    np.testing.assert_allclose(np.asarray(ml[2]), np.asarray(octs[0][:, 3]),
                               atol=2e-6)
