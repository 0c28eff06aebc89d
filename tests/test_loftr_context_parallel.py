"""LoFTR coarse-attention context parallelism (VERDICT r2 item 8 /
SURVEY §5): the sequence-sharded transformer must equal the
single-device path bit-for-bit up to f32 reduction order."""

import jax
import jax.numpy as jnp
import numpy as np

from kornia_tpu.feature.loftr import (LoFTRConfig, _transformer,
                                      loftr_coarse_context_parallel,
                                      loftr_init_params)
from kornia_tpu.parallel.mesh import make_mesh


def test_sharded_coarse_equals_single_device():
    cfg = LoFTRConfig(num_coarse_layers=2)
    params = loftr_init_params(jax.random.PRNGKey(0), cfg)
    B, L, C = 1, 16 * 8, cfg.coarse_dim  # L divisible by 8 devices
    k0, k1 = jax.random.split(jax.random.PRNGKey(1))
    f0 = jax.random.normal(k0, (B, L, C)) * 0.5
    f1 = jax.random.normal(k1, (B, L, C)) * 0.5

    ref0, ref1 = _transformer(params, "loftr_coarse",
                              cfg.num_coarse_layers, cfg.num_heads, f0, f1)

    mesh = make_mesh((8, 1), devices=jax.devices()[:8])
    out0, out1 = loftr_coarse_context_parallel(params, cfg, f0, f1, mesh)
    np.testing.assert_allclose(np.asarray(out0), np.asarray(ref0),
                               atol=2e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(ref1),
                               atol=2e-5, rtol=1e-5)


def test_sharded_coarse_jits_under_mesh():
    cfg = LoFTRConfig(num_coarse_layers=1)
    params = loftr_init_params(jax.random.PRNGKey(2), cfg)
    mesh = make_mesh((8, 1), devices=jax.devices()[:8])
    f = jax.random.normal(jax.random.PRNGKey(3), (2, 64, cfg.coarse_dim))

    run = jax.jit(lambda p, a, b: loftr_coarse_context_parallel(
        p, cfg, a, b, mesh))
    o0, o1 = run(params, f, f + 0.1)
    assert o0.shape == f.shape and bool(jnp.all(jnp.isfinite(o0)))
