"""RRDBNet (Real-ESRGAN generator) contracts: output scale, converter
layout (validated against a synthetic basicsr-keyed checkpoint), x2
pixel-unshuffle path, jit + grad."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kornia_tpu.models.rrdbnet import (RRDBNet, RRDBNetBuilder,
                                       RRDBNetConfig, forward, init_params,
                                       load_torch_weights, _param_specs)

pytestmark = pytest.mark.slow  # heavy leg: run with --runslow


def _tiny(scale):
    return RRDBNetConfig(num_feat=8, num_block=2, num_grow_ch=4,
                         scale=scale)


class TestRRDBNet:
    def test_x4_shape(self):
        cfg = _tiny(4)
        net = RRDBNet(cfg)
        out = net(jnp.zeros((1, 3, 16, 16)))
        assert out.shape == (1, 3, 64, 64)

    def test_x2_pixel_unshuffle_path(self):
        cfg = _tiny(2)
        net = RRDBNet(cfg)
        out = net(jnp.zeros((1, 3, 16, 16)))
        assert out.shape == (1, 3, 32, 32)

    def test_converter_synthetic_checkpoint(self):
        cfg = _tiny(4)
        rng = np.random.default_rng(0)
        sd = {k: rng.normal(size=shape).astype(np.float32)
              for k, (kind, shape) in _param_specs(cfg).items()}
        params = load_torch_weights({"params_ema": sd}, cfg)
        x = jnp.asarray(rng.random((1, 3, 8, 8)), jnp.float32)
        out = forward(params, cfg, x)
        assert out.shape == (1, 3, 32, 32)
        assert bool(jnp.isfinite(out).all())
        # conv layout: torch (O, I, kh, kw) -> HWIO
        w = sd["conv_first.weight"]
        np.testing.assert_array_equal(
            np.asarray(params["conv_first.weight"]),
            w.transpose(2, 3, 1, 0))

    def test_jit_and_grad(self):
        cfg = _tiny(4)
        params = init_params(jax.random.PRNGKey(0), cfg)
        x = jax.random.uniform(jax.random.PRNGKey(1), (1, 3, 8, 8))
        f = jax.jit(lambda p: jnp.sum(forward(p, cfg, x) ** 2))
        g = jax.grad(f)(params)
        total = sum(float(jnp.abs(v).sum()) for v in g.values())
        assert np.isfinite(total) and total > 0

    def test_builder(self):
        with pytest.raises(ValueError):
            RRDBNetConfig.from_name("nope")
        sr = RRDBNetBuilder.build("RealESRGAN_x4plus_anime_6B")
        assert sr.model.cfg.num_block == 6
