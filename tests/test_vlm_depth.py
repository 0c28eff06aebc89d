"""SigLip2 two-tower, DepthAnything DPT, and generative VLM contracts."""

import jax
import jax.numpy as jnp
import numpy as np

from kornia_tpu.models.depth_anything import (DepthAnything,
                                              DepthAnythingConfig)
from kornia_tpu.models.siglip2 import (SigLip2, SigLip2Config, siglip_loss)
from kornia_tpu.models.vlm import VLM, VLMConfig
import pytest

pytestmark = pytest.mark.slow  # heavy leg: run with --runslow

rng = np.random.default_rng(11)


def test_siglip2_embeds_and_logits():
    m = SigLip2(SigLip2Config.tiny())
    img = jnp.asarray(rng.random((4, 3, 32, 32)), dtype=jnp.float32)
    ids = jnp.asarray(rng.integers(0, 1000, (4, 16)), dtype=jnp.int32)
    am = jnp.ones((4, 16), jnp.int32)
    out = m(img, ids, am, return_loss=True)
    assert out["image_embeds"].shape == (4, 64)
    assert out["logits_per_text"].shape == (4, 4)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(out["image_embeds"]), axis=-1), 1.0,
        atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(out["logits_per_image"]),
        np.asarray(out["logits_per_text"]).T, atol=1e-6)
    assert bool(jnp.isfinite(out["loss"]))


def test_siglip_loss_variants():
    logits = jnp.asarray(rng.standard_normal((3, 3)), dtype=jnp.float32)
    full = siglip_loss(logits)
    diag = siglip_loss(logits, positive_only=True)
    # reference diagonal-only variant (model.py:233-237)
    expect = -np.mean(np.log(1 / (1 + np.exp(-np.diag(np.asarray(logits))))))
    np.testing.assert_allclose(float(diag), expect, rtol=1e-5)
    assert float(full) > float(diag) - 1e-6  # full adds negative-pair terms


def test_siglip2_grad_through_contrastive_loss():
    m = SigLip2(SigLip2Config.tiny())
    img = jnp.asarray(rng.random((2, 3, 32, 32)), dtype=jnp.float32)
    ids = jnp.asarray(rng.integers(0, 1000, (2, 8)), dtype=jnp.int32)
    m(img, ids)  # init
    x = jnp.transpose(img, (0, 2, 3, 1))
    g = jax.grad(lambda p: m.model.apply(p, x, ids, None,
                                         return_loss=True)["loss"])(m.params)
    assert all(bool(jnp.isfinite(t).all())
               for t in jax.tree_util.tree_leaves(g))


def test_siglip2_text_mask_changes_output():
    m = SigLip2(SigLip2Config.tiny())
    ids = jnp.asarray(rng.integers(0, 1000, (1, 8)), dtype=jnp.int32)
    img = jnp.asarray(rng.random((1, 3, 32, 32)), dtype=jnp.float32)
    m(img, ids)
    full = m(img, ids, jnp.ones((1, 8), jnp.int32))["text_embeds"]
    half = m(img, ids, jnp.asarray([[1, 1, 1, 1, 0, 0, 0, 0]]))["text_embeds"]
    assert not np.allclose(np.asarray(full), np.asarray(half))


def test_depth_anything_shapes_grad():
    d = DepthAnything(DepthAnythingConfig.tiny())
    img = jnp.asarray(rng.random((2, 3, 64, 48)), dtype=jnp.float32)
    dep = d(img)
    assert dep.shape == (2, 1, 64, 48)
    assert bool(jnp.isfinite(dep).all()) and float(dep.min()) >= 0.0
    x = jnp.transpose(img, (0, 2, 3, 1))
    g = jax.grad(lambda p: d.model.apply(p, x).mean())(d.params)
    assert all(bool(jnp.isfinite(t).all())
               for t in jax.tree_util.tree_leaves(g))


def test_vlm_greedy_generation_deterministic_and_jittable():
    m = VLM(VLMConfig.tiny())
    img = jnp.asarray(rng.random((2, 3, 32, 32)), dtype=jnp.float32)
    ids = jnp.asarray(rng.integers(0, 512, (2, 6)), dtype=jnp.int32)
    toks = m.generate(img, ids, max_new_tokens=8)
    assert toks.shape == (2, 8) and toks.dtype == jnp.int32
    toks2 = np.asarray(jax.jit(lambda a, b: m.generate(a, b, 8))(img, ids))
    np.testing.assert_array_equal(np.asarray(toks), toks2)


def test_vlm_image_conditions_generation():
    m = VLM(VLMConfig.tiny())
    ids = jnp.asarray(rng.integers(0, 512, (1, 6)), dtype=jnp.int32)
    img1 = jnp.asarray(rng.random((1, 3, 32, 32)), dtype=jnp.float32)
    img2 = jnp.asarray(rng.random((1, 3, 32, 32)), dtype=jnp.float32)
    t1 = np.asarray(m.generate(img1, ids, 8))
    t2 = np.asarray(m.generate(img2, ids, 8))
    assert not (t1 == t2).all()  # vision tokens reach the decoder
