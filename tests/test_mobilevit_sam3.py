"""MobileViT backbone and SAM-3 component contracts."""

import jax
import jax.numpy as jnp
import numpy as np

from kornia_tpu.models.mobile_vit import MobileViT
from kornia_tpu.models.sam3 import Sam3
import pytest

pytestmark = pytest.mark.slow  # heavy leg: run with --runslow

rng = np.random.default_rng(13)


def test_mobilevit_output_contract():
    # reference: 256x256 xxs input -> (B, 320, 8, 8) (vit_mobile.py:392)
    m = MobileViT("xxs")
    x = jnp.asarray(rng.random((1, 3, 256, 256)), dtype=jnp.float32)
    out = m(x)
    assert out.shape == (1, 320, 8, 8)
    assert bool(jnp.isfinite(out).all())


def test_mobilevit_modes():
    for mode, ch in (("xs", 384), ("s", 640)):
        m = MobileViT(mode)
        out = m(jnp.asarray(rng.random((1, 3, 64, 64)), dtype=jnp.float32))
        assert out.shape == (1, ch, 2, 2)


def test_sam3_masks_and_iou():
    m = Sam3(patch_size=16, encoder_dim=64, depth=2)
    img = jnp.asarray(rng.random((2, 3, 64, 64)), dtype=jnp.float32)
    pts = jnp.asarray([[[32.0, 20.0], [10.0, 50.0]]] * 2)
    lab = jnp.asarray([[1, 0]] * 2)
    masks, iou = m(img, pts, lab)
    # exact reference semantics: masks are the upscaled embeddings
    # (B, P/8, S/4, S/4); iou has num_multimask_outputs entries
    assert masks.shape == (2, 8, 16, 16) and iou.shape == (2, 3)
    # a different label selects a different embedding: iou changes
    _, iou2 = m(img, pts, jnp.asarray([[1, -1]] * 2))
    assert not np.allclose(np.asarray(iou), np.asarray(iou2))


def test_sam3_jit_and_grad():
    m = Sam3(patch_size=16, encoder_dim=64, depth=2)
    img = jnp.asarray(rng.random((1, 3, 64, 64)), dtype=jnp.float32)
    pts = jnp.asarray([[[32.0, 20.0]]])
    lab = jnp.asarray([[1]])
    params = m.params

    def loss(p):
        masks, iou = Sam3(m.cfg, p)(img, pts, lab)
        return jnp.mean(masks ** 2) + jnp.mean(iou ** 2)

    out = jax.jit(lambda p: loss(p))(params)
    assert bool(jnp.isfinite(out))
    g = jax.grad(loss)(params)
    assert all(bool(jnp.isfinite(t).all())
               for t in jax.tree_util.tree_leaves(g))
