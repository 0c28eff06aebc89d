"""Contracts for model I/O structures (SegmentationResults, Prompts,
NaFlex) vs reference behavior (kornia/models/structures.py,
processors/naflex.py)."""

import sys
import types

import numpy as np
import pytest

sys.path.append("/root/reference")
sys.modules.setdefault("kornia_rs", types.ModuleType("kornia_rs"))

import jax.numpy as jnp

from kornia_tpu.models.structures import (NaFlex, Prompts,
                                          SegmentationResults)

torch = pytest.importorskip("torch")


def test_segmentation_results_parity():
    from kornia.models.structures import \
        SegmentationResults as TorchResults
    g = torch.Generator().manual_seed(0)
    logits = torch.randn(2, 3, 8, 8, generator=g)
    scores = torch.rand(2, 3, generator=g)
    want = TorchResults(logits, scores, 0.1)
    got = SegmentationResults(jnp.asarray(logits.numpy()),
                              jnp.asarray(scores.numpy()), 0.1)
    np.testing.assert_array_equal(np.asarray(got.binary_masks),
                                  want.binary_masks.numpy())
    w = want.original_res_logits((28, 30), (14, 15), (32, 32))
    o = got.original_res_logits((28, 30), (14, 15), (32, 32))
    np.testing.assert_allclose(np.asarray(o), w.numpy(), atol=1e-4,
                               rtol=1e-3)
    np.testing.assert_array_equal(np.asarray(got.binary_masks),
                                  want.binary_masks.numpy())


def test_prompts():
    pts = (jnp.zeros((2, 3, 2)), jnp.zeros((2, 3)))
    pr = Prompts(points=pts, boxes=jnp.zeros((2, 4)))
    assert pr.keypoints.shape == (2, 3, 2)
    assert pr.keypoints_labels.shape == (2, 3)
    with pytest.raises(ValueError):
        Prompts(points=pts, boxes=jnp.zeros((3, 4)))


def test_naflex_parity():
    import torch.nn.functional as F
    from kornia.models.processors.naflex import NaFlex as TorchNaFlex
    torch.manual_seed(1)
    conv = torch.nn.Conv2d(3, 16, kernel_size=8, stride=8)
    pos = torch.randn(16, 16)  # 4x4 grid
    ref = TorchNaFlex(conv, pos).eval()
    x = torch.rand(1, 3, 48, 48, generator=torch.Generator().manual_seed(2))
    with torch.no_grad():
        want = ref(x)  # 6x6 grid -> interpolated positions

    w = jnp.asarray(conv.weight.detach().numpy().transpose(2, 3, 1, 0))
    b = jnp.asarray(conv.bias.detach().numpy())

    def patch_fn(img):
        import jax.lax as lax
        y = lax.conv_general_dilated(
            jnp.transpose(img, (0, 2, 3, 1)), w, (8, 8), [(0, 0)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
        return jnp.transpose(y, (0, 3, 1, 2))

    got = NaFlex(patch_fn, jnp.asarray(pos.numpy()))(jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=1e-4,
                               rtol=1e-3)
