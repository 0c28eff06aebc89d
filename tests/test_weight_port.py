"""Torch→JAX weight-porting conformance (the porting harness from
SURVEY.md §7 'hard parts' item 5 — validated with a synthetic torch
checkpoint since pretrained weights can't be fetched in this environment)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn

import jax
import jax.numpy as jnp


def _torch_hardnet():
    feats = tnn.Sequential(
        tnn.Conv2d(1, 32, 3, 1, 1, bias=False),
        tnn.BatchNorm2d(32, affine=False), tnn.ReLU(),
        tnn.Conv2d(32, 32, 3, 1, 1, bias=False),
        tnn.BatchNorm2d(32, affine=False), tnn.ReLU(),
        tnn.Conv2d(32, 64, 3, 2, 1, bias=False),
        tnn.BatchNorm2d(64, affine=False), tnn.ReLU(),
        tnn.Conv2d(64, 64, 3, 1, 1, bias=False),
        tnn.BatchNorm2d(64, affine=False), tnn.ReLU(),
        tnn.Conv2d(64, 128, 3, 2, 1, bias=False),
        tnn.BatchNorm2d(128, affine=False), tnn.ReLU(),
        tnn.Conv2d(128, 128, 3, 1, 1, bias=False),
        tnn.BatchNorm2d(128, affine=False), tnn.ReLU(),
        tnn.Conv2d(128, 128, 8, 1, 0, bias=False),
        tnn.BatchNorm2d(128, affine=False),
    ).eval()
    with torch.no_grad():
        for m in feats.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.normal_(0, 0.1)
                m.running_var.uniform_(0.5, 1.5)
    return feats


class TestHardNetPort:
    def test_forward_parity(self):
        feats = _torch_hardnet()

        def torch_forward(x):
            mu = x.mean(dim=(1, 2, 3), keepdim=True)
            sd = x.std(dim=(1, 2, 3), keepdim=True)
            out = feats((x - mu) / (sd + 1e-7)).view(x.shape[0], -1)
            return torch.nn.functional.normalize(out, dim=1)

        torch.manual_seed(0)
        x = torch.rand(4, 1, 32, 32)
        ref = torch_forward(x).detach().numpy()

        from kornia_tpu.feature.hardnet import HardNet, load_torch_weights
        params = load_torch_weights(dict(feats.state_dict()))
        ours = np.asarray(HardNet(params)(jnp.asarray(x.numpy())))
        np.testing.assert_allclose(ours, ref, atol=1e-4)
