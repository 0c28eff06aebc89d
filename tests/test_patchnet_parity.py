"""Exact-architecture parity for the patch-descriptor nets (TFeat, SOSNet,
HyNet) and the Key.Net response against the reference torch
implementations (random init + randomized norm stats; published
checkpoints load through the same `from_torch` path)."""

import sys
import types

import numpy as np
import pytest

sys.path.append("/root/reference")  # append: /root/reference/tests must not shadow our tests/ package
sys.modules.setdefault("kornia_rs", types.ModuleType("kornia_rs"))

torch = pytest.importorskip("torch")

import jax.numpy as jnp

pytestmark = pytest.mark.slow  # heavy leg: run with --runslow


def _randomize(module, seed):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in module.parameters():
            p.normal_(0, 0.5, generator=g)
        for m in module.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.2, generator=g)
                m.running_var.uniform_(0.5, 1.5, generator=g)


class TestTFeatParity:
    def test_forward(self):
        from kornia.feature import TFeat as TorchTFeat
        from kornia_tpu.feature.descriptors import TFeat

        torch.manual_seed(0)
        ref = TorchTFeat(pretrained=False).eval()
        _randomize(ref, 1)
        x = torch.rand(4, 1, 32, 32, generator=torch.Generator().manual_seed(2))
        with torch.no_grad():
            want = ref(x).numpy()
        got = np.asarray(TFeat.from_torch(ref.state_dict())(
            jnp.asarray(x.numpy())))
        np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-3)


class TestSOSNetParity:
    def test_forward(self):
        from kornia.feature import SOSNet as TorchSOSNet
        from kornia_tpu.feature.descriptors import SOSNet

        torch.manual_seed(3)
        ref = TorchSOSNet(pretrained=False).eval()
        _randomize(ref, 4)
        x = torch.rand(4, 1, 32, 32, generator=torch.Generator().manual_seed(5))
        with torch.no_grad():
            want = ref(x).numpy()
        got = np.asarray(SOSNet.from_torch(ref.state_dict())(
            jnp.asarray(x.numpy())))
        np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-3)


class TestHyNetParity:
    def test_forward(self):
        from kornia.feature import HyNet as TorchHyNet
        from kornia_tpu.feature.descriptors import HyNet

        torch.manual_seed(6)
        ref = TorchHyNet(pretrained=False).eval()
        _randomize(ref, 7)
        x = torch.rand(4, 1, 32, 32, generator=torch.Generator().manual_seed(8))
        with torch.no_grad():
            want = ref(x).numpy()
        got = np.asarray(HyNet.from_torch(ref.state_dict())(
            jnp.asarray(x.numpy())))
        np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-3)


class TestKeyNetParity:
    def test_response(self):
        from kornia.feature.keynet import KeyNet as TorchKeyNet
        from kornia_tpu.feature.descriptors import KeyNet

        torch.manual_seed(9)
        ref = TorchKeyNet(pretrained=False).eval()
        _randomize(ref, 10)
        x = torch.rand(2, 1, 64, 48, generator=torch.Generator().manual_seed(11))
        with torch.no_grad():
            want = ref(x).numpy()
        got = np.asarray(KeyNet.from_torch(ref.state_dict())(
            jnp.asarray(x.numpy())))
        np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-3)
