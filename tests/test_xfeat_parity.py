"""Exact-architecture parity for XFeat against the reference torch
implementation (random init; `xfeat.pt` loads through the same
`XFeat.from_torch` path)."""

import sys
import types

import numpy as np
import pytest

sys.path.append("/root/reference")  # append: /root/reference/tests must not shadow our tests/ package
sys.modules.setdefault("kornia_rs", types.ModuleType("kornia_rs"))

torch = pytest.importorskip("torch")

import jax.numpy as jnp

pytestmark = pytest.mark.slow  # heavy leg: run with --runslow


@pytest.fixture(scope="module")
def ref():
    from kornia.feature.xfeat import XFeat as TorchXFeat
    torch.manual_seed(31)
    net = TorchXFeat().eval()
    g = torch.Generator().manual_seed(32)
    with torch.no_grad():
        for p in net.parameters():
            # ~unit-gain random weights: larger stds amplify f32 noise
            # exponentially through the 20-conv stack and swamp the
            # architecture comparison
            std = (1.0 / (p.shape[1] * p.shape[2] * p.shape[3]) ** 0.5
                   if p.ndim == 4 else 0.05)
            p.normal_(0, std, generator=g)
        for m in net.modules():
            if isinstance(m, (torch.nn.BatchNorm2d, torch.nn.BatchNorm1d)):
                m.running_mean.normal_(0, 0.2, generator=g)
                m.running_var.uniform_(0.5, 1.5, generator=g)
    return net


def test_backbone_parity(ref):
    from kornia_tpu.feature.xfeat import XFeat, xfeat_model
    x = torch.rand(2, 3, 64, 96, generator=torch.Generator().manual_seed(33))
    with torch.no_grad():
        want_f, want_k, want_h = ref.net(x)
    got = XFeat.from_torch(ref.net.state_dict())
    f, k, h = xfeat_model(got.params, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(f), want_f.numpy(), atol=1e-4,
                               rtol=1e-3)
    np.testing.assert_allclose(np.asarray(k), want_k.numpy(), atol=1e-4,
                               rtol=1e-3)
    np.testing.assert_allclose(np.asarray(h), want_h.numpy(), atol=1e-5,
                               rtol=1e-4)


def test_detect_and_compute_parity(ref):
    from kornia_tpu.feature.xfeat import XFeat
    x = torch.rand(1, 3, 64, 64, generator=torch.Generator().manual_seed(34))
    with torch.no_grad():
        want = ref.detectAndCompute(x, top_k=48, detection_threshold=1e-4)[0]
    got = XFeat.from_torch(ref.net.state_dict())
    out = got.detectAndCompute(jnp.asarray(x.numpy()), top_k=48,
                               detection_threshold=1e-4)
    n_valid = int(np.asarray(out["valid"][0]).sum())
    n_want = want["keypoints"].shape[0]
    assert n_valid == min(48, n_want)
    m = min(n_valid, n_want)
    np.testing.assert_allclose(np.asarray(out["keypoints"][0])[:m],
                               want["keypoints"].numpy()[:m], atol=1e-3)
    np.testing.assert_allclose(np.asarray(out["scores"][0])[:m],
                               want["scores"].numpy()[:m], atol=1e-4,
                               rtol=1e-3)
    np.testing.assert_allclose(np.asarray(out["descriptors"][0])[:m],
                               want["descriptors"].numpy()[:m], atol=1e-3,
                               rtol=1e-2)


def test_dense_and_star_parity(ref):
    from kornia_tpu.feature.xfeat import XFeat
    x0 = torch.rand(1, 3, 64, 64, generator=torch.Generator().manual_seed(35))
    with torch.no_grad():
        want = ref.detectAndComputeDense(x0, top_k=64)
    got = XFeat.from_torch(ref.net.state_dict())
    out = got.detectAndComputeDense(jnp.asarray(x0.numpy()), top_k=64)
    # keypoint sets agree (top-k by reliability; ordering may permute ties)
    np.testing.assert_allclose(np.asarray(out["scales"]),
                               want["scales"].numpy(), atol=1e-6)
    w_set = {tuple(v) for v in want["keypoints"][0].numpy().round(3)}
    g_set = {tuple(v) for v in np.asarray(out["keypoints"][0]).round(3)}
    assert len(w_set & g_set) >= int(0.95 * len(w_set))


def test_fine_matcher_parity(ref):
    from kornia_tpu.feature.xfeat import XFeat
    z = torch.randn(16, 128, generator=torch.Generator().manual_seed(36))
    with torch.no_grad():
        want = ref.net.fine_matcher(z).numpy()
    got = XFeat.from_torch(ref.net.state_dict())
    out = got._fine_matcher(jnp.asarray(z.numpy()))
    np.testing.assert_allclose(np.asarray(out), want, atol=1e-4, rtol=1e-3)
