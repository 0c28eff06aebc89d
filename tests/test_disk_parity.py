"""Exact-architecture parity for DISK against the reference torch
implementation (random init; the published checkpoints load through the
same `DISK.from_torch` path)."""

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
    from kornia.feature import DISK as TorchDISK
    torch.manual_seed(21)
    net = TorchDISK().eval()
    g = torch.Generator().manual_seed(22)
    with torch.no_grad():
        for p in net.parameters():
            p.normal_(0, 0.2, generator=g)
    return net


def test_dense_parity(ref):
    from kornia_tpu.feature.disk import DISK
    x = torch.rand(2, 3, 64, 48, generator=torch.Generator().manual_seed(23))
    with torch.no_grad():
        want_heat, want_desc = ref.heatmap_and_dense_descriptors(x)
    got = DISK.from_torch(ref.state_dict())
    heat, desc = got.heatmap_and_dense_descriptors(jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(heat), want_heat.numpy(),
                               atol=1e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(desc), want_desc.numpy(),
                               atol=1e-4, rtol=1e-3)


def test_keypoint_extraction_parity(ref):
    """Fixed-K extraction keeps the same keypoints/scores as the
    reference's variable-length protocol (up to score ordering)."""
    from kornia_tpu.feature.disk import DISK
    x = torch.rand(1, 3, 64, 64, generator=torch.Generator().manual_seed(24))
    with torch.no_grad():
        want = ref(x, n=32, window_size=5, score_threshold=0.0)[0]
    got = DISK.from_torch(ref.state_dict())(
        jnp.asarray(x.numpy()), n=32, window_size=5, score_threshold=0.0)
    n_valid = int(np.asarray(got.valid[0]).sum())
    assert abs(n_valid - want.keypoints.shape[0]) <= 1  # kthvalue tie slack
    # compare as sets sorted by score
    want_order = np.argsort(-want.detection_scores.numpy())
    want_kp = want.keypoints.numpy()[want_order]
    got_kp = np.asarray(got.keypoints[0])[:n_valid]
    m = min(n_valid, want_kp.shape[0])
    np.testing.assert_allclose(got_kp[:m], want_kp[:m], atol=0.5)
    # descriptors at those locations match
    want_desc = want.descriptors.numpy()[want_order]
    got_desc = np.asarray(got.descriptors[0])[:m]
    np.testing.assert_allclose(got_desc, want_desc[:m], atol=1e-3, rtol=1e-2)
