"""Exact-architecture parity for LoFTR against the reference torch
implementation (random near-unit-gain init; the published outdoor/indoor
checkpoints load through the same `LoFTR.from_torch` path)."""

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
    from kornia.feature.loftr import LoFTR as TorchLoFTR
    torch.manual_seed(41)
    net = TorchLoFTR(pretrained=None).eval()
    g = torch.Generator().manual_seed(42)
    with torch.no_grad():
        for p in net.parameters():
            std = (1.0 / (p.shape[1] * p.shape[2] * p.shape[3]) ** 0.5
                   if p.ndim == 4 else
                   1.0 / p.shape[-1] ** 0.5 if p.ndim == 2 else 0.05)
            p.normal_(0, std, generator=g)
        for m in net.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.1, generator=g)
                m.running_var.uniform_(0.8, 1.2, generator=g)
            if isinstance(m, torch.nn.LayerNorm):
                m.weight.uniform_(0.8, 1.2, generator=g)
                m.bias.normal_(0, 0.05, generator=g)
    return net


def _jax_model(ref):
    from kornia_tpu.feature.loftr import LoFTR, LoFTRConfig
    return LoFTR.from_torch(ref.state_dict(),
                            LoFTRConfig(top_k=64, thr=1e-8))


def test_backbone_parity(ref):
    from kornia_tpu.feature.loftr import loftr_backbone
    x = torch.rand(1, 1, 64, 96, generator=torch.Generator().manual_seed(43))
    with torch.no_grad():
        want_c, want_f = ref.backbone(x)
    m = _jax_model(ref)
    c, f = loftr_backbone(m.params, m.cfg, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(jnp.transpose(c, (0, 3, 1, 2))),
                               want_c.numpy(), atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(jnp.transpose(f, (0, 3, 1, 2))),
                               want_f.numpy(), atol=2e-4, rtol=1e-3)


def test_position_encoding_parity(ref):
    from kornia_tpu.feature.loftr import position_encoding
    with torch.no_grad():
        want = ref.pos_encoding.pe[:, :, :8, :12].numpy()
    got = position_encoding(256, (8, 12), temp_bug_fix=False)
    np.testing.assert_allclose(
        np.asarray(jnp.transpose(got, (0, 3, 1, 2))), want, atol=1e-6)


def test_coarse_transformer_parity(ref):
    from kornia_tpu.feature.loftr import _transformer
    m = _jax_model(ref)
    g = torch.Generator().manual_seed(44)
    f0 = torch.randn(1, 48, 256, generator=g)
    f1 = torch.randn(1, 40, 256, generator=g)
    with torch.no_grad():
        want0, want1 = ref.loftr_coarse(f0, f1)
    got0, got1 = _transformer(m.params, "loftr_coarse", 4, 8,
                              jnp.asarray(f0.numpy()),
                              jnp.asarray(f1.numpy()))
    np.testing.assert_allclose(np.asarray(got0), want0.numpy(), atol=1e-4,
                               rtol=1e-3)
    np.testing.assert_allclose(np.asarray(got1), want1.numpy(), atol=1e-4,
                               rtol=1e-3)


def test_full_forward_parity(ref):
    """Fixed-K output contains the reference's kept matches with matching
    refined coordinates and confidences."""
    g = torch.Generator().manual_seed(45)
    x0 = torch.rand(1, 1, 64, 64, generator=g)
    x1 = torch.rand(1, 1, 64, 64, generator=g)
    # lower the reference threshold so random-weight confidences survive
    ref.coarse_matching.thr = 1e-8
    with torch.no_grad():
        want = ref({"image0": x0, "image1": x1})
    m = _jax_model(ref)
    out = m({"image0": jnp.asarray(x0.numpy()),
             "image1": jnp.asarray(x1.numpy())})
    valid = np.asarray(out["valid"][0])
    got_k0 = np.asarray(out["keypoints0"][0])[valid]
    got_k1 = np.asarray(out["keypoints1"][0])[valid]
    got_conf = np.asarray(out["confidence"][0])[valid]
    want_k0 = want["keypoints0"].numpy()
    n = want_k0.shape[0]
    assert n > 0
    assert valid.sum() == min(n, 64)
    # match by keypoint0 coordinates (coarse grid positions are exact)
    order_w = np.lexsort((want_k0[:, 1], want_k0[:, 0]))
    order_g = np.lexsort((got_k0[:, 1], got_k0[:, 0]))
    mN = min(n, valid.sum())
    np.testing.assert_allclose(got_k0[order_g][:mN], want_k0[order_w][:mN],
                               atol=1e-3)
    np.testing.assert_allclose(got_conf[order_g][:mN],
                               want["confidence"].numpy()[order_w][:mN],
                               atol=1e-5, rtol=1e-3)
    np.testing.assert_allclose(got_k1[order_g][:mN],
                               want["keypoints1"].numpy()[order_w][:mN],
                               atol=0.05)
