"""Exact-architecture parity for LightGlue against the reference torch
implementation (random init; published checkpoints load through the same
`LightGlue.from_torch` path)."""

import sys
import types

import numpy as np
import pytest

sys.path.append("/root/reference")  # append: /root/reference/tests must not shadow our tests/ package
sys.modules.setdefault("kornia_rs", types.ModuleType("kornia_rs"))

torch = pytest.importorskip("torch")

import jax.numpy as jnp

pytestmark = pytest.mark.slow  # heavy leg: run with --runslow


def _make_ref(**conf):
    from kornia.feature.lightglue import LightGlue as TorchLG
    torch.manual_seed(51)
    net = TorchLG(features=None, flash=False, depth_confidence=-1,
                  width_confidence=-1, **conf).eval()
    g = torch.Generator().manual_seed(52)
    with torch.no_grad():
        for p in net.parameters():
            p.normal_(0, 1.0 / max(p.shape[-1], 2) ** 0.5, generator=g)
    return net


@pytest.fixture(scope="module")
def ref():
    # small config keeps CPU attention fast; same code path as the 256-dim
    # 9-layer published models
    return _make_ref(input_dim=64, descriptor_dim=64, n_layers=3, num_heads=4)


def _inputs(m=24, n=20, dim=64, seed=53):
    g = torch.Generator().manual_seed(seed)
    kp0 = torch.rand(1, m, 2, generator=g) * torch.tensor([64.0, 48.0])
    kp1 = torch.rand(1, n, 2, generator=g) * torch.tensor([64.0, 48.0])
    d0 = torch.nn.functional.normalize(torch.randn(1, m, dim, generator=g),
                                       dim=-1)
    d1 = torch.nn.functional.normalize(torch.randn(1, n, dim, generator=g),
                                       dim=-1)
    size = torch.tensor([[64.0, 48.0]])
    return kp0, kp1, d0, d1, size


def test_full_forward_parity(ref):
    from kornia_tpu.feature.lightglue import LightGlue, LightGlueConfig
    kp0, kp1, d0, d1, size = _inputs()
    with torch.no_grad():
        want = ref({"image0": {"keypoints": kp0, "descriptors": d0,
                               "image_size": size},
                    "image1": {"keypoints": kp1, "descriptors": d1,
                               "image_size": size}})
    cfg = LightGlueConfig(input_dim=64, descriptor_dim=64, n_layers=3,
                          num_heads=4)
    lg = LightGlue.from_torch(ref.state_dict(), cfg)
    got = lg({"image0": {"keypoints": jnp.asarray(kp0.numpy()),
                         "descriptors": jnp.asarray(d0.numpy()),
                         "image_size": jnp.asarray(size.numpy())},
              "image1": {"keypoints": jnp.asarray(kp1.numpy()),
                         "descriptors": jnp.asarray(d1.numpy()),
                         "image_size": jnp.asarray(size.numpy())}})
    np.testing.assert_allclose(np.asarray(got["log_assignment"]),
                               want["log_assignment"].numpy(), atol=1e-4,
                               rtol=1e-3)
    np.testing.assert_array_equal(np.asarray(got["matches0"]),
                                  want["matches0"].numpy())
    np.testing.assert_array_equal(np.asarray(got["matches1"]),
                                  want["matches1"].numpy())
    np.testing.assert_allclose(np.asarray(got["matching_scores0"]),
                               want["matching_scores0"].numpy(), atol=1e-5,
                               rtol=1e-3)


def test_input_proj_and_scale_ori():
    """disk-style projection (128→64) + sift-style scale/ori channels."""
    from kornia_tpu.feature.lightglue import LightGlue, LightGlueConfig
    ref = _make_ref(input_dim=128, descriptor_dim=64, n_layers=2,
                    num_heads=4, add_scale_ori=True)
    g = torch.Generator().manual_seed(54)
    kp0, kp1, _, _, size = _inputs(16, 12)
    d0 = torch.randn(1, 16, 128, generator=g)
    d1 = torch.randn(1, 12, 128, generator=g)
    s0 = torch.rand(1, 16, generator=g) + 0.5
    s1 = torch.rand(1, 12, generator=g) + 0.5
    o0 = torch.rand(1, 16, generator=g) * 6.28
    o1 = torch.rand(1, 12, generator=g) * 6.28
    with torch.no_grad():
        want = ref({"image0": {"keypoints": kp0, "descriptors": d0,
                               "image_size": size, "scales": s0, "oris": o0},
                    "image1": {"keypoints": kp1, "descriptors": d1,
                               "image_size": size, "scales": s1, "oris": o1}})
    cfg = LightGlueConfig(input_dim=128, descriptor_dim=64, n_layers=2,
                          num_heads=4, add_scale_ori=True)
    lg = LightGlue.from_torch(ref.state_dict(), cfg)
    j = jnp.asarray
    got = lg({"image0": {"keypoints": j(kp0.numpy()),
                         "descriptors": j(d0.numpy()),
                         "image_size": j(size.numpy()),
                         "scales": j(s0.numpy()), "oris": j(o0.numpy())},
              "image1": {"keypoints": j(kp1.numpy()),
                         "descriptors": j(d1.numpy()),
                         "image_size": j(size.numpy()),
                         "scales": j(s1.numpy()), "oris": j(o1.numpy())}})
    np.testing.assert_allclose(np.asarray(got["log_assignment"]),
                               want["log_assignment"].numpy(), atol=1e-4,
                               rtol=1e-3)
    np.testing.assert_array_equal(np.asarray(got["matches0"]),
                                  want["matches0"].numpy())
