"""ALIKED weight-port parity: reference torch ALIKED (random init,
randomized BN) vs our flax model through `load_torch_weights`
(VERDICT r2 missing-item 1; torch layout: aliked.py:520-836)."""

import sys
import types

import numpy as np
import pytest

sys.path.append("/root/reference")
sys.modules.setdefault("kornia_rs", types.ModuleType("kornia_rs"))

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.slow  # heavy leg: run with --runslow


@pytest.fixture(scope="module")
def ref_model():
    from kornia.feature.aliked.aliked import ALIKED as RefALIKED

    torch.manual_seed(0)
    m = RefALIKED("aliked-t16").eval()
    with torch.no_grad():
        for mod in m.modules():
            if isinstance(mod, torch.nn.BatchNorm2d):
                mod.running_mean.normal_(0, 0.1)
                mod.running_var.uniform_(0.5, 1.5)
                mod.weight.uniform_(0.5, 1.5)
                mod.bias.normal_(0, 0.1)
    return m


def test_dense_map_port(ref_model):
    from kornia_tpu.feature.aliked import ALIKEDNet, load_torch_weights

    torch.manual_seed(1)
    img = torch.rand(1, 3, 64, 64)
    with torch.no_grad():
        feat_ref, score_ref = ref_model.extract_dense_map(img)

    variables = load_torch_weights(dict(ref_model.state_dict()),
                                   "aliked-t16")
    net_vars = {"params": variables["params"]["net"],
                "batch_stats": variables["batch_stats"]["net"]}
    x = jnp.transpose(jnp.asarray(img.numpy()), (0, 2, 3, 1))
    feat, score = ALIKEDNet("aliked-t16").apply(net_vars, x)
    np.testing.assert_allclose(np.asarray(score),
                               score_ref.numpy()[:, 0], atol=1e-4)
    np.testing.assert_allclose(np.transpose(np.asarray(feat), (0, 3, 1, 2)),
                               feat_ref.numpy(), atol=1e-4)


def test_sddh_port(ref_model):
    from kornia_tpu.feature.aliked import SDDH, load_torch_weights

    torch.manual_seed(2)
    C, H, W = 64, 32, 32
    fmap = torch.rand(1, C, H, W) - 0.5
    kps = torch.rand(12, 2) * 1.2 - 0.6  # normalized [-1, 1]
    with torch.no_grad():
        descs_ref, _ = ref_model.desc_head(fmap, [kps])

    variables = load_torch_weights(dict(ref_model.state_dict()),
                                   "aliked-t16")
    sddh = SDDH(dims=C, kernel_size=3, n_pos=16)
    x = jnp.transpose(jnp.asarray(fmap.numpy()), (0, 2, 3, 1))
    desc, _ = sddh.apply({"params": variables["params"]["desc_head"]},
                         x, jnp.asarray(kps.numpy())[None])
    np.testing.assert_allclose(np.asarray(desc[0]), descs_ref[0].numpy(),
                               atol=1e-4)
