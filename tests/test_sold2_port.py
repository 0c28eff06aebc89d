"""SOLD2 weight-port parity: reference torch SOLD2Net (random init,
randomized BN stats) vs our flax SOLD2Net through `load_torch_weights`
(VERDICT r2 missing-item 1; torch layout backbones.py:244-522)."""

import sys
import types

import numpy as np
import pytest

sys.path.append("/root/reference")
sys.modules.setdefault("kornia_rs", types.ModuleType("kornia_rs"))

torch = pytest.importorskip("torch")

import jax.numpy as jnp

pytestmark = pytest.mark.slow  # heavy leg: run with --runslow


def test_sold2net_port():
    from kornia.feature.sold2.backbones import SOLD2Net as RefNet

    from kornia_tpu.feature.sold2 import SOLD2Net, load_torch_weights

    cfg = {"backbone_cfg": {"input_channel": 1, "depth": 4, "num_stacks": 2,
                            "num_blocks": 1, "num_classes": 5},
           "grid_size": 8, "use_descriptor": True}
    torch.manual_seed(0)
    ref = RefNet(cfg).eval()
    with torch.no_grad():
        for m in ref.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.1)
                m.running_var.uniform_(0.5, 1.5)
                m.weight.uniform_(0.5, 1.5)
                m.bias.normal_(0, 0.1)

    torch.manual_seed(1)
    img = torch.rand(1, 1, 64, 64)
    with torch.no_grad():
        out_ref = ref(img)
        junc_ref = out_ref["junctions"].numpy()
        heat_ref = out_ref["heatmap"].numpy()  # decoder softmaxes internally
        desc_ref = out_ref["descriptors"].numpy()

    variables = load_torch_weights(dict(ref.state_dict()))
    x = jnp.transpose(jnp.asarray(img.numpy()), (0, 2, 3, 1))
    out = SOLD2Net().apply(variables, x)
    np.testing.assert_allclose(np.asarray(out["junctions"]), junc_ref,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(out["heatmap"]), heat_ref,
                               atol=1e-4)
    np.testing.assert_allclose(
        np.transpose(np.asarray(out["dense_desc"]), (0, 3, 1, 2)), desc_ref,
        atol=1e-4)
