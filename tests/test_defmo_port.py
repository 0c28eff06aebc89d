"""DeFMO weight-port parity: reference torch DeFMO (random init,
randomized BN stats) vs our flax model through `load_torch_weights`
(VERDICT r2 missing-item 1; torch layout defmo.py:270-390)."""

import sys
import types

import numpy as np
import pytest

sys.path.append("/root/reference")
sys.modules.setdefault("kornia_rs", types.ModuleType("kornia_rs"))

torch = pytest.importorskip("torch")

import jax.numpy as jnp

pytestmark = pytest.mark.slow  # heavy leg: run with --runslow


def test_defmo_port():
    from kornia.feature.defmo import DeFMO as RefDeFMO

    from kornia_tpu.feature.defmo import DeFMO, load_torch_weights

    torch.manual_seed(0)
    ref = RefDeFMO(pretrained=False).eval()
    with torch.no_grad():
        for m in ref.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.1)
                m.running_var.uniform_(0.5, 1.5)
                m.weight.uniform_(0.5, 1.5)
                m.bias.normal_(0, 0.1)

    torch.manual_seed(1)
    img = torch.rand(1, 6, 32, 32)
    with torch.no_grad():
        want = ref(img).numpy()  # (1, 24, 4, 32, 32)

    model = DeFMO(params=load_torch_weights(dict(ref.state_dict())))
    got = np.asarray(model(jnp.asarray(img.numpy())))
    np.testing.assert_allclose(got, want, atol=2e-4)
