"""Weight-port manifest: every entry resolves, converts a synthetic
checkpoint, and round-trips through the .npz staging format."""

import numpy as np
import pytest

from kornia_tpu.weights import (MANIFEST, _resolve, import_checkpoint,
                                load_params, save_params)


def test_all_converters_resolve():
    for name, port in MANIFEST.items():
        fn = _resolve(port.converter)
        assert callable(fn), name


def test_import_checkpoint_end_to_end(tmp_path):
    """Synthetic HardNet torch checkpoint -> converter -> staged .npz ->
    load_params round-trip."""
    torch = pytest.importorskip("torch")
    import torch.nn as tnn

    layers = []
    chans = [(1, 32), (32, 32), (32, 64), (64, 64), (64, 128), (128, 128)]
    for cin, cout in chans:
        layers += [tnn.Conv2d(cin, cout, 3, padding=1, bias=False),
                   tnn.BatchNorm2d(cout, affine=False)]
        layers += [tnn.ReLU()]
    layers += [tnn.Conv2d(128, 128, 8, bias=False),
               tnn.BatchNorm2d(128, affine=False)]
    net = tnn.Sequential(*layers)
    sd = {f"features.{k}": v for k, v in net.state_dict().items()}
    ckpt = tmp_path / "hardnet.pth"
    torch.save(sd, ckpt)

    out = import_checkpoint("hardnet", str(ckpt),
                            str(tmp_path / "hardnet.npz"))
    params = load_params(out)
    assert "conv0_w" in params and params["conv0_w"].shape == (32, 1, 3, 3)

    # nested round-trip
    tree = {"a": {"b": np.ones((2, 3)), "c": np.zeros(4)}, "d": np.eye(2)}
    p = tmp_path / "tree.npz"
    save_params(tree, str(p))
    back = load_params(str(p))
    np.testing.assert_allclose(np.asarray(back["a"]["b"]), tree["a"]["b"])
    np.testing.assert_allclose(np.asarray(back["d"]), tree["d"])
