"""Exact-architecture parity for OriNet / AffNet / the dominant-gradient
orientation estimator / the KeyNet multi-resolution detector against the
reference torch implementations."""

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


class TestOriNetParity:
    def test_forward(self):
        from kornia.feature import OriNet as TorchOriNet
        from kornia_tpu.feature.affnet import OriNet

        ref = TorchOriNet(pretrained=False).eval()
        _randomize(ref, 1)
        x = torch.rand(6, 1, 32, 32,
                       generator=torch.Generator().manual_seed(2))
        with torch.no_grad():
            want = ref(x).numpy()
        got = np.asarray(OriNet.from_torch(ref.state_dict())(
            jnp.asarray(x.numpy())))
        np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-3)


class TestAffNetParity:
    def test_net_forward(self):
        """The 3-output trunk on pre-extracted patches (bypasses patch
        sampling so the tolerance is tight)."""
        from kornia.feature import LAFAffNetShapeEstimator as TorchAffNet
        from kornia_tpu.feature.affnet import AffNet

        ref = TorchAffNet(pretrained=False).eval()
        _randomize(ref, 3)
        x = torch.rand(6, 1, 32, 32,
                       generator=torch.Generator().manual_seed(4))
        with torch.no_grad():
            want = ref.features(ref._normalize_input(x)).view(-1, 3).numpy()
        got = np.asarray(AffNet.from_torch(ref.state_dict())(
            jnp.asarray(x.numpy())))
        np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-3)

    def test_laf_estimator_end_to_end(self):
        from kornia.feature import LAFAffNetShapeEstimator as TorchAffNet
        from kornia_tpu.feature.affnet import LAFAffNetShapeEstimator

        ref = TorchAffNet(pretrained=False, preserve_orientation=False).eval()
        _randomize(ref, 5)
        g = torch.Generator().manual_seed(6)
        img = torch.rand(1, 1, 64, 64, generator=g)
        laf = torch.tensor(
            [[[[8.0, 0.0, 24.0], [0.0, 8.0, 20.0]],
              [[6.0, 0.0, 40.0], [0.0, 6.0, 40.0]]]])
        with torch.no_grad():
            want = ref(laf, img).numpy()
        mine = LAFAffNetShapeEstimator.from_torch(
            ref.state_dict(), preserve_orientation=False)
        got = np.asarray(mine(jnp.asarray(laf.numpy()),
                              jnp.asarray(img.numpy())))
        np.testing.assert_allclose(got, want, atol=5e-3, rtol=1e-2)


class TestDominantOrientationParity:
    def test_patch_dominant_gradient_orientation(self):
        from kornia.feature import (
            PatchDominantGradientOrientation as TorchPDGO)
        from kornia_tpu.feature.orientation import (
            patch_dominant_gradient_orientation)

        ref = TorchPDGO(32).eval()
        x = torch.rand(8, 1, 32, 32,
                       generator=torch.Generator().manual_seed(7))
        with torch.no_grad():
            want = ref(x).numpy()
        got = np.asarray(patch_dominant_gradient_orientation(
            jnp.asarray(x.numpy())))
        np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-3)

    def test_laf_orienter_additive(self):
        from kornia.feature import LAFOrienter as TorchLAFOrienter
        from kornia_tpu.feature.orientation import LAFOrienter

        ref = TorchLAFOrienter(19).eval()
        g = torch.Generator().manual_seed(8)
        img = torch.rand(1, 1, 64, 64, generator=g)
        laf = torch.tensor(
            [[[[8.0, 0.0, 30.0], [0.0, 8.0, 30.0]]]])
        with torch.no_grad():
            want = ref(laf, img).numpy()
        got = np.asarray(LAFOrienter(19)(jnp.asarray(laf.numpy()),
                                         jnp.asarray(img.numpy())))
        np.testing.assert_allclose(got, want, atol=5e-2, rtol=5e-2)


class TestKeyNetDetectorParity:
    def test_detections(self):
        """Valid keypoint locations/scores vs the reference
        KeyNetDetector on the same random-init KeyNet weights."""
        from kornia.feature import KeyNetDetector as TorchKeyNetDetector
        from kornia_tpu.feature.descriptors import KeyNet
        from kornia_tpu.feature.multires_detector import KeyNetDetector

        ref = TorchKeyNetDetector(pretrained=False, num_features=64).eval()
        _randomize(ref.model, 9)
        g = torch.Generator().manual_seed(10)
        img = torch.rand(1, 1, 96, 96, generator=g)
        with torch.no_grad():
            ref_lafs, ref_resp = ref(img)
        keynet = KeyNet.from_torch(ref.model.state_dict())
        mine = KeyNetDetector(keynet.params, num_features=64)
        lafs, resp, valid = mine(jnp.asarray(img.numpy()))
        n_valid = int(np.asarray(valid).sum())
        n_ref = ref_lafs.shape[1]
        # fixed-K padding: our valid count must cover the reference set
        assert abs(n_valid - n_ref) <= max(3, int(0.1 * n_ref))
        k = min(n_valid, n_ref, 32)
        got_xy = np.asarray(lafs)[0, :k, :, 2]
        want_xy = ref_lafs[0, :k, :, 2].numpy()
        np.testing.assert_allclose(got_xy, want_xy, atol=1.5)
        np.testing.assert_allclose(np.asarray(resp)[0, :k],
                                   ref_resp.view(1, -1)[0, :k].numpy(),
                                   atol=1e-3, rtol=1e-2)
