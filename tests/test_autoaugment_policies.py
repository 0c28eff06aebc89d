"""AutoAugment policy tables must match the reference ENTRY-FOR-ENTRY
(reference: kornia/augmentation/auto/autoaugment/autoaugment.py:30-114),
and the Operation wrapper must carry gradients through its magnitude
(reference OperationBase, auto/operations/base.py:30)."""

import sys
import types

import numpy as np
import pytest

sys.path.append("/root/reference")
sys.modules.setdefault("kornia_rs", types.ModuleType("kornia_rs"))

import jax
import jax.numpy as jnp

from kornia_tpu.augmentation.auto import (AutoAugment, CIFAR10_POLICY,
                                          IMAGENET_POLICY, Operation,
                                          SVHN_POLICY, _AA_FNS)


@pytest.mark.parametrize("name,ours", [
    ("imagenet_policy", IMAGENET_POLICY),
    ("cifar10_policy", CIFAR10_POLICY),
    ("svhn_policy", SVHN_POLICY),
])
def test_policy_tables_match_reference(name, ours):
    ref_mod = pytest.importorskip(
        "kornia.augmentation.auto.autoaugment.autoaugment")
    ref = getattr(ref_mod, name)
    assert len(ours) == len(ref) == 25
    for sp_ours, sp_ref in zip(ours, ref):
        assert len(sp_ours) == len(sp_ref)
        for (n_o, p_o, l_o), (n_r, p_r, l_r) in zip(sp_ours, sp_ref):
            assert n_o == n_r
            assert p_o == pytest.approx(p_r)
            assert l_o == l_r


@pytest.mark.parametrize("policy", ["imagenet", "cifar10", "svhn"])
def test_autoaugment_runs(policy):
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, 3, 16, 16))
    y = jax.jit(AutoAugment(policy))(x, jax.random.PRNGKey(1))
    assert y.shape == x.shape
    assert bool(jnp.all(jnp.isfinite(y)))


@pytest.mark.parametrize("op_name,mag", [
    ("rotate", 10.0), ("brightness", 1.2), ("contrast", 0.8),
    ("shear_x", 20.0), ("color", 1.3),
])
def test_operation_grad_through_magnitude(op_name, mag):
    x = jax.random.uniform(jax.random.PRNGKey(3), (2, 3, 12, 12),
                           minval=0.1, maxval=0.9)
    op = Operation(op_name, _AA_FNS[op_name], probability=1.0)
    g = jax.grad(lambda m: jnp.sum(
        op(x, jax.random.PRNGKey(4), magnitude=m) ** 2))(jnp.asarray(mag))
    assert np.isfinite(float(g))
    assert abs(float(g)) > 0.0
