"""Parity batch 3 (VERDICT r4 item 6 — remaining aug corners): exact
injected-parameter parity vs reference kornia for the deterministic
filter/intensity ops and the two table-indexed samplers that earlier
sweeps skipped: AutoContrast, BoxBlur, MedianBlur, ChannelDropout,
PlanckianJitter."""

import sys
import types

import numpy as np
import pytest

sys.path.append("/root/reference")
sys.modules.setdefault("kornia_rs", types.ModuleType("kornia_rs"))

torch = pytest.importorskip("torch")
kornia = pytest.importorskip("kornia")
import kornia.augmentation as KA

import jax.numpy as jnp

import kornia_tpu.augmentation as A

pytestmark = pytest.mark.slow  # torch-parity leg: run with --runslow

B = 2
rng = np.random.default_rng(23)
IMG = rng.random((B, 3, 24, 24)).astype(np.float32)
_TRUE = jnp.ones((B,), bool)


def _drop_translate(p):
    """reference channel_idx (B, n) -> our (B, C) boolean drop mask."""
    C = IMG.shape[1]
    idx = p["channel_idx"].numpy().astype(int)
    drop = np.zeros((B, C), bool)
    for b in range(B):
        drop[b, idx[b]] = True
    return {"drop": jnp.asarray(drop)}


def _planckian_translate(p):
    from kornia_tpu.augmentation.intensity import _PLANCKIAN_BLACKBODY
    idx = p["idx"].numpy().astype(int)
    return {"gains": jnp.asarray(_PLANCKIAN_BLACKBODY)[idx]}


CASES = {
    "RandomAutoContrast": (
        lambda: KA.RandomAutoContrast(p=1.0),
        lambda: A.RandomAutoContrast(p=1.0),
        lambda p: {}, 1e-4),
    "RandomBoxBlur": (
        lambda: KA.RandomBoxBlur((3, 3), p=1.0),
        lambda: A.RandomBoxBlur((3, 3), p=1.0),
        lambda p: {}, 1e-5),
    "RandomMedianBlur": (
        lambda: KA.RandomMedianBlur((3, 3), p=1.0),
        lambda: A.RandomMedianBlur((3, 3), p=1.0),
        lambda p: {}, 1e-6),
    "RandomChannelDropout": (
        lambda: KA.RandomChannelDropout(p=1.0),
        lambda: A.RandomChannelDropout(p=1.0),
        _drop_translate, 1e-6),
    "RandomPlanckianJitter": (
        lambda: KA.RandomPlanckianJitter(p=1.0),
        lambda: A.RandomPlanckianJitter(p=1.0),
        _planckian_translate, 1e-4),  # f32 mul rounding; bug scale was 9e-2
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_aug_parity_batch3(name):
    make_ref, make_ours, translate, atol = CASES[name]
    ref = make_ref()
    with torch.no_grad():
        out_ref = ref(torch.from_numpy(IMG)).numpy()
    params = translate(ref._params)
    params["apply_mask"] = _TRUE
    out = np.asarray(make_ours()(jnp.asarray(IMG), params=params))
    assert out.shape == out_ref.shape, name
    d = np.abs(out - out_ref)
    assert d.max() < atol, f"{name}: max diff {d.max():.2e}"
