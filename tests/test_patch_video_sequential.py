"""PatchSequential / VideoSequential reference semantics (VERDICT r2
item 5): per-patch replayable param records, the reference's sampling
modes, and injected-param parity against kornia's containers
(reference: kornia/augmentation/container/patch.py:39, video.py:452)."""

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
from kornia_tpu.augmentation.video import (PatchParamItem, PatchSequential,
                                           VideoSequential)

rng = np.random.default_rng(11)


class TestPatchSequential:
    def test_extract_restore_roundtrip(self):
        x = jnp.arange(16.0).reshape(1, 1, 4, 4)
        ps = PatchSequential(A.RandomBrightness(p=1.0), grid_size=2)
        patches = ps.extract_patches(x)
        # reference ordering (patch.py:196 docstring): row-major grid
        np.testing.assert_allclose(np.asarray(patches[0, 0, 0]),
                                   [[0, 1], [4, 5]])
        np.testing.assert_allclose(np.asarray(patches[0, 1, 0]),
                                   [[2, 3], [6, 7]])
        back = ps.restore_from_patches(patches)
        np.testing.assert_allclose(np.asarray(back), np.asarray(x))

    def test_valid_padding_crops_center(self):
        x = jnp.arange(54.0).reshape(1, 1, 6, 9)
        ps = PatchSequential(A.RandomBrightness(p=1.0), grid_size=2,
                             padding="valid")
        # reference doctest (patch.py:219): explicit crop pad
        patches = ps.extract_patches(x, pad=(-1, -1, -2, -2))
        np.testing.assert_allclose(np.asarray(patches[0, 0, 0]),
                                   [[19, 20, 21]])
        np.testing.assert_allclose(np.asarray(patches[0, 3, 0]),
                                   [[31, 32, 33]])
        # compute_padding matches the reference formula (patch.py:172)
        assert ps.compute_padding((6, 9)) == (-2, -2, -2, -2)

    def test_per_patch_params_differ_and_replay(self):
        x = jnp.asarray(rng.random((2, 3, 16, 16)), jnp.float32)
        ps = PatchSequential(A.RandomBrightness(brightness=(0.5, 1.5),
                                                p=1.0), grid_size=2)
        out1 = ps(x, key=jax.random.PRNGKey(3))
        recs = ps._params
        assert len(recs) == 2 * 4  # one per (batch, patch)
        factors = [float(np.asarray(r.data["factor"]).reshape(-1)[0])
                   for r in recs]
        assert len(set(np.round(factors, 6))) > 1, "patches share params"
        out2 = ps(x, params=recs)  # exact replay
        np.testing.assert_allclose(np.asarray(out1), np.asarray(out2))

    def test_same_on_batch_shares_across_batch(self):
        one = rng.random((1, 3, 8, 8)).astype(np.float32)
        x = jnp.asarray(np.repeat(one, 3, 0))  # identical batch images
        ps = PatchSequential(A.RandomBrightness(brightness=(0.5, 1.5),
                                                p=1.0), grid_size=2,
                             same_on_batch=True)
        out = ps(x, key=jax.random.PRNGKey(0))
        recs = ps._params
        assert len(recs) == 4  # one per LOCATION
        for r in recs:
            assert len(r.indices) == 3  # covers the whole batch
        # identical inputs + location-shared params -> identical outputs
        np.testing.assert_allclose(np.asarray(out[0]), np.asarray(out[1]),
                                   atol=1e-6)

    def test_patchwise_apply_assigns_op_per_location(self):
        x = jnp.asarray(rng.random((1, 3, 8, 8)), jnp.float32)
        ps = PatchSequential(A.RandomBrightness(p=1.0),
                             A.RandomContrast(p=1.0),
                             A.RandomSaturation(p=1.0),
                             A.RandomGamma(p=1.0),
                             grid_size=2, patchwise_apply=True)
        ps(x, key=jax.random.PRNGKey(1))
        assert [r.op_index for r in ps._params] == [0, 1, 2, 3]

    def test_intensity_inverse_is_identity_geometric_raises(self):
        x = jnp.asarray(rng.random((1, 3, 8, 8)), jnp.float32)
        ps = PatchSequential(A.RandomBrightness(p=1.0), grid_size=2)
        np.testing.assert_allclose(np.asarray(ps.inverse(x)), np.asarray(x))
        ps_geo = PatchSequential(A.RandomHorizontalFlip(p=1.0), grid_size=2)
        with pytest.raises(NotImplementedError):
            ps_geo.inverse(x)

    def test_reference_parity_injected_params(self):
        """Reference PatchSequential forward with ITS sampled per-patch
        params -> identical output from ours via converted records."""
        import kornia.augmentation as KA

        img = rng.random((2, 3, 16, 16)).astype(np.float32)
        ref = KA.PatchSequential(
            KA.RandomBrightness(brightness=(0.6, 1.4), p=1.0),
            KA.RandomContrast(contrast=(0.7, 1.3), p=1.0),
            grid_size=(2, 2), patchwise_apply=False, same_on_batch=False)
        with torch.no_grad():
            r_out = ref(torch.from_numpy(img)).numpy()

        name_to_idx = {"RandomBrightness": 0, "RandomContrast": 1}
        key_of = {0: "brightness_factor", 1: "contrast_factor"}
        ours = PatchSequential(
            A.RandomBrightness(brightness=(0.6, 1.4), p=1.0),
            A.RandomContrast(contrast=(0.7, 1.3), p=1.0), grid_size=2)
        recs = []
        for item in ref._params:
            op_i = name_to_idx[item.param.name.split("_")[0]]
            fac = item.param.data[key_of[op_i]].numpy().reshape(-1)
            n = len(item.indices)
            recs.append(PatchParamItem(
                tuple(item.indices), op_i,
                {"factor": jnp.asarray(np.broadcast_to(fac, (n,)).copy()),
                 "apply_mask": jnp.ones((n,), bool)}))
        o_out = ours(jnp.asarray(img), params=recs)
        np.testing.assert_allclose(np.asarray(o_out), r_out, atol=2e-5)


class TestVideoSequential:
    def test_same_on_frame_consistency(self):
        frame = rng.random((2, 1, 3, 8, 8)).astype(np.float32) * 0.5 + 0.2
        clip = jnp.asarray(np.repeat(frame, 4, 1))  # identical frames
        vs = VideoSequential(A.RandomBrightness(brightness=(0.7, 1.3),
                                                p=1.0))
        out = np.asarray(vs(clip, key=jax.random.PRNGKey(0)))
        assert out.shape == clip.shape
        # same params on every frame of a clip -> identical frame outputs
        assert np.allclose(out[0, 0], out[0, 3], atol=1e-6)
        assert np.allclose(out[1, 0], out[1, 2], atol=1e-6)
        # but the two clips drew different factors
        assert not np.allclose(out[0, 0] - frame[0, 0],
                               out[1, 0] - frame[1, 0], atol=1e-4)

    def test_bcthw_format(self):
        clip = jnp.asarray(rng.random((2, 3, 4, 8, 8)), jnp.float32)
        vs = VideoSequential(A.RandomHorizontalFlip(p=1.0),
                             data_format="BCTHW")
        out = vs(clip, key=jax.random.PRNGKey(0))
        assert out.shape == clip.shape
        np.testing.assert_allclose(np.asarray(out),
                                   np.asarray(clip)[..., ::-1], atol=1e-6)

    def test_inverse_roundtrip_geometric(self):
        # smooth gradient image: white noise would be destroyed by the two
        # bilinear resamplings regardless of inverse correctness
        yy, xx = np.meshgrid(np.linspace(0, 1, 16), np.linspace(0, 1, 16),
                             indexing="ij")
        img = (0.3 * yy + 0.5 * xx).astype(np.float32)
        clip = jnp.asarray(np.broadcast_to(img, (1, 3, 3, 16, 16)).copy())
        vs = VideoSequential(A.RandomRotation(degrees=25.0, p=1.0))
        out = vs(clip, key=jax.random.PRNGKey(2))
        back = vs.inverse(out)
        # interiors return (borders lose pixels to the rotation)
        d = np.abs(np.asarray(back) - np.asarray(clip))[..., 4:-4, 4:-4]
        assert np.quantile(d, 0.9) < 0.05, np.quantile(d, 0.9)

    def test_reference_parity_injected_params(self):
        import kornia.augmentation as KA

        clip = rng.random((2, 3, 3, 8, 8)).astype(np.float32)  # BCTHW
        ref = KA.VideoSequential(
            KA.RandomBrightness(brightness=(0.6, 1.4), p=1.0),
            data_format="BCTHW", same_on_frame=True)
        with torch.no_grad():
            r_out = ref(torch.from_numpy(clip)).numpy()
        item = ref._params[0]
        fac = item.data["brightness_factor"].numpy().reshape(-1)  # (B*T,)
        ours = VideoSequential(A.RandomBrightness(brightness=(0.6, 1.4),
                                                  p=1.0),
                               data_format="BCTHW")
        params = [{"factor": jnp.asarray(fac),
                   "apply_mask": jnp.ones((fac.shape[0],), bool)}]
        o_out = ours(jnp.asarray(clip), params=params)
        np.testing.assert_allclose(np.asarray(o_out), r_out, atol=2e-5)


class TestRound4Regressions:
    def test_patchwise_requires_op_list_tiling_grid(self):
        # reference constraint (patch.py:146-152)
        with pytest.raises(ValueError, match="equal with grid size"):
            PatchSequential(A.RandomBrightness(p=1.0), grid_size=2,
                            patchwise_apply=True)

    def test_patchwise_rejects_int_random_apply(self):
        # reference constraint (patch.py:154-155)
        with pytest.raises(ValueError, match="Only boolean"):
            PatchSequential(A.RandomBrightness(p=1.0),
                            A.RandomContrast(p=1.0),
                            A.RandomSaturation(p=1.0),
                            A.RandomGamma(p=1.0),
                            grid_size=2, patchwise_apply=True,
                            random_apply=2)

    def test_patchwise_random_apply_true_samples_subsequences(self):
        x = jnp.asarray(rng.random((2, 3, 8, 8)), jnp.float32)
        ps = PatchSequential(A.RandomBrightness(p=1.0),
                             A.RandomContrast(p=1.0),
                             grid_size=2, patchwise_apply=True,
                             random_apply=True)
        out = ps(x, key=jax.random.PRNGKey(5))
        assert out.shape == x.shape
        # every record targets a single location across the batch
        for r in ps._params:
            locs = {i % 4 for i in r.indices}
            assert len(locs) == 1 and len(r.indices) == 2

    def test_batched_replay_one_device_call_per_op(self):
        # VERDICT r3 item 6: B=8, 4x4 grid, 3 ops must issue <= n_ops
        # aug invocations (previously B*P*n_ops = 384 dispatches)
        x = jnp.asarray(rng.random((8, 3, 16, 16)), jnp.float32)
        ps = PatchSequential(A.RandomBrightness(p=1.0),
                             A.RandomContrast(p=1.0),
                             A.RandomGamma(p=1.0), grid_size=4)
        calls = []

        class Counting:
            def __init__(self, aug):
                self._aug = aug

            def __call__(self, *a, **kw):
                calls.append(1)
                return self._aug(*a, **kw)

            def __getattr__(self, n):
                return getattr(self._aug, n)

        ps.augs = [Counting(a) for a in ps.augs]
        out = ps(x, key=jax.random.PRNGKey(0))
        assert out.shape == x.shape
        assert len(calls) <= 3, len(calls)

    def test_batched_replay_matches_naive(self):
        x = jnp.asarray(rng.random((3, 3, 16, 16)), jnp.float32)
        ps = PatchSequential(A.RandomBrightness(brightness=(0.5, 1.5),
                                                p=1.0),
                             A.RandomContrast(contrast=(0.6, 1.4), p=1.0),
                             grid_size=2)
        recs = ps.forward_parameters(jax.random.PRNGKey(9), x.shape)
        batched = ps(x, params=recs)
        # naive per-record replay (the pre-round-4 path)
        pad = ps.compute_padding(x.shape[-2:])
        patches = ps.extract_patches(x, pad)
        flat = patches.reshape(-1, *patches.shape[2:])
        for rec in recs:
            idx = jnp.asarray(rec.indices, jnp.int32)
            flat = flat.at[idx].set(ps.augs[rec.op_index](flat[idx],
                                                          params=rec.data))
        naive = ps.restore_from_patches(
            flat.reshape(x.shape[0], -1, *flat.shape[1:]), pad)
        np.testing.assert_allclose(np.asarray(batched), np.asarray(naive),
                                   atol=1e-6)

    def test_video_inverse_mismatched_clip_shape(self):
        # VERDICT r3 item 8: inverse must take T from ITS input, not from
        # state recorded by the last forward
        yy, xx = np.meshgrid(np.linspace(0, 1, 16), np.linspace(0, 1, 16),
                             indexing="ij")
        img = (0.3 * yy + 0.5 * xx).astype(np.float32)
        vs = VideoSequential(A.RandomHorizontalFlip(p=1.0))
        clip5 = jnp.asarray(np.broadcast_to(img, (1, 5, 3, 16, 16)).copy())
        clip2 = jnp.asarray(np.broadcast_to(img, (1, 2, 3, 16, 16)).copy())
        out5 = vs(clip5, key=jax.random.PRNGKey(0))  # records T=5 params
        params5 = vs._params if hasattr(vs, "_params") else None
        # forward a DIFFERENT T, then invert it — must unfold with T=2
        out2 = vs(clip2, key=jax.random.PRNGKey(1))
        back2 = vs.inverse(out2)
        assert back2.shape == clip2.shape
        np.testing.assert_allclose(np.asarray(back2), np.asarray(clip2),
                                   atol=1e-5)
        assert out5.shape == clip5.shape
        assert not hasattr(vs, "_T")
