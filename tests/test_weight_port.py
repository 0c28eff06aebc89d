"""Torch→JAX weight-porting conformance (the porting harness from
SURVEY.md §7 'hard parts' item 5 — validated with a synthetic torch
checkpoint since pretrained weights can't be fetched in this environment)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn

import jax
import jax.numpy as jnp


def _torch_hardnet():
    feats = tnn.Sequential(
        tnn.Conv2d(1, 32, 3, 1, 1, bias=False),
        tnn.BatchNorm2d(32, affine=False), tnn.ReLU(),
        tnn.Conv2d(32, 32, 3, 1, 1, bias=False),
        tnn.BatchNorm2d(32, affine=False), tnn.ReLU(),
        tnn.Conv2d(32, 64, 3, 2, 1, bias=False),
        tnn.BatchNorm2d(64, affine=False), tnn.ReLU(),
        tnn.Conv2d(64, 64, 3, 1, 1, bias=False),
        tnn.BatchNorm2d(64, affine=False), tnn.ReLU(),
        tnn.Conv2d(64, 128, 3, 2, 1, bias=False),
        tnn.BatchNorm2d(128, affine=False), tnn.ReLU(),
        tnn.Conv2d(128, 128, 3, 1, 1, bias=False),
        tnn.BatchNorm2d(128, affine=False), tnn.ReLU(),
        tnn.Conv2d(128, 128, 8, 1, 0, bias=False),
        tnn.BatchNorm2d(128, affine=False),
    ).eval()
    with torch.no_grad():
        for m in feats.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.normal_(0, 0.1)
                m.running_var.uniform_(0.5, 1.5)
    return feats


class TestHardNetPort:
    def test_forward_parity(self):
        feats = _torch_hardnet()

        def torch_forward(x):
            mu = x.mean(dim=(1, 2, 3), keepdim=True)
            sd = x.std(dim=(1, 2, 3), keepdim=True)
            out = feats((x - mu) / (sd + 1e-7)).view(x.shape[0], -1)
            return torch.nn.functional.normalize(out, dim=1)

        torch.manual_seed(0)
        x = torch.rand(4, 1, 32, 32)
        ref = torch_forward(x).detach().numpy()

        from kornia_tpu.feature.hardnet import HardNet, load_torch_weights
        params = load_torch_weights(dict(feats.state_dict()))
        ours = np.asarray(HardNet(params)(jnp.asarray(x.numpy())))
        np.testing.assert_allclose(ours, ref, atol=1e-4)


# -- DepthAnything (DINOv2 ViT + DPT head) -----------------------------------
# torch MIRROR of the official depth_anything_vit*14 module layout
# (pretrained.* DINOv2 with LayerScale; depth_head.* DPT) so the converter
# is validated key-for-key against the real state-dict schema.

class _TAttention(tnn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.heads = heads
        self.qkv = tnn.Linear(dim, 3 * dim)
        self.proj = tnn.Linear(dim, dim)

    def forward(self, x):
        B, N, D = x.shape
        dh = D // self.heads
        qkv = self.qkv(x).reshape(B, N, 3, self.heads, dh).permute(
            2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        a = (q @ k.transpose(-2, -1) * dh ** -0.5).softmax(dim=-1)
        out = (a @ v).transpose(1, 2).reshape(B, N, D)
        return self.proj(out)


class _TLayerScale(tnn.Module):
    def __init__(self, dim):
        super().__init__()
        self.gamma = tnn.Parameter(torch.rand(dim) * 0.4 + 0.8)

    def forward(self, x):
        return x * self.gamma


class _TMlp(tnn.Module):
    def __init__(self, dim, hidden):
        super().__init__()
        self.fc1 = tnn.Linear(dim, hidden)
        self.fc2 = tnn.Linear(hidden, dim)

    def forward(self, x):
        return self.fc2(torch.nn.functional.gelu(self.fc1(x)))


class _TBlock(tnn.Module):
    def __init__(self, dim, heads, mlp_ratio=4.0):
        super().__init__()
        self.norm1 = tnn.LayerNorm(dim)
        self.attn = _TAttention(dim, heads)
        self.ls1 = _TLayerScale(dim)
        self.norm2 = tnn.LayerNorm(dim)
        self.mlp = _TMlp(dim, int(dim * mlp_ratio))
        self.ls2 = _TLayerScale(dim)

    def forward(self, x):
        x = x + self.ls1(self.attn(self.norm1(x)))
        return x + self.ls2(self.mlp(self.norm2(x)))


class _TPatchEmbed(tnn.Module):
    def __init__(self, dim, patch):
        super().__init__()
        self.proj = tnn.Conv2d(3, dim, patch, patch)


class _TDinov2(tnn.Module):
    def __init__(self, dim, depth, heads, patch, n_patches):
        super().__init__()
        self.cls_token = tnn.Parameter(torch.randn(1, 1, dim) * 0.02)
        self.pos_embed = tnn.Parameter(
            torch.randn(1, 1 + n_patches, dim) * 0.02)
        self.patch_embed = _TPatchEmbed(dim, patch)
        self.blocks = tnn.ModuleList(
            [_TBlock(dim, heads) for _ in range(depth)])
        self.norm = tnn.LayerNorm(dim)


class _TRCU(tnn.Module):
    def __init__(self, feats):
        super().__init__()
        self.conv1 = tnn.Conv2d(feats, feats, 3, 1, 1)
        self.conv2 = tnn.Conv2d(feats, feats, 3, 1, 1)

    def forward(self, x):
        out = self.conv2(torch.relu(self.conv1(torch.relu(x))))
        return out + x


class _TFusion(tnn.Module):
    def __init__(self, feats):
        super().__init__()
        self.resConfUnit1 = _TRCU(feats)
        self.resConfUnit2 = _TRCU(feats)
        self.out_conv = tnn.Conv2d(feats, feats, 1)

    def forward(self, x, res=None, size=None):
        if res is not None:
            x = x + self.resConfUnit1(res)
        x = self.resConfUnit2(x)
        if size is None:
            x = torch.nn.functional.interpolate(
                x, scale_factor=2, mode="bilinear", align_corners=True)
        else:
            x = torch.nn.functional.interpolate(
                x, size=size, mode="bilinear", align_corners=True)
        return self.out_conv(x)


class _TScratch(tnn.Module):
    def __init__(self, oc, feats):
        super().__init__()
        for i in range(4):
            setattr(self, f"layer{i + 1}_rn",
                    tnn.Conv2d(oc[i], feats, 3, 1, 1, bias=False))
        for n in range(1, 5):
            setattr(self, f"refinenet{n}", _TFusion(feats))
        self.output_conv1 = tnn.Conv2d(feats, feats // 2, 3, 1, 1)
        self.output_conv2 = tnn.Sequential(
            tnn.Conv2d(feats // 2, 32, 3, 1, 1), tnn.ReLU(),
            tnn.Conv2d(32, 1, 1), tnn.ReLU())


class _TDPTHead(tnn.Module):
    def __init__(self, dim, oc, feats):
        super().__init__()
        self.projects = tnn.ModuleList(
            [tnn.Conv2d(dim, c, 1) for c in oc])
        self.resize_layers = tnn.ModuleList([
            tnn.ConvTranspose2d(oc[0], oc[0], 4, 4),
            tnn.ConvTranspose2d(oc[1], oc[1], 2, 2),
            tnn.Identity(),
            tnn.Conv2d(oc[3], oc[3], 3, 2, 1)])
        self.scratch = _TScratch(oc, feats)

    def forward(self, taps, h, w, patch):
        outs = []
        for i, t in enumerate(taps):
            x = t.permute(0, 2, 1).reshape(t.shape[0], -1, h, w)
            x = self.resize_layers[i](self.projects[i](x))
            outs.append(getattr(self.scratch, f"layer{i + 1}_rn")(x))
        l1, l2, l3, l4 = outs
        p4 = self.scratch.refinenet4(l4, size=l3.shape[2:])
        p3 = self.scratch.refinenet3(p4, l3, size=l2.shape[2:])
        p2 = self.scratch.refinenet2(p3, l2, size=l1.shape[2:])
        p1 = self.scratch.refinenet1(p2, l1)
        out = self.scratch.output_conv1(p1)
        out = torch.nn.functional.interpolate(
            out, size=(h * patch, w * patch), mode="bilinear",
            align_corners=True)
        return self.scratch.output_conv2(out)


class _TDepthAnything(tnn.Module):
    def __init__(self, dim=64, depth=4, heads=4, patch=14, grid=4,
                 oc=(16, 24, 32, 48), feats=16):
        super().__init__()
        self.patch = patch
        self.pretrained = _TDinov2(dim, depth, heads, patch, grid * grid)
        self.depth_head = _TDPTHead(dim, oc, feats)

    def forward(self, x):
        B = x.shape[0]
        p = self.pretrained
        h, w = x.shape[2] // self.patch, x.shape[3] // self.patch
        t = p.patch_embed.proj(x).flatten(2).transpose(1, 2)
        t = torch.cat([p.cls_token.expand(B, -1, -1), t], dim=1)
        t = t + p.pos_embed
        taps = []
        for blk in p.blocks:
            t = blk(t)
            taps.append(t)
        taps = [p.norm(t)[:, 1:] for t in taps]
        return self.depth_head(taps, h, w, self.patch)


class TestDepthAnythingPort:
    def test_forward_parity(self):
        from kornia_tpu.models.depth_anything import (DepthAnything,
                                                      DepthAnythingConfig,
                                                      load_torch_weights)
        torch.manual_seed(7)
        tm = _TDepthAnything().eval()
        x = torch.rand(2, 3, 56, 56)
        with torch.no_grad():
            ref = tm(x).numpy()  # (B, 1, 56, 56)
        cfg = DepthAnythingConfig(
            patch_size=14, hidden_size=64, num_layers=4, num_heads=4,
            out_indices=(0, 1, 2, 3), reassemble_channels=(16, 24, 32, 48),
            fusion_channels=16)
        params = load_torch_weights(
            {k: v.numpy() for k, v in tm.state_dict().items()}, cfg)
        ours = np.asarray(DepthAnything(cfg, params=params)(
            jnp.asarray(x.numpy())))
        np.testing.assert_allclose(ours, ref, atol=2e-4)

    def test_manifest_entry_and_autoconfig(self):
        from kornia_tpu.models.depth_anything import load_torch_weights
        from kornia_tpu.weights import MANIFEST, _resolve
        assert "depth_anything" in MANIFEST
        assert _resolve(MANIFEST["depth_anything"].converter) \
            is load_torch_weights
        # auto-config detects depth/dim from the state dict alone
        tm = _TDepthAnything()
        params = load_torch_weights(
            {k: v.numpy() for k, v in tm.state_dict().items()})
        assert "block3" in params["params"]
        assert "block4" not in params["params"]
