"""Tiny fixed-seed model builders shared by the golden-output tests and
their generator (VERDICT r4 item 6: golden tests per model family —
frozen expected tensors, not just torch round-trips).

Each builder returns (output_array,) for a DETERMINISTIC tiny-config
model: PRNGKey(0) init + a fixed smooth input. The generator
(`python tests/gen_golden_models.py`) records summary statistics + 8
probe values per family into golden/models_golden.json; the test re-runs
the builders on CPU and asserts the frozen numbers, so ANY unintended
change to an architecture's math — ours or upstream jax's — trips a
named, per-family assertion.
"""

from __future__ import annotations

import numpy as np


def _img(shape, period=7.0):
    """Deterministic smooth test input in [0, 1]."""
    import jax.numpy as jnp
    n = int(np.prod(shape))
    t = jnp.arange(n, dtype=jnp.float32)
    return (0.5 + 0.5 * jnp.sin(t / period)).reshape(shape)


def _key():
    import jax
    return jax.random.PRNGKey(0)


# --------------------------------------------------------------------------
# builders: name -> () -> np.ndarray (flattened probe output)
# --------------------------------------------------------------------------

def build_vit():
    from kornia_tpu.models.vit import ViTConfig, VisionTransformer, init_params
    cfg = ViTConfig(image_size=32, patch_size=8, dim=32, depth=2,
                    num_heads=2)
    params = init_params(_key(), cfg)
    model = VisionTransformer(cfg, params)
    out = model(_img((1, 3, 32, 32)))
    return np.asarray(out)


def build_tiny_vit():
    from kornia_tpu.models.tiny_vit import TinyViT, TinyViTConfig
    cfg = TinyViTConfig(img_size=64, num_classes=5, embed_dims=(16, 32, 32, 64),
                        depths=(1, 1, 2, 1), num_heads=(2, 4, 4, 8),
                        window_sizes=(2, 2, 4, 2))
    model = TinyViT(cfg, key=_key())
    out = model(_img((1, 3, 64, 64)))
    return np.asarray(out)


def build_mobile_vit():
    from kornia_tpu.models import mobile_vit as mv
    cfg = mv.MobileViTConfig(mode="xxs")
    params = mv.init_params(_key(), cfg)
    out = mv.forward(params, cfg, _img((1, 3, 64, 64)))
    return np.asarray(out)


def build_efficient_vit():
    from kornia_tpu.models import efficient_vit as ev
    cfg = ev.EfficientViTConfig()
    params = ev.init_params(_key(), cfg)
    out = ev.forward(params, cfg, _img((1, 3, 64, 64)))
    leaves = [np.asarray(v).ravel() for k, v in sorted(out.items())
              if k != "input"]
    return np.concatenate(leaves)


def build_sam_encoder():
    from kornia_tpu.models.sam import SamConfig, init_params, encode_image
    cfg = SamConfig(image_size=64, encoder_embed_dim=32, encoder_depth=2,
                    encoder_num_heads=2, encoder_global_attn_indexes=(1,),
                    window_size=2)
    params = init_params(_key(), cfg)
    out = encode_image(params, cfg, _img((1, 3, 64, 64)))
    return np.asarray(out)


def build_rt_detr():
    from kornia_tpu.models.rt_detr import (RTDETRConfig, rtdetr_forward,
                                           rtdetr_init_params)
    cfg = RTDETRConfig()
    params = rtdetr_init_params(_key(), cfg)
    logits, boxes = rtdetr_forward(params, cfg, _img((1, 3, 64, 64)))
    return np.concatenate([np.asarray(logits).ravel(),
                           np.asarray(boxes).ravel()])


def build_dexined():
    from kornia_tpu.models.dexined import dexined_forward, dexined_init_params
    params = dexined_init_params(_key())
    out = dexined_forward(params, _img((1, 3, 64, 64)))
    return np.asarray(out)


def build_yunet():
    from kornia_tpu.models.yunet import yunet_forward, yunet_init_params
    params = yunet_init_params(_key())
    out = yunet_forward(params, _img((1, 3, 64, 64)))
    leaves = [np.asarray(v).ravel() for v in
              (out.values() if isinstance(out, dict) else out)]
    return np.concatenate(leaves)


def build_rrdbnet():
    from kornia_tpu.models import rrdbnet
    cfg = rrdbnet.RRDBNetConfig(num_feat=8, num_block=1, num_grow_ch=4)
    params = rrdbnet.init_params(_key(), cfg)
    out = rrdbnet.forward(params, cfg, _img((1, 3, 16, 16)))
    return np.asarray(out)


def build_small_sr():
    from kornia_tpu.models.small_sr import SmallSR
    model = SmallSR(scale=2, key=_key())
    out = model(_img((1, 3, 16, 16)))
    return np.asarray(out)


def build_depth_anything():
    from kornia_tpu.models.depth_anything import DepthAnything, DepthAnythingConfig
    cfg = DepthAnythingConfig(hidden_size=32, num_layers=4, num_heads=2,
                              out_indices=(0, 1, 2, 3),
                              reassemble_channels=(8, 8, 8, 8),
                              fusion_channels=8)
    model = DepthAnything(cfg, key=_key())
    out = model(_img((1, 3, 56, 56)))
    return np.asarray(out)


def build_hardnet():
    from kornia_tpu.feature.hardnet import HardNet, hardnet_init_params
    params = hardnet_init_params(_key())
    model = HardNet(params)
    out = model(_img((4, 1, 32, 32)))
    return np.asarray(out)


def build_disk_unet():
    from kornia_tpu.feature.disk import disk_init_params, disk_unet
    params = disk_init_params(_key())
    out = disk_unet(params, _img((1, 3, 64, 64)))
    return np.asarray(out)


def build_xfeat():
    from kornia_tpu.feature.xfeat import xfeat_init_params, xfeat_model
    params = xfeat_init_params(_key())
    feats, kpts, heat = xfeat_model(params, _img((1, 1, 64, 64)))
    return np.concatenate([np.asarray(feats).ravel(),
                           np.asarray(kpts).ravel(),
                           np.asarray(heat).ravel()])


def build_lightglue():
    import jax
    import jax.numpy as jnp
    from kornia_tpu.feature.lightglue import LightGlue, LightGlueConfig
    cfg = LightGlueConfig(descriptor_dim=32, input_dim=32, n_layers=2,
                          num_heads=2)
    model = LightGlue(cfg, key=_key())
    k0 = jax.random.uniform(jax.random.PRNGKey(1), (1, 16, 2)) * 64
    k1 = jax.random.uniform(jax.random.PRNGKey(2), (1, 16, 2)) * 64
    d0 = jax.random.normal(jax.random.PRNGKey(3), (1, 16, 32))
    d1 = jax.random.normal(jax.random.PRNGKey(4), (1, 16, 32))
    out = model({"keypoints0": k0, "keypoints1": k1,
                 "descriptors0": d0, "descriptors1": d1,
                 "image_size": jnp.array([64.0, 64.0])})
    return np.asarray(out["log_assignment"])


def build_defmo():
    from kornia_tpu.feature.defmo import DeFMO
    model = DeFMO(tsr_steps=4, key=_key())
    out = model(_img((1, 6, 32, 32)))
    return np.asarray(out)


def build_tfeat():
    from kornia_tpu.feature.descriptors import TFeat
    model = TFeat(key=_key())
    return np.asarray(model(_img((4, 1, 32, 32))))


def build_sosnet():
    from kornia_tpu.feature.descriptors import SOSNet
    model = SOSNet(key=_key())
    return np.asarray(model(_img((4, 1, 32, 32))))


def build_hynet():
    from kornia_tpu.feature.descriptors import HyNet
    model = HyNet(key=_key())
    return np.asarray(model(_img((4, 1, 32, 32))))


def build_mkd():
    # parameter-free handcrafted descriptor: the golden freezes the
    # embedding/gradient math itself (reference: feature/mkd.py:540)
    from kornia_tpu.feature.mkd import MKDDescriptor
    model = MKDDescriptor(patch_size=32, kernel_type="concat",
                          whitening=None)
    return np.asarray(model(_img((4, 1, 32, 32))))


def build_orinet():
    from kornia_tpu.feature.affnet import OriNet
    return np.asarray(OriNet()(_img((4, 1, 32, 32))))


def build_affnet():
    from kornia_tpu.feature.affnet import AffNet
    return np.asarray(AffNet()(_img((4, 1, 32, 32))))


def build_keynet_response():
    # dense response map (not top-k detections: keypoint SELECTION can
    # flip under f32 jitter and would make the golden fragile)
    from kornia_tpu.feature.descriptors import KeyNet
    model = KeyNet(key=_key())
    return np.asarray(model(_img((1, 1, 48, 48))))


def build_loftr_coarse():
    # dense coarse+fine backbone features (selection-free, see above)
    from kornia_tpu.feature.loftr import (LoFTRConfig, loftr_backbone,
                                          loftr_init_params)
    cfg = LoFTRConfig(coarse_dim=64, fine_dim=32, num_coarse_layers=1,
                      num_heads=4, top_k=32)
    params = loftr_init_params(_key(), cfg)
    c, f = loftr_backbone(params, cfg, _img((1, 1, 64, 64)))
    return np.concatenate([np.asarray(c).ravel(), np.asarray(f).ravel()])


def build_dedode_detector():
    import jax.numpy as jnp
    from kornia_tpu.feature.dedode import DeDoDeDetector
    det = DeDoDeDetector()
    x = jnp.transpose(_img((1, 3, 64, 64)), (0, 2, 3, 1))
    params = det.init(_key(), x)
    return np.asarray(det.apply(params, x))


def build_sold2_heatmaps():
    import jax.numpy as jnp
    from kornia_tpu.feature.sold2 import SOLD2Net
    net = SOLD2Net()
    x = jnp.transpose(_img((1, 1, 64, 64)), (0, 2, 3, 1))
    params = net.init(_key(), x)
    out = net.apply(params, x)
    return np.concatenate([np.asarray(out["junctions"]).ravel(),
                           np.asarray(out["heatmap"]).ravel()])


def build_sam3():
    import jax.numpy as jnp
    from kornia_tpu.models.sam3 import Sam3
    model = Sam3(img_size=64, encoder_dim=64, depth=2, num_heads=4)
    coords = jnp.asarray([[[20.0, 24.0], [40.0, 36.0]]])
    labels = jnp.asarray([[1, 0]], jnp.int32)
    masks, iou = model(_img((1, 3, 64, 64)), coords, labels)
    return np.concatenate([np.asarray(masks).ravel(),
                           np.asarray(iou).ravel()])


def build_siglip2():
    import jax.numpy as jnp
    from kornia_tpu.models.siglip2 import SigLip2, SigLip2Config
    model = SigLip2(SigLip2Config.tiny(), key=_key())
    ids = (jnp.arange(8, dtype=jnp.int32) * 17 % 1000)[None]
    out = model(_img((1, 3, 32, 32)), ids)
    return np.concatenate([np.asarray(v).ravel()
                           for v in (out["image_embeds"], out["text_embeds"],
                                     out["logits_per_text"])])


BUILDERS = {
    "vit": build_vit,
    "tiny_vit": build_tiny_vit,
    "mobile_vit": build_mobile_vit,
    "efficient_vit": build_efficient_vit,
    "sam_encoder": build_sam_encoder,
    "rt_detr": build_rt_detr,
    "dexined": build_dexined,
    "yunet": build_yunet,
    "rrdbnet": build_rrdbnet,
    "small_sr": build_small_sr,
    "depth_anything": build_depth_anything,
    "hardnet": build_hardnet,
    "disk_unet": build_disk_unet,
    "xfeat": build_xfeat,
    "lightglue": build_lightglue,
    "defmo": build_defmo,
    "tfeat": build_tfeat,
    "sosnet": build_sosnet,
    "hynet": build_hynet,
    "mkd": build_mkd,
    "orinet": build_orinet,
    "affnet": build_affnet,
    "keynet_response": build_keynet_response,
    "loftr_coarse": build_loftr_coarse,
    "dedode_detector": build_dedode_detector,
    "sold2_heatmaps": build_sold2_heatmaps,
    "sam3": build_sam3,
    "siglip2": build_siglip2,
}


def probe(arr: np.ndarray, n: int = 8):
    """Stable summary of an output tensor: global stats + n strided values."""
    flat = np.asarray(arr, np.float64).ravel()
    idx = np.linspace(0, flat.size - 1, n).astype(np.int64)
    return {
        "size": int(flat.size),
        "mean": float(flat.mean()),
        "std": float(flat.std()),
        "absmax": float(np.abs(flat).max()),
        "values": [float(v) for v in flat[idx]],
        "value_idx": [int(i) for i in idx],
    }
