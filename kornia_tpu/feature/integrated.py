"""Integrated local-feature pipelines
(reference: kornia/feature/integrated.py, 591 LoC).

`LocalFeature` = detector → orientation → patch extraction → descriptor,
all on padded fixed-K sets with validity masks. `LocalFeatureMatcher`
wires two images through detection + description + matching and returns
the SfM front-end dict (reference: integrated.py:414-486).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.dtype import as_float
from .detector import ScaleSpaceDetector
from .laf import extract_patches_from_pyramid, get_laf_center
from .matching import DescriptorMatcher
from .orientation import LAFOrienter
from .responses import dog_response, gftt_response, harris_response, hessian_response
from .siftdesc import SIFTDescriptor

__all__ = ["LAFDescriptor", "LocalFeature", "SIFTFeature",
           "SIFTFeatureScaleSpace", "GFTTAffNetHardNet",
           "HesAffNetHardNet", "KeyNetHardNet", "KeyNetAffNetHardNet",
           "LocalFeatureMatcher"]


class LAFDescriptor:
    """Extract patches for LAFs and run a patch descriptor
    (reference: integrated.py:86)."""

    def __init__(self, patch_descriptor=None, patch_size: int = 41,
                 grayscale_descriptor: bool = True,
                 patch_mode: Optional[str] = None):
        self.descriptor = patch_descriptor or SIFTDescriptor(patch_size)
        self.patch_size = patch_size
        self.grayscale = grayscale_descriptor
        # Pallas sampling mode for the TPU patch kernel (None -> exact
        # "split"); "bf16" quarters the MXU work for descriptor use
        self.patch_mode = patch_mode

    def __call__(self, img: jax.Array, lafs: jax.Array) -> jax.Array:
        B, N = lafs.shape[:2]
        if self.grayscale and img.shape[1] == 3:
            from ..ops.color import rgb_to_grayscale
            img = rgb_to_grayscale(img)
        patches = extract_patches_from_pyramid(img, lafs, self.patch_size,
                                               pallas_mode=self.patch_mode)
        flat = patches.reshape(B * N, *patches.shape[2:])
        descs = self.descriptor(flat)
        return descs.reshape(B, N, -1)


class LocalFeature:
    """detector + descriptor pipeline (reference: integrated.py:137).
    Order matches the reference detectors: detect → affine shape →
    orientation → describe; `scale_laf` multiplies LAF scales before
    description (reference: integrated.py:150-171)."""

    def __init__(self, detector, descriptor: LAFDescriptor,
                 orienter: Optional[LAFOrienter] = None,
                 aff_module=None, scale_laf_coef: float = 1.0):
        self.detector = detector
        self.descriptor = descriptor
        self.orienter = orienter
        self.aff_module = aff_module
        self.scale_laf_coef = scale_laf_coef

    def __call__(self, img: jax.Array
                 ) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
        """→ (lafs, responses, descriptors, valid)."""
        img = as_float(img)
        gray = img
        if img.shape[1] == 3:
            from ..ops.color import rgb_to_grayscale
            gray = rgb_to_grayscale(img)
        lafs, resps, valid = self.detector(gray)
        if self.aff_module is not None:
            lafs = self.aff_module(lafs, gray)
        if self.orienter is not None:
            lafs = self.orienter(lafs, gray)
        if self.scale_laf_coef != 1.0:
            from .laf import scale_laf
            lafs = scale_laf(lafs, self.scale_laf_coef)
        descs = self.descriptor(gray, lafs)
        return lafs, resps, descs, valid


class SIFTFeature(LocalFeature):
    """DoG + orientation + (Root)SIFT (reference: integrated.py:177)."""

    def __init__(self, num_features: int = 500, rootsift: bool = True,
                 double_image: bool = False, fast_patches: bool = False):
        from ..ops.pyramid import ScalePyramid
        detector = ScaleSpaceDetector(
            num_features,
            resp="dog",  # true adjacent-level difference of gaussians
            scale_pyr=ScalePyramid(3, 1.6, 32, double_image=double_image),
            nms_size=3,
            minima_are_also_good=True,
            mr_size=6.0,
        )
        desc = SIFTDescriptor(patch_size=41, rootsift=rootsift)
        pm = "bf16" if fast_patches else None
        super().__init__(detector, LAFDescriptor(desc, 41, patch_mode=pm),
                         LAFOrienter(19, patch_mode=pm))


def _blob_dog_resp(x: jax.Array, sigmas=None) -> jax.Array:
    """Approximate per-level DoG by LoG-like band-pass (detector calls the
    response per level; a true DoG needs adjacent levels — approximated
    with the scale-normalized Laplacian which has the same extrema)."""
    from ..ops.filters import laplacian
    out = -laplacian(x, 5, normalized=True)
    if sigmas is not None:
        out = out * (sigmas * sigmas)
    return out


class GFTTSIFTFeature(LocalFeature):
    """GFTT corners + RootSIFT descriptors — the dense-corner front end
    preferred for odometry (analogue of the reference's
    GFTTAffNetHardNet preset with a deterministic descriptor)."""

    def __init__(self, num_features: int = 500, rootsift: bool = True,
                 fast_patches: bool = False):
        from ..ops.pyramid import ScalePyramid
        detector = ScaleSpaceDetector(
            num_features, resp=gftt_response,
            scale_pyr=ScalePyramid(3, 1.6, 32, double_image=False),
            mr_size=6.0)
        desc = SIFTDescriptor(patch_size=41, rootsift=rootsift)
        pm = "bf16" if fast_patches else None
        super().__init__(detector, LAFDescriptor(desc, 41, patch_mode=pm),
                         LAFOrienter(19, patch_mode=pm))


class SIFTFeatureScaleSpace(LocalFeature):
    """DoG over a blur pyramid + (Root)SIFT
    (reference: integrated.py:215 SIFTFeatureScaleSpace)."""

    def __init__(self, num_features: int = 500, upright: bool = False,
                 rootsift: bool = True):
        from ..ops.pyramid import ScalePyramid
        detector = ScaleSpaceDetector(
            num_features, resp="dog",
            scale_pyr=ScalePyramid(3, 1.6, 32, double_image=True),
            nms_size=3, minima_are_also_good=True, mr_size=6.0)
        desc = SIFTDescriptor(patch_size=41, rootsift=rootsift)
        super().__init__(detector, LAFDescriptor(desc, 41),
                         None if upright else LAFOrienter(19))


class GFTTAffNetHardNet(LocalFeature):
    """GFTT corners + AffNet shape + HardNet descriptors
    (reference: integrated.py:251). Random-init AffNet/HardNet until
    torch weights are ported (`AffNet.from_torch` /
    `hardnet.load_torch_weights`); for deterministic accuracy tests use
    SIFTFeature."""

    def __init__(self, num_features: int = 500, upright: bool = False,
                 params: Optional[dict] = None,
                 affnet_params: Optional[dict] = None):
        from .affnet import LAFAffNetShapeEstimator
        from .hardnet import HardNet
        from ..ops.pyramid import ScalePyramid
        detector = ScaleSpaceDetector(
            num_features, resp=gftt_response,
            scale_pyr=ScalePyramid(3, 1.6, 32, double_image=True),
            mr_size=6.0)
        hn = HardNet(params)
        super().__init__(
            detector, LAFDescriptor(hn, 32),
            None if upright else LAFOrienter(19),
            aff_module=LAFAffNetShapeEstimator(
                affnet_params, preserve_orientation=False))


class HesAffNetHardNet(LocalFeature):
    """Hessian blobs + AffNet shape + HardNet descriptors
    (reference: integrated.py:280 HesAffNetHardNet)."""

    def __init__(self, num_features: int = 500, upright: bool = False,
                 params: Optional[dict] = None,
                 affnet_params: Optional[dict] = None):
        from .affnet import LAFAffNetShapeEstimator
        from .hardnet import HardNet
        from ..ops.pyramid import ScalePyramid
        detector = ScaleSpaceDetector(
            num_features, resp=hessian_response,
            scale_pyr=ScalePyramid(3, 1.6, 32, double_image=True),
            mr_size=6.0)
        hn = HardNet(params)
        super().__init__(
            detector, LAFDescriptor(hn, 32),
            None if upright else LAFOrienter(19),
            aff_module=LAFAffNetShapeEstimator(
                affnet_params, preserve_orientation=False))


class KeyNetHardNet(LocalFeature):
    """KeyNet multi-resolution detector + OriNet orientation + HardNet
    (reference: integrated.py:305 KeyNetHardNet)."""

    def __init__(self, num_features: int = 2048, upright: bool = False,
                 scale_laf_coef: float = 1.0,
                 keynet_params: Optional[dict] = None,
                 orinet_params: Optional[dict] = None,
                 hardnet_params: Optional[dict] = None):
        from .affnet import OriNet
        from .hardnet import HardNet
        from .multires_detector import KeyNetDetector
        ori = None if upright else LAFOrienter(
            angle_detector=OriNet(orinet_params))
        detector = KeyNetDetector(keynet_params, num_features,
                                  ori_module=ori)
        super().__init__(detector, LAFDescriptor(HardNet(hardnet_params),
                                                 32),
                         scale_laf_coef=scale_laf_coef)


class KeyNetAffNetHardNet(LocalFeature):
    """KeyNet detector + AffNet shape + OriNet orientation + HardNet
    (reference: integrated.py:331 KeyNetAffNetHardNet)."""

    def __init__(self, num_features: int = 2048, upright: bool = False,
                 scale_laf_coef: float = 1.0,
                 keynet_params: Optional[dict] = None,
                 orinet_params: Optional[dict] = None,
                 affnet_params: Optional[dict] = None,
                 hardnet_params: Optional[dict] = None):
        from .affnet import LAFAffNetShapeEstimator, OriNet
        from .hardnet import HardNet
        from .multires_detector import KeyNetDetector
        ori = None if upright else LAFOrienter(
            angle_detector=OriNet(orinet_params))
        detector = KeyNetDetector(
            keynet_params, num_features, ori_module=ori,
            aff_module=LAFAffNetShapeEstimator(
                affnet_params, preserve_orientation=False))
        super().__init__(detector, LAFDescriptor(HardNet(hardnet_params),
                                                 32),
                         scale_laf_coef=scale_laf_coef)


class LocalFeatureMatcher:
    """Full two-view front end (reference: integrated.py:361)."""

    def __init__(self, local_feature: LocalFeature,
                 matcher: DescriptorMatcher):
        self.local_feature = local_feature
        self.matcher = matcher

    def __call__(self, data: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
        img0 = data["image0"]
        img1 = data["image1"]
        lafs0, r0, d0, v0 = self.local_feature(img0)
        lafs1, r1, d1, v1 = self.local_feature(img1)
        B = img0.shape[0]
        out_dists = []
        out_idx = []
        out_valid = []
        for b in range(B):
            dists, idx, valid = self.matcher(d0[b], d1[b], v0[b], v1[b])
            out_dists.append(dists)
            out_idx.append(idx)
            out_valid.append(valid)
        dists = jnp.stack(out_dists)
        idx = jnp.stack(out_idx)
        valid = jnp.stack(out_valid)
        kp0 = get_laf_center(lafs0)
        kp1_all = get_laf_center(lafs1)
        # per-component flat gathers: take_along_axis on the (B, N, 2)
        # point array is a multi-dim-slice gather, ~40x slower on TPU
        j1 = idx[..., 1]
        kp1 = jnp.stack([jnp.take_along_axis(kp1_all[..., 0], j1, axis=1),
                         jnp.take_along_axis(kp1_all[..., 1], j1, axis=1)],
                        axis=-1)
        return {
            "keypoints0": kp0,
            "keypoints1": kp1,
            "lafs0": lafs0,
            "lafs1": lafs1,
            "descriptors0": d0,
            "descriptors1": d1,
            "confidence": 1.0 - jnp.clip(dists[..., 0], 0.0, 1.0),
            "batch_indexes": jnp.repeat(jnp.arange(B), idx.shape[1]),
            "matches": idx,
            "valid": valid,
        }
