#!/usr/bin/env python
"""Stage-by-stage profile of the two-view front end on the current device.

Times each stage as its own jitted executable with fetch-forced completion
(see CLAUDE.md timing methodology): warm, then min over reps of
time(call + 4-byte fetch). Stage times include one RPC round trip (~25 ms
through the axon tunnel) — comparisons between stages remain valid since
the floor is common; for the full-pipeline number we use batch scaling.

Usage: python benchmarks/profile_frontend.py [--size 256] [--features 512]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from kornia_tpu.utils import enable_compilation_cache

enable_compilation_cache()


def timed(fn, *args, reps=7):
    f = jax.jit(fn)
    out = f(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.reshape(-1)[0])
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        leaf = jax.tree_util.tree_leaves(f(*args))[0]
        np.asarray(leaf.reshape(-1)[0])
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--height", type=int, default=0)
    ap.add_argument("--width", type=int, default=0)
    ap.add_argument("--features", type=int, default=512)
    args = ap.parse_args()
    H = args.height or args.size
    W = args.width or args.size
    NF = args.features

    from kornia_tpu.feature.integrated import SIFTFeature, LAFDescriptor
    from kornia_tpu.feature.laf import extract_patches_from_pyramid
    from kornia_tpu.feature.matching import match_smnn
    from kornia_tpu.feature.orientation import LAFOrienter
    from kornia_tpu.geometry.ransac import ransac
    from kornia_tpu.ops.filters import gaussian_blur2d
    from kornia_tpu.ops.warp import warp_perspective

    key = jax.random.PRNGKey(0)
    img0 = gaussian_blur2d(jax.random.uniform(key, (1, 1, H, W)), 3, 1.0)
    M = jnp.eye(3).at[0, 2].set(-4.0)[None]
    img1 = warp_perspective(img0, M, (H, W))

    feat = SIFTFeature(num_features=NF)
    det = feat.detector
    pyr = det.scale_pyr

    print(f"== size={H}x{W} features={NF} device={jax.devices()[0]}", flush=True)

    t = timed(lambda x: pyr(x)[0][-1], img0)
    print(f"scale_pyramid           {t*1e3:8.1f} ms", flush=True)

    t = timed(lambda x: det(x), img0)
    print(f"detector (pyr+nms+topk) {t*1e3:8.1f} ms", flush=True)

    lafs, resps, valid = jax.jit(det.__call__)(img0)
    lafs = jax.block_until_ready(lafs)

    ori = feat.orienter
    t = timed(lambda l, x: ori(l, x), lafs, img0)
    print(f"orientation             {t*1e3:8.1f} ms", flush=True)

    t = timed(lambda x, l: extract_patches_from_pyramid(x, l, 41), img0, lafs)
    print(f"patch extraction (41px) {t*1e3:8.1f} ms", flush=True)

    patches = jax.jit(
        lambda x, l: extract_patches_from_pyramid(x, l, 41))(img0, lafs)
    desc = feat.descriptor.descriptor
    t = timed(lambda p: desc(p.reshape(-1, 1, 41, 41)), patches)
    print(f"SIFT descriptor         {t*1e3:8.1f} ms", flush=True)

    d0 = jax.jit(lambda p: desc(p.reshape(-1, 1, 41, 41)))(patches)
    v = jnp.ones((NF,), bool)
    t = timed(lambda a, b: match_smnn(a, b, 0.95, v, v), d0, d0)
    print(f"match_smnn              {t*1e3:8.1f} ms", flush=True)

    # full LocalFeature (detect+ori+patches+desc)
    t = timed(lambda x: feat(x), img0)
    print(f"LocalFeature total      {t*1e3:8.1f} ms", flush=True)

    # RANSAC essential at this feature count
    kp = jax.random.normal(jax.random.PRNGKey(1), (NF, 2)) * 0.3
    t = timed(lambda a, b, k: ransac(a, b, k, "essential", inl_th=1e-3,
                                     batch_size=1024, max_iterations=8,
                                     mask=v),
              kp, kp + 0.001, jax.random.PRNGKey(2))
    print(f"ransac essential 1024x8 {t*1e3:8.1f} ms", flush=True)

    # whole two-view pipeline, batch-scaled honest number
    from kornia_tpu.slam.twoview import _two_view_fn
    K = jnp.array([[0.8 * W, 0.0, W / 2], [0.0, 0.8 * W, H / 2],
                   [0.0, 0.0, 1.0]])
    fn = _two_view_fn((1, 1, H, W), NF, 1024, 8, 0.95)
    t = timed(lambda a, b: fn(a, b, K, jax.random.PRNGKey(0), 1e-3),
              img0, img1)
    print(f"two_view_pose e2e       {t*1e3:8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
