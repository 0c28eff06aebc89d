#!/usr/bin/env python
"""Find the two-view 'glue gap' (VERDICT r4 item 3): batch-scaled
per-stage marginal times, measured the SAME way as bench.py's e2e number
(vmap over pairs, marginal time from batch 1 -> 8), so the stage sum and
the e2e number are directly comparable — no RPC floor, no inferred rows.

Usage: python benchmarks/glue_probe.py [--size 480 640] [--features 1024]
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
    out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.reshape(-1)[0])
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        leaf = jax.tree_util.tree_leaves(fn(*args))[0]
        np.asarray(leaf.reshape(-1)[0])
        ts.append(time.perf_counter() - t0)
    return min(ts)


def marginal(fn, make_args, b_lo=1, b_hi=8):
    f = jax.jit(fn)
    t_lo = timed(f, *make_args(b_lo))
    t_hi = timed(f, *make_args(b_hi))
    return max((t_hi - t_lo) / (b_hi - b_lo), 1e-7)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, nargs=2, default=(480, 640))
    ap.add_argument("--features", type=int, default=1024)
    args = ap.parse_args()
    H, W = args.size
    NF = args.features

    from kornia_tpu.feature.integrated import SIFTFeature
    from kornia_tpu.feature.laf import extract_patches_from_pyramid
    from kornia_tpu.feature.matching import match_smnn
    from kornia_tpu.geometry.ransac import ransac
    from kornia_tpu.ops.filters import gaussian_blur2d
    from kornia_tpu.ops.warp import warp_perspective
    from kornia_tpu.slam.twoview import _two_view_fn

    key = jax.random.PRNGKey(0)
    base = gaussian_blur2d(jax.random.uniform(key, (1, 1, H, W)), 3, 1.0)
    M = jnp.eye(3).at[0, 2].set(-4.0)[None]
    warped = warp_perspective(base, M, (H, W))
    K = jnp.array([[0.8 * W, 0.0, W / 2], [0.0, 0.8 * W, H / 2],
                   [0.0, 0.0, 1.0]])
    th = 1.5 / float(0.8 * W)

    def imgs(B):
        return jnp.concatenate([base * (1 - 0.001 * i) for i in range(B)], 0)

    feat = SIFTFeature(num_features=NF)
    det = feat.detector

    print(f"== {H}x{W} / {NF}f on {jax.devices()[0].platform}; "
          "batch-scaled marginal ms per item ==", flush=True)
    rows = {}

    # per-frame stages, vmapped over batch (image batch dim IS the vmap)
    rows["detector"] = marginal(
        jax.vmap(lambda x: det(x[None])), lambda B: (imgs(B),))

    lafs1, _, _ = jax.jit(det.__call__)(base)
    lafsB = lambda B: jnp.concatenate([lafs1] * B, 0)

    rows["orientation"] = marginal(
        jax.vmap(lambda l, x: feat.orienter(l[None], x[None])),
        lambda B: (lafsB(B), imgs(B)))

    rows["patches41"] = marginal(
        jax.vmap(lambda x, l: extract_patches_from_pyramid(x[None], l[None],
                                                           41)),
        lambda B: (imgs(B), lafsB(B)))

    p1 = jax.jit(lambda x, l: extract_patches_from_pyramid(x, l, 41))(
        base, lafs1)
    desc = feat.descriptor.descriptor
    rows["sift_desc"] = marginal(
        jax.vmap(lambda p: desc(p.reshape(-1, 1, 41, 41))),
        lambda B: (jnp.concatenate([p1] * B, 0),))

    # full per-frame front end (detect+orient+patches+desc)
    rows["frame_frontend"] = marginal(
        jax.vmap(lambda x: feat(x[None])), lambda B: (imgs(B),))

    d1 = jax.jit(lambda x: feat(x))(base)[2][0]
    v = jnp.ones((NF,), bool)
    rows["match_smnn"] = marginal(
        jax.vmap(lambda a, b: match_smnn(a, b, 0.95, v, v)),
        lambda B: (jnp.concatenate([d1[None]] * B, 0),
                   jnp.concatenate([d1[None] * 0.999] * B, 0)))

    kp = jax.random.normal(jax.random.PRNGKey(1), (NF, 2)) * 0.3
    kpsB = lambda B: jnp.concatenate([kp[None]] * B, 0)
    rows["ransac_ess"] = marginal(
        jax.vmap(lambda a, b, k: ransac(a, b, k, "essential", inl_th=th,
                                        batch_size=256, max_iterations=32,
                                        mask=v).model),
        lambda B: (kpsB(B), kpsB(B) + 0.001,
                   jax.random.split(jax.random.PRNGKey(2), 8)[:B]))

    single = _two_view_fn((1, 1, H, W), NF, 256, 32, 0.95)
    batched = jax.vmap(single, in_axes=(0, 0, None, 0, None))

    def pair_args(B):
        i0 = jnp.concatenate([base[None] * (1 - 0.001 * i)
                              for i in range(B)], 0)
        i1 = jnp.concatenate([warped[None] * (1 - 0.001 * i)
                              for i in range(B)], 0)
        keys = jax.random.split(jax.random.PRNGKey(1), B)
        return i0, i1, K, keys, th

    t_lo = timed(batched, *pair_args(1))
    t_hi = timed(batched, *pair_args(8))
    rows["e2e_pair"] = max((t_hi - t_lo) / 7, 1e-7)

    for k, v_ in rows.items():
        print(f"{k:<16}{v_*1e3:8.2f} ms", flush=True)
    acct = 2 * rows["frame_frontend"] + rows["match_smnn"] + \
        rows["ransac_ess"]
    print(f"{'2*frontend+match+ransac':<24}{acct*1e3:8.2f} ms "
          f"vs e2e {rows['e2e_pair']*1e3:.2f} ms "
          f"(glue = {(rows['e2e_pair']-acct)*1e3:.2f} ms)", flush=True)
    stage_sum = 2 * (rows["detector"] + rows["orientation"]
                     + rows["patches41"] + rows["sift_desc"])
    print(f"{'frontend vs stage sum':<24}{rows['frame_frontend']*1e3:8.2f}"
          f" vs {stage_sum/2*1e3:.2f} ms per frame", flush=True)


if __name__ == "__main__":
    main()
