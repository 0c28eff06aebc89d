#!/usr/bin/env python
"""Benchmark harness. Prints ONE JSON line:
{"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

Headline: two-view front-end throughput per chip (north-star config 2:
detect + describe + match + 5-point essential RANSAC + pose) at 480x640
with 1024 features. vs_baseline = speedup over the reference kornia
pipeline (SIFTFeature + smnn + essential RANSAC, torch 8-thread CPU on
this machine — the reference publishes no GPU numbers for this pipeline;
see BASELINE.md "two-view" section for the measurement).

Extra fields carried in the same JSON object:
  twoview_fps_256_512f   same pipeline at 256^2 / 512 features
  ba_iters_per_s         LM bundle-adjustment iterations/s at 50 cams /
                         2k points / 10k observations (iteration-scaled)
  aug_geomean_img_s      the reference's own per-op augmentation regime
                         (batch 32, 256^2; BASELINE.md)
  aug_vs_torch_cpu_same_machine
                         geomean speedup vs reference kornia measured on
                         THIS machine (torch, 8 CPU threads)
  ate                    contents of ATE_RESULTS.json if present (written
                         by benchmarks/ate_bench.py --save on rendered
                         exact-GT sequences; see COVERAGE.md)

Timing methodology (CLAUDE.md): through the axon tunnel
`block_until_ready` can acknowledge at enqueue, so every measurement
forces a 4-byte fetch and uses BATCH SCALING — marginal time
(T(B*k) - T(B)) / (k-1) with min-over-reps — so RPC round-trip,
dispatch, and fetch cancel and nothing is algebraically simplifiable.
BA uses ITERATION scaling (T(24 iters) - T(4)) / 20 for the same reason.
"""

import json
import math
import os
import subprocess
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from kornia_tpu.utils import enable_compilation_cache

enable_compilation_cache()  # persist TPU executables across runs

# Reference kornia measured on this machine (torch 2.x, 8 CPU threads,
# min of 3 runs; /tmp-reproducible via BASELINE.md "two-view pipeline"):
#   256x256 / 512 feats: 1283 ms/pair   480x640 / 1024 feats: 4471 ms/pair
REF_TWOVIEW_S_PER_PAIR = {"256": 1.283, "480x640": 4.471}


def _timed(fn, *args, reps=9):
    f = jax.jit(fn)
    out = f(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.reshape(-1)[0])  # warm + force completion (4 bytes)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        leaf = jax.tree_util.tree_leaves(f(*args))[0]
        np.asarray(leaf.reshape(-1)[0])
        ts.append(time.perf_counter() - t0)
    return min(ts)


def _bench_batch_scaled(make_args, fn, b_lo, b_hi):
    """Marginal per-item device time via batch scaling."""
    t_lo = _timed(fn, *make_args(b_lo))
    t_hi = _timed(fn, *make_args(b_hi))
    return max((t_hi - t_lo) / (b_hi - b_lo), 1e-7)


def bench_twoview(H, W, NF):
    """Two-view front end, batch-scaled pairs/s."""
    from kornia_tpu.slam.twoview import _two_view_fn
    single = _two_view_fn((1, 1, H, W), NF, 256, 32, 0.95)
    batched = jax.vmap(single, in_axes=(0, 0, None, 0, None))
    from kornia_tpu.ops.filters import gaussian_blur2d
    from kornia_tpu.ops.warp import warp_perspective
    key = jax.random.PRNGKey(0)
    base = gaussian_blur2d(jax.random.uniform(key, (1, 1, H, W)), 3, 1.0)
    M = jnp.eye(3).at[0, 2].set(-4.0)[None]
    warped = warp_perspective(base, M, (H, W))
    K = jnp.array([[0.8 * W, 0.0, W / 2], [0.0, 0.8 * W, H / 2],
                   [0.0, 0.0, 1.0]])
    th = 1.5 / float(0.8 * W)

    def make_args(B):
        i0 = jnp.concatenate([base[None] * (1 - 0.001 * i)
                              for i in range(B)], 0)
        i1 = jnp.concatenate([warped[None] * (1 - 0.001 * i)
                              for i in range(B)], 0)
        keys = jax.random.split(jax.random.PRNGKey(1), B)
        return i0, i1, K, keys, th

    dt = _bench_batch_scaled(make_args, batched, 1, 8)
    return 1.0 / dt  # pairs (frames) per second per chip


def bench_ba_iters():
    """LM BA iterations/s at 50 cams / 2k pts / 10k obs."""
    from kornia_tpu.slam.ba import BAProblem, BAState, bundle_adjust
    from kornia_tpu.geometry.liegroup import Se3, So3
    C, P, O = 50, 2000, 10000
    rng = np.random.default_rng(0)
    Xw = rng.uniform(-2, 2, (P, 3)).astype(np.float32)
    Xw[:, 2] += 6.0
    angles = rng.normal(0, 0.05, (C, 3)).astype(np.float32)
    ts = np.stack([np.linspace(0, 2, C), np.zeros(C), np.zeros(C)],
                  1).astype(np.float32)
    K = jnp.array([[300.0, 0, 320], [0, 300.0, 240], [0, 0, 1.0]])
    cam_idx = rng.integers(0, C, O).astype(np.int32)
    pt_idx = rng.integers(0, P, O).astype(np.int32)
    poses = Se3(So3.exp(jnp.asarray(angles)), jnp.asarray(ts))
    Rm = np.asarray(poses.r.matrix())
    Xc = np.einsum("oij,oj->oi", Rm[cam_idx], Xw[pt_idx]) + ts[cam_idx]
    uv = (Xc[:, :2] / Xc[:, 2:]) * 300.0 + np.array([320.0, 240.0])
    uv += rng.normal(0, 0.5, uv.shape)
    problem = BAProblem(jnp.asarray(cam_idx), jnp.asarray(pt_idx),
                        jnp.asarray(uv.astype(np.float32)),
                        jnp.ones(O, bool), K)
    state = BAState(poses, jnp.asarray(Xw + rng.normal(0, 0.05, Xw.shape)
                                       .astype(np.float32)))

    def run(iters):
        return _timed(
            lambda s: bundle_adjust(s, problem, C, P, num_iters=iters)[0]
            .points, state)

    t_lo, t_hi = run(4), run(24)
    it_s = 20.0 / max(t_hi - t_lo, 1e-7)
    return it_s


def _measure_torch_aug_baseline(B, size):
    """Live re-measure of the same-machine torch-CPU kornia baseline
    (BENCH_REMEASURE_AUG=1). Mirrors BASELINE.md's recorded protocol:
    batch B at size^2, img/s, min-of-20 wall timings."""
    import sys
    import types
    sys.path.insert(0, "/root/reference")
    sys.modules.setdefault("kornia_rs", types.ModuleType("kornia_rs"))
    import torch
    import kornia as KR
    x = torch.rand(B, 3, size, size)
    half = size // 2
    cases = {
        "HorizontalFlip": lambda t: torch.flip(t, (-1,)),
        "VerticalFlip": lambda t: torch.flip(t, (-2,)),
        "Resize_half": lambda t: KR.geometry.resize(
            KR.geometry.resize(t, (half, half), antialias=True),
            (size, size)),
        "GaussianBlur": lambda t: KR.filters.gaussian_blur2d(
            t, (3, 3), (0.8, 0.8)),
        "Brightness": lambda t: KR.enhance.adjust_brightness(t, 0.1),
        "Grayscale": lambda t: KR.color.grayscale_to_rgb(
            KR.color.rgb_to_grayscale(t)),
    }
    out = {}
    with torch.no_grad():
        for name, fn in cases.items():
            fn(x)  # warm
            best = min(_walltime(fn, x) for _ in range(20))
            out[name] = B / max(best, 1e-9)
    return out


def _walltime(fn, x):
    t0 = time.perf_counter()
    fn(x)
    return time.perf_counter() - t0


def bench_aug():
    from kornia_tpu.ops import (adjust_brightness, gaussian_blur2d,
                                grayscale_to_rgb, hflip, resize,
                                rgb_to_grayscale, vflip)
    B, C, H, W = 32, 3, 256, 256
    img = jax.random.uniform(jax.random.PRNGKey(0), (B, C, H, W))
    # reference = kornia on THIS machine (same-machine measurement — the
    # old cross-hardware Jetson-GPU comparison was demoted per VERDICT r2
    # item 9). The constants below are a RECORDED baseline, provenance in
    # BASELINE.md "Same-machine torch-CPU augmentation baseline" (measured
    # 2026-06, torch 2.13.0+cpu, batch 32 at 256^2, img/s, min-of-20).
    # Set BENCH_REMEASURE_AUG=1 to re-measure live instead of using them.
    ops = {
        "HorizontalFlip": (hflip, 6114.0),
        "VerticalFlip": (vflip, 7294.0),
        "Resize_half": (lambda x: resize(resize(x, (128, 128),
                                                antialias=True), (256, 256)),
                        65.0),
        "GaussianBlur": (lambda x: gaussian_blur2d(x, 3, 0.8), 62.0),
        "Brightness": (lambda x: adjust_brightness(x, 0.1), 3913.0),
        "Grayscale": (lambda x: grayscale_to_rgb(rgb_to_grayscale(x)),
                      7790.0),
    }
    if os.environ.get("BENCH_REMEASURE_AUG"):
        for name, ref in _measure_torch_aug_baseline(B, H).items():
            ops[name] = (ops[name][0], ref)
    MULT = 32
    speedups, tps = [], []
    for name, (fn, ref) in ops.items():
        imgN = jnp.concatenate([img * (1 - 0.001 * i) for i in range(MULT)],
                               0)
        t1 = _timed(fn, img)
        tN = _timed(fn, imgN)
        dt = max((tN - t1) / (MULT - 1), 1e-7)
        tp = B / dt
        tps.append(tp)
        if ref:
            speedups.append(tp / ref)
    geo = lambda xs: math.exp(sum(math.log(x) for x in xs) / len(xs))
    return geo(tps), geo(speedups)


def _ate_provenance(ate_path):
    """Git hash + staleness of ATE_RESULTS.json vs the last slam/ change.

    VERDICT r4 weak-1: BENCH_r04 embedded a round-3 artifact verbatim with
    nothing recording its age. Stamp the artifact's last commit and flag
    STALE when any slam/VO/ate-bench source changed after it."""
    root = os.path.dirname(os.path.abspath(__file__))

    def last_commit(*paths):
        try:
            out = subprocess.run(
                ["git", "log", "-1", "--format=%h %ct", "--", *paths],
                cwd=root, capture_output=True, text=True, timeout=30)
            h, t = out.stdout.split()
            return h, int(t)
        except Exception:
            return None, None

    ate_h, ate_t = last_commit("ATE_RESULTS.json")
    src_h, src_t = last_commit("kornia_tpu/slam", "kornia_tpu/geometry",
                               "kornia_tpu/feature", "benchmarks/ate_bench.py")
    prov = {"ate_commit": ate_h, "slam_src_commit": src_h}
    if ate_t is not None and src_t is not None:
        prov["stale"] = bool(ate_t < src_t)
        if prov["stale"]:
            prov["note"] = ("STALE: ATE_RESULTS.json predates the last "
                            "slam/geometry/feature change — re-run "
                            "benchmarks/ate_bench.py --save")
    return prov


def _aug_median_of_processes(n=3):
    """Run the aug sweep in n SEPARATE processes and take the median.

    The remote TPU pool schedules identical executables anywhere from
    0.07 ms to 30 ms (CLAUDE.md); a single process's numbers are not
    trendable (VERDICT r4 weak-2: 53k → 182k → 45k across rounds). Median
    of n fresh processes is the honest estimator."""
    me = os.path.abspath(__file__)
    tps, spds = [], []
    for i in range(n):
        r = subprocess.run([sys.executable, me, "--aug-only"],
                           capture_output=True, text=True, timeout=1800)
        line = r.stdout.strip().splitlines()[-1] if r.stdout.strip() else ""
        try:
            d = json.loads(line)
            tps.append(d["aug_tp"])
            spds.append(d["aug_speed"])
        except Exception:
            print(f"aug subprocess {i} failed: {r.stderr[-500:]}",
                  file=sys.stderr)
    if not tps:  # all subprocesses failed: fall back to in-process
        tp, spd = bench_aug()
        return tp, spd, 1
    med = lambda xs: sorted(xs)[len(xs) // 2]
    return med(tps), med(spds), len(tps)


def main():
    if "--aug-only" in sys.argv:
        aug_tp, aug_speed = bench_aug()
        print(json.dumps({"aug_tp": aug_tp, "aug_speed": aug_speed}))
        return

    fps_640 = bench_twoview(480, 640, 1024)
    fps_256 = bench_twoview(256, 256, 512)
    ba_it_s = bench_ba_iters()
    aug_tp, aug_speed, aug_n = _aug_median_of_processes(
        int(os.environ.get("BENCH_AUG_PROCS", "3")))

    out = {
        "metric": "twoview_fps_per_chip_480x640_1024f",
        "value": round(fps_640, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps_640 * REF_TWOVIEW_S_PER_PAIR["480x640"], 2),
        "twoview_fps_256_512f": round(fps_256, 2),
        "twoview_vs_ref_256": round(fps_256 * REF_TWOVIEW_S_PER_PAIR["256"],
                                    2),
        "ba_iters_per_s_c50_p2k_o10k": round(ba_it_s, 1),
        "aug_geomean_img_s_b32_256": round(aug_tp, 1),
        "aug_vs_torch_cpu_same_machine": round(aug_speed, 2),
        "aug_process_count": aug_n,
    }
    ate_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "ATE_RESULTS.json")
    if os.path.exists(ate_path):
        with open(ate_path) as f:
            out["ate"] = json.load(f)
        out["ate"]["provenance"] = _ate_provenance(ate_path)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
