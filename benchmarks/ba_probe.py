#!/usr/bin/env python
"""Root-cause probe for the round-5 orbit BA regression.

Runs chained VO once on the degraded orbit, then feeds the SAME keyframe
track tables to the global bundle adjustment from two different
initializations:

  gt-init       keyframe poses set to ground truth
  chained-init  the odometry chain (normal path)

If BA started AT ground truth walks away from it, the problem is not the
init basin — it's the observation model (biased keypoints, contaminated
tracks, wrong robust weighting). If gt-init stays at GT but chained-init
degrades, it's a basin/annealing problem.

Usage: python benchmarks/ba_probe.py [--frames 60] [--seq orbit]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=60)
    ap.add_argument("--size", type=int, nargs=2, default=(480, 640))
    ap.add_argument("--seq", type=str, default="orbit",
                    choices=("walk", "orbit", "loop"))
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--ba-iters", type=int, default=None)
    ap.add_argument("--gnc", type=float, nargs=3, default=None)
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from kornia_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    import jax.numpy as jnp
    import numpy as np

    from kornia_tpu.metrics.metrics import ate_rmse
    from kornia_tpu.slam.vo import VisualOdometry
    from kornia_tpu.utils.render import (degrade_sequence, loop_trajectory,
                                         make_room_scene, orbit_trajectory,
                                         render_sequence, walk_trajectory)

    H, W = args.size
    K = jnp.array([[0.8 * W, 0.0, W / 2], [0.0, 0.8 * W, H / 2],
                   [0.0, 0.0, 1.0]], jnp.float32)
    scene = make_room_scene(tex_size=512 if max(H, W) > 350 else 256)
    traj = {"walk": lambda n: walk_trajectory(n, depth=10.0),
            "orbit": orbit_trajectory,
            "loop": lambda n: loop_trajectory(n, rx=1.2, rz=2.4)}[
        args.seq](args.frames)
    frames, _ = render_sequence(scene, K, traj, H, W)
    frames = degrade_sequence(frames, jax.random.PRNGKey(5))

    def cam_centers(poses):
        return np.stack([-p[:3, :3].T @ p[:3, 3] for p in poses])

    gt_c = cam_centers(traj)
    L = float(np.sum(np.linalg.norm(np.diff(gt_c, axis=0), axis=1)))

    def ate(poses):
        return float(ate_rmse(jnp.asarray(cam_centers(poses)),
                              jnp.asarray(gt_c), with_scale=True))

    vo_kw = {}
    if args.ba_iters is not None:
        vo_kw["ba_iters"] = args.ba_iters
    if args.gnc is not None:
        vo_kw["gnc_deltas"] = tuple(args.gnc)
    vo = VisualOdometry(K, num_features=512, **vo_kw)
    res = vo.run(frames, refine=False)
    kf = vo.kf_frames
    kf_kps, kf_next, kf_inl = vo._kf_tracks
    print(f"{len(kf)} keyframes / {args.frames} frames; "
          f"chained ATE {ate(res.poses):.4f} ({100*ate(res.poses)/L:.2f}%)")

    def kf_ate(kf_poses):
        gt_kf = jnp.asarray(np.stack([gt_c[k] for k in kf]))
        c = jnp.asarray(cam_centers(kf_poses))
        return float(ate_rmse(c, gt_kf, with_scale=True))

    for label, init in (("gt-init", [traj[k].astype(np.float64) for k in kf]),
                        ("chained-init", [res.poses[k] for k in kf])):
        before = kf_ate(init)
        refined = vo._refine_tracks(kf_kps, kf_next, kf_inl,
                                    [p.copy() for p in init])
        after = kf_ate(refined)
        print(f"{label:>14}: kf-ATE {before:.4f} ({100*before/L:.2f}%) -> "
              f"{after:.4f} ({100*after/L:.2f}%)")


if __name__ == "__main__":
    main()
