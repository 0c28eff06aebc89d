#!/usr/bin/env python
"""North-star trajectory accuracy: ATE RMSE on rendered GT sequences.

Real TUM/ETH3D data cannot be staged (no network egress), so the harness
renders exact-ground-truth sequences with the same structure classes
(TUM-style handheld forward walk, ETH3D-style inward orbit) via the
analytic ray tracer in kornia_tpu/utils/render.py.

Three pipelines are compared on IDENTICAL correspondences:
  ours-chained   kornia_tpu two-view E/H RANSAC + scale propagation
  ours-refined   + global/windowed bundle adjustment over chained tracks
  reference      kornia (torch CPU) 5-point essential RANSAC
                 (geometry/ransac.py:42 + epipolar/essential.py:748) on the
                 same matches, poses chained with GT step scale

The reference pipeline has no scale propagation or BA, so its chaining is
given GROUND-TRUTH per-step baselines (the standard two-view eval
protocol — generous to the reference). Ours-chained uses its own
propagated scales; ATE alignment is Sim(3) (Umeyama with scale).

Usage: python benchmarks/ate_bench.py [--frames 12] [--size 240 320] [--cpu]
"""

from __future__ import annotations

import argparse
import os
import sys
import time
import types

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def cam_centers(poses):
    import numpy as np
    return np.stack([-p[:3, :3].T @ p[:3, 3] for p in poses])


def run_reference_chained(kps, pair_next, pair_inl_mask, K_np, traj, rng_seed=0):
    """Reference kornia two-view pipeline on OUR matches; GT step scale."""
    import numpy as np
    sys.path.append("/root/reference")
    sys.modules.setdefault("kornia_rs", types.ModuleType("kornia_rs"))
    import torch
    import kornia.geometry as KG

    f = 0.5 * float(K_np[0, 0] + K_np[1, 1])
    ransac = KG.RANSAC(model_type="essential", inl_th=1.5 / f,
                       batch_size=1024, max_iter=8)
    Kt = torch.from_numpy(K_np).float()
    eye = torch.eye(3)[None]
    poses = [np.eye(4)]
    T_prev = np.eye(4)
    for i in range(1, len(kps)):
        nxt = pair_next[i - 1]
        valid = pair_inl_mask[i - 1]
        js = np.nonzero(valid)[0]
        kp0 = torch.from_numpy(kps[i - 1][js]).float()
        kp1 = torch.from_numpy(kps[i][nxt[js]]).float()
        x0 = KG.normalize_points_with_intrinsics(kp0[None], Kt[None])
        x1 = KG.normalize_points_with_intrinsics(kp1[None], Kt[None])
        try:
            E, _ = ransac(x0[0], x1[0], weights=None)
            R, t, _ = KG.motion_from_essential_choose_solution(
                E[None], eye, eye, x0, x1)
            R = R[0].numpy()
            tdir = t[0, :, 0].numpy()
            tdir = tdir / max(np.linalg.norm(tdir), 1e-9)
        except Exception as e:  # degenerate pair: keep previous motion
            print(f"  [reference] step {i} failed: {e}", file=sys.stderr)
            R = np.eye(3)
            tdir = np.zeros(3)
        # GT scale (monocular ambiguity resolved for the reference)
        Trel_gt = traj[i] @ np.linalg.inv(traj[i - 1])
        s = np.linalg.norm(Trel_gt[:3, 3])
        Trel = np.eye(4)
        Trel[:3, :3] = R
        Trel[:3, 3] = s * tdir
        T_prev = Trel @ T_prev
        poses.append(T_prev.copy())
    return poses


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=12)
    ap.add_argument("--size", type=int, nargs=2, default=(240, 320))
    ap.add_argument("--features", type=int, default=512)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--skip-reference", action="store_true")
    ap.add_argument("--degrade", action="store_true",
                    help="exposure drift + sensor noise + motion blur "
                         "(utils/render.py degrade_sequence) — the "
                         "photometric nuisances a clean render cannot "
                         "exercise (VERDICT r2 item 3)")
    ap.add_argument("--loop", action="store_true",
                    help="add a closed-circuit sequence and report "
                         "odometry-only vs loop-closed ATE")
    ap.add_argument("--save", action="store_true",
                    help="write repo-root ATE_RESULTS.json (picked up by "
                         "bench.py as headline metadata)")
    ap.add_argument("--kf-parallax", type=float, default=None,
                    help="override VisualOdometry keyframe parallax gate")
    ap.add_argument("--ba-iters", type=int, default=None,
                    help="override VisualOdometry ba_iters")
    ap.add_argument("--gnc", type=float, nargs=3, default=None,
                    help="override GNC deltas (wide cauchy tight)")
    ap.add_argument("--no-incremental-ba", action="store_true")
    ap.add_argument("--incremental-ba-mode", type=str, default=None,
                    choices=("map-only",),
                    help="map-only: incremental window BA refines the map "
                         "fed to PnP but never writes poses back")
    ap.add_argument("--window", type=int, default=None,
                    help="override VO sliding/incremental window size")
    ap.add_argument("--incremental-fix", type=int, default=None,
                    help="fixed-prefix size of incremental windows "
                         "(covisibility-anchor approximation)")
    ap.add_argument("--global-ba-passes", type=int, default=None)
    ap.add_argument("--no-ba-map-feedback", action="store_true")
    ap.add_argument("--ba-track-budget", type=int, default=None,
                    help="override VO ba_track_budget (static track cap "
                         "for the window/global BA)")
    ap.add_argument("--global-ba-frames", type=int, default=None,
                    help="override VO global_ba_frames (set <3 to force "
                         "the sliding-window final pass instead of the "
                         "two-pass global BA)")
    ap.add_argument("--ransac-iters", type=int, default=32,
                    help="RANSAC max iterations (early exit prunes)")
    ap.add_argument("--pg-optimizer", type=str, default="se3",
                    choices=("se3", "sim3"),
                    help="loop-closure pose-graph parameterization")
    ap.add_argument("--pg-iters", type=int, default=40)
    ap.add_argument("--smooth-first", action="store_true",
                    help="skip-edge pose-graph smoothing of the CHAINED "
                         "poses, then global BA from that init "
                         "(refine_from_cache) — tests whether the "
                         "smoothed chain lands BA in a better basin")
    ap.add_argument("--kf-smooth", action="store_true",
                    help="skip-edge keyframe pose-graph smoothing after "
                         "refinement (smooth_keyframe_graph)")
    ap.add_argument("--kf-smooth-skips", type=int, nargs="+",
                    default=(2, 4))
    ap.add_argument("--post-ba", action="store_true",
                    help="re-run the cached keyframe BA from the "
                         "loop-closed poses (global-BA-after-closure)")
    ap.add_argument("--seqs", type=str, default=None,
                    help="comma-separated prefixes to run (walk,orbit,loop)")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from kornia_tpu.utils import enable_compilation_cache
    enable_compilation_cache()  # reuse detector/pair/BA executables across runs
    import jax.numpy as jnp
    import numpy as np

    from kornia_tpu.metrics.metrics import ate_rmse
    from kornia_tpu.slam.loop_closure import close_loops
    from kornia_tpu.slam.vo import VisualOdometry, VOResult
    from kornia_tpu.utils.render import (degrade_sequence, loop_trajectory,
                                         make_room_scene, orbit_trajectory,
                                         render_sequence, walk_trajectory)

    H, W = args.size
    K = jnp.array([[0.8 * W, 0.0, W / 2], [0.0, 0.8 * W, H / 2],
                   [0.0, 0.0, 1.0]], jnp.float32)
    K_np = np.asarray(K)
    scene = make_room_scene(tex_size=512 if max(H, W) > 350 else 256)

    seqs = [
        ("walk (TUM-style)", walk_trajectory(args.frames, depth=10.0)),
        ("orbit (ETH3D-style)", orbit_trajectory(args.frames)),
    ]
    if args.loop:
        seqs.append(("loop (closed circuit)",
                     loop_trajectory(args.frames, rx=1.2, rz=2.4)))

    if args.seqs:
        pref = tuple(s.strip() for s in args.seqs.split(","))
        seqs = [(n, t) for n, t in seqs if n.startswith(pref)]

    vo_kw = {}
    if args.kf_parallax is not None:
        vo_kw["kf_parallax"] = args.kf_parallax
    if args.ba_iters is not None:
        vo_kw["ba_iters"] = args.ba_iters
    if args.gnc is not None:
        vo_kw["gnc_deltas"] = tuple(args.gnc)
    if args.global_ba_frames is not None:
        vo_kw["global_ba_frames"] = args.global_ba_frames
    if args.ba_track_budget is not None:
        vo_kw["ba_track_budget"] = args.ba_track_budget
    if args.no_incremental_ba:
        vo_kw["incremental_ba"] = False
    if args.incremental_ba_mode is not None:
        vo_kw["incremental_ba"] = args.incremental_ba_mode
    if args.window is not None:
        vo_kw["window"] = args.window
    if args.incremental_fix is not None:
        vo_kw["incremental_fix"] = args.incremental_fix
    if args.global_ba_passes is not None:
        vo_kw["global_ba_passes"] = args.global_ba_passes
    if args.no_ba_map_feedback:
        vo_kw["ba_map_feedback"] = False

    rows = []
    for name, traj in seqs:
        frames, _ = render_sequence(scene, K, traj, H, W)
        if args.degrade:
            frames = degrade_sequence(frames, jax.random.PRNGKey(5))
        gt_c = cam_centers(traj)
        L = float(np.sum(np.linalg.norm(np.diff(gt_c, axis=0), axis=1)))
        vo = VisualOdometry(K, num_features=args.features,
                            ransac_iters=args.ransac_iters,
                            ransac_batch=256, **vo_kw)

        t0 = time.perf_counter()
        res_ch = vo.run(frames, refine=False)
        t_ch = time.perf_counter() - t0
        t0 = time.perf_counter()
        res_rf = vo.run(frames, refine=True)
        t_rf = time.perf_counter() - t0

        def ate(poses):
            return float(ate_rmse(jnp.asarray(cam_centers(poses)),
                                  jnp.asarray(gt_c), with_scale=True))

        a_ch, a_rf = ate(res_ch.poses), ate(res_rf.poses)
        if args.smooth_first:
            sm = vo.smooth_keyframes(res_ch.poses,
                                     skips=tuple(args.kf_smooth_skips))
            rf2 = vo.refine_from_cache(sm)
            print(f"  [smooth-first] chained {100*a_ch/L:.2f}% -> smoothed "
                  f"{100*ate(sm)/L:.2f}% -> BA {100*ate(rf2)/L:.2f}%")
            res_rf = VOResult(poses=rf2, num_inliers=res_rf.num_inliers)
            a_rf = ate(rf2)
        if args.kf_smooth:
            sm = vo.smooth_keyframes(res_rf.poses,
                                     skips=tuple(args.kf_smooth_skips))
            a_sm = ate(sm)
            print(f"  [smooth] refined {a_rf:.4f} ({100*a_rf/L:.2f}%) -> "
                  f"smoothed {a_sm:.4f} ({100*a_sm/L:.2f}%)")
            # unconditional adoption (GT-aware selection would be
            # cheating): --kf-smooth is a pipeline config, not an oracle
            res_rf = VOResult(poses=sm, num_inliers=res_rf.num_inliers)
            a_rf = a_sm

        a_lc = float("nan")
        if name.startswith("loop"):
            from kornia_tpu.slam.loop_closure import (
                detect_loop_candidates, global_descriptors, verify_loop)
            f = float(K_np[0, 0])
            gdesc = global_descriptors(vo.frame_cache)
            cands = detect_loop_candidates(
                gdesc, max(args.frames // 4, 10), 0.75)
            print(f"  [loop] candidates: {cands[:5]}")
            for ci, cj, cs in cands[:3]:
                _T, _n, _nm = verify_loop(vo.frame_cache, res_rf.poses,
                                          ci, cj, K_np, inl_th=1.5 / f)
                print(f"  [loop] verify i={ci} j={cj} sim={cs:.3f} "
                      f"inl={_n} map={_nm}")
            closed, lc_edges = close_loops(
                vo.frame_cache, res_rf.poses, K_np,
                min_separation=max(args.frames // 4, 10), sim_th=0.75,
                min_inliers=15, min_inlier_frac=0.35, inl_th=1.5 / f,
                loop_weight=10.0,
                pg_iters=args.pg_iters, optimizer=args.pg_optimizer)
            if args.post_ba and lc_edges:
                closed_ba = vo.refine_from_cache(closed)
                print(f"  [loop] post-BA: closed {ate(closed):.4f} -> "
                      f"{ate(closed_ba):.4f}")
                closed = closed_ba
            a_lc = ate(closed)
            print(f"  [loop] accepted edges: "
                  f"{[(e.i, e.j, e.num_inliers) for e in lc_edges]} "
                  f"refined {a_rf:.4f} -> closed {a_lc:.4f}")

        a_ref = float("nan")
        if not args.skip_reference:
            # replay detection/matching to hand the reference OUR raw
            # mutual-SNN matches (pre-RANSAC) — it runs its own RANSAC
            from kornia_tpu.feature.matching import match_smnn
            detect = vo._detect_fn()
            match = jax.jit(lambda a, b, va, vb: match_smnn(
                a, b, vo.matcher_th, va, vb))
            kps, nexts, matchmask = [], [], []
            kp_p, d_p, v_p = detect(frames[0])
            kps.append(np.asarray(kp_p))
            for i in range(1, len(frames)):
                kp_c, d_c, v_c = detect(frames[i])
                _dist, idx, mvalid = match(d_p, d_c, v_p, v_c)
                kps.append(np.asarray(kp_c))
                nexts.append(np.asarray(idx[:, 1]))
                matchmask.append(np.asarray(mvalid))
                kp_p, d_p, v_p = kp_c, d_c, v_c
            ref_poses = run_reference_chained(kps, nexts, matchmask, K_np,
                                              traj)
            a_ref = ate(ref_poses)

        rows.append((name, L, a_ch, a_rf, a_lc, a_ref, t_ch, t_rf))

    print(f"\n== ATE RMSE (Sim3-aligned), {args.frames} frames at {H}x{W}, "
          f"{args.features} features, device={jax.devices()[0].platform} ==")
    print(f"{'sequence':<22}{'len':>6}{'chained':>10}{'refined':>10}"
          f"{'closed':>9}{'reference':>11}{'t_chain':>9}{'t_refine':>10}")
    for name, L, a_ch, a_rf, a_lc, a_ref, t_ch, t_rf in rows:
        print(f"{name:<22}{L:>6.2f}{a_ch:>10.4f}{a_rf:>10.4f}{a_lc:>9.4f}"
              f"{a_ref:>11.4f}{t_ch:>8.1f}s{t_rf:>9.1f}s")
    for name, L, a_ch, a_rf, a_lc, a_ref, *_ in rows:
        print(f"{name}: chained {100*a_ch/L:.2f}%  refined {100*a_rf/L:.2f}%"
              f"  closed {100*a_lc/L:.2f}%"
              f"  reference {100*a_ref/L:.2f}%  (of trajectory length)")

    if args.save:
        import json
        payload = {
            "config": {"frames": args.frames, "size": [H, W],
                       "features": args.features, "degrade": args.degrade,
                       "device": jax.devices()[0].platform,
                       "vo_overrides": dict(vo_kw, ransac_iters=args
                                            .ransac_iters),
                       "note": "rendered exact-GT sequences "
                               "(utils/render.py); ATE RMSE after Sim3 "
                               "alignment; reference = kornia 5-pt RANSAC "
                               "chained with GT step scales on identical "
                               "matches"},
            "sequences": {
                name: {"length": round(L, 3),
                       "ours_chained": round(a_ch, 4),
                       "ours_refined": round(a_rf, 4),
                       "ours_loop_closed": (None if a_lc != a_lc
                                            else round(a_lc, 4)),
                       "reference": (None if a_ref != a_ref
                                     else round(a_ref, 4)),
                       "ours_refined_pct": round(100 * a_rf / L, 2),
                       "reference_pct": (None if a_ref != a_ref
                                         else round(100 * a_ref / L, 2))}
                for name, L, a_ch, a_rf, a_lc, a_ref, *_ in rows},
        }
        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        with open(os.path.join(root, "ATE_RESULTS.json"), "w") as f:
            json.dump(payload, f, indent=1)
        print("saved ATE_RESULTS.json")


if __name__ == "__main__":
    main()
