"""Full SLAM over the realistic canyon world THROUGH THE REAL CLI at
production shapes (r4 directive 6).

CanyonScene renders a continuous piecewise-planar world — every pixel
textured, true per-plane homographies under motion, natural-image
statistics. r4 upgrades over the r3 harness:

- PRODUCTION shapes: 376x1241 frames, 1024 features (the bench/headline
  configuration), >= 1,000 frames.
- Trajectory with TWO mid-run loop episodes: square circuit A (novel),
  A again (revisit -> episode 1), a smaller square B (novel territory ->
  Bayes decay -> loop EXIT fires the mid-run pose graph), then A again
  (revisit -> episode 2), closed by finish().
- Driven through the REAL CLI (`apps.slam.main`) over a KITTI-format
  folder written to disk — the same loader/decode path a user runs — with
  one untimed warm pass first (jit + persistent cache), then the timed
  pass. Accuracy and speed come from the SAME run.

Writes CANYON_E2E_r{N}.json.

Usage: python -m benchmarks.canyon_drive [--frames 1216] [--batch 32]
       [--out CANYON_E2E_r04.json] [--cpu] [--small] [--skip_warm]
"""

import argparse
import contextlib
import io
import json
import os
import re
import sys
import time

import numpy as np

from stereo_orb_slam_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()


def two_episode_trajectory(frames: int, side_a: float, side_b: float):
    """[N,4,4] poses: A, A, B, A, B, A — sustained revisit phases separated
    by novel-territory circuits (see module docstring). Six segments keep
    the per-frame step near 60 mm (per-step triangulation noise is roughly
    step-size independent, so longer steps drift less per metre)."""
    sys.path.insert(0, __file__.rsplit("/", 2)[0] + "/tests")
    from synth import loop_trajectory

    if frames >= 900:
        seg = max(16, frames // 6 // 4 * 4)
        tA = loop_trajectory(seg, side=side_a)
        tB = loop_trajectory(seg, side=side_b)
        traj = np.concatenate([tA, tA, tB, tA, tB, tA])
    else:
        # Small/smoke scale: six segments would leave too few frames per
        # leg (degenerate per-frame yaw). One circuit + one revisit.
        seg = max(16, frames // 2 // 4 * 4)
        tA = loop_trajectory(seg, side=side_a)
        traj = np.concatenate([tA, tA])
    return traj[:frames]


def write_kitti(folder: str, frames, traj, fx, cx, cy, baseline):
    from PIL import Image

    os.makedirs(folder + "/image_0", exist_ok=True)
    os.makedirs(folder + "/image_1", exist_ok=True)
    for i, (l, r) in enumerate(frames):
        Image.fromarray(l, "L").save(f"{folder}/image_0/{i:06d}.png")
        Image.fromarray(r, "L").save(f"{folder}/image_1/{i:06d}.png")
    with open(folder + "/calib.txt", "w") as f:
        f.write(f"P0: {fx} 0 {cx} 0 0 {fx} {cy} 0 0 0 1 0\n")
        f.write(f"P1: {fx} 0 {cx} {-fx * baseline} 0 {fx} {cy} 0 0 0 1 0\n")
    gt_path = folder + "/gt.txt"
    with open(gt_path, "w") as f:
        for T in traj:
            f.write(" ".join(f"{v:.6f}" for v in np.asarray(T)[:3, :].reshape(12))
                    + "\n")
    return gt_path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=1216)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--side", type=float, default=3.0)
    ap.add_argument("--side_b", type=float, default=2.0)
    ap.add_argument("--features", type=int, default=1024)
    ap.add_argument("--h", type=int, default=376)
    ap.add_argument("--w", type=int, default=1241)
    ap.add_argument("--noise", type=float, default=1.0)
    ap.add_argument("--dataset_dir", default="/tmp/canyon_kitti")
    ap.add_argument("--out", default="CANYON_E2E_r04.json")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--skip_warm", action="store_true")
    ap.add_argument("--reuse_dataset", action="store_true",
                    help="skip rendering when the dataset folder already "
                         "holds the requested frame count")
    ap.add_argument("--loop_query_size", type=int, default=8,
                    help="BoW top-k (8: keeps distant candidates visible "
                         "during long revisits; the r3 canyon needed the "
                         "same)")
    ap.add_argument("--small", action="store_true",
                    help="fast smoke configuration (CPU CI): 192 frames, "
                         "320x480, 384 features, batch 8")
    ap.add_argument("--no_preload_device", action="store_true",
                    help="feed frames through the per-batch relay upload "
                         "instead of staging them in HBM first; the "
                         "~38 MB/s link then caps the drive at ~40 fps "
                         "regardless of compute (recorded as "
                         "transport_floor_fps in the JSON)")
    ap.add_argument("--live_ba_iterations", type=int, default=20,
                    help="deeper-than-default live window-BA budget: the "
                         "canyon's 2%% ATE gate needs the extra polish and "
                         "the r5 live loop has the fps headroom")
    ap.add_argument("--finish_seconds", type=float, default=150.0,
                    help="declared finish-stage wall budget forwarded to "
                         "the CLI (r5 directive 8); 0 = uncapped")
    args = ap.parse_args()
    if args.small:
        args.frames, args.h, args.w = 192, 320, 480
        args.features, args.batch = 384, 8

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    sys.path.insert(0, __file__.rsplit("/", 2)[0] + "/tests")
    from synth import CanyonScene

    from stereo_orb_slam_tpu.apps import slam as slam_app
    from stereo_orb_slam_tpu.utils import evaluate

    rng = np.random.default_rng(7)
    # Intrinsics scaled to the requested resolution (default canyon is
    # 320x480 / fx=300; production 376x1241 keeps a comparable FOV).
    sx = args.w / 480.0
    fx = 300.0 * sx
    cx, cy = args.w / 2.0, args.h / 2.0
    scene = CanyonScene(rng, fx=fx, cx=cx, cy=cy, h=args.h, w=args.w,
                        noise_sigma=args.noise)
    traj = two_episode_trajectory(args.frames, args.side, args.side_b)
    # Six equal segments may not divide --frames exactly; the DRIVE length
    # is the trajectory's (the r5 reuse check compared against --frames and
    # silently re-rendered ~9 min every run).
    args.frames = len(traj)

    t_render = time.time()
    img0 = args.dataset_dir + "/image_0"
    have = (len(os.listdir(img0)) if os.path.isdir(img0) else 0)
    if args.reuse_dataset and have >= args.frames:
        gt_path = args.dataset_dir + "/gt.txt"
    else:
        frames = [(l.astype(np.uint8), r.astype(np.uint8))
                  for (l, r) in scene.render_sequence(traj)]
        gt_path = write_kitti(args.dataset_dir, frames, traj, fx, cx, cy,
                              scene.baseline)
        del frames
    t_render = time.time() - t_render

    cli = ["--dataset", "kitti", "--folder", args.dataset_dir,
           "--camera", args.dataset_dir + "/calib.txt",
           "--output_dir", args.dataset_dir + "/out",
           "--batch_frames", str(args.batch),
           "--num_features", str(args.features),
           "--loop_query_size", str(args.loop_query_size),
           "--ransac_refit",
           "--live_ba_iterations", str(args.live_ba_iterations),
           "--finish_seconds", str(args.finish_seconds),
           "--gt", gt_path]
    if not args.no_preload_device:
        cli.append("--preload_device")

    def run_cli():
        buf = io.StringIO()
        t0 = time.time()
        with contextlib.redirect_stdout(buf), contextlib.redirect_stderr(buf):
            slam_app.main(cli)
        return time.time() - t0, buf.getvalue()

    t_warm = 0.0
    if not args.skip_warm:
        t_warm, _ = run_cli()
    t_total, out = run_cli()

    def grab(pat, default=None):
        m = re.search(pat, out)
        return float(m.group(1)) if m else default

    live_fps = grab(r"live loop: ([\d.]+) fps")
    ate_live = grab(r"live ATE RMSE: ([\d.]+) m")
    ate = grab(r"(?<!live )ATE RMSE: ([\d.]+) m")
    rpe_t = grab(r"RPE: ([\d.]+) m")
    # Loop EPISODES from the CLI's loop trace artifact: upward crossings
    # of the is_loop threshold in the per-frame Bayes probability.
    episodes, p_max = 0, 0.0
    trace = args.dataset_dir + "/out/loop_matches.txt"
    if os.path.exists(trace):
        probs = [float(m.group(1)) for m in re.finditer(
            r"probability = ([\d.eE+-]+)", open(trace).read())]
        if probs:
            from stereo_orb_slam_tpu.config import LoopConfig

            p = np.asarray(probs)
            # Same threshold source as endurance.py (config, not a literal),
            # so the two harnesses can't disagree if the default moves.
            above = p > LoopConfig().is_loop_thresh
            episodes = int(np.sum(above[1:] & ~above[:-1])
                           + (1 if above[:1].any() else 0))
            p_max = float(p.max())
    path_len = float(np.sum(np.linalg.norm(
        np.diff(traj[:, :3, 3], axis=0), axis=1)))

    # Per-segment ATE (r5 directive 5: attribute error growth along the
    # drive): aligned global ATE evaluated over six equal frame segments.
    seg_ate = None
    traj_file = args.dataset_dir + "/out/trajectory_slam.txt"
    if os.path.exists(traj_file) and os.path.exists(gt_path):
        from stereo_orb_slam_tpu.utils import evaluate

        gt = evaluate.load_kitti_gt(gt_path)
        est = evaluate.load_kitti_gt(traj_file)
        m = min(len(gt), len(est))
        segs = np.array_split(np.arange(m), 6)
        seg_ate = []
        for s in segs:
            if len(s) < 2:
                continue
            seg_ate.append(round(float(
                evaluate.ate_rmse(est[s], gt[s])), 3))

    result = {
        "what": ("full SLAM through the REAL CLI on the ray-traced canyon "
                 "world at production shapes; A-A-B-A-B-A trajectory with "
                 "sustained revisit episodes; REFERENCE matching gates (30/0.5)"),
        "frames": args.frames,
        "image_size": f"{args.h}x{args.w}",
        "num_features": args.features,
        "batch_frames": args.batch,
        "noise_sigma": args.noise,
        "render_seconds": round(t_render, 1),
        "frames_device_resident": not args.no_preload_device,
        "warm_pass_seconds": round(t_warm, 1),
        "live_fps": live_fps,
        "total_seconds_timed_pass": round(t_total, 1),
        "finish_budget_seconds": args.finish_seconds,
        "ate_live_m": ate_live,
        "ate_final_m": ate,
        "trajectory_path_m": round(path_len, 1),
        "ate_pct_of_path": (round(100.0 * ate / path_len, 3)
                            if ate is not None else None),
        "rpe_trans_m": rpe_t,
        "ate_m_by_sixth": seg_ate,
        "loop_episodes": episodes,
        "bayes_p_max": round(p_max, 3),
    }
    text = json.dumps(result, indent=1)
    print(text)
    with open(args.out, "w") as f:
        f.write(text + "\n")


if __name__ == "__main__":
    main()
