"""Full SLAM over the realistic canyon scene with a closed loop trajectory.

The realism harness at SEQUENCE scale (r2 verdict items 3 + 4 combined):
CanyonScene renders a continuous piecewise-planar world — every pixel
textured, true per-plane homographies under motion, natural-image
statistics — and the camera drives a closed square loop with four 90-degree
yaw turns, returning to its start. The full SlamSystem runs at the
REFERENCE matching gates (30 / 0.5, ref src/params.h:12,15): tracking
through the turns, BoW loop detection on the revisit, pose graph + global
BA at finish. ATE is reported against the exact trajectory both for raw VO
chaining and the final optimized map.

Writes CANYON_E2E_r{N}.json.

Usage: python -m benchmarks.canyon_drive [--frames 192] [--batch 16]
       [--out CANYON_E2E_r03.json] [--cpu]
"""

import argparse
import json
import sys
import time

import numpy as np

from stereo_orb_slam_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=192)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--side", type=float, default=3.2)
    ap.add_argument("--features", type=int, default=384)
    ap.add_argument("--noise", type=float, default=1.0)
    ap.add_argument("--out", default="CANYON_E2E_r03.json")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    sys.path.insert(0, __file__.rsplit("/", 2)[0] + "/tests")
    from synth import CanyonScene, loop_trajectory

    from stereo_orb_slam_tpu.apps.slam import SlamSystem
    from stereo_orb_slam_tpu.config import (
        FrontendConfig, LoopConfig, RansacConfig, SlamConfig,
    )
    from stereo_orb_slam_tpu.io.datasets import DeviceBatchReader
    from stereo_orb_slam_tpu.utils import evaluate

    rng = np.random.default_rng(7)
    scene = CanyonScene(rng, noise_sigma=args.noise)
    # One full circuit takes 2/3 of the frames; the rest re-drives the
    # first legs, giving the Bayes filter a sustained revisit to integrate
    # over (it needs ~8 consecutive hits from p=0.005 to cross 0.9).
    circuit = max(8, (args.frames * 2 // 3) // 4 * 4)
    traj_c = loop_trajectory(circuit, side=args.side)
    traj = np.concatenate([traj_c, traj_c[: args.frames - circuit]])

    cfg = SlamConfig().replace(
        frontend=FrontendConfig(num_features=args.features),  # ref gates
        ransac=RansacConfig(final_model_fitting=True, min_pairs=8),
        refine_interval=8,
        batch_frames=args.batch,
        loop=LoopConfig(distant_frame_thresh=40, query_size=8,
                        database_capacity=512),
    )
    system = SlamSystem(scene.make_rig(), cfg, vocab_train_frames=12)

    t_render = time.time()
    frames = [(l.astype(np.uint8), r.astype(np.uint8))
              for (l, r) in scene.render_sequence(traj)]
    t_render = time.time() - t_render

    t0 = time.time()
    reader = DeviceBatchReader(frames, args.batch)
    for dl, dr in reader:
        system.process_batch(dl, dr)
    for l, r in reader.remainder:
        system.process(l, r)
    system.flush()
    t_live = time.time() - t0

    w = system.world
    n = w.num_frames
    ate_vo = float(evaluate.ate_rmse(w.pose_global[:n], traj[:n]))
    p_max = (max(system.loop.probabilities)
             if system.loop and system.loop.probabilities else 0.0)

    t0 = time.time()
    stats = system.finish()
    t_finish = time.time() - t0
    ate_final = float(evaluate.ate_rmse(w.pose_global[:n], traj[:n]))
    t_rpe, r_rpe = evaluate.rpe(w.pose_global[:n], traj[:n])

    result = {
        "what": ("full SLAM on the ray-traced canyon world, closed square "
                 "loop, REFERENCE matching gates (30/0.5)"),
        "frames": int(n),
        "total_frames": args.frames,
        "loop_side_m": args.side,
        "noise_sigma": args.noise,
        "num_features": args.features,
        "render_seconds": round(t_render, 1),
        "live_fps": round(args.frames / t_live, 2),
        "bayes_p_max": round(float(p_max), 3),
        "loop_edges_final": stats.get("pose_graph", {}).get("num_loop_edges"),
        "ate_vo_m": round(ate_vo, 4),
        "ate_final_m": round(ate_final, 4),
        "rpe_trans_m": round(float(t_rpe), 4),
        "rpe_rot_rad": round(float(r_rpe), 5),
        "finish_seconds": round(t_finish, 1),
        "num_points": int(w.num_points),
    }
    out = json.dumps(result, indent=1)
    print(out)
    with open(args.out, "w") as f:
        f.write(out + "\n")


if __name__ == "__main__":
    main()
