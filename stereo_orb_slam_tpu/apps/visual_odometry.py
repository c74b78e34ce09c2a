"""Visual-odometry-only CLI (no BA / loop closure / pose graph).

Equivalent of the reference `visual_odometry` executable (ref
`src/visual_odometry.cpp:33-123`): per-frame tracking, pose integration with
renormalization, txt + PLY export. This is the minimal end-to-end slice
(BASELINE.json config 1).
"""

from __future__ import annotations

import argparse
import time

import numpy as np

from stereo_orb_slam_tpu.frontend.odometer import VisualOdometer
from stereo_orb_slam_tpu.io import calib, datasets, export
from stereo_orb_slam_tpu.utils import evaluate, logging as slog
from stereo_orb_slam_tpu.worldmap import WorldMap


def main(argv=None):
    from stereo_orb_slam_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    ap = argparse.ArgumentParser(description="TPU-native stereo visual odometry")
    ap.add_argument("--dataset", required=True, help="kitti | EuRoc | other")
    ap.add_argument("--folder", required=True)
    ap.add_argument("--camera", required=True)
    ap.add_argument("--output_dir", default=".")
    ap.add_argument("--output_suffix", default="vo")
    ap.add_argument("--max_frames", type=int, default=0)
    ap.add_argument("--gt", default=None)
    ap.add_argument("--debug_viz", default=None, metavar="DIR",
                    help="write Stereo/Temporal/Tracking debug PNGs "
                         "(the reference's three imshow windows, "
                         "ref visual_odometer.cpp:31-33)")
    ap.add_argument("--debug_viz_every", type=int, default=10)
    args = ap.parse_args(argv)

    pairs = datasets.load_dataset(args.dataset, args.folder)
    if args.max_frames:
        pairs = pairs[: args.max_frames]
    rig = calib.load_camera(args.camera)
    world = WorldMap()
    vo = VisualOdometer(world, rig)

    reader = datasets.PrefetchingReader(pairs)
    t_start = time.perf_counter()
    times = []
    prev_img, prev_slots = None, None
    for i, (img_l, img_r) in enumerate(reader):
        if args.debug_viz:
            prev_slots = vo.prev  # matching state BEFORE this frame's swap
        t0 = time.perf_counter()
        vo.track(img_l, img_r)
        dt = time.perf_counter() - t0
        times.append(dt)
        slog.info(f"frame #{i}: {dt * 1e3:.1f} ms")
        if args.debug_viz and i % max(1, args.debug_viz_every) == 0:
            from stereo_orb_slam_tpu.utils import viz

            viz.save_frame_debug(
                args.debug_viz, i, img_l, img_r, vo.last_result,
                prev_img=prev_img, prev_slots=prev_slots,
            )
        if args.debug_viz and vo.success:
            prev_img = img_l  # temporal view matches against the swapped frame
    total = time.perf_counter() - t_start

    n = world.num_frames
    export.dump_world(args.output_dir, world)
    export.save_poses_ply(
        f"{args.output_dir}/waypoints_{args.output_suffix}.ply",
        world.pose_global[:n],
    )
    export.save_kitti_trajectory(
        f"{args.output_dir}/trajectory_{args.output_suffix}.txt",
        world.pose_global[:n],
    )
    fps = len(pairs) / total
    med_ms = float(np.median(times) * 1e3) if times else 0.0
    slog.info(f"{len(pairs)} frames, {fps:.2f} fps, median {med_ms:.1f} ms/frame")

    if args.gt:
        gt = evaluate.load_kitti_gt(args.gt)
        ate = evaluate.ate_rmse(world.pose_global[:n], gt)
        t_rpe, r_rpe = evaluate.rpe(world.pose_global[:n], gt)
        print(f"ATE RMSE: {ate:.3f} m   RPE: {t_rpe:.4f} m / {r_rpe:.5f} rad")


def cli():
    """Entry point with reference-style [FAIL] messages instead of
    tracebacks for predictable operator errors (ref slam.cpp:45-71)."""
    import sys

    from stereo_orb_slam_tpu.utils import logging as _slog

    try:
        main()
    except FileNotFoundError as e:
        _slog.fail(f"{e.filename or e}: file not found")
        sys.exit(1)
    except ValueError as e:
        _slog.fail(str(e))
        sys.exit(1)


if __name__ == "__main__":
    cli()
