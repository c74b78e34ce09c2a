"""Offline refinement: restore a dumped problem and re-run global BA.

Workflow the reference implicitly supports via its constraints dump
(SURVEY.md §5.4) but provides no tool for: load poses/points/constraints,
run (optionally distributed) global bundle adjustment, write the refined
dump back.
"""

from __future__ import annotations

import argparse

from stereo_orb_slam_tpu.backend.ba import BundleAdjuster
from stereo_orb_slam_tpu.config import BAConfig
from stereo_orb_slam_tpu.io import calib, checkpoint, export
from stereo_orb_slam_tpu.utils import logging as slog


def main(argv=None):
    from stereo_orb_slam_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    ap = argparse.ArgumentParser(description="Offline global BA over a dump")
    ap.add_argument("--input_dir", required=True)
    ap.add_argument("--camera", required=True)
    ap.add_argument("--output_dir", required=True)
    ap.add_argument("--iterations", type=int, default=50)
    ap.add_argument("--distributed", action="store_true",
                    help="shard observations over all local devices")
    args = ap.parse_args(argv)

    world = checkpoint.restore_world(args.input_dir)
    rig = calib.load_camera(args.camera)
    cfg = BAConfig(max_iterations=args.iterations)

    if args.distributed:
        from stereo_orb_slam_tpu.parallel.dist_ba import DistributedBundleAdjuster
        from stereo_orb_slam_tpu.parallel.mesh import make_mesh

        adj = DistributedBundleAdjuster(world, rig, make_mesh(), cfg)
    else:
        adj = BundleAdjuster(world, rig, cfg)

    stats = adj.optimize(0, world.num_frames)
    slog.info(f"global BA: {stats}")
    export.dump_world(args.output_dir, world)
    export.save_kitti_trajectory(
        f"{args.output_dir}/trajectory_refined.txt",
        world.pose_global[: world.num_frames],
    )


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
