"""Offline vocabulary trainer.

Builds the flat BoW codebook from a dataset's images (the counterpart of the
reference's prebuilt DBoW2 vocabulary at ref `src/slam.cpp:101`; the
reference cannot train one — its commented-out ctor at
`src/loop_detector.cpp:8-16` was dead code).

    python -m stereo_orb_slam_tpu.apps.train_vocab \
        --dataset kitti --folder .../sequences/00 --out vocab.npz \
        --stride 10 --words 1024
"""

from __future__ import annotations

import argparse

import jax.numpy as jnp
import numpy as np

from stereo_orb_slam_tpu.config import FrontendConfig
from stereo_orb_slam_tpu.frontend.odometer import detect_and_describe
from stereo_orb_slam_tpu.io import datasets
from stereo_orb_slam_tpu.loop import OrbVocabulary
from stereo_orb_slam_tpu.utils import logging as slog
from stereo_orb_slam_tpu.utils.cache import enable_compilation_cache


def main(argv=None):
    enable_compilation_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", required=True)
    ap.add_argument("--folder", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--stride", type=int, default=10,
                    help="use every Nth frame")
    ap.add_argument("--words", type=int, default=1024)
    ap.add_argument("--iterations", type=int, default=8)
    ap.add_argument("--max_frames", type=int, default=0)
    args = ap.parse_args(argv)

    pairs = datasets.load_dataset(args.dataset, args.folder)[:: args.stride]
    if args.max_frames:
        pairs = pairs[: args.max_frames]

    fe = FrontendConfig()
    corpus = []
    for i, (pl, _) in enumerate(pairs):
        img = datasets.read_grayscale(pl)
        xy, v, d = detect_and_describe(jnp.asarray(img), fe)
        v_np = np.asarray(v)
        corpus.append(np.asarray(d)[v_np])
        if i % 20 == 0:
            slog.info(f"described frame {i}/{len(pairs)}")

    all_desc = np.concatenate(corpus)
    slog.info(f"training on {len(all_desc)} descriptors")
    vocab = OrbVocabulary.train(
        all_desc, num_words=args.words, iterations=args.iterations
    )
    vocab.save(args.out)
    slog.info(f"saved vocabulary to {args.out}")


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
