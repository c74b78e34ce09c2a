"""Endurance drive: 2,000+ frames of live batched SLAM with loop closures.

r2 verdict item 3: nothing previously showed the live loop's fps curve
stays flat past frame ~200 — BoW database capacity-doubling forces pipeline
drains + new jit shapes, BA windows walk through padding buckets, WorldMap
host arrays capacity-double, and the loop detector must enter/exit loops on
a long trajectory (the reference runs whole 4,541-frame KITTI sequences
through the same loop, ref src/slam.cpp:108-148 + loop_detector.cpp:123-151).

Scene: the bench's sliding-texture stereo world (constant-depth plane,
exact lateral ground truth) driven on a TRIANGLE-WAVE trajectory — out for
`period/2` frames, back along the same path, repeat. Revisits re-render the
same viewpoints, so BoW scores spike against distant frames and the Bayes
filter must enter a loop on each return leg and trigger the pose graph on
exit.

Writes ENDURANCE_r{N}.json:
  - per-500-frame fps curve (wall clock, pipeline included),
  - flatness ratio fps[last window] / fps[frames 500-1000],
  - compile count AFTER warm-up (jax_log_compiles hook) — growth means a
    jit-shape leak,
  - loop statistics (pose-graph solves, committed loop edges),
  - final ATE vs exact lateral ground truth.

Usage: python -m benchmarks.endurance [--frames 2048] [--batch 24]
       [--out ENDURANCE_r03.json] [--h 376 --w 1241]
"""

import argparse
import json
import logging
import time

import numpy as np

from stereo_orb_slam_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()


def triangle_positions(n_frames: int, period: int, step: float):
    """Lateral texture offsets of a zig-zag revisit path through waypoints
    [0, +A, 0, -A, 0] at quarter marks (A = period/4 * step): the outbound
    leg explores, the return leg REVISITS it (loop episode 1), the negative
    leg is NOVEL territory (Bayes probability decays -> loop EXIT fires the
    pose graph mid-run), and the final leg revisits it (episode 2, closed
    by finish()). Returns float offsets per frame (may be negative)."""
    q = max(period // 4, 1)
    way_f = np.arange(0, n_frames + q, q)
    cycle = [0.0, q * step, 0.0, -q * step]
    way_x = [cycle[i % 4] for i in range(len(way_f))]
    return np.interp(np.arange(n_frames), way_f, way_x)


class TriangleSceneReader:
    """Lazily renders the sliding-texture stereo frames along the triangle
    trajectory (uint8) — 2k+ KITTI-sized frames don't fit precomputed."""

    def __init__(self, n_frames, h, w, period, step=4, shift=6, seed=0):
        rng = np.random.default_rng(seed)
        self.n = n_frames
        self.h, self.w, self.shift = h, w, shift
        self.pos = triangle_positions(n_frames, period, step)
        self.origin = 32 - int(self.pos.min())
        span = (w + 2 * 32 + shift + step + 8
                + int(self.pos.max()) - int(self.pos.min()))
        base = rng.uniform(0, 255, (h // 8, span // 8 + 2)).astype(np.float32)
        self.base = np.kron(base, np.ones((8, 8), np.float32))[:h, :span]

    def frame(self, i):
        o = self.origin + self.pos[i]
        oi = int(round(o))
        l = self.base[:, oi : oi + self.w]
        r = self.base[:, oi + self.shift : oi + self.shift + self.w]
        return (l.astype(np.uint8), r.astype(np.uint8))

    def __iter__(self):
        for i in range(self.n):
            yield self.frame(i)


def _group_by(items, key):
    out = {}
    for x in items:
        out.setdefault(key(x), []).append(x)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=2048)
    ap.add_argument("--batch", type=int, default=24)
    ap.add_argument("--period", type=int, default=1600)
    ap.add_argument("--h", type=int, default=376)
    ap.add_argument("--w", type=int, default=1241)
    ap.add_argument("--refine_interval", type=int, default=10)
    ap.add_argument("--window", type=int, default=500)
    ap.add_argument("--out", default="ENDURANCE_r04.json")
    ap.add_argument("--db_capacity", type=int, default=0,
                    help="BoW database capacity. Default 0 = PRE-SIZE from "
                         "the sequence length (pow2 >= frames, min 8192): "
                         "the r3 run started at 1024 and paid a mid-run "
                         "resize + pipeline drain at frame ~1024 (r4 "
                         "directive 1a). Pass a small value explicitly to "
                         "exercise the capacity-doubling drain path.")
    ap.add_argument("--finish_seconds", type=float, default=60.0,
                    help="declared wall budget for the end-of-sequence pose "
                         "graph + global BA polish (r5 directive 8); "
                         "0 = uncapped")
    ap.add_argument("--budget_curve", action="store_true",
                    help="also record ATE after finish budgets of "
                         "1/10/30/uncapped seconds (restores world state "
                         "between runs; adds minutes)")
    ap.add_argument("--warm_frames", type=int, default=160,
                    help="throwaway warm drive length before the timed run "
                         "(0 disables); populates jit caches off the clock")
    ap.add_argument("--warm_period", type=int, default=96,
                    help="triangle period of the WARM drive: short enough "
                         "that a full loop episode (enter + exit + capped "
                         "closure BA) fires inside the warm frames, so the "
                         "closure-path programs AND the at-scale window-BA "
                         "buckets load off the clock (r5: they cost "
                         "~25 s of one-time in-process loads inside the "
                         "timed run's first two windows otherwise)")
    ap.add_argument("--device_frames", action="store_true",
                    help="stage the scene texture on device ONCE and slice "
                         "each batch's frames device-side. Models the "
                         "reference's locally-attached image source (disk/"
                         "RAM at GB/s, ref slam.cpp:112-113 cv::imread): "
                         "through the remote relay, uploading raw frames "
                         "costs ~0.93 MB/frame against a measured ~38 MB/s "
                         "link — a ~40 fps transport ceiling no SLAM "
                         "improvement can cross. Default (off) keeps the "
                         "full upload in the measurement and records the "
                         "measured transport floor alongside.")
    args = ap.parse_args()
    db_capacity = args.db_capacity or max(
        8192, 1 << (args.frames - 1).bit_length())

    import jax

    from stereo_orb_slam_tpu.apps.slam import SlamSystem
    from stereo_orb_slam_tpu.config import LoopConfig, SlamConfig
    from stereo_orb_slam_tpu.geometry import camera
    from stereo_orb_slam_tpu.io.datasets import DeviceBatchReader
    from stereo_orb_slam_tpu.loop import OrbVocabulary

    # Count XLA compiles via the jax_log_compiles logger: after warm-up the
    # count must stop growing (shape-bucket leaks would recompile forever).
    compile_count = [0]
    cache_hits = [0]
    cur_frame = [0]          # frame index the live loop is at (for logs)
    compile_log = []         # (frame_index, HLO module name) per compile
    hit_frames = []          # frame index per persistent-cache HIT

    class _H(logging.Handler):
        def emit(self, record):
            msg = record.getMessage()
            if "Compiling" in msg:
                compile_count[0] += 1
                # Record WHICH module compiled and when, so post-warm-up
                # compiles are attributable (r5 directive 6).
                compile_log.append((cur_frame[0], msg[:160]))
            elif "Persistent compilation cache hit" in msg:
                # A "Compiling" line followed by a cache hit is a LOAD
                # (deserialize, ~0.1-1 s), not a fresh XLA compile
                # (tens of seconds) — split the two in the report.
                cache_hits[0] += 1
                hit_frames.append(cur_frame[0])

    handler = _H()
    jax.config.update("jax_log_compiles", True)
    for name in ("jax._src.dispatch", "jax._src.interpreters.pxla",
                 "jax._src.compiler"):
        lg = logging.getLogger(name)
        lg.addHandler(handler)
        lg.propagate = False  # count, don't spam stderr

    fx, cx, cy, b = 718.856, 607.1928, 185.2157, 0.5371657
    left = camera.Pinhole.create(fx, fx, cx, cy)
    pose_r = np.eye(4, dtype=np.float32)
    pose_r[0, 3] = b
    right = camera.Pinhole.create(fx, fx, cx, cy, pose=pose_r)
    rig = camera.StereoRig.create(left, right, rectified=True, baseline=b)

    rngv = np.random.default_rng(1)
    corpus = rngv.integers(0, 2 ** 32, (8192, 8), dtype=np.uint32)
    vocab = OrbVocabulary.train(corpus, num_words=1024, iterations=2)

    # NOTE no global BAConfig.max_solve_seconds: a nonzero cap forces EVERY
    # >=2^16-obs solve down the host-chunked multi-sync path so the cap is
    # enforceable — which put 2-3 relay round trips inside each live window
    # solve (~8 ms/frame, the biggest single cost in the r5 try5 run). The
    # finish stage gets its wall budget explicitly via --finish_seconds
    # (SlamSystem.finish passes max_seconds per solve), and the live
    # closure polish is capped by PoseGraphConfig.live_ba_max_seconds.
    cfg = SlamConfig().replace(
        refine_interval=args.refine_interval, batch_frames=args.batch,
        loop=LoopConfig(database_capacity=db_capacity),
    )
    system = SlamSystem(rig, cfg, vocab=vocab)

    scene = TriangleSceneReader(args.frames, args.h, args.w, args.period)

    if args.warm_frames > 0:
        # Throwaway warm drive (r4 directive 1b): a scratch SlamSystem over
        # the first frames of the same scene populates the in-process jit
        # caches (chain program, early window-BA C/P/O buckets) and the
        # persistent .jax_cache, so the REAL run below starts from frame 0
        # at steady-state speed — the reference pays no compiles at all
        # (ref src/slam.cpp:108-148), so neither should our timed run.
        warm_sys = SlamSystem(rig, cfg, vocab=vocab)
        warm_scene = TriangleSceneReader(args.warm_frames, args.h, args.w,
                                         args.warm_period)
        for dl, dr in DeviceBatchReader(warm_scene, args.batch):
            warm_sys.process_batch(dl, dr)
        warm_sys.flush()
        # Closure-path programs (pose-graph buckets, loop-edge E ladder)
        # compile here instead of inside the first mid-run stall.
        warm_sys.prewarm_closure_path(args.frames)
        del warm_sys
        compile_count[0] = 0
        cache_hits[0] = 0
        compile_log.clear()
        hit_frames.clear()

    # Transport health at run time: the relay's round trip varies by
    # multiples across the day and scales EVERY number below; record it so
    # runs are comparable (sync-differencing methodology, bench.py).
    import jax.numpy as jnp
    import numpy as _np

    noop = jax.jit(lambda x: x * 1.0)
    zz = jnp.ones((8, 8), jnp.float32)
    _ = _np.asarray(noop(zz))
    rtts = []
    for _i in range(8):
        t0 = time.perf_counter()
        _ = _np.asarray(noop(zz))
        rtts.append(time.perf_counter() - t0)
    rtt_ms = round(1e3 * float(_np.median(rtts)), 1)

    # Measured h2d bandwidth + the transport floor it implies: each frame
    # is h*w*2 uint8 bytes; at ~38 MB/s the upload alone caps the whole
    # drive's fps regardless of compute (r5 finding).
    probe = _np.zeros((args.batch, args.h, args.w), _np.uint8)
    t0 = time.perf_counter()
    d = jax.device_put(probe)
    d.block_until_ready()
    up_mbs = probe.nbytes / 1e6 / (time.perf_counter() - t0)
    del d
    bytes_per_frame = args.h * args.w * 2
    transport_floor_fps = up_mbs * 1e6 / bytes_per_frame

    if args.device_frames:
        base_dev = jnp.asarray(scene.base.astype(np.uint8))
        w_img, shift = args.w, scene.shift

        @jax.jit
        def slice_batch(base, offs):
            def one(o):
                l = jax.lax.dynamic_slice(base, (0, o), (args.h, w_img))
                r = jax.lax.dynamic_slice(base, (0, o + shift),
                                          (args.h, w_img))
                return l, r
            return jax.vmap(one)(offs)

        def batches():
            offs_all = (scene.origin
                        + np.round(scene.pos).astype(np.int32))
            nb = args.frames // args.batch
            for bi in range(nb):
                o = jnp.asarray(offs_all[bi * args.batch:
                                         (bi + 1) * args.batch])
                yield slice_batch(base_dev, o)

        reader = None
        batch_iter = batches()
        rem = [scene.frame(i)
               for i in range((args.frames // args.batch) * args.batch,
                              args.frames)]
    else:
        reader = DeviceBatchReader(scene, args.batch)
        batch_iter = iter(reader)

    t_start = time.perf_counter()
    batch_t = []        # (frame_index_after, wall_time)
    compiles_t = []
    stage_t = []        # (frame_index_after, dict(timers.totals)) snapshots
    pgo_solves_before = 0
    for dl, dr in batch_iter:
        t0 = time.perf_counter()
        system.process_batch(dl, dr)
        batch_t.append((system.frame_index, time.perf_counter() - t0))
        cur_frame[0] = system.frame_index
        compiles_t.append(compile_count[0])
        stage_t.append((system.frame_index, dict(system.timers.totals)))
    t_batches = time.perf_counter() - t_start
    for l, r in (rem if args.device_frames else reader.remainder):
        system.process(l, r)
    t_remainder = time.perf_counter() - t_start - t_batches
    system.flush()
    t_live = time.perf_counter() - t_start
    t_flush = t_live - t_batches - t_remainder

    # fps per window (exclude window 0: warm-up compiles land there).
    W = args.window
    windows = {}
    for (fidx, dt) in batch_t:
        windows.setdefault(fidx // W, []).append(dt)
    fps_curve = {
        str(k * W): round(args.batch * len(v) / sum(v), 2)
        for k, v in sorted(windows.items())
    }
    keys = sorted(windows)
    fps_ref = (args.batch * len(windows[keys[1]])
               / sum(windows[keys[1]])) if len(keys) > 2 else None
    fps_last = (args.batch * len(windows[keys[-1]])
                / sum(windows[keys[-1]])) if len(keys) > 2 else None

    # Compile growth after the first window.
    first_win_batches = len(windows[keys[0]])
    compiles_after_warm = compile_count[0] - compiles_t[
        min(first_win_batches, len(compiles_t)) - 1]
    f_boundary = batch_t[min(first_win_batches, len(batch_t)) - 1][0]
    late_compiles = [{"frame": f, "module": m.replace("Compiling ", "")}
                     for (f, m) in compile_log if f >= f_boundary]

    # Per-window per-stage split (ms/frame): deltas of the cumulative
    # stage totals at each window's last batch (r5 directive 1 — the
    # 8.4 ms/frame at-scale gap between bench and endurance was
    # unattributed in r4).
    last_snap = {}
    for (fidx, tot) in stage_t:
        last_snap[fidx // W] = (fidx, tot)
    stage_by_window = {}
    prev_f, prev_tot = 0, {}
    for wk in sorted(last_snap):
        fidx, tot = last_snap[wk]
        nf = max(fidx - prev_f, 1)
        stage_by_window[str(wk * W)] = {
            k: round(1e3 * (tot.get(k, 0.0) - prev_tot.get(k, 0.0)) / nf, 2)
            for k in sorted(tot)
        }
        prev_f, prev_tot = fidx, tot

    live_committed = len(system.pgo.committed_edges)
    p_trace = (np.asarray(system.loop.probabilities)
               if system.loop else np.zeros(1))
    # Loop EPISODES: upward crossings of the is_loop threshold.
    above = p_trace > system.loop.cfg.is_loop_thresh
    episodes = int(np.sum(above[1:] & ~above[:-1]) + (1 if above[:1].any()
                                                      else 0))

    # GT: camera at lateral offset pos*depth/fx (texture slides `pos` px at
    # plane depth `depth`).
    depth = fx * b / scene.shift

    def lateral_ate():
        wn = system.world.num_frames
        gt_x = scene.pos[:wn] * depth / fx
        est_x = system.world.pose_global[:wn, 0, 3]
        return float(np.sqrt(np.mean((est_x - gt_x) ** 2)))

    # Optional convergence-vs-budget curve (r5 directive 8): finish under
    # several wall budgets, restoring the live world state between runs.
    budget_curve = None
    if args.budget_curve:
        import copy

        def snap_state():
            return (
                copy.deepcopy(system.world.__dict__),
                copy.deepcopy({
                    k: v for k, v in system.pgo.__dict__.items()
                    if k not in ("world", "ba", "loop_matcher",
                                 "pre_optimize_hook")
                }),
            )

        def restore_state(s):
            system.world.__dict__.update(copy.deepcopy(s[0]))
            system.pgo.__dict__.update(copy.deepcopy(s[1]))

        snap = snap_state()
        budget_curve = {}
        for budget in (1.0, 10.0, 30.0, 0.0):
            restore_state(snap)
            tb = time.perf_counter()
            try:
                system.finish(max_seconds=budget or None)
                budget_curve[str(budget) if budget else "uncapped"] = {
                    "wall_s": round(time.perf_counter() - tb, 2),
                    "lateral_ate_m": round(lateral_ate(), 4),
                }
            except Exception as e:
                budget_curve[str(budget)] = f"{type(e).__name__}: {e}"[:200]
        restore_state(snap)

    # Final pose graph + global BA under the DECLARED budget, then ATE vs
    # exact lateral ground truth.
    t0 = time.perf_counter()
    finish_error = None
    try:
        system.finish(max_seconds=args.finish_seconds or None)
    except Exception as e:  # record the live metrics even if finish dies
        finish_error = f"{type(e).__name__}: {e}"[:300]
    t_finish = time.perf_counter() - t0
    w = system.world
    n = w.num_frames
    ate = lateral_ate()

    result = {
        "what": "live batched SLAM endurance drive (zig-zag revisit path)",
        "frames": int(system.frame_index),
        "tracked_frames": int(n),
        "batch_frames": args.batch,
        "db_capacity_initial": db_capacity,
        "relay_rtt_ms_at_start": rtt_ms,
        "db_size_final": int(system.loop.db_size if system.loop else 0),
        "live_fps_overall": round(system.frame_index / t_live, 2),
        # Wall split of the live region: the batch loop vs the (<batch)
        # sequential remainder frames vs the final pipeline drain. The
        # in-batch wall is also the sum of batch_t; gaps between the two
        # indicate time OUTSIDE process_batch (reader stalls etc.).
        "wall_split_s": {
            "batches": round(t_batches, 2),
            "batches_measured_sum": round(sum(t for _, t in batch_t), 2),
            "remainder_frames": round(t_remainder, 2),
            "flush": round(t_flush, 2),
        },
        "frames_device_resident": bool(args.device_frames),
        "upload_probe_MB_per_s": round(up_mbs, 1),
        "upload_bytes_per_frame": bytes_per_frame,
        "transport_floor_fps_if_uploading": round(transport_floor_fps, 1),
        "fps_per_window": fps_curve,
        "stage_ms_per_frame_by_window": stage_by_window,
        # Live window-BA solves by window: [n_solves, total_wall_s,
        # mean_iterations, mean_obs] — attributes the ba.finish stage.
        "window_ba_by_window": {
            str(wk * W): [
                len(v),
                round(sum(x[1] for x in v), 2),
                round(float(np.mean([x[2] for x in v])), 1),
                int(np.mean([x[3] for x in v])),
            ]
            for wk, v in sorted(
                _group_by(system.ba_log, lambda x: x[0] // W).items())
        },
        "fps_flatness_last_vs_early": (
            round(fps_last / fps_ref, 3) if fps_ref else None),
        "compiles_total": compile_count[0],
        "persistent_cache_hits_total": cache_hits[0],
        "compiles_after_first_window": compiles_after_warm,
        "true_compiles_after_first_window": max(
            0, compiles_after_warm
            - sum(1 for f in hit_frames if f >= f_boundary)),
        "compiles_after_first_window_modules": late_compiles,
        "loop_episodes": episodes,
        "bayes_p_max": float(p_trace.max()),
        "loop_edges_committed_live": int(live_committed),
        "loop_edges_committed_total": len(system.pgo.committed_edges),
        "pose_graph_loop_edges_final":
            system.pgo.last_stats.get("num_loop_edges"),
        # Per-closure stall: wall seconds of each LIVE loop-exit
        # pose-graph + (1 s wall-capped) global BA on the critical path.
        "closure_stall_seconds": [round(t, 2)
                                  for t in system.pgo.live_stall_log],
        "closure_stall_splits": system.pgo.live_stall_splits,
        "finish_seconds": round(t_finish, 2),
        "finish_budget_seconds": args.finish_seconds,
        "finish_budget_curve": budget_curve,
        "finish_error": finish_error,
        "lateral_ate_m": round(ate, 4),
        "num_points": int(w.num_points),
        "num_obs": int(w.num_obs),
    }
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
