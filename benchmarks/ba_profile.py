"""Op-level roofline profile of the BA LM iteration on TPU.

Methodology note (r3): timing each stage as an ISOLATED jitted program is
invalid on the remote-attached relay — arguments re-stream per program, so
an isolated stage can "measure" 10x the time it takes inside the fused
solve. This tool instead:

1. times the PRODUCTION whole-solve program (ba_solve, chain LM iterations
   in one dispatch) with the sync-differencing methodology (bench.py), and
2. attributes on-device time with jax.profiler: the trace's leaf device op
   durations are mapped back to source lines via the compiled HLO's op
   metadata, then aggregated per (file, line) and per file.

Problem size matches bench.bench_ba: C=200 cams, P=20k points, O=120k obs
(the global-BA envelope of ref src/bundle_adjuster.cpp:13-36). The FLOP
model yields achieved FLOP/s vs the v5e single-chip peak (~49 f32 MXU
TFLOP/s) for an honest MFU figure.

Usage: python -m benchmarks.ba_profile [--C 200 --P 20000 --obs_per_cam 600]
       [--trace_dir /tmp/ba_trace] [--out BA_PROFILE_r03.json]
"""

import argparse
import collections
import glob
import gzip
import json
import re
import time

import numpy as np

from stereo_orb_slam_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from stereo_orb_slam_tpu.backend import schur_dense  # noqa: E402
from stereo_orb_slam_tpu.backend.ba import (  # noqa: E402
    BAProblem, ba_solve, ba_solve_impl,
)
from stereo_orb_slam_tpu.config import BAConfig  # noqa: E402


def make_problem(C, P, obs_per_cam, rng, local=0):
    """local=0: the historical yardstick — every observation assigned to a
    UNIFORM RANDOM point, so a point's cameras span the whole window (no
    locality; the banded Schur assembly is infeasible by construction).
    local=L: REALISTIC track structure — point p is born at camera
    floor(p*C/P) and observed by 1..L consecutive cameras, exactly the
    pattern world.ba_problem produces on a drive (tracks over consecutive
    frames). Same noise model either way."""
    fx, cx, cy, b = 718.856, 607.1928, 185.2157, 0.5371657
    P_l = np.array([[fx, 0, cx, 0], [0, fx, cy, 0], [0, 0, 1, 0]], np.float32)
    P_r = P_l.copy()
    P_r[0, 3] = -fx * b
    pts = np.stack(
        [rng.uniform(-20, 20, P), rng.uniform(-5, 5, P), rng.uniform(5, 60, P)], 1
    ).astype(np.float32)
    pose6 = rng.normal(0, 0.01, (C, 6)).astype(np.float32)
    if local > 0:
        c0 = (np.arange(P, dtype=np.int64) * C // P).astype(np.int32)
        tlen = rng.integers(1, local + 1, P)
        tlen = np.minimum(tlen, C - c0)
        obs_point = np.repeat(np.arange(P, dtype=np.int32), tlen)
        offs = np.concatenate([np.arange(t) for t in tlen]).astype(np.int32)
        obs_cam = (np.repeat(c0, tlen) + offs).astype(np.int32)
        O = len(obs_point)
    else:
        O = C * obs_per_cam
        obs_cam = np.repeat(np.arange(C, dtype=np.int32), obs_per_cam)
        obs_point = rng.integers(0, P, O).astype(np.int32)
    order = np.argsort(obs_point, kind="stable")
    obs_point, obs_cam = obs_point[order], obs_cam[order]
    X = pts[obs_point]

    def proj(Pm):
        Xh = np.concatenate([X, np.ones((O, 1), np.float32)], 1)
        uvw = Xh @ Pm.T
        return uvw[:, :2] / np.maximum(uvw[:, 2:3], 1e-6)

    obs_uv = np.concatenate([proj(P_l), proj(P_r)], 1).astype(np.float32)
    obs_uv += rng.normal(0, 0.5, obs_uv.shape).astype(np.float32)
    prob = BAProblem(
        pose6=jnp.asarray(pose6), points=jnp.asarray(pts),
        obs_cam=jnp.asarray(obs_cam), obs_point=jnp.asarray(obs_point),
        obs_uv=jnp.asarray(obs_uv), obs_weight=jnp.ones(O, jnp.float32),
        cam_mask=jnp.asarray([0.0] + [1.0] * (C - 1), jnp.float32),
        point_mask=jnp.ones(P, jnp.float32),
        P_l=jnp.asarray(P_l), P_r=jnp.asarray(P_r),
    )
    sto, scam, smask, K = schur_dense.group_slots(obs_point, obs_cam, P, O)
    K = sto.shape[1]  # R-aligned slot-map width (executed shape)
    slots = (jnp.asarray(sto), jnp.asarray(scam), jnp.asarray(smask))
    cam_K = 1 << (int(np.bincount(obs_cam).max()) - 1).bit_length()
    band = schur_dense.band_plan(obs_point, obs_cam, P, O, C, K)
    return prob, slots, K, cam_K, O, band


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--C", type=int, default=200)
    ap.add_argument("--P", type=int, default=20000)
    ap.add_argument("--obs_per_cam", type=int, default=600)
    ap.add_argument("--chain", type=int, default=20)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--trace_dir", default="/tmp/ba_profile_trace")
    ap.add_argument("--out", default=None)
    ap.add_argument("--local", type=int, default=0,
                    help="track length L: realistic consecutive-camera "
                         "observation structure (0 = historical random-"
                         "assignment yardstick)")
    ap.add_argument("--no_banded", action="store_true",
                    help="force the dense expansion even when the banded "
                         "plan is feasible (A/B measurement)")
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    prob, slots, K, cam_K, O, band = make_problem(
        args.C, args.P, args.obs_per_cam, rng, local=args.local)
    C, P = args.C, args.P
    if args.no_banded:
        band = None
    band_bases = None if band is None else jnp.asarray(band[0])
    band_B = None if band is None else band[1]
    band_Pc = None if band is None else band[2]
    cfg = BAConfig(function_tolerance=0.0)
    chain = args.chain

    carry, n_it, _ = ba_solve(prob, jnp.int32(chain), cfg, dense_slots=slots,
                              cam_K=cam_K, band_bases=band_bases,
                              band_B=band_B, band_Pc=band_Pc)
    jax.block_until_ready(carry.prob.pose6)
    assert int(n_it) == chain

    # ---- whole-solve timing (sync-differencing; see bench.py) -------------
    noop = jax.jit(lambda x: x * 1.0)
    zz = jnp.ones((8, 8), jnp.float32)
    _ = np.asarray(noop(zz))

    def tmin(fn, n):
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            r = fn()
            _ = np.asarray(jax.tree.leaves(r)[0]).ravel()[0]
            ts.append(time.perf_counter() - t0)
        return float(np.min(ts[1:]))

    rtt = tmin(lambda: noop(zz), max(8, args.iters))
    t_solve = tmin(
        lambda: ba_solve(prob, jnp.int32(chain), cfg,
                         dense_slots=slots, cam_K=cam_K,
                         band_bases=band_bases,
                         band_B=band_B,
                         band_Pc=band_Pc)[0].prob.pose6,
        args.iters,
    ) - rtt
    it_ms = t_solve / chain * 1e3

    # ---- trace + HLO source attribution -----------------------------------
    lowered = jax.jit(ba_solve_impl,
                      static_argnames=("cfg", "cam_K", "band_B",
                                       "band_Pc")).lower(
        prob, jnp.int32(chain), cfg, dense_slots=slots, cam_K=cam_K,
        band_bases=band_bases, band_B=band_B, band_Pc=band_Pc)
    hlo = lowered.compile().as_text()
    srcmap = {}
    for m in re.finditer(
        r"%?([\w.\-]+) = .*?metadata=\{[^}]*?source_file=\"([^\"]+)\""
        r"[^}]*?source_line=(\d+)", hlo,
    ):
        srcmap[m.group(1)] = (m.group(2).split("/")[-1], int(m.group(3)))
    # op_name paths ("jit(...)/while/body/gather", einsum equations, ...):
    # fusions INSIDE the while body all inherit the while call-site source
    # line, which made the r3 per-line table attribute 67% of the iteration
    # to "one line" (a misreading the r4 op-level traces corrected) — the
    # op path keeps the semantic operation visible.
    opmap = {}
    for m in re.finditer(
        r"%?([\w.\-]+) = (\S+) [\w\-]+\(.*?metadata=\{[^}]*?"
        r"op_name=\"([^\"]+)\"", hlo,
    ):
        shape = m.group(2).split("{")[0].strip()
        path = m.group(3).split("jit(ba_solve_impl)/")[-1]
        opmap[m.group(1)] = f"{path} {shape}"

    jax.profiler.start_trace(args.trace_dir)
    carry, _, _ = ba_solve(prob, jnp.int32(chain), cfg, dense_slots=slots,
                           cam_K=cam_K, band_bases=band_bases,
                           band_B=band_B, band_Pc=band_Pc)
    jax.block_until_ready(carry.prob.pose6)
    jax.profiler.stop_trace()

    tr = sorted(glob.glob(
        args.trace_dir + "/plugins/profile/*/*.trace.json.gz"))[-1]
    with gzip.open(tr) as f:
        data = json.load(f)
    ev = data.get("traceEvents", [])
    pids = {}
    for e in ev:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pids[e["pid"]] = e["args"].get("name", "")
    by_line = collections.Counter()
    by_file = collections.Counter()
    by_op = collections.Counter()
    total = 0.0
    for e in ev:
        if e.get("ph") != "X" or "TPU" not in pids.get(e.get("pid"), ""):
            continue
        nm = e["name"]
        if nm.startswith("jit_") or nm.startswith("while"):
            continue  # container events double-count their children
        d = e.get("dur", 0)
        total += d
        key = nm.lstrip("%")
        src = srcmap.get(key)
        by_line[src or ("<unattributed>", 0)] += d
        by_file[(src or ("<unattributed>", 0))[0]] += d
        by_op[opmap.get(key, nm.split(".")[0])] += d

    # ---- FLOP model --------------------------------------------------------
    P_pad = int(slots[0].shape[0])
    Bw = band_B if band_B is not None else C
    flops_assemble = 2 * (3 * P_pad) * (6 * Bw) ** 2 + 2 * P_pad * K * Bw * 18
    flops_chol = (6 * C) ** 3 // 3 + 2 * (6 * C) ** 2
    flops_build = O * (500 + 2 * (36 * 4 + 18 * 4 + 24 + 12)) + P_pad * K * 12
    flops_iter = flops_assemble + flops_chol + flops_build
    it_s = 1e3 / it_ms

    result = {
        "what": "whole-solve BA timing + trace-attributed device profile",
        "problem": {"C": C, "P": P, "O": O, "K_slots": K, "P_pad": P_pad,
                    "local_track_len": args.local,
                    "band_B": band_B,
                    "band_chunks": (None if band is None
                                    else int(len(band[0])))},
        "rtt_ms": round(rtt * 1e3, 2),
        "lm_iteration_ms": round(it_ms, 3),
        "lm_iterations_per_sec": round(it_s, 2),
        "device_ms_per_iter_traced": round(total / 1e3 / chain, 3),
        "per_file_ms_per_iter": {
            k: round(v / 1e3 / chain, 3) for k, v in by_file.most_common()
        },
        "top_lines_ms_per_iter": {
            f"{f}:{l}": round(v / 1e3 / chain, 3)
            for (f, l), v in by_line.most_common(12)
        },
        "top_ops_ms_per_iter": {
            k: round(v / 1e3 / chain, 3)
            for k, v in by_op.most_common(16)
        },
        "flops_per_iter_G": round(flops_iter / 1e9, 1),
        "achieved_tflops": round(flops_iter * it_s / 1e12, 2),
        "mfu_vs_f32_peak_49T": round(flops_iter * it_s / 49e12, 4),
    }
    out = json.dumps(result, indent=1)
    print(out)
    if args.out:
        with open(args.out, "w") as f:
            f.write(out + "\n")


if __name__ == "__main__":
    main()
