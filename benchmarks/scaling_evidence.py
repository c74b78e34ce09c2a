"""Distributed-BA scaling evidence beyond wall clock (r2 verdict item 6).

Wall-clock efficiency on a virtual CPU mesh is bounded by core
oversubscription, not by the algorithm (r2 recorded 63% at 2 devices on 2
shared cores). This tool pins the two quantities that DO transfer to real
multi-chip hardware:

1. COLLECTIVE VOLUME, from the compiled HLO of the sharded LM step: every
   all-reduce tensor's shape is extracted and checked against the analytic
   model — reductions carry O(C + P) bytes (camera/point blocks), never
   O(observations). On a pod, these bytes ride ICI; with volume independent
   of the per-device observation shard, the communication/computation ratio
   FALLS as the problem grows, which is the mechanism behind the >=80%
   2-host efficiency claim.

2. COMPUTE-TIME efficiency at 2 real OS processes (jax.distributed over
   CPU, 1 device each — the same code path a 2-host pod runs): per-process
   CPU time of the timed LM-step loop vs a 1-process baseline.
   CPU time measures work done, immune to the wall-clock core contention
   that polluted the r2 numbers.

Also records the wall-clock virtual-mesh curve (1/2/4/8) for continuity
with SCALING_r02.json.

Usage: python -m benchmarks.scaling_evidence [--out SCALING_r03.json]
       (CPU recommended: env JAX_PLATFORMS=cpu
        XLA_FLAGS=--xla_force_host_platform_device_count=8)
"""

import argparse
import json
import os
import re
import socket
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = r"""
import sys, os, json, time
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("XLA_FLAGS", None)
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, {repo!r})
import numpy as np
import jax.numpy as jnp
from stereo_orb_slam_tpu.parallel import multihost
from stereo_orb_slam_tpu.parallel.mesh import make_mesh
from stereo_orb_slam_tpu.config import BAConfig
from benchmarks.scaling_evidence import build_point_aligned_step

nproc = int(sys.argv[1])
pid = int(sys.argv[2])
port = sys.argv[3]
n_iter = int(sys.argv[4])
if nproc > 1:
    multihost.initialize(coordinator_address="localhost:" + port,
                         num_processes=nproc, process_id=pid)
cfg = BAConfig(cg_iterations=25)
mesh = make_mesh(nproc)
opc = int(sys.argv[5]); Pn = int(sys.argv[6])
step, prob = build_point_aligned_step(mesh, cfg, C=200, P=Pn, obs_per_cam=opc)
lam = jnp.float32(1e-4)
p2, *_ = step(prob, lam)
jax.block_until_ready(p2.pose6)
# timed region: CPU time measures per-process WORK, not contended wall.
t0c = time.process_time(); t0w = time.perf_counter()
for _ in range(n_iter):
    p2, *_ = step(p2, lam)
jax.block_until_ready(p2.pose6)
out = dict(pid=pid, cpu_s=time.process_time() - t0c,
           wall_s=time.perf_counter() - t0w, iters=n_iter)
print("RESULT " + json.dumps(out))
"""


def build_problem(C=200, P=20000, obs_per_cam=600, seed=0):
    """The bench_ba yardstick problem (shared with apps.scaling_bench)."""
    from stereo_orb_slam_tpu.apps.scaling_bench import make_problem

    return make_problem(C=C, P=P, obs_per_cam=obs_per_cam, seed=seed)


def build_point_aligned_step(mesh, cfg, C=200, P=20000, obs_per_cam=600,
                             dense: bool = True):
    """(sharded point-aligned LM step, placed problem) on `mesh` — the
    production distributed scheme (parallel/dist_ba). `dense=True` (the
    default for windowed/mid-size C) uses the distributed dense Schur:
    local S assembly + ONE [6C,6C] psum + replicated Cholesky, ~3
    collectives per LM step instead of one per CG iteration — the fix for
    the latency-bound 37% two-process overhead at the yardstick problem
    (SCALING_r03 -> r4 directive 5)."""
    import numpy as np

    from stereo_orb_slam_tpu.parallel.dist_ba import (
        build_point_aligned, place_point_aligned,
        sharded_lm_step_point_aligned,
    )

    raw = build_problem(C=C, P=P, obs_per_cam=obs_per_cam)
    obs_point = np.asarray(raw.obs_point)
    order = np.argsort(obs_point, kind="stable")
    cam_mask = np.asarray(raw.cam_mask)
    prob, meta = build_point_aligned(
        np.asarray(raw.pose6), np.asarray(raw.points),
        np.asarray(raw.obs_cam)[order], obs_point[order],
        np.asarray(raw.obs_uv)[order], cam_mask,
        np.asarray(raw.P_l), np.asarray(raw.P_r), mesh.devices.size,
    )
    prob = place_point_aligned(mesh, prob)
    dense_K = None
    if dense:
        kmax = max(int(np.bincount(obs_point).max(initial=2)), 2)
        dense_K = 1 << (kmax - 1).bit_length()
    step = sharded_lm_step_point_aligned(mesh, cfg, dense_K=dense_K)
    return step, prob


def collective_report(n_devices: int, C=200, P=20000, obs_per_cam=600,
                      cg_iterations=25):
    """Compile the sharded LM step for an n-device mesh and extract every
    all-reduce tensor from the optimized HLO. Returns the shape census,
    total static bytes, the analytic per-step model, and the invariant
    check (no all-reduce ever carries an observation-sized tensor)."""
    from stereo_orb_slam_tpu.config import BAConfig
    from stereo_orb_slam_tpu.parallel.mesh import make_mesh

    cfg = BAConfig(cg_iterations=cg_iterations)
    mesh = make_mesh(n_devices)
    step, prob = build_point_aligned_step(mesh, cfg, C=C, P=P,
                                          obs_per_cam=obs_per_cam)
    lam = np.float32(1e-4)
    hlo = step.lower(prob, lam).compile().as_text()

    census = {}
    o_sized = []
    O = C * obs_per_cam

    def record(dtype, dims):
        shape = tuple(int(d) for d in dims.split(",") if d) if dims else ()
        key = f"{dtype}{list(shape)}"
        census[key] = census.get(key, 0) + 1
        # The invariant: reductions are camera-sized (point-aligned
        # scheme; the first dim of an obs/point-sized tensor would be
        # >= the per-device shard length).
        lead = shape[0] if shape else 1
        if lead >= min(O, P) // max(n_devices, 1):
            o_sized.append(key)

    # Plain all-reduces: "= f32[200,6]{...} all-reduce(-start)?(...)"
    for m in re.finditer(r"= (\w+)\[([\d,]*)\]\S* all-reduce", hlo):
        record(m.group(1), m.group(2))
    # XLA-combined all-reduces carry TUPLE shapes:
    # "= (f32[200,42]{...}, f32[]) all-reduce(...)" — parse every element.
    for m in re.finditer(r"= \(([^)]*)\) all-reduce", hlo):
        for e in re.finditer(r"(\w+)\[([\d,]*)\]", m.group(1)):
            record(e.group(1), e.group(2))

    # Analytic dynamic volume per LM step (f32 bytes, one direction) for
    # the POINT-ALIGNED DENSE-SCHUR scheme — all point-side reductions are
    # local and the reduced system reduces ONCE:
    #   build: cam_rows [C,42] + cost (x2 on lm_step: build + trial cost)
    #   solve: rhs [C,6] + S [6C,6C]
    model_bytes = 4 * (
        2 * (C * 42 + 1) + C * 6 + (6 * C) ** 2
    )
    return {
        "devices": n_devices,
        "all_reduce_shape_census_static": census,
        "obs_sized_all_reduces": o_sized,
        "analytic_bytes_per_lm_step": model_bytes,
        "analytic_MB_per_lm_step": round(model_bytes / 1e6, 2),
        "obs_bytes_per_device_for_scale": 4 * O * 9 // n_devices,
    }


def compute_time_nproc(nproc=2, n_iter=6, obs_per_cam=600, P=20000):
    """Per-process CPU time of the sharded LM step: 1-process baseline vs
    `nproc` real processes (jax.distributed). Returns compute-time
    efficiency.

    On this 2-core box, nproc>2 oversubscribes cores; gloo barriers
    busy-wait, so CPU time INCLUDES spin at the barriers and the measured
    efficiency is a conservative lower bound (r5 directive 9 asks for the
    4-process point or the measured falloff + cause).

    CPU-backend caveat: every psum is a gloo barrier costing ~1-2 ms of
    host CPU regardless of payload (vs ~us on ICI for the [C,6] tensors
    the point-aligned scheme reduces), so the measured efficiency is a
    LOWER bound that rises with work-per-barrier — measure at more than
    one problem size to see the asymptote."""
    def run(nproc):
        port = str(_free_port())
        procs = []
        n_cores = len(os.sched_getaffinity(0))
        for pid in range(nproc):
            cmd = [sys.executable, "-c", _WORKER.format(repo=REPO),
                   str(nproc), str(pid), port, str(n_iter),
                   str(obs_per_cam), str(P)]
            if n_cores >= nproc:
                # One core per process: the 1-process baseline and each
                # 2-process worker then measure the same single-core
                # execution regime (otherwise XLA intra-op threads let the
                # baseline use every core and skew the CPU-time ratio).
                cmd = ["taskset", "-c", str(pid % n_cores)] + cmd
            p = subprocess.Popen(
                cmd,
                stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            )
            procs.append(p)
        outs = []
        for p in procs:
            out, err = p.communicate(timeout=900)
            for line in out.splitlines():
                if line.startswith("RESULT "):
                    outs.append(json.loads(line[len("RESULT "):]))
            if p.returncode != 0:
                raise RuntimeError(err[-2000:])
        return outs

    base = run(1)[0]
    many = run(nproc)
    cpu1 = base["cpu_s"]
    cpun = [o["cpu_s"] for o in many]
    eff_mean = cpu1 / sum(cpun)
    eff_critical = cpu1 / (nproc * max(cpun))
    return {
        "processes": nproc,
        "one_process_cpu_s": round(cpu1, 3),
        "n_process_cpu_s": [round(c, 3) for c in cpun],
        "one_process_wall_s": round(base["wall_s"], 3),
        "n_process_wall_s": [round(o["wall_s"], 3) for o in many],
        "compute_time_efficiency_mean": round(eff_mean, 3),
        "compute_time_efficiency_critical_path": round(eff_critical, 3),
        "iters": n_iter,
        "problem": {"C": 200, "P": P, "O": 200 * obs_per_cam},
    }


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="SCALING_r04.json")
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--devices", type=int, nargs="+", default=[1, 2, 4, 8])
    args = ap.parse_args()

    from stereo_orb_slam_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax

    from stereo_orb_slam_tpu.apps import scaling_bench
    from stereo_orb_slam_tpu.config import BAConfig

    avail = len(jax.devices())
    sizes = [d for d in args.devices if d <= avail]

    collectives = [collective_report(n) for n in sizes if n > 1]

    cfg = BAConfig(cg_iterations=25)
    wall = {}
    base = None
    for n in sizes:
        ips = scaling_bench.measure(n, args.iters, cfg)
        if base is None:
            base = ips
        wall[str(n)] = {
            "ba_iterations_per_sec": round(ips, 3),
            "wall_efficiency": round(ips / (base * n), 3),
        }

    ct = [compute_time_nproc(2, args.iters),
          compute_time_nproc(2, args.iters, obs_per_cam=1800, P=40000)]
    # 4-process points (r5 directive 9): same methodology, 2 procs/core.
    ct4 = [compute_time_nproc(4, args.iters),
           compute_time_nproc(4, args.iters, obs_per_cam=1800, P=40000)]

    result = {
        "what": ("distributed-BA scaling evidence: HLO collective census, "
                 "2-process compute-time efficiency, virtual-mesh wall "
                 "curve"),
        "problem": {"C": 200, "P": 20000, "O": 120000, "cg_iterations": 25},
        "collectives": collectives,
        "compute_time_2proc": ct,
        "compute_time_4proc": ct4,
        "wall_clock_virtual_mesh": wall,
        "note": ("wall-clock efficiency on the virtual mesh shares this "
                 "host's cores across all virtual devices and under-reads; "
                 "compute-time efficiency + O(C+P) collective volume are "
                 "the hardware-transferable quantities"),
    }
    out = json.dumps(result, indent=1)
    print(out)
    with open(args.out, "w") as f:
        f.write(out + "\n")


if __name__ == "__main__":
    main()
