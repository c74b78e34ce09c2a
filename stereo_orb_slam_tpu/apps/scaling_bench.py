"""Distributed-BA scaling harness (BASELINE.json metric: BA iterations/s at
1 chip / 1 host / N hosts, scaling efficiency).

Runs the observation-sharded LM step on meshes of growing size over the
available devices (real chips, or a virtual CPU mesh via
XLA_FLAGS=--xla_force_host_platform_device_count=N) and reports iterations/s
plus parallel efficiency vs the single-device run.

    python -m stereo_orb_slam_tpu.apps.scaling_bench --devices 1 2 4 8
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def make_problem(C=200, P=20000, obs_per_cam=600, seed=0):
    import jax.numpy as jnp

    from stereo_orb_slam_tpu.backend.ba import BAProblem

    rng = np.random.default_rng(seed)
    fx, cx, cy, b = 718.856, 607.1928, 185.2157, 0.5371657
    P_l = np.array([[fx, 0, cx, 0], [0, fx, cy, 0], [0, 0, 1, 0]], np.float32)
    P_r = P_l.copy()
    P_r[0, 3] = -fx * b
    O = C * obs_per_cam
    pts = np.stack(
        [rng.uniform(-20, 20, P), rng.uniform(-5, 5, P), rng.uniform(5, 60, P)],
        1,
    ).astype(np.float32)
    pose6 = rng.normal(0, 0.01, (C, 6)).astype(np.float32)
    obs_cam = np.repeat(np.arange(C, dtype=np.int32), obs_per_cam)
    obs_point = rng.integers(0, P, O).astype(np.int32)
    X = pts[obs_point]

    def proj(Pm):
        Xh = np.concatenate([X, np.ones((O, 1), np.float32)], 1)
        uvw = Xh @ Pm.T
        return uvw[:, :2] / np.maximum(uvw[:, 2:3], 1e-6)

    obs_uv = np.concatenate([proj(P_l), proj(P_r)], 1).astype(np.float32)
    obs_uv += rng.normal(0, 0.5, obs_uv.shape).astype(np.float32)
    cam_mask = np.asarray([0.0] + [1.0] * (C - 1), np.float32)
    return BAProblem(
        pose6=jnp.asarray(pose6), points=jnp.asarray(pts),
        obs_cam=jnp.asarray(obs_cam), obs_point=jnp.asarray(obs_point),
        obs_uv=jnp.asarray(obs_uv), obs_weight=jnp.ones(O, jnp.float32),
        cam_mask=jnp.asarray(cam_mask), point_mask=jnp.ones(P, jnp.float32),
        P_l=jnp.asarray(P_l), P_r=jnp.asarray(P_r),
    )


def measure(n_devices: int, n_iter: int, cfg) -> float:
    """Iterations/s of the sharded LM step on an n-device mesh."""
    import jax
    import jax.numpy as jnp

    from stereo_orb_slam_tpu.parallel.dist_ba import sharded_lm_step
    from stereo_orb_slam_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(n_devices)
    step = sharded_lm_step(mesh, cfg)
    prob = make_problem()
    lam = jnp.float32(1e-4)

    p2, *_ = step(prob, lam)
    jax.block_until_ready(p2.pose6)

    # Sync-differencing (see bench.py): subtract the transport round trip.
    noop = jax.jit(lambda x: x * 1.0)
    zz = jnp.ones((8, 8), jnp.float32)
    _ = np.asarray(noop(zz))

    def sync_min(fn, n):
        ts = []
        for i in range(n):
            t0 = time.perf_counter()
            r = fn(i)
            _ = np.asarray(jax.tree.leaves(r)[0]).ravel()[0]
            ts.append(time.perf_counter() - t0)
        return float(np.min(ts[1:]))

    rtt = sync_min(lambda i: noop(zz), max(4, n_iter))
    state = {"prob": prob}

    def it(i):
        p2, *_ = step(state["prob"], lam)
        state["prob"] = p2
        return p2.pose6

    total = sync_min(it, n_iter)
    return 1.0 / max(total - rtt, 1e-5)


def main(argv=None):
    import jax

    from stereo_orb_slam_tpu.config import BAConfig
    from stereo_orb_slam_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, nargs="+", default=None)
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args(argv)

    avail = len(jax.devices())
    sizes = args.devices or [d for d in (1, 2, 4, 8) if d <= avail]
    cfg = BAConfig(cg_iterations=25)

    results = {}
    base = None
    for n in sizes:
        ips = measure(n, args.iters, cfg)
        if base is None:
            base = ips
        eff = ips / (base * n) if base else 0.0
        results[str(n)] = {
            "ba_iterations_per_sec": round(ips, 3),
            "scaling_efficiency": round(eff, 3),
        }
        print(f"devices={n}: {ips:.2f} it/s, efficiency {eff:.2%}")
    print(json.dumps({"scaling": results}))


if __name__ == "__main__":
    main()
