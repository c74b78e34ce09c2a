"""f32 numerics at global-BA scale (VERDICT round-1 item 6; SURVEY §7
"Schur + LM numerics" hard part).

Ceres runs in double; our TPU solver stores and reduces in f32. This test
solves a synthetic C=1000-keyframe / P=100k-point / O=200k-observation
global BA in BOTH precisions (the f64 run needs JAX_ENABLE_X64, which is
process-global, hence the subprocess) and asserts the f32 cost signal — the
quantity the LM accept test `cost1 < cost0` depends on — agrees with f64.

The dense-Schur fast path is f32-only by design; the comparison runs the
matrix-free path both solves use at this scale.
"""

import json
import os
import subprocess
import sys
import pytest

_WORKER = r"""
import os, sys, json
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_ENABLE_X64"] = "1"
os.environ.pop("XLA_FLAGS", None)
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
sys.path.insert(0, __REPO__)
import numpy as np
import jax.numpy as jnp
from stereo_orb_slam_tpu.backend.ba import BAProblem, ba_solve
from stereo_orb_slam_tpu.config import BAConfig


def make(dtype, C=1000, P=100000, opc=200, seed=0):
    rng = np.random.default_rng(seed)
    fx, cx, cy, b = 718.856, 607.1928, 185.2157, 0.5371657
    P_l = np.array([[fx, 0, cx, 0], [0, fx, cy, 0], [0, 0, 1, 0]], dtype)
    P_r = P_l.copy(); P_r[0, 3] = -fx * b
    O = C * opc
    pts = np.stack([rng.uniform(-20, 20, P), rng.uniform(-5, 5, P),
                    rng.uniform(5, 60, P)], 1).astype(dtype)
    pose6 = rng.normal(0, 0.003, (C, 6)).astype(dtype)
    obs_cam = np.repeat(np.arange(C, dtype=np.int32), opc)
    obs_point = rng.integers(0, P, O).astype(np.int32)
    order = np.argsort(obs_point, kind="stable")
    obs_point, obs_cam = obs_point[order], obs_cam[order]
    X = pts[obs_point]
    def proj(Pm):
        Xh = np.concatenate([X, np.ones((O, 1), dtype)], 1)
        uvw = Xh @ Pm.T
        return uvw[:, :2] / np.maximum(uvw[:, 2:3], 1e-6)
    obs_uv = np.concatenate([proj(P_l), proj(P_r)], 1).astype(dtype)
    obs_uv += rng.normal(0, 0.5, obs_uv.shape).astype(dtype)
    return BAProblem(
        pose6=jnp.asarray(pose6), points=jnp.asarray(pts),
        obs_cam=jnp.asarray(obs_cam), obs_point=jnp.asarray(obs_point),
        obs_uv=jnp.asarray(obs_uv), obs_weight=jnp.ones(O, dtype),
        cam_mask=jnp.asarray(np.r_[0.0, np.ones(C - 1)].astype(dtype)),
        point_mask=jnp.ones(P, dtype),
        P_l=jnp.asarray(P_l), P_r=jnp.asarray(P_r),
    )


cfg = BAConfig(cg_iterations=40, function_tolerance=0.0)
out = {}
for dtype, name in ((np.float32, "f32"), (np.float64, "f64")):
    prob = make(dtype)
    carry, n_it, c0 = ba_solve(prob, jnp.int32(6), cfg)
    out[name] = {"c0": float(c0), "c1": float(carry.cost),
                 "iters": int(n_it)}
print("RESULT " + json.dumps(out))
"""


@pytest.mark.slow
def test_f32_cost_signal_matches_f64_at_1000_keyframes(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER.replace("__REPO__", repr(repo)))
    proc = subprocess.run(
        [sys.executable, str(worker)], capture_output=True, text=True,
        timeout=560,
    )
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    line = [l for l in proc.stdout.splitlines() if l.startswith("RESULT ")][-1]
    r = json.loads(line[len("RESULT "):])

    # Same initial cost (same problem), and both made real progress.
    assert abs(r["f32"]["c0"] - r["f64"]["c0"]) / r["f64"]["c0"] < 1e-4
    assert r["f32"]["c1"] < 0.2 * r["f32"]["c0"]
    # The f32 cost signal tracks the f64 one: the LM accept test
    # (cost1 < cost0) sees the same landscape.
    rel = abs(r["f32"]["c1"] - r["f64"]["c1"]) / r["f64"]["c1"]
    assert rel < 1e-3, f"f32 final cost diverged from f64: {r}"
