"""Endurance-harness smoke test (r2 verdict item 3).

Drives benchmarks/endurance.py — the 2k+ frame live-loop stability harness
whose TPU artifact is ENDURANCE_r03.json — at a miniature scale on CPU and
asserts its invariants hold mechanically:

- every frame tracks through the batched pipeline incl. BoW
  capacity-doubling drains (db starts at 32 rows, run needs 96),
- XLA compile count stops growing after the first window (no jit-shape
  leak as the map/database grow),
- the artifact's fields are complete and ATE against the exact lateral
  ground truth stays tight.
"""

import json
import os
import subprocess
import sys

import pytest


@pytest.mark.slow
@pytest.mark.timeout(900)
def test_endurance_harness_invariants(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = tmp_path / "endurance.json"
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)
    r = subprocess.run(
        [sys.executable, "-m", "benchmarks.endurance",
         "--frames", "96", "--batch", "8", "--period", "64",
         "--h", "240", "--w", "320", "--window", "32",
         "--db_capacity", "32", "--out", str(out)],
        cwd=repo, env=env, capture_output=True, text=True, timeout=850,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    data = json.loads(out.read_text())
    assert data["frames"] == 96
    assert data["tracked_frames"] == 96
    assert data["finish_error"] is None, data["finish_error"]
    # The database grew past its initial capacity (32 -> 96 rows): the
    # capacity-doubling drain path ran.
    assert data["db_size_final"] == 96
    assert data["db_capacity_initial"] == 32
    # No compile growth once the shapes have been seen: everything after
    # the first window must come from the jit cache (a handful of solves
    # with new padding buckets are allowed; unbounded growth is the bug).
    assert data["compiles_after_first_window"] <= 30, data
    # Exact lateral ground truth holds through the whole run.
    assert data["lateral_ate_m"] < 0.05, data
